#!/usr/bin/env python3
"""Local pre-check of SparkEntry oracles: compares Verify's parquet output
against DuckDB running oracle_sql.json over the same testdata tables.
Mimics the driver's gate (column-name sort, value compare). Dev tool only —
not part of the Spark library.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = sorted(got_rel.columns)
            got = con.sql(
                f"SELECT {', '.join(got_cols)} FROM '{out_dir}/{name}/*.parquet'").fetchall()
            exp_rel = con.sql(sql)
            exp_cols = sorted(exp_rel.columns)
            exp_proj = con.sql(f"SELECT {', '.join(exp_cols)} FROM ({sql}) __t")
            exp = exp_proj.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {e}")
            n_fail += 1
            continue
        if got_cols != exp_cols:
            print(f"FAIL {name}: columns {got_cols} != {exp_cols}")
            n_fail += 1
            continue
        got_n = [[norm(v) for v in r] for r in got]
        exp_n = [[norm(v) for v in r] for r in exp]
        if got_n == exp_n:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            if len(got_n) != len(exp_n):
                print(f"FAIL {name}: rowcount {len(got_n)} != {len(exp_n)}")
            else:
                for i, (g, e) in enumerate(zip(got_n, exp_n)):
                    if g != e:
                        print(f"FAIL {name}: row {i} differs\n  got {g}\n  exp {e}")
                        break
    # the planted-ground-truth gate is part of the same pre-verify pipeline:
    # a SelfCheck failure must fail THIS command's exit code, not just
    # scroll by in sbt output (selfcheck.json is written by every Verify)
    sc_pass = sc_fail = 0
    try:
        selfcheck = json.load(open(f"{out_dir}/selfcheck.json"))
        for name, row in sorted(selfcheck.items()):
            if row.get("pass"):
                sc_pass += 1
                print(f"PASS selfcheck:{name} ({row['found']}/{row['planted']} planted)")
            else:
                sc_fail += 1
                print(f"FAIL selfcheck:{name}: found {row.get('found')} of "
                      f"{row.get('planted')} planted — {row.get('detail')}")
    except FileNotFoundError:
        print("WARN no selfcheck.json in the verify output (old Verify build?)")
    print(f"\n{n_pass} pass / {n_fail} fail "
          f"(+{len([k for k in json.load(open(f'{out_dir}/oracle_sql.json'))])} oracles checked; "
          f"selfcheck {sc_pass} pass / {sc_fail} fail)")
    return 1 if (n_fail or sc_fail) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
