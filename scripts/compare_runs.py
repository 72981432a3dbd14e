#!/usr/bin/env python3
"""Cross-JVM determinism sweep: value-compares two independent Verify
output dirs (each produced by a separate `sbt runMain graft.Verify` JVM).
Every query — oracle-backed AND rows-only — must be value-identical row
for row; this is the round-level check that covers the hash-seeded
outputs DuckDB cannot re-express (minhash/simhash survivors, IVF/LSH ANN,
HLL, fingerprint) INCLUDING quantizer training, which the in-process
twin-run gate cannot re-exercise (it shares SparkEntry's IVF cache).

Usage: python3 scripts/compare_runs.py <outDirA> <outDirB>
"""
import math
import os
import sys

import duckdb


def norm(v):
    # recurse into nested values: an array<double> holding NaN must still
    # compare equal to itself
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else float(v)
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, norm(x)) for k, x in v.items()))
    return v


def query_dirs(d):
    return {n for n in os.listdir(d) if os.path.isdir(os.path.join(d, n))}


def main(dir_a, dir_b):
    con = duckdb.connect()
    # union of both sides: a query written by only one run is a DIFF, not
    # a silent coverage gap
    names = sorted(query_dirs(dir_a) | query_dirs(dir_b))
    n_pass = n_warn = n_fail = 0
    for name in names:
        try:
            rows = []
            for d in (dir_a, dir_b):
                r = con.sql(f"SELECT * FROM '{d}/{name}/*.parquet'")
                cols = sorted(r.columns)
                vals = [tuple(norm(v) for v in row)
                        for row in con.sql(
                            f"SELECT {', '.join(cols)} FROM '{d}/{name}/*.parquet'").fetchall()]
                rows.append(vals)
        except Exception as e:  # missing dir, unreadable parquet, ...
            n_fail += 1
            print(f"DIFF {name}: error reading one side ({e})")
            continue
        if rows[0] == rows[1]:
            n_pass += 1
            print(f"SAME {name} ({len(rows[0])} rows)")
        elif sorted(rows[0], key=repr) == sorted(rows[1], key=repr):
            # same multiset, different row order: values are deterministic
            # (no DIFF — parquet glob order is not a contract), but flag it
            # loudly — a query whose ORDER BY is not total surfaces exactly
            # here first, and as a driver hash flake at a larger SF later
            n_warn += 1
            print(f"WARN {name}: identical rows in DIFFERENT ORDER "
                  f"({len(rows[0])} rows) — is the ORDER BY total (unique tiebreak)?")
        else:
            n_fail += 1
            print(f"DIFF {name}: {len(rows[0])} vs {len(rows[1])} rows")
    print(f"\n{n_pass} identical / {n_warn} order-warnings / {n_fail} different")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
