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
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else float(v)
    return v


def main(dir_a, dir_b):
    con = duckdb.connect()
    names = sorted(
        d for d in os.listdir(dir_a)
        if os.path.isdir(os.path.join(dir_a, d)))
    n_pass = n_fail = 0
    for name in names:
        rows = []
        for d in (dir_a, dir_b):
            r = con.sql(f"SELECT * FROM '{d}/{name}/*.parquet'")
            cols = sorted(r.columns)
            vals = [tuple(norm(v) for v in row)
                    for row in con.sql(
                        f"SELECT {', '.join(cols)} FROM '{d}/{name}/*.parquet'").fetchall()]
            rows.append(vals)
        if rows[0] == rows[1]:
            n_pass += 1
            print(f"SAME {name} ({len(rows[0])} rows)")
        else:
            n_fail += 1
            print(f"DIFF {name}: {len(rows[0])} vs {len(rows[1])} rows")
    print(f"\n{n_pass} identical / {n_fail} different")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
