#!/usr/bin/env python3
"""Compare two graft.Verify output dirs for bit-identical results.

Usage: python3 tools/diffruns.py <outDirA> <outDirB>

Run Verify twice with different layouts (e.g. SPARK_GRAFT_CPUS=32 vs 7)
and diff: any query whose result depends on partitioning/parallelism —
a tie broken by physical row order, a partition-local RNG, an
accumulator race — shows up here long before a cluster would expose it.
Builder-side tool; the shipped library never imports it.
"""
import os
import sys

import duckdb


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    mismatches, compared = [], 0
    for name in sorted(os.listdir(b_dir)):
        qa, qb = os.path.join(a_dir, name), os.path.join(b_dir, name)
        if not (os.path.isdir(qa) and os.path.isdir(qb)):
            continue
        compared += 1
        try:
            da = con.sql(f"SELECT * FROM read_parquet('{qa}/*.parquet')").df()
            db = con.sql(f"SELECT * FROM read_parquet('{qb}/*.parquet')").df()
            ca = sorted(da.columns)
            if sorted(db.columns) != ca:
                mismatches.append(f"{name} (columns differ)")
                continue
            da = da[ca].apply(lambda c: c.map(repr)).sort_values(by=ca).reset_index(drop=True)
            db = db[ca].apply(lambda c: c.map(repr)).sort_values(by=ca).reset_index(drop=True)
            if len(da) != len(db) or not da.equals(db):
                mismatches.append(name)
        except Exception as e:
            mismatches.append(f"{name} (error: {str(e)[:100]})")
    print(f"compared {compared} queries")
    for m in mismatches:
        print(f"DIFF  {m}")
    print("layout-dependent results:", mismatches if mismatches else "NONE")
    return 1 if mismatches else 0


if __name__ == "__main__":
    sys.exit(main())
