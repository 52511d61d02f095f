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

# Sketch-backed queries whose VALUES legitimately depend on partial-merge
# order (a GK quantile summary or HLL merged in a different partition
# order is a different-but-equally-valid summary). ONLY the named sketch
# value columns get the relative tolerance; every other column — string
# keys, integer group/bucket ids, and exact numerics riding alongside the
# sketch (q101's n/n_null/min/max) — still compares exactly, so two runs
# with genuinely different keys or exact values can never slip through
# the tolerance. Everything else stays bit-exact — a tie broken by
# physical row order in an EXACT query is still a bug this tool catches.
APPROX_TOL = {
    "q20_approx_distinct": (0.15, {"approx_parts"}),
    "q100_percentiles_approx": (0.02, {"price_p25", "price_p50", "price_p75", "qty_p90"}),
    "q101_profile_hll": (0.15, {"n_distinct"}),
}


def approx_equal(name, da, db, tol, approx_cols):
    import numpy as np
    keys = sorted(c for c in da.columns if c not in approx_cols)
    nums = [c for c in sorted(da.columns) if c in approx_cols]
    da = da.sort_values(by=keys + nums).reset_index(drop=True)
    db = db.sort_values(by=keys + nums).reset_index(drop=True)
    if len(da) != len(db):
        return False
    if keys and not da[keys].apply(lambda c: c.map(repr)).equals(
            db[keys].apply(lambda c: c.map(repr))):
        return False
    for c in nums:
        x = da[c].astype(float).to_numpy()
        y = db[c].astype(float).to_numpy()
        if not np.allclose(x, y, rtol=tol, equal_nan=True):
            return False
    return True


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
            if name in APPROX_TOL:
                tol, approx_cols = APPROX_TOL[name]
                if not approx_equal(name, da[ca], db[ca], tol, approx_cols):
                    mismatches.append(f"{name} (beyond sketch tolerance)")
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
