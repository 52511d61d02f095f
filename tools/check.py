#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir> [query ...]

Reads each parquet result written by graft.Verify from <outDir>/<name>/,
runs the matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over
views named after the fixture tables in <sfDir>, and compares:
  - column sets (sorted by name)
  - dtypes (warning only)
  - row multisets (exact value match after canonical sort)

This is a builder-side tool; the shipped library never imports it.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Approx-by-nature queries: both engines run their OWN sketch
# (HLL / quantile summary), so numeric values are compared with a relative
# tolerance instead of exact string equality. Rows, columns, and string
# key columns still compare exactly. The true value gate for these is
# AccuracySpec (vs the exact answer); this keeps the local harness honest
# about rows+schema without hash-failing expected sketch noise.
APPROX_TOL = {
    "q20_approx_distinct": 0.15,       # two independent HLLs (rsd 0.05 each)
    "q100_percentiles_approx": 0.02,   # GK vs t-digest/disc; measured 0.12% @ sf0.01
    "q101_profile_hll": 0.15,          # HLL n_distinct; n/null/min/max are exact
}


def approx_compare(name, got, exp, tol):
    import numpy as np
    keys = sorted(c for c in got.columns if got[c].dtype == object)
    nums = sorted(c for c in got.columns if c not in keys)
    g = got.sort_values(by=keys or list(got.columns)).reset_index(drop=True)
    e = exp.sort_values(by=keys or list(exp.columns)).reset_index(drop=True)
    for c in keys:
        if list(g[c]) != list(e[c]):
            return f"key column {c} differs: {list(g[c])[:5]} vs {list(e[c])[:5]}"
    for c in nums:
        gv = g[c].astype(float).to_numpy()
        ev = e[c].astype(float).to_numpy()
        denom = np.maximum(np.abs(ev), 1.0)
        rel = np.abs(gv - ev) / denom
        if np.any(rel > tol):
            i = int(np.argmax(rel))
            return (f"col {c} beyond tol {tol}: rel={rel[i]:.4f} "
                    f"(spark={gv[i]} oracle={ev[i]})")
    return None


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for a total order + exact compare (bit-different doubles
    # stringify differently, which is exactly what we want to catch)
    sdf = df.apply(lambda col: col.map(repr))
    order = sdf.sort_values(by=list(sdf.columns)).index
    return df.loc[order].reset_index(drop=True), sdf.loc[order].reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"SKIP  {name} (no oracle; rows-only)")
            n_skip += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: load/oracle error: {str(e)[:300]}")
            n_fail += 1
            continue
        gcols, ecols = sorted(got.columns), sorted(exp.columns)
        if gcols != ecols:
            print(f"FAIL  {name}: columns differ: spark={gcols} oracle={ecols}")
            n_fail += 1
            continue
        if name in APPROX_TOL:
            if len(got) != len(exp):
                print(f"FAIL  {name}: row count {len(got)} vs {len(exp)}")
                n_fail += 1
                continue
            err = approx_compare(name, got, exp, APPROX_TOL[name])
            if err:
                print(f"FAIL  {name}: {err}")
                n_fail += 1
            else:
                print(f"PASS  {name} ({len(got)} rows, approx tol={APPROX_TOL[name]})")
                n_pass += 1
            continue
        g, gs = canon(got)
        e, es = canon(exp)
        if len(g) != len(e):
            print(f"FAIL  {name}: row count {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        neq = (gs != es)
        if neq.any().any():
            bad_cols = [c for c in gs.columns if neq[c].any()]
            idx = neq.any(axis=1)
            i0 = list(gs.index[idx])[:3]
            print(f"FAIL  {name}: value mismatch in cols {bad_cols}")
            for i in i0:
                print(f"      row {i}: spark={dict(gs.loc[i])} oracle={dict(es.loc[i])}")
            n_fail += 1
            continue
        dtw = ""
        for c in g.columns:
            if str(g[c].dtype) != str(e[c].dtype):
                dtw += f" [dtype {c}: {g[c].dtype} vs {e[c].dtype}]"
        print(f"PASS  {name} ({len(g)} rows){dtw}")
        n_pass += 1
    # A query that crashed in Verify writes NO result dir and would silently
    # vanish from the tally above — count every declared-but-missing query
    # as a FAIL so the gate can't report all-pass over broken queries.
    seen = {d for d in os.listdir(out_dir)
            if os.path.isdir(os.path.join(out_dir, d))}
    missing = sorted(q for q in oracles
                     if q not in seen and (not only or q in only))
    for q in missing:
        print(f"FAIL  {q}: declared oracle but no result dir (query crashed in Verify?)")
        n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
