#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query output
parquet under OUTDIR, run the matching oracle SQL from oracle_sql.json in
DuckDB over the SFDIR tables and compare rows exactly (columns sorted by
name, rows sorted, values compared exactly).

Usage: python3 tools/oracle_check.py OUTDIR SFDIR
"""
import json
import math
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # Array-typed cells (numpy ndarray / list) are unhashable and engine-
    # dependent in repr; coerce to a tuple of normalized element strings so
    # sorting/comparison can't crash and "[1 2]" vs "[1, 2]" can't diverge.
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(str(norm_cell(x)) for x in v)
    return v


def compare(name, mine, oracle):
    mcols, ocols = sorted(mine.columns), sorted(oracle.columns)
    if [c.lower() for c in mcols] != [c.lower() for c in ocols]:
        return f"SCHEMA: mine={mcols} oracle={ocols}"
    # dtype families must agree (int vs float vs object) even when values
    # stringify identically — catches silent type drift between engines
    fam = lambda d: ("int" if d.kind in "iu" else
                     "float" if d.kind == "f" else
                     "bool" if d.kind == "b" else
                     "ts" if d.kind == "M" else "obj")
    for c in mcols:
        mf, of = fam(mine[c].dtype), fam(oracle[c].dtype)
        if mf != of:
            if {mf, of} == {"int", "float"}:  # count() nullability widening
                mine = mine.assign(**{c: mine[c].astype("float64")})
                oracle = oracle.assign(**{c: oracle[c].astype("float64")})
            else:
                return f"DTYPE {c}: mine={mine[c].dtype} oracle={oracle[c].dtype}"
    mine = mine[mcols]
    oracle = oracle[[c for c in sorted(oracle.columns)]]
    if len(mine) != len(oracle):
        return f"ROWS: mine={len(mine)} oracle={len(oracle)}"
    mrows = sorted([tuple(str(norm_cell(v)) for v in r) for r in mine.itertuples(index=False)])
    orows = sorted([tuple(str(norm_cell(v)) for v in r) for r in oracle.itertuples(index=False)])
    if mrows != orows:
        diffs = [(a, b) for a, b in zip(mrows, orows) if a != b][:3]
        return f"HASH: first diffs {diffs}"
    return None


def main():
    outdir, sfdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(outdir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for name in sorted(os.listdir(outdir)):
        qdir = os.path.join(outdir, name)
        if not os.path.isdir(qdir):
            continue
        try:
            mine = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        except Exception as e:
            results[name] = f"READ-FAIL: {e}"
            continue
        if name not in oracles:
            results[name] = f"rows-only ({len(mine)} rows)"
            continue
        try:
            oracle = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-FAIL: {str(e)[:200]}"
            continue
        err = compare(name, mine, oracle)
        results[name] = err if err else "OK"

    missing = [q for q in oracles if q not in results]
    npass = sum(1 for v in results.values() if v == "OK")
    nrows_only = sum(1 for v in results.values() if v.startswith("rows-only"))
    for name, v in sorted(results.items()):
        flag = "  " if v == "OK" or v.startswith("rows-only") else "XX"
        print(f"{flag} {name}: {v}")
    if missing:
        print(f"MISSING OUTPUT for oracles: {missing}")
    print(f"\n{npass} OK, {nrows_only} rows-only, "
          f"{len(results) - npass - nrows_only} failed, {len(missing)} missing")


if __name__ == "__main__":
    main()
