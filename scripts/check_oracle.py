#!/usr/bin/env python3
"""Dev-only oracle checker (mimics the driver's DuckDB compare).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads every table in sfDir into DuckDB, runs each oracle_sql.json entry,
and compares against the Spark parquet result in <verifyOutDir>/<name>:
columns sorted by name, rows sorted, values compared exactly (floats via
repr). This script is local tooling only — the shipped Scala library does
not depend on it.
"""
import json
import sys
import glob
import os

import duckdb


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order]


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = n_err = 0
    if only:
        oracles = {k: v for k, v in oracles.items() if only in k}
    for name in sorted(oracles):
        sql = oracles[name]
        spark_dir = f"{out_dir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"MISS {name}: no spark output")
            n_err += 1
            continue
        try:
            duck = con.execute(sql)
            d_cols = [c[0] for c in duck.description]
            d_rows = duck.fetchall()
            sq = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            s_cols = [c[0] for c in sq.description]
            s_rows = sq.fetchall()
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            n_err += 1
            continue
        dc, dcols = canon(d_rows, d_cols)
        sc, scols = canon(s_rows, s_cols)
        if dcols != scols:
            print(f"BAD  {name}: columns spark={scols} duck={dcols}")
            n_bad += 1
        elif dc != sc:
            n_bad += 1
            diff = [(a, b) for a, b in zip(sc, dc) if a != b]
            print(f"BAD  {name}: {len(d_rows)} vs {len(s_rows)} rows; "
                  f"first diffs: {diff[:2]}")
        else:
            n_ok += 1
            print(f"OK   {name} ({len(s_rows)} rows)")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_err} err")
    return 1 if (n_bad or n_err) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  sys.argv[3] if len(sys.argv) > 3 else None))
