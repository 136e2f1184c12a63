#!/usr/bin/env python3
"""Dev-only oracle checker (mimics the driver's DuckDB compare).

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads every table in sfDir into DuckDB, runs each oracle_sql.json entry,
and compares against the Spark parquet result in <verifyOutDir>/<name>:
columns sorted by name, rows sorted, values compared exactly (floats via
repr) — AND column types compared strictly (DuckDB's type name on both
sides, since the Spark parquet is read back through DuckDB too). The type
check matches the driver's type-sensitive hash: a DuckDB DECIMAL128 SUM vs
a Spark BIGINT is value-equal under repr but red at the driver (the
round-4 q97 bug class), so any type mismatch is now BAD here as well.
This script is local tooling only — the shipped Scala library does not
depend on it.
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


def run_side(con, sql):
    """One execution per side: schema types AND row values both come from
    the same Arrow table (a separate fetchall would re-run the query —
    the xxhash64 CTE-chain oracles are expensive enough to care)."""
    tbl = con.execute(sql).arrow()
    cols = list(tbl.schema.names)
    types = [str(tbl.schema.field(c).type) for c in cols]
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, types, rows


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
        spark_sql = f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')"
        try:
            # Arrow schemas carry the real types (the DB-API description
            # collapses BIGINT/DECIMAL128 both to NUMBER); the driver's
            # type-sensitive hash operates at this level.
            d_cols, d_types, d_rows = run_side(con, sql)
            s_cols, s_types, s_rows = run_side(con, spark_sql)
        except Exception as e:
            print(f"ERR  {name}: {str(e).splitlines()[0][:160]}")
            n_err += 1
            continue
        dc, dcols = canon(d_rows, d_cols)
        sc, scols = canon(s_rows, s_cols)
        d_tmap = dict(zip(d_cols, d_types))
        s_tmap = dict(zip(s_cols, s_types))
        type_bad = [(c, s_tmap[c], d_tmap[c]) for c in dcols
                    if c in s_tmap and s_tmap[c] != d_tmap[c]]
        if dcols != scols:
            print(f"BAD  {name}: columns spark={scols} duck={dcols}")
            n_bad += 1
        elif type_bad:
            n_bad += 1
            print(f"BAD  {name}: type mismatch "
                  + "; ".join(f"{c}: spark={s} duck={d}"
                              for c, s, d in type_bad))
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
