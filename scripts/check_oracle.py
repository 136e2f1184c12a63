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


def canon(rows, cols, types):
    """One canonical permutation for values AND types — the positional
    type compare is correct only because both use this same stable
    sort, so the ordering lives in exactly one place.

    Duplicate column names (ADVICE r6): a stable name-sort pairs
    duplicates by each side's original relative order, which is
    positional luck — so the compare loop REFUSES duplicate-named
    results outright (reported BAD) instead of risking a spurious
    verdict, and QueriesSmokeSpec makes duplicate names a build
    failure on the Spark side."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(repr(r[i]) for i in order))
    return sorted(out), [cols[i] for i in order], [types[i] for i in order]


def run_side(con, sql):
    """One execution per side: schema types AND row values both come from
    the same Arrow table (a separate fetchall would re-run the query —
    the xxhash64 CTE-chain oracles are expensive enough to care). Values
    are extracted POSITIONALLY (per-column to_pylist), not via row dicts:
    a result with duplicate column names would collapse to one value per
    name in a dict and silently mask a mismatch in the shadowed column."""
    tbl = con.execute(sql).arrow()
    cols = list(tbl.schema.names)
    types = [str(tbl.schema.field(i).type) for i in range(tbl.num_columns)]
    col_vals = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = [tuple(vals) for vals in zip(*col_vals)] if cols else []
    return cols, types, rows


def main(sf_dir, out_dir, only=None, types_out=None):
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.basename(p)[:-8]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_ok = n_bad = n_err = 0
    audit = []  # (query, column, spark arrow type, duckdb arrow type)
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
        # types are compared POSITIONALLY along the same canon column
        # ordering the values use (canon returns both) — a name-keyed
        # dict would collapse duplicate column names to the last
        # occurrence and compare only that one's type, contradicting
        # run_side's duplicate-column rationale (round-5 advice)
        dup = sorted({c for side in (d_cols, s_cols) for c in side
                      if side.count(c) > 1})
        if dup:
            print(f"BAD  {name}: duplicate column name(s) {dup} — "
                  "name-sorted pairing is ill-defined on duplicates; "
                  "alias every column uniquely on both sides")
            n_bad += 1
            continue
        dc, dcols, d_ctypes = canon(d_rows, d_cols, d_types)
        sc, scols, s_ctypes = canon(s_rows, s_cols, s_types)
        if dcols == scols:
            for i in range(len(dcols)):
                audit.append((name, dcols[i], s_ctypes[i], d_ctypes[i]))
        else:
            # column sets disagree: positional pairing would attribute
            # one side's type to the other side's column — fall back to
            # name-keyed rows so '<missing>' names the absent column
            # (duplicate names collapse here, but this branch is already
            # a reported column-mismatch failure)
            d_tmap = dict(zip(dcols, d_ctypes))
            s_tmap = dict(zip(scols, s_ctypes))
            for c in sorted(set(dcols) | set(scols)):
                audit.append((name, c, s_tmap.get(c, "<missing>"),
                              d_tmap.get(c, "<missing>")))
        type_bad = ([(dcols[i], s_ctypes[i], d_ctypes[i])
                     for i in range(len(dcols))
                     if s_ctypes[i] != d_ctypes[i]]
                    if dcols == scols else [])
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
    if types_out:
        n_mismatch = sum(1 for _, _, s, d in audit if s != d)
        with open(types_out, "w") as f:
            f.write("# Oracle output-type audit (generated by "
                    "scripts/check_oracle.py --types)\n"
                    "# Arrow type of every column on both sides of every "
                    "oracle compare;\n"
                    "# the driver's hash is type-sensitive, so every row "
                    "must read MATCH.\n"
                    f"# columns: {len(audit)}, mismatches: {n_mismatch}\n\n")
            f.write(f"{'query':32s} {'column':24s} {'spark':20s} "
                    f"{'duckdb':20s} verdict\n")
            for name, c, s, d in audit:
                verdict = "MATCH" if s == d else "MISMATCH"
                f.write(f"{name:32s} {c:24s} {s:20s} {d:20s} {verdict}\n")
        print(f"type audit -> {types_out} "
              f"({len(audit)} columns, {n_mismatch} mismatches)")
    return 1 if (n_bad or n_err) else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    flags = [a for a in sys.argv[1:] if a.startswith("--")]
    types_out = None
    for fl in flags:
        if fl.startswith("--types="):
            types_out = fl.split("=", 1)[1]
        elif fl == "--types":
            types_out = "scripts/oracle_types_audit.txt"
    sys.exit(main(args[0], args[1],
                  args[2] if len(args) > 2 else None, types_out))
