#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check_correctness.py <verify_out_dir> [sf_dir]

Reads each <name>/ parquet result produced by `graft.Verify`, runs the
corresponding oracle SQL from oracle_sql.json in DuckDB against the raw
parquet tables in sf_dir, and compares values (columns sorted by name,
rows sorted, NaN-safe). Mirrors what the driver does so oracle-SQL bugs
surface before the round gate.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def table(rows, cols):
    # sort columns by name, then rows lexicographically
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = Path(sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01")

    con = duckdb.connect()
    for t in TABLES:
        p = sf_dir / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    results = {}
    n_pass = n_fail = n_rows_only = 0
    for d in sorted(out_dir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        try:
            got = con.execute(f"SELECT * FROM read_parquet('{d}/*.parquet')").fetchall()
            got_cols = [c[0] for c in con.execute(
                f"SELECT * FROM read_parquet('{d}/*.parquet') LIMIT 0").description]
        except Exception as e:
            print(f"FAIL  {name}: cannot read result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS" if len(got) > 0 else "ROWS(empty!)"
            print(f"{status:5} {name}: rows={len(got)} (no oracle)")
            n_rows_only += 1
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [c[0] for c in con.execute(
                f"SELECT * FROM ({oracle[name]}) LIMIT 0").description]
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        gc, gr = table(got, got_cols)
        ec, er = table(exp, exp_cols)
        if gc != ec:
            print(f"FAIL  {name}: schema mismatch spark={gc} duckdb={ec}")
            n_fail += 1
        elif gr != er:
            diff = [i for i, (a, b) in enumerate(zip(gr, er)) if a != b][:3]
            print(f"FAIL  {name}: {len(gr)} vs {len(er)} rows; first diffs:")
            for i in diff:
                print(f"      spark : {gr[i]}")
                print(f"      duckdb: {er[i]}")
            if len(gr) != len(er):
                only_g = set(gr) - set(er)
                only_e = set(er) - set(gr)
                for r in list(only_g)[:2]:
                    print(f"      only-spark : {r}")
                for r in list(only_e)[:2]:
                    print(f"      only-duckdb: {r}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(gr)} rows")
            n_pass += 1

    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
