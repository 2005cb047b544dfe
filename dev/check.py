#!/usr/bin/env python3
"""Dev-loop oracle check (mirrors the driver's DuckDB compare).

Usage: python3 dev/check.py <sfDir> <outDir> [query ...]
Run graft.Verify first to populate <outDir>. Compares each query's parquet
against the oracle SQL in oracle_sql.json: row count, column names
(sorted), and a value hash over rows sorted by all columns.
"""
import sys, json, glob, math

import duckdb


def canon(rows, cols):
    def cell(v):
        if v is None:
            return "\\N"
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return repr(round(v, 9))
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        if isinstance(v, list):
            return "[" + ",".join(cell(x) for x in v) + "]"
        return str(v)
    return sorted("|".join(cell(r[i]) for i in range(len(cols))) for r in rows)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO RESULT PARQUET")
            n_bad += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet('{files[0]}')").fetchall()
        gcols = [d[0] for d in con.description]
        want = con.execute(sql).fetchall()
        wcols = [d[0] for d in con.description]
        gidx = sorted(range(len(gcols)), key=lambda i: gcols[i])
        widx = sorted(range(len(wcols)), key=lambda i: wcols[i])
        g = canon([[r[i] for i in gidx] for r in got], sorted(gcols))
        w = canon([[r[i] for i in widx] for r in want], sorted(wcols))
        ok_rows = len(got) == len(want)
        ok_cols = sorted(gcols) == sorted(wcols)
        ok_hash = g == w
        if ok_rows and ok_cols and ok_hash:
            print(f"{name}: OK ({len(got)} rows)")
        else:
            n_bad += 1
            print(f"{name}: MISMATCH rows={ok_rows} ({len(got)} vs {len(want)}) "
                  f"cols={ok_cols} hash={ok_hash}")
            if not ok_cols:
                print(f"  spark cols: {sorted(gcols)}\n  oracle cols: {sorted(wcols)}")
            if ok_cols and not ok_hash:
                diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
                for a, b in diff:
                    print(f"  spark : {a[:200]}\n  oracle: {b[:200]}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
