#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
Compares each <out>/<name>/*.parquet against oracle_sql.json run on the
sf tables (column-name-sorted, row-sorted value equality + dtype check).
"""
import duckdb, json, sys

out, sf = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        got, gd = got_rel.fetchall(), got_rel.description
        want_rel = con.sql(sql)
        want, wd = want_rel.fetchall(), want_rel.description
        gc, wc = [d[0] for d in gd], [d[0] for d in wd]
        gt = {d[0]: str(d[1]) for d in gd}
        wt = {d[0]: str(d[1]) for d in wd}
        go = sorted(range(len(gc)), key=lambda i: gc[i])
        wo = sorted(range(len(wc)), key=lambda i: wc[i])
        g = sorted(tuple(r[i] for i in go) for r in got)
        w = sorted(tuple(r[i] for i in wo) for r in want)
        ok = g == w and sorted(gc) == sorted(wc)
        types_ok = gt == wt
        tag = "MATCH" if ok else "MISMATCH"
        if ok and not types_ok:
            tag += f" (dtype diff: {dict((k,(gt[k],wt[k])) for k in gt if gt.get(k)!=wt.get(k))})"
        print(f"{name}: {tag} rows={len(g)}")
        if not ok:
            fails += 1
            print("  cols got :", sorted(gc), "\n  cols want:", sorted(wc))
            diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print("  first diffs:", diff if diff else (g[:2], w[:2]))
    except Exception as e:
        fails += 1
        print(f"{name}: ERROR {e}")
rowsonly = []  # queries without oracle entries
import os
for d in sorted(os.listdir(out)):
    if os.path.isdir(f"{out}/{d}") and d not in oracle:
        n = con.sql(f"SELECT count(*) FROM '{out}/{d}/*.parquet'").fetchone()[0]
        rowsonly.append(f"{d}(rows={n})")
if rowsonly:
    print("rows-only:", ", ".join(rowsonly))
sys.exit(1 if fails else 0)
