#!/usr/bin/env python3
"""DuckDB side of a bench SUBSET (PERF.md sf1 slope tables): like
duckdb_bench.py but only the comma-separated qNN prefixes given as argv[3].

Usage:
  python3 tools/duckdb_bench_subset.py <sf_dir> <verify_out_dir> q100,q105
"""
import json, sys, time
import duckdb

sf_dir, out_dir, only = sys.argv[1], sys.argv[2], sys.argv[3]
prefixes = set(p.strip() for p in only.split(",") if p.strip())
con = duckdb.connect()
con.execute("PRAGMA threads=32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times = {}
for name in sorted(oracle):
    if name.split("_")[0] not in prefixes:
        continue
    try:
        con.sql(oracle[name]).fetchall()          # warm-up
        t0 = time.time()
        con.sql(oracle[name]).fetchall()
        times[name] = round(time.time() - t0, 4)
    except Exception as e:
        times[name] = None
        print(f"ERR {name}: {e}", file=sys.stderr)
total = round(sum(v for v in times.values() if v), 2)
print(json.dumps({"total_sec": total, "queries": times}))
