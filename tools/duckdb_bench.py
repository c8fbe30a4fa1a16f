#!/usr/bin/env python3
"""Measure the DuckDB side of the BASELINE comparison (BASELINE.md §operative):
run every oracle SQL from a Verify dump against the same sf tables, one warm-up
plus one timed pass per query, 32 threads.

Usage: python3 tools/duckdb_bench.py /root/testdata/sf0.1 /tmp/verify_sf01
Writes per-query seconds JSON to stdout.
"""
import json, sys, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
con.execute("PRAGMA threads=32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times = {}
for name in sorted(oracle):
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
