#!/usr/bin/env python3
"""Build a local sf1-scale dataset by replicating sf0.1 10x with
join-consistent key shifts (VERDICT r2 next-round item 7: demonstrate the
Spark-vs-DuckDB crossover instead of extrapolating it).

Usage: python3 tools/make_sf1.py [out_dir] [replicas]
(default /root/repo/bench/sf1, 10 — replicas=100 builds the sf10 spot-bench
set, same construction one decade further)

Each replica i shifts every key family by i*stride where stride > max(key),
so foreign keys stay consistent (orders.o_custkey -> customer.c_custkey,
lineitem.l_orderkey -> orders.o_orderkey, ...) and join fan-outs per key are
UNCHANGED — the workload is the same shape, just 10x the rows. Dimension
tables (region/nation) and tables unused by the sf1 query subset
(events/documents/embeddings) are copied verbatim.
"""
import shutil, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/bench/sf1"
REPLICAS = int(sys.argv[2]) if len(sys.argv) > 2 else 10

con = duckdb.connect()

def stride(table, key):
    return con.sql(f"SELECT max({key})+1 FROM '{SRC}/{table}.parquet'").fetchone()[0]

ck = stride("customer", "c_custkey")
ok = stride("orders", "o_orderkey")
pk = stride("part", "p_partkey")
sk = stride("supplier", "s_suppkey")

# (table, [(col, stride)]) — every other column passes through unchanged
SHIFTS = {
    "customer": [("c_custkey", ck)],
    "part": [("p_partkey", pk)],
    "supplier": [("s_suppkey", sk)],
    "orders": [("o_orderkey", ok), ("o_custkey", ck)],
    "lineitem": [("l_orderkey", ok), ("l_partkey", pk), ("l_suppkey", sk)],
}

import os
os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation"]:
    shutil.copy(f"{SRC}/{t}.parquet", f"{OUT}/{t}.parquet")

# events: 10x with (event_id, user_id) shifts — per-user event counts and
# the hourly time profile are unchanged, so sessionize/funnel/range-join
# workloads keep their shape at 10x the rows.
ek = stride("events", "event_id")
uk = stride("events", "user_id")
con.sql(f"""
    COPY (SELECT event_id + i*{ek} AS event_id, ts,
                 user_id + i*{uk} AS user_id, event_type, value, props
          FROM '{SRC}/events.parquet', range({REPLICAS}) AS r(i))
    TO '{OUT}/events.parquet' (FORMAT PARQUET)
""")

# embeddings: 10x with vec_id shift and a per-replica CYCLIC ROTATION of
# the vector (unit norm preserved, deterministic) — replicas are genuinely
# different vectors, so similarity workloads don't degenerate into
# identical-vector 10-cliques.
vk = stride("embeddings", "vec_id")
con.sql(f"""
    COPY (SELECT vec_id + i*{vk} AS vec_id,
                 CASE WHEN i = 0 THEN embedding
                      ELSE list_concat(embedding[i+1:], embedding[1:i]) END
                   AS embedding,
                 label
          FROM '{SRC}/embeddings.parquet', range({REPLICAS}) AS r(i))
    TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)
""")

# documents: 10x with doc_id shift AND a per-replica word suffix, so docs
# are near-dups only WITHIN their replica (suffixing every word disjoints
# the shingle sets across replicas) — the dedup/similarity workload keeps
# the sf0.1 shape at 10x the rows instead of degenerating into 10-cliques.
dk = stride("documents", "doc_id")
con.sql(f"""
    COPY (
      WITH rep AS (
        SELECT doc_id + i*{dk} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE regexp_replace(text, '(\\S+)', '\\1x' || i, 'g') END AS text,
               lang, source
        FROM '{SRC}/documents.parquet', range({REPLICAS}) AS r(i))
      -- n_chars recomputed from the rewritten text (suffixing grows it),
      -- so n_chars-derived aggregates (q92/q96/q103) reflect the actual text
      SELECT doc_id, text, lang, source, CAST(length(text) AS BIGINT) AS n_chars
      FROM rep)
    TO '{OUT}/documents.parquet' (FORMAT PARQUET)
""")
print("documents:", con.sql(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()[0], "rows")

for t, shifts in SHIFTS.items():
    cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]
    shifted = dict(shifts)
    sel = ", ".join(
        f"{c} + i*{shifted[c]} AS {c}" if c in shifted else c for c in cols)
    con.sql(f"""
        COPY (SELECT {sel}
              FROM '{SRC}/{t}.parquet', range({REPLICAS}) AS r(i))
        TO '{OUT}/{t}.parquet' (FORMAT PARQUET)
    """)
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
print(f"{REPLICAS}x {SRC} written to {OUT}")
