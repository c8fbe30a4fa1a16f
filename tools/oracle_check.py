#!/usr/bin/env python3
"""Local proxy for the driver's DuckDB correctness gate.

Usage: python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/verify_out

For each <name> dir under out_dir, reads the Spark parquet result, runs
oracle_sql.json[<name>] in DuckDB against the sf tables, sorts columns by
name and rows by all columns, and compares row count, column names, and
values (floats to 1e-9 relative).
"""
import json, math, sys
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(rel):
    cols = sorted(rel.columns)
    df = rel.df()[cols]
    rows = df.values.tolist()
    rows.sort(key=lambda r: [(x is None or (isinstance(x, float) and math.isnan(x)), str(x)) for x in r])
    return cols, rows

def eq(a, b):
    if a is None and b is None: return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b): return True
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return str(a) == str(b)

npass = nfail = 0
for name in sorted(oracle):
    try:
        s_cols, s_rows = canon(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        o_cols, o_rows = canon(con.sql(oracle[name]))
        if s_cols != o_cols:
            print(f"FAIL {name}: cols spark={s_cols} oracle={o_cols}"); nfail += 1; continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}"); nfail += 1; continue
        bad = next((i for i, (a, b) in enumerate(zip(s_rows, o_rows))
                    if not all(eq(x, y) for x, y in zip(a, b))), None)
        if bad is not None:
            print(f"FAIL {name}: row {bad}\n  spark : {s_rows[bad]}\n  oracle: {o_rows[bad]}"); nfail += 1; continue
        print(f"pass {name} ({len(s_rows)} rows)"); npass += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); nfail += 1
print(f"== {npass} pass / {nfail} fail ==")
sys.exit(1 if nfail else 0)
