#!/usr/bin/env python3
"""DuckDB side of the sf1 side-by-side (VERDICT r7 next-2), with a
per-query watchdog: the sf0.1 run already showed DuckDB's recursive-CTE
graph queries (q34 155.8 s, q88 18.1 s) dominating its total, and at sf1
those can run to hours. A query that exceeds the timeout is interrupted
via con.interrupt() and recorded as {"timeout": T} — an honest "did not
finish in T s" datapoint rather than an unbounded run or a silent skip.

Usage: python3 tools/duckdb_bench_timeout.py SF_DIR ORACLE_DIR [TIMEOUT_S]
  SF_DIR     parquet table dir (e.g. /root/repo/bench/sf1)
  ORACLE_DIR dir containing oracle_sql.json (a Verify dump)
  TIMEOUT_S  per-query wall budget, default 600

Writes {"total_sec": .., "timeouts": [..], "queries": {name: sec|null}}
to stdout; timed-out queries contribute TIMEOUT_S to total_sec (a lower
bound on the true total) and are listed in "timeouts".
"""
import json, sys, threading, time
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
timeout_s = float(sys.argv[3]) if len(sys.argv) > 3 else 600.0

con = duckdb.connect()
con.execute("PRAGMA threads=32")
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
times, timeouts = {}, []


def run_guarded(sql):
    """One execution with a watchdog; returns (seconds, timed_out)."""
    fired = threading.Event()

    def kill():
        fired.set()
        con.interrupt()

    timer = threading.Timer(timeout_s, kill)
    timer.start()
    t0 = time.time()
    try:
        con.sql(sql).fetchall()
        return time.time() - t0, False
    except duckdb.InterruptException:
        return time.time() - t0, True
    except Exception:
        if fired.is_set():  # interrupt surfaces as various error types
            return time.time() - t0, True
        raise
    finally:
        timer.cancel()


for name in sorted(oracle):
    try:
        _, warm_to = run_guarded(oracle[name])   # warm-up
        if warm_to:
            times[name] = round(timeout_s, 4)
            timeouts.append(name)
            print(f"TIMEOUT {name} (warm-up > {timeout_s}s)", file=sys.stderr)
            continue
        dt, to = run_guarded(oracle[name])        # timed
        if to:
            times[name] = round(timeout_s, 4)
            timeouts.append(name)
            print(f"TIMEOUT {name} (> {timeout_s}s)", file=sys.stderr)
        else:
            times[name] = round(dt, 4)
    except Exception as e:
        times[name] = None
        print(f"ERR {name}: {e}", file=sys.stderr)

total = round(sum(v for v in times.values() if v), 2)
print(json.dumps({"total_sec": total, "timeout_s": timeout_s,
                  "timeouts": timeouts, "queries": times}))
