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


def run_guarded(sql, _retried=False):
    """One execution with a watchdog; returns (seconds, timed_out).

    Race guards (ADVICE r8): kill() only interrupts while the query is
    still RUNNING — firing after completion would leave DuckDB's interrupt
    flag set and cancel the NEXT query. The window between completion and
    the running-flag clear can't be fully closed from Python (no
    clear-interrupt API), so classification is also elapsed-checked: an
    interrupt/exception before ~timeout_s elapsed is a stale flag (retried
    once) or a real error (re-raised), never recorded as a timeout.
    """
    fired = threading.Event()
    running = threading.Event()
    lock = threading.Lock()

    def kill():
        with lock:
            if running.is_set():
                fired.set()
                con.interrupt()

    timer = threading.Timer(timeout_s, kill)
    t0 = time.time()
    running.set()
    timer.start()
    try:
        con.sql(sql).fetchall()
        return time.time() - t0, False
    except duckdb.InterruptException:
        if time.time() - t0 >= timeout_s * 0.99:
            return time.time() - t0, True
        if _retried:
            raise
        # stale interrupt flag from the PREVIOUS query: cancel THIS
        # call's timer before recursing — the retry must run under its
        # own fresh watchdog, not racing two armed timers (the outer one
        # would fire early at timeout_s minus the stale-flag epsilon)
        timer.cancel()
        return run_guarded(sql, _retried=True)
    except Exception:
        # interrupt surfaces as various error types; only classify as a
        # timeout when the watchdog fired AND the elapsed time corroborates
        if fired.is_set() and time.time() - t0 >= timeout_s * 0.99:
            return time.time() - t0, True
        raise
    finally:
        with lock:
            running.clear()
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
