#!/usr/bin/env python3
"""Synthetic CPU contention for bench robustness A/Bs.

Spawns N busy processes (pure-python xorshift spin, no memory pressure)
for the given duration, emulating the oversubscribed-vCPU condition the
round-8 driver host showed (stragglers on wide exchanges). Used to
verify that the q132/q137 shape fixes hold when the host is loaded:

    python3 tools/cpu_burn.py <n_procs> <seconds> &
    SPARK_GRAFT_ONLY=q132,q137 ... graft.Bench

Processes are independent and self-terminate; no cleanup needed.
"""
import multiprocessing
import sys
import time


def burn(seconds: float) -> None:
    x = 88172645463325252
    end = time.time() + seconds
    while time.time() < end:
        # ~1e5 xorshift steps between clock checks
        for _ in range(100000):
            x ^= (x << 13) & 0xFFFFFFFFFFFFFFFF
            x ^= x >> 7
            x ^= (x << 17) & 0xFFFFFFFFFFFFFFFF


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    procs = [multiprocessing.Process(target=burn, args=(secs,)) for _ in range(n)]
    for p in procs:
        p.start()
    for p in procs:
        p.join()
