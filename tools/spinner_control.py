"""Pure-python spinner scaling control — ZERO Spark, ZERO shared state.

Calibrates how much of a local[N] vs local[4N] efficiency shortfall is the
sandbox VM itself (hypervisor throttling / effective-core ceiling) rather
than the engine: if independent processes doing register-only arithmetic
can't scale 4x, no Spark job on this box can either. Run per host — the
VM migrates between rounds and each silicon has a different ceiling
(results quoted in BENCH/BASELINE.md's extra-pair sections).

Usage: python tools/spinner_control.py [pairs, default "2,8 4,16 8,32"]
Prints one JSON line per pair.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time


def _spin(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def _throughput(procs: int, work: int = 30_000_000) -> float:
    t0 = time.perf_counter()
    with mp.Pool(procs) as p:
        p.map(_spin, [work] * procs)
    return procs * work / (time.perf_counter() - t0)


def main() -> int:
    pairs = [tuple(int(x) for x in a.split(","))
             for a in (sys.argv[1:] or ["2,8", "4,16", "8,32"])]
    for lo, hi in pairs:
        tl, th = _throughput(lo), _throughput(hi)
        print(json.dumps({
            "pair": [lo, hi],
            "ops_per_sec": {str(lo): round(tl), str(hi): round(th)},
            "spinner_efficiency": round((th / tl) / (hi / lo), 3),
        }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
