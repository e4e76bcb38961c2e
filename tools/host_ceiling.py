"""Host process-scaling ceiling: the same fixed CPU workload fanned over
P and 4P OS processes (no Spark, no JVM), interleaved — an upper bound on
what ANY in-sandbox engine can show for N->4N scaling on this host.
Usage: python tools/host_ceiling.py [P] [rounds] [items]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def burn(seed: int) -> float:
    # sort-heavy work: memory bandwidth + CPU, like shuffle/encode tasks
    a = np.random.RandomState(seed).rand(400_000)
    s = 0.0
    for _ in range(12):
        s += float(np.sort(a)[seed % 7])
        a = a * 1.0000001
    return s


def run(procs: int, items: int) -> float:
    t0 = time.time()
    with mp.Pool(procs) as pool:
        pool.map(burn, range(items))
    return time.time() - t0


def main():
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    items = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    run(4 * p, items // 4)  # warmup
    effs = []
    for i in range(rounds):
        t_lo = run(p, items)
        t_hi = run(4 * p, items)
        eff = (t_lo / t_hi) / 4
        effs.append(eff)
        print(json.dumps({"round": i + 1, "P_sec": round(t_lo, 2),
                          "4P_sec": round(t_hi, 2), "eff": round(eff, 3)}))
    effs.sort()
    print(json.dumps({"P": p, "median_eff": round(effs[len(effs) // 2], 3),
                      "best_eff": round(max(effs), 3)}))


if __name__ == "__main__":
    main()
