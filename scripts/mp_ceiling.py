"""Raw-multiprocessing ceiling probe for the flagship scorer kernel.

Measures the TurnScorer kernel's aggregate rows/s at two process counts
(default 8 and 32) with NO Ray, NO IO — pre-generated Arrow batches are
inherited copy-on-write via fork, each worker is pinned to its own CPU.
The resulting efficiency `(r_hi / r_lo) / (hi / lo)` is the hardware
ceiling any pipeline built on this kernel can reach on this VM (both
legs share one memory bus; a real multi-node cluster does not), and the
number `bench.py --scaling` should be compared against.

Usage: python scripts/mp_ceiling.py [--rows 100000] [--secs 6] [--legs 8,32]
"""

from __future__ import annotations

import argparse
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_TABLE = None  # set in parent before fork; children read COW pages


def _worker(cpu: int, secs: float, out):
    os.sched_setaffinity(0, {cpu})
    from cleanlab_ray.stages.turn_scorer import TurnScorer

    scorer = TurnScorer()
    batch = _TABLE
    scorer(batch.slice(0, 1024))  # warm: build tables, JIT caches
    rows = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < secs:
        scorer(batch)
        rows += batch.num_rows
    dt = time.perf_counter() - t0
    out.put(rows / dt)


def _leg(nproc: int, secs: float) -> float:
    out = mp.Queue()
    procs = [
        mp.Process(target=_worker, args=(cpu, secs, out)) for cpu in range(nproc)
    ]
    for p in procs:
        p.start()
    rates = [out.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def main() -> None:
    global _TABLE
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8192 * 8)
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--legs", default="8,32")
    args = ap.parse_args()
    legs = [int(x) for x in args.legs.split(",")]

    import pyarrow as pa

    from cleanlab_ray.fixtures.transcripts import generate_transcripts

    t = generate_transcripts(n_convs=max(1000, args.rows // 13), seed=7)
    if not isinstance(t, pa.Table):
        t = pa.Table.from_pandas(t)
    _TABLE = t.slice(0, args.rows).combine_chunks()

    results = {}
    for n in legs:
        results[n] = _leg(n, args.secs)
        print(f"{n:3d} procs: {results[n]/1e3:9.1f}k rows/s "
              f"({results[n]/n/1e3:6.1f}k/proc)", flush=True)
    lo, hi = min(legs), max(legs)
    eff = (results[hi] / results[lo]) / (hi / lo)
    print(f"ceiling efficiency {lo}->{hi}: {eff:.3f}")


if __name__ == "__main__":
    main()
