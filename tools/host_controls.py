"""Host-capacity controls for the scaling protocols.

A scaling ratio measured on an overcommitted VM is only interpretable
against the host's OWN capacity ratio at the two parallelism levels,
measured the same minute. Three probes, because this host exhibits three
different walls (measured 2026-08-18, BENCH/BASELINE.md "Host controls"):

  * alu   — pure-Python integer loop: scheduler/CPU-slot capacity. Scales
            near-ideal here (per-proc slowdown 1.0-1.5x at 16 procs).
  * bw    — pre-faulted steady-state memcpy (np.copyto between warm
            buffers): DRAM bandwidth. Scales near-flat here too.
  * alloc — FRESH-allocation memcpy (a.copy() on new pages every
            iteration): the kernel page-fault/zeroing path. This is the
            probe that matches a Spark data plane's profile — Arrow
            batches, Python workers, and JVM GC allocate fresh pages
            constantly — and the one that saturates on this VM
            (per-proc slowdown ~3.8x from 4 to 16 procs, i.e. a hard
            ~1.06x speedup ceiling for 4->16-core allocation-heavy work).

Protocols report efficiency vs the alu ceiling (continuity with rounds
2-4) AND vs the alloc ceiling (the binding one for this workload class).
"""

from __future__ import annotations

import multiprocessing as mp
import time

_MB64 = 64 * 1024 * 1024


def burn_alu(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def burn_alloc(n: int) -> float:
    import numpy as np

    a = np.ones(_MB64, dtype=np.uint8)
    t0 = time.time()
    x = 0
    for _ in range(n):
        b = a.copy()  # new 64 MB of fresh pages each iteration
        x ^= int(b[123])
    return time.time() - t0


def burn_bw(n: int) -> float:
    import numpy as np

    a = np.ones(_MB64, dtype=np.uint8)
    b = np.empty_like(a)
    np.copyto(b, a)  # fault once
    t0 = time.time()
    for _ in range(n):
        np.copyto(b, a)
    return time.time() - t0


_KINDS = {"alu": (burn_alu, 6_000_000), "alloc": (burn_alloc, 15), "bw": (burn_bw, 30)}


def control(kinds: tuple[str, ...], procs_levels: tuple[int, ...]) -> dict:
    """{kind: {procs: wall_seconds}} — fixed work PER process, so the wall
    time ratio between levels is the per-proc slowdown and
    ideal_speedup / slowdown is the capacity ceiling."""
    out: dict = {}
    for kind in kinds:
        fn, work = _KINDS[kind]
        out[kind] = {}
        for procs in procs_levels:
            t0 = time.time()
            with mp.Pool(procs) as p:
                p.map(fn, [work] * procs)
            out[kind][procs] = round(time.time() - t0, 3)
    return out


if __name__ == "__main__":
    import json
    import sys

    levels = tuple(int(x) for x in sys.argv[1:]) or (2, 8)
    for rep in range(3):
        print(json.dumps({"rep": rep, **control(("alu", "alloc", "bw"), levels)}))
