"""Summarize the steady-state wave-size amortization runs (BENCH/BASELINE.md):
parse bench JSON lines from the XL logs, group by (wave_size, cpus), take
per-group minima, and print the efficiency trend table.

Usage: python tools/xl_summary.py /tmp/scaling_xl.log /tmp/scaling_xl2.log ...
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    runs: dict[tuple[int, int], list[float]] = {}
    for path in sys.argv[1:]:
        for ln in open(path):
            ln = ln.strip()
            if not ln.startswith('{"metric"'):
                continue
            d = json.loads(ln)
            key = (d["crawl_urls"], d["cpus"])
            runs.setdefault(key, []).append(d["queries"]["crawl_supersteps"])
    waves = sorted({k[0] for k in runs})
    print(f"{'wave':>8} {'T2 (s)':>8} {'T8 (s)':>8} {'speedup':>8} "
          f"{'eff raw':>8} {'urls/s@8':>9}")
    for w in waves:
        t2 = min(runs.get((w, 2), [float('nan')]))
        t8 = min(runs.get((w, 8), [float('nan')]))
        sp = t2 / t8
        print(f"{w:>8} {t2:>8.1f} {t8:>8.1f} {sp:>8.2f} {sp/4:>8.3f} "
              f"{w/t8:>9.0f}")


if __name__ == "__main__":
    main()
