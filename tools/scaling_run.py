"""BENCH/BASELINE.md scaling-evidence protocol (BASELINE.json north_rule):
run the IDENTICAL crawl job on the IDENTICAL input at two parallelism
levels (N and 4N cores), report throughput at both and efficiency
E = (R_4N / R_N) / 4.

Host reality this protocol controls for:
  * the VM's 32 "CPUs" are overcommitted hardware threads — a pure-Python
    fixed-work control (run before every rep) measures the machine's REAL
    parallel capacity at each moment; efficiency is reported both raw and
    normalized by the control's own 2→8 speedup ceiling;
  * wall times vary ±30% run-to-run — configs alternate, each runs `reps`
    times, and per-metric minima are compared (standard noisy-host
    practice).

Two workload shapes:
  * multiwave — 10k seeds, ~5 supersteps: includes the per-superstep driver
    barrier cost (honest small-crawl shape);
  * steadystate — the whole target seeded at once, one giant wave: the
    regime a 10^10-URL frontier actually runs in, where waves are 10^6-10^8
    rows and barrier cost is noise.

Usage: python tools/scaling_run.py [reps=3] [N=2] > out.jsonl
(N is the lower parallelism level; the upper is 4N — e.g. N=2 runs
local[2] vs local[8], N=8 runs local[8] vs local[32].)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import subprocess
import sys
import time


def _burn(n: int) -> int:
    x = 0
    for i in range(n):
        x += i * i
    return x


def cpu_control(levels: tuple[int, int] = (2, 8)) -> dict:
    out = {}
    for procs in levels:
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_burn, [6_000_000] * procs)
        out[procs] = round(time.time() - t0, 3)
    return out


BASE_ENV = {
    "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
    "SPARK_GRAFT_CRAWL_ONLY": "1",
    "SPARK_GRAFT_CORPUS_DIR": "/tmp/bench_corpus",
    "SPARK_GRAFT_PAGES_PER_DOC": "80",   # 400k pages at sf0.1
    "SPARK_GRAFT_BODY_REPEAT": "25",     # ~12 KB pages (realistic)
    "SPARK_GRAFT_MAX_DOCS": "200000",
}


def run_bench(cpus: int, seed_all: bool) -> dict:
    env = dict(os.environ)
    env.update(BASE_ENV)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    if seed_all:
        env["SPARK_GRAFT_SEED_ALL"] = "1"
    p = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=1800,
    )
    last = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"bench failed (cpus={cpus}): {p.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    n_hi = 4 * n_lo
    lvl = (n_lo, n_hi)
    if reps < 3:
        # the protocol is min-over-3 on a ±40% host; a 1-2 rep "summary"
        # is exactly the round-3 mistake — refuse to produce one
        raise SystemExit(
            "scaling_run: protocol requires reps >= 3 (got "
            f"{reps}); run fewer reps only via run_bench() directly"
        )
    controls: list[dict] = []
    results: dict[tuple[str, int], list[dict]] = {}
    run_bench(n_hi, False)  # warm-up + corpus generation, discarded

    order = [("multiwave", n_lo), ("multiwave", n_hi),
             ("steadystate", n_lo), ("steadystate", n_hi)]
    for r in range(reps):
        for mode, cpus in (order if r % 2 == 0 else order[::-1]):
            time.sleep(15)
            ctrl = cpu_control(lvl)
            controls.append(ctrl)
            res = run_bench(cpus, mode == "steadystate")
            results.setdefault((mode, cpus), []).append(res)
            print(
                json.dumps({"rep": r, "mode": mode, "cpus": cpus, "control": ctrl, **res}),
                flush=True,
            )

    def best_crawl(mode: str, cpus: int) -> float:
        return min(x["queries"]["crawl_supersteps"] for x in results[(mode, cpus)])

    def best_extract(cpus: int) -> float:
        return min(
            x["queries"]["extract_bulk"]
            for k, v in results.items() if k[1] == cpus for x in v
        )

    urls = results[("multiwave", n_hi)][0]["crawl_urls"]
    n_links = results[("multiwave", n_hi)][0]["links_extracted"]
    # control ceiling: ideal 4x scaled by the control's observed per-proc
    # slowdown at 8 vs 2 procs (median across all control samples)
    ratios = sorted(c[n_hi] / c[n_lo] for c in controls)
    slow = ratios[len(ratios) // 2]
    ceiling = 4.0 / slow

    summary: dict = {"summary": True, "levels": list(lvl),
                     "corpus_pages": results[("multiwave", n_hi)][0]["corpus_pages"],
                     "crawl_urls": urls,
                     f"control_per_proc_slowdown_{n_hi}v{n_lo}": round(slow, 3),
                     "control_speedup_ceiling": round(ceiling, 2), "modes": {}}
    klo, khi = f"local{n_lo}", f"local{n_hi}"
    for mode in ("multiwave", "steadystate"):
        t2, t8 = best_crawl(mode, n_lo), best_crawl(mode, n_hi)
        sp = t2 / t8
        summary["modes"][mode] = {
            "crawl_s": {klo: t2, khi: t8},
            "urls_per_sec": {klo: round(urls / t2, 1), khi: round(urls / t8, 1)},
            f"speedup_{n_lo}_to_{n_hi}": round(sp, 2),
            "efficiency_raw": round(sp / 4, 3),
            "efficiency_vs_control": round(sp / ceiling, 3),
        }
    e2, e8 = best_extract(n_lo), best_extract(n_hi)
    sp = e2 / e8
    summary["extract_bulk"] = {
        "links_per_sec": {klo: round(n_links / e2, 1), khi: round(n_links / e8, 1)},
        f"speedup_{n_lo}_to_{n_hi}": round(sp, 2),
        "efficiency_raw": round(sp / 4, 3),
        "efficiency_vs_control": round(sp / ceiling, 3),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
