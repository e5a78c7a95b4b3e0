"""BENCH/BASELINE.md scaling-evidence protocol (BASELINE.json north_rule):
run the IDENTICAL crawl job on the IDENTICAL input at two parallelism
levels (N and 4N cores), report throughput at both and efficiency
E = (R_4N / R_N) / 4.

This VM's 32 'CPUs' are overcommitted hardware threads — a pure-Python
multiprocessing control shows fixed per-process work slows ~2x going from
8 to 32 concurrent processes, so 8->32 cannot show 4x on ANY workload
here. The protocol therefore measures N=2 vs 4N=8 (the control shows that
range is linear) and records the control data. Runs alternate configs and
repeat; min wall time per config is reported (standard practice on noisy
shared hosts).

Usage: python tools/scaling_run.py [reps=2]
Writes results JSON lines to stdout; compose BENCH/BASELINE.md from them.
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


def cpu_control() -> dict:
    """Fixed per-process work at increasing process counts — measures the
    host's real parallel capacity independent of Spark."""
    out = {}
    for procs in (1, 2, 8, 32):
        t0 = time.time()
        with mp.Pool(procs) as p:
            p.map(_burn, [6_000_000] * procs)
        out[f"procs_{procs}"] = round(time.time() - t0, 2)
    return out


def run_bench(cpus: int, env_extra: dict) -> dict:
    env = dict(os.environ)
    env.update(
        {
            "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
            "SPARK_GRAFT_CPUS": str(cpus),
            "SPARK_GRAFT_CRAWL_ONLY": "1",
            **env_extra,
        }
    )
    p = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=1800,
    )
    last = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"bench failed (cpus={cpus}): {p.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    corpus_env = {
        "SPARK_GRAFT_CORPUS_DIR": "/tmp/bench_corpus",
        "SPARK_GRAFT_PAGES_PER_DOC": "80",   # 400k pages at sf0.1
        "SPARK_GRAFT_BODY_REPEAT": "25",     # ~12 KB pages (realistic)
        "SPARK_GRAFT_MAX_DOCS": "200000",
    }
    print(json.dumps({"cpu_control": (ctrl := cpu_control())}), flush=True)
    results: dict[int, list[dict]] = {2: [], 8: []}
    # warm-up / corpus generation run (discarded)
    run_bench(8, corpus_env)
    for r in range(reps):
        for cpus in (2, 8) if r % 2 == 0 else (8, 2):
            time.sleep(20)  # cooldown
            res = run_bench(cpus, corpus_env)
            results[cpus].append(res)
            print(json.dumps({"run": r, "cpus": cpus, **res}), flush=True)

    def best(c: int) -> dict:
        return min(results[c], key=lambda x: x["queries"]["crawl_supersteps"])

    b2, b8 = best(2), best(8)
    r2 = b2["crawl_urls"] / b2["queries"]["crawl_supersteps"]
    r8 = b8["crawl_urls"] / b8["queries"]["crawl_supersteps"]
    e2 = b2["links_extracted"] / b2["queries"]["extract_bulk"]
    e8 = b8["links_extracted"] / b8["queries"]["extract_bulk"]
    summary = {
        "summary": True,
        "crawl_urls_per_sec": {"local2": round(r2, 1), "local8": round(r8, 1)},
        "crawl_speedup_2_to_8": round(r8 / r2, 2),
        "crawl_efficiency": round(r8 / r2 / 4, 3),
        "extract_links_per_sec": {"local2": round(e2, 1), "local8": round(e8, 1)},
        "extract_speedup_2_to_8": round(e8 / e2, 2),
        "extract_efficiency": round(e8 / e2 / 4, 3),
        "cpu_control": ctrl,
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
