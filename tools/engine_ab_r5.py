"""Same-day A/B: HEAD vs round-4-close (a7419cc) at the scaling-protocol
shape — the round-4 methodology for separating host drift from engine
regression (BENCH/BASELINE.md "root cause of the round-3 ratio drop").

The freshly-recorded scaling_runs_r5.jsonl legs read 30-60% slower than
round-4-close at local[8] while local[2] moved ~10%: either a serial-time
regression (Amdahl would hit the fast leg harder) or a contended host
window. Interleaving the two engines rep-by-rep in the SAME session
window answers it: a regression reproduces under identical noise; drift
doesn't.

Usage: python tools/engine_ab_r5.py [reps=2] > BENCH/engine_ab_r5.jsonl
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
from scaling_run import BASE_ENV, cpu_control  # noqa: E402

TREES = {"head": "/root/repo", "r4close": "/tmp/r4close"}


def run_bench(tree: str, cpus: int, seed_all: bool) -> dict:
    env = dict(os.environ)
    env.update(BASE_ENV)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env.pop("SPARK_GRAFT_SEED_ALL", None)
    if seed_all:
        env["SPARK_GRAFT_SEED_ALL"] = "1"
    p = subprocess.run(
        [sys.executable, "bench.py"], capture_output=True, text=True,
        env=env, cwd=TREES[tree], timeout=1800,
    )
    last = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"bench failed ({tree},{cpus}): {p.stderr[-1500:]}")
    return json.loads(last[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    run_bench("head", 8, False)  # warm-up + shared corpus gen, discarded
    legs = [
        ("steadystate", 8), ("steadystate", 2),
        ("multiwave", 8), ("multiwave", 2),
    ]
    best: dict = {}
    for r in range(reps):
        for mode, cpus in legs:
            for tree in (("head", "r4close") if r % 2 == 0
                         else ("r4close", "head")):
                time.sleep(10)
                ctrl = cpu_control()
                res = run_bench(tree, cpus, mode == "steadystate")
                crawl = res["queries"]["crawl_supersteps"]
                key = (tree, mode, cpus)
                best[key] = min(best.get(key, 1e9), crawl)
                print(json.dumps({
                    "rep": r, "tree": tree, "mode": mode, "cpus": cpus,
                    "control": ctrl, "crawl_s": crawl,
                    "urls_per_sec": res.get("urls_per_sec"),
                    "extract_s": res["queries"].get("extract_bulk"),
                    "host_probe_s": res.get("host_probe_s"),
                    "git_sha": res.get("git_sha"),
                }), flush=True)
    summary = {"summary": True, "best_crawl_s": {
        f"{t}/{m}@{c}": v for (t, m, c), v in sorted(best.items())
    }}
    for mode, cpus in legs:
        h = best.get(("head", mode, cpus))
        r4 = best.get(("r4close", mode, cpus))
        if h and r4:
            summary[f"head_vs_r4close_{mode}@{cpus}"] = round(h / r4, 3)
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
