"""A/B the write-overlap change (stage_async: pages/seen_index staging
launched before the rank barrier vs the all-at-commit stage_all form).

Protocol: multiwave crawl bench (the barrier-heavy shape) at local[8],
`reps` per side, alternating A/B each rep, min-over-reps compared — the
same noisy-host discipline as tools/scaling_run.py. The A side opts in
via SPARK_GRAFT_OVERLAP=1 (the engine default is the blocking stage-all
path, per this tool's r4 measurement), so both sides run the SAME
working tree and commit.

Usage: python tools/overlap_ab.py [reps=3] > BENCH/overlap_ab_r4.jsonl
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

BASE_ENV = {
    "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
    "SPARK_GRAFT_CRAWL_ONLY": "1",
    "SPARK_GRAFT_CORPUS_DIR": "/tmp/bench_corpus",
    "SPARK_GRAFT_PAGES_PER_DOC": "80",
    "SPARK_GRAFT_BODY_REPEAT": "25",
    "SPARK_GRAFT_MAX_DOCS": "200000",
    "SPARK_GRAFT_CPUS": "8",
}


def run_bench(overlap: bool) -> dict:
    env = dict(os.environ)
    env.update(BASE_ENV)
    if overlap:
        env["SPARK_GRAFT_OVERLAP"] = "1"
    p = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, cwd="/root/repo",
        timeout=1800,
    )
    last = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(f"bench failed (overlap={overlap}): {p.stderr[-2000:]}")
    return json.loads(last[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    run_bench(True)  # warm-up + corpus gen, discarded
    results: dict[bool, list[float]] = {True: [], False: []}
    for r in range(reps):
        for overlap in ((True, False) if r % 2 == 0 else (False, True)):
            time.sleep(10)
            res = run_bench(overlap)
            t = res["queries"]["crawl_supersteps"]
            results[overlap].append(t)
            print(json.dumps({
                "rep": r, "overlap": overlap, "crawl_s": t,
                "crawl_urls": res.get("crawl_urls"), "sha": res.get("git_sha"),
            }), flush=True)
    a, b = min(results[True]), min(results[False])
    print(json.dumps({
        "summary": True, "reps": reps,
        "overlap_crawl_s_min": a, "no_overlap_crawl_s_min": b,
        "overlap_speedup": round(b / a, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
