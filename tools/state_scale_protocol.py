"""state_scale_bench at protocol rigor (VERDICT r3 #1 done-criterion).

Runs tools/state_scale_bench.py — ONE big-wave superstep against K_SEEN
accumulated bucketed seen rows — at local[2] and local[8], `reps` times
each (alternating order), a fixed-work CPU control before every rep, and
prints per-phase minima + scaling efficiency raw and vs the control
ceiling. The phases that prove the bucketed-state design are
"wave select" (pending compose: frontier_add ∖ seen_index, both bucketed)
and "rank new frontier" (the seen anti-join) — the two per-superstep scans
of the accumulated state.

Usage: python tools/state_scale_protocol.py [reps=3] > out.jsonl
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling_run import cpu_control  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_ENV = {
    "SPARK_GRAFT_K_SEEN": os.environ.get("SPARK_GRAFT_K_SEEN", "10000000"),
    "SPARK_GRAFT_WAVE": os.environ.get("SPARK_GRAFT_WAVE", "800000"),
    "SPARK_GRAFT_CORPUS_DIR": "/tmp/bench_corpus",
}


def run_once(cpus: int) -> dict:
    env = dict(os.environ)
    env.update(BASE_ENV)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    p = subprocess.run(
        [sys.executable, "tools/state_scale_bench.py"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    lines = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(f"state bench failed (cpus={cpus}): {p.stderr[-2000:]}")
    return json.loads(lines[-1])


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if reps < 3:
        raise SystemExit("protocol requires reps >= 3")
    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    run_once(8)  # warm-up + corpus generation, discarded
    controls: list[dict] = []
    results: dict[int, list[dict]] = {2: [], 8: []}
    for r in range(reps):
        for cpus in ((2, 8) if r % 2 == 0 else (8, 2)):
            time.sleep(10)
            ctrl = cpu_control()
            controls.append(ctrl)
            res = run_once(cpus)
            results[cpus].append(res)
            print(
                json.dumps(
                    {"rep": r, "cpus": cpus, "control": ctrl, "git_sha": sha, **res}
                ),
                flush=True,
            )

    ratios = sorted(c[8] / c[2] for c in controls)
    slow = ratios[len(ratios) // 2]
    ceiling = 4.0 / slow

    def phase_min(cpus: int, phase: str) -> float:
        return min(x["phases"].get(phase, float("inf")) for x in results[cpus])

    phases = sorted(
        {p for rs in results.values() for x in rs for p in x["phases"]}
    )
    summary: dict = {
        "summary": True,
        "git_sha": sha,
        "k_seen": int(BASE_ENV["SPARK_GRAFT_K_SEEN"]),
        "wave": int(BASE_ENV["SPARK_GRAFT_WAVE"]),
        "reps": reps,
        "control_speedup_ceiling": round(ceiling, 2),
        "total_s": {
            "local2": min(x["total_s"] for x in results[2]),
            "local8": min(x["total_s"] for x in results[8]),
        },
        "phases": {},
    }
    t2, t8 = summary["total_s"]["local2"], summary["total_s"]["local8"]
    summary["speedup_2_to_8"] = round(t2 / t8, 2)
    summary["efficiency_raw"] = round(t2 / t8 / 4, 3)
    summary["efficiency_vs_control"] = round(t2 / t8 / ceiling, 3)
    for p in phases:
        p2, p8 = phase_min(2, p), phase_min(8, p)
        summary["phases"][p] = {
            "local2_s": p2,
            "local8_s": p8,
            "speedup": round(p2 / p8, 2) if p8 else None,
            "eff_vs_control": round(p2 / p8 / ceiling, 3) if p8 else None,
        }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
