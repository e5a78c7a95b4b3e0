"""Multi-executor scaling evidence via spark-submit --py-files (north rule).

BASELINE.json's north_rule asks for the pipeline "run via spark-submit
--py-files on a multi-executor cluster at two cluster sizes (N and 4N
executors) with throughput scaling efficiency >=0.8 between them". The
sandbox has no real cluster, but Spark's ``local-cluster[n,cores,memMB]``
master is the next-best thing and is NOT a thread-pool simulation: it
spawns *n separate executor JVMs* wired to the driver over the standard
RPC/block-manager stack, so task dispatch, Arrow batch transfer to Python
workers, and every shuffle cross executor-process boundaries exactly as on
a multi-host cluster (minus the NIC). This runner therefore exercises the
real deliverable code path end-to-end:

  spark-submit --py-files jcrawler_spark.zip \
      --master local-cluster[N,2,mem] bench.py   (crawl-only mode)

at N=2 and 4N=8 executors (ONE core each -> 2 vs 8 task slots). The span
is deliberately the local[N] protocol's 2-vs-8-core span: a first run at
2-core executors (4 vs 16 slots, BENCH/cluster_runs_r4_16core.jsonl)
measured flat scaling and root-caused it to the HOST, not the engine or
the cluster stack — this VM's kernel page-fault/allocation path saturates
between 8 and 16 concurrent faulting processes (tools/host_controls.py
'alloc' probe: 5-11x per-proc slowdown at 16 procs while the ALU and
pre-faulted-bandwidth probes stay flat; same-day single-JVM local[16] was
SLOWER than local[4] on the identical workload, and 8 executor JVMs beat
the same-core single JVM — full numbers in BENCH/BASELINE.md). Protocol
mirrors tools/scaling_run.py: reps alternate order, and BOTH an ALU and
an allocation-path control run before every rep; the summary reports
efficiency raw, vs the ALU ceiling (continuity with rounds 2-4), and vs
the alloc ceiling (the binding one for an allocation-heavy data plane).

Outputs one JSON line per rep plus a summary line; redirect to
BENCH/cluster_runs_r4.jsonl.

Usage: python tools/cluster_scaling_run.py [reps=3] > out.jsonl
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")

# identical workload to tools/scaling_run.py (400k-page bucketed corpus,
# ~12 KB bodies, 200k-URL crawl target) so cluster numbers are comparable
# with the local[N] protocol rows in BENCH/BASELINE.md
BASE_ENV = {
    "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
    "SPARK_GRAFT_CRAWL_ONLY": "1",
    "SPARK_GRAFT_CORPUS_DIR": "/tmp/bench_corpus",
    "SPARK_GRAFT_PAGES_PER_DOC": "80",
    "SPARK_GRAFT_BODY_REPEAT": "25",
    "SPARK_GRAFT_MAX_DOCS": "200000",
}

EXEC_CORES = 1
# sized so the ~5 GB cached corpus fits in storage memory even at the
# 2-executor level — otherwise eviction penalizes N and flatters the
# N->4N speedup (8 x 10 GiB + 16 GiB driver stays inside the 128 GiB VM)
EXEC_MEM_MB = 10240


def make_pyfiles_zip(dest: str) -> str:
    """Package jcrawler_spark for --py-files, as a production deploy would."""
    pkg = os.path.join(REPO, "jcrawler_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, REPO))
    return dest


def cpu_control() -> dict:
    """ALU + allocation-path probes at the two TOTAL-core levels."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from host_controls import control

    levels = (2 * EXEC_CORES, 8 * EXEC_CORES)
    return control(("alu", "alloc"), levels)


def run_cluster_bench(n_exec: int, seed_all: bool, pyzip: str) -> dict:
    env = dict(os.environ)
    env.update(BASE_ENV)
    env["SPARK_GRAFT_MASTER"] = f"local-cluster[{n_exec},{EXEC_CORES},{EXEC_MEM_MB}]"
    env["SPARK_GRAFT_CPUS"] = str(n_exec * EXEC_CORES)  # fallback/label only
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    if seed_all:
        env["SPARK_GRAFT_SEED_ALL"] = "1"
    else:
        env.pop("SPARK_GRAFT_SEED_ALL", None)
    p = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", env["SPARK_GRAFT_MASTER"],
            "--driver-memory", "16g",
            "--py-files", pyzip,
            os.path.join(REPO, "bench.py"),
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
    )
    last = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not last:
        raise RuntimeError(
            f"cluster bench failed (n_exec={n_exec}): {p.stderr[-3000:]}"
        )
    rec = json.loads(last[-1])
    if rec.get("n_executors") != n_exec:
        raise RuntimeError(
            f"expected {n_exec} executors, bench saw {rec.get('n_executors')}"
        )
    return rec


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    if reps < 3:
        raise SystemExit(f"protocol requires reps >= 3 (got {reps})")
    pyzip = make_pyfiles_zip("/tmp/jcrawler_spark_pyfiles.zip")
    controls: list[dict] = []
    results: dict[tuple[str, int], list[dict]] = {}
    run_cluster_bench(8, False, pyzip)  # warm-up + corpus gen, discarded

    order = [
        ("multiwave", 2), ("multiwave", 8),
        ("steadystate", 2), ("steadystate", 8),
    ]
    for r in range(reps):
        for mode, n_exec in (order if r % 2 == 0 else order[::-1]):
            time.sleep(10)
            ctrl = cpu_control()
            controls.append(ctrl)
            res = run_cluster_bench(n_exec, mode == "steadystate", pyzip)
            results.setdefault((mode, n_exec), []).append(res)
            print(
                json.dumps(
                    {"rep": r, "mode": mode, "n_executors": n_exec,
                     "control": ctrl, **res}
                ),
                flush=True,
            )

    def best_crawl(mode: str, n_exec: int) -> float:
        return min(x["queries"]["crawl_supersteps"] for x in results[(mode, n_exec)])

    def best_extract(n_exec: int) -> float:
        return min(
            x["queries"]["extract_bulk"]
            for k, v in results.items() if k[1] == n_exec for x in v
        )

    urls = results[("multiwave", 8)][0]["crawl_urls"]
    n_links = results[("multiwave", 8)][0]["links_extracted"]
    lo, hi = 2 * EXEC_CORES, 8 * EXEC_CORES

    def ceiling_of(kind: str) -> float:
        ratios = sorted(c[kind][hi] / c[kind][lo] for c in controls)
        slow = ratios[len(ratios) // 2]
        return 4.0 / slow

    alu_ceiling = ceiling_of("alu")
    alloc_ceiling = ceiling_of("alloc")

    summary: dict = {
        "summary": True,
        "cluster": f"local-cluster[N,{EXEC_CORES},{EXEC_MEM_MB}] via "
                   "spark-submit --py-files",
        "executors": {"N": 2, "4N": 8},
        "corpus_pages": results[("multiwave", 8)][0]["corpus_pages"],
        "crawl_urls": urls,
        "alu_speedup_ceiling": round(alu_ceiling, 2),
        "alloc_speedup_ceiling": round(alloc_ceiling, 2),
        "modes": {},
    }

    def effs(sp: float) -> dict:
        return {
            "speedup_N_to_4N": round(sp, 2),
            "efficiency_raw": round(sp / 4, 3),
            "efficiency_vs_alu_control": round(sp / alu_ceiling, 3),
            "efficiency_vs_alloc_control": round(sp / alloc_ceiling, 3),
        }

    for mode in ("multiwave", "steadystate"):
        t2, t8 = best_crawl(mode, 2), best_crawl(mode, 8)
        summary["modes"][mode] = {
            "crawl_s": {"exec2": t2, "exec8": t8},
            "urls_per_sec": {"exec2": round(urls / t2, 1),
                             "exec8": round(urls / t8, 1)},
            **effs(t2 / t8),
        }
    e2, e8 = best_extract(2), best_extract(8)
    summary["extract_bulk"] = {
        "links_per_sec": {"exec2": round(n_links / e2, 1),
                          "exec8": round(n_links / e8, 1)},
        **effs(e2 / e8),
    }
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
