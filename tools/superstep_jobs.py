"""Jobs-per-superstep probe — the driver-fixed-cost metric (VERDICT r4 #2).

Every Spark *job* a superstep schedules is a driver round-trip: job
submit, DAG build, task launch and the final result fetch are serial
driver work that does not shrink with executor count, so at small waves
jobs/superstep IS the scaling-efficiency ceiling of the multiwave shape.
This probe counts it directly: run the same small multiwave crawl twice
(2 and 7 supersteps, fresh state dirs, same session) and report the
marginal jobs per superstep — the subtraction cancels session/seed/
corpus one-time jobs exactly.

Job counts come from the Spark UI REST API (all scheduler jobs, every
driver thread — including the snapshot store's async staging pool,
which thread-local job groups would miss).

Env:
  SPARK_GRAFT_PYPATH  repo to import jcrawler_spark from (default
                      /root/repo) — point at a git worktree of an older
                      commit for a before/after A/B.
  SPARK_GRAFT_INLINE  "0" forces the sampled range rank
                      (rank_inline_max_wave=None) when the config knows
                      the field; default leaves the repo default.
  SPARK_GRAFT_CPUS    local[N] (default 8).

Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

PYPATH = os.environ.get("SPARK_GRAFT_PYPATH", "/root/repo")
sys.path.insert(0, PYPATH)
# python workers resolve the package via env, not driver sys.path —
# must be set before the JVM gateway launches
os.environ["PYTHONPATH"] = PYPATH + os.pathsep + os.environ.get("PYTHONPATH", "")

from pyspark.sql import SparkSession  # noqa: E402


def _rest(spark, leaf: str) -> int:
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app}/{leaf}"
    with urllib.request.urlopen(url) as r:
        return len(json.load(r))


def job_count(spark) -> int:
    """Scheduler jobs — includes AQE per-shuffle-stage materializations."""
    return _rest(spark, "jobs")


def action_count(spark) -> int:
    """SQL executions — one per driver-visible ACTION (AQE sub-jobs share
    their root execution), the count VERDICT r4 #2's criterion means."""
    return _rest(spark, "sql?offset=0&length=1000000")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    from jcrawler_spark.session import get_spark

    spark = get_spark(
        f"local[{cpus}]",
        app_name="superstep-jobs-probe",
        extra_conf={
            "spark.ui.enabled": "true",  # job counts come from the UI REST
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    from jcrawler_spark import corpus
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher

    n_pages, n_hosts, n_seeds = 20_000, 200, 500
    pages = corpus.build_pages_df(spark, n_pages, n_hosts, partitions=cpus).cache()
    pages.count()
    seeds = [corpus.url_of(i, n_hosts) for i in range(n_seeds)]

    kw = dict(max_docs=n_pages, max_connections=None)
    if os.environ.get("SPARK_GRAFT_INLINE", "") == "0":
        try:
            CrawlConfig(rank_inline_max_wave=None)
            kw["rank_inline_max_wave"] = None
        except TypeError:
            pass  # older checkout: field absent, repo default applies

    def crawl(k: int) -> tuple[int, int, int, float]:
        state = tempfile.mkdtemp(prefix="jobs-probe-")
        eng = CrawlEngine(
            spark, CrawlConfig(**kw), SyntheticFetcher(pages), state
        )
        eng.seed(seeds)
        # two literal prefixes cover every synthetic host — mirrors
        # bench.py's multiwave shape (and keeps pre-balanced-_prefix_match
        # checkouts analyzable in the before/after A/B)
        eng.accept_set = ["https://host", "http://host"]
        j0, a0, t0 = job_count(spark), action_count(spark), time.time()
        n = 0
        while n < k:
            if eng.step() is None:
                break
            n += 1
        return (
            job_count(spark) - j0,
            action_count(spark) - a0,
            n,
            time.time() - t0,
        )

    crawl(2)  # warm-up (JIT, store init patterns), discarded
    j_lo, a_lo, k_lo, _ = crawl(2)
    j_hi, a_hi, k_hi, wall_hi = crawl(7)
    dk = max(k_hi - k_lo, 1)
    print(
        json.dumps(
            {
                "pypath": PYPATH,
                "inline_env": os.environ.get("SPARK_GRAFT_INLINE", ""),
                "cpus": cpus,
                "supersteps": [k_lo, k_hi],
                "jobs": [j_lo, j_hi],
                "actions": [a_lo, a_hi],
                "jobs_per_superstep_marginal": round((j_hi - j_lo) / dk, 2),
                "actions_per_superstep_marginal": round(
                    (a_hi - a_lo) / dk, 2
                ),
                "wall_s_7steps": round(wall_hi, 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
