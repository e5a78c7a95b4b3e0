"""WARC ingest scale bench (sources/warc.py evidence row).

Measures archive → pages throughput (the full parse: multi-member gunzip,
record framing, HTTP split, Arrow batch emission, JVM-side derived
columns) at a chosen parallelism on the SAME on-disk archive, so the
BENCH/BASELINE.md N-vs-4N protocol applies: run at local[2] and local[8],
3 reps each, min-over-reps, efficiency vs the host-control ceilings.

The archive is file-granular work (one task per .warc.gz — the Common
Crawl layout), so scaling is embarrassingly parallel by construction;
what this measures is that nothing serializes it in practice (driver
listing, Arrow transfer, Python worker startup).

    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_WARC_DIR=/tmp/warc_bench \
    python tools/warc_scale_bench.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jcrawler_spark import corpus  # noqa: E402
from jcrawler_spark.session import get_spark  # noqa: E402
from jcrawler_spark.sources import warc  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_WARC_PAGES", "40000"))
N_FILES = int(os.environ.get("SPARK_GRAFT_WARC_FILES", "64"))
BODY_REPEAT = int(os.environ.get("SPARK_GRAFT_BODY_REPEAT", "25"))
WARC_DIR = os.environ.get("SPARK_GRAFT_WARC_DIR", "")
REP = int(os.environ.get("SPARK_GRAFT_REP", "0"))


def main() -> None:
    spark = get_spark(f"local[{CPUS}]", app_name="warc-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- archive (untimed, reused across parallelism levels) ----
    adir = WARC_DIR or f"/tmp/warc-bench-{N_PAGES}-b{BODY_REPEAT}"
    marker = os.path.join(adir, "_DONE")
    if not os.path.exists(marker):
        pages = corpus.build_pages_df(
            spark, N_PAGES, max(8, N_PAGES // 100),
            partitions=N_FILES, body_repeat=BODY_REPEAT,
        )
        warc.write_warc_files(pages.repartition(N_FILES), adir).collect()
        open(marker, "w").close()
    n_bytes = sum(
        os.path.getsize(os.path.join(adir, f))
        for f in os.listdir(adir)
        if f.endswith(".warc.gz")
    )

    # warm-up (JVM + Python workers), small slice
    warc.read_warc(
        spark, os.path.join(adir, "part-00000.warc.gz")
    ).count()

    # ---- timed: full distributed parse + projection ----
    t0 = time.monotonic()
    agg = (
        warc.to_pages(warc.read_warc(spark, adir))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.length("html")).alias("html_bytes"),
            F.count("url_hash").alias("n_hashed"),
        )
        .collect()[0]
    )
    parse_s = round(time.monotonic() - t0, 3)

    probe = None
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import sys, json; sys.path.insert(0, sys.argv[1]); "
             "from host_controls import control; "
             'print(json.dumps(control(("alu", "alloc"), (8,))))',
             os.path.dirname(os.path.abspath(__file__))],
            capture_output=True, text=True, timeout=120,
        )
        probe = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        pass
    sha = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
        text=True, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip() or None

    print(json.dumps({
        "rep": REP,
        "cpus": CPUS,
        "git_sha": sha,
        "host_probe_s": probe,
        "n_pages": int(agg["n"]),
        "n_files": N_FILES,
        "archive_bytes": n_bytes,
        "html_bytes": int(agg["html_bytes"]),
        "parse_s": parse_s,
        "pages_per_sec": round(agg["n"] / parse_s, 1),
        "mb_per_sec": round(agg["html_bytes"] / parse_s / 1e6, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
