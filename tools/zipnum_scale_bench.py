"""ZipNum index-build scale bench (sources/cdx.py evidence row).

Measures the full global-index build — JVM cdxj parse, ONE
range-partitioning Exchange on the SURT key, in-partition sort, gzip
block shard write, cluster.idx assembly — at a chosen parallelism over
the SAME on-disk .cdxj input, so the BENCH/BASELINE.md N-vs-4N protocol
applies: local[2] vs local[8], 3 reps each, min-over-reps, efficiency
read against the same-minute host-control ceilings (this VM's alloc path
drifts; see BENCH/BASELINE.md "host wall").

Input is synthesized as text (no WARC bodies needed — the build touches
index lines only, which is exactly the at-scale property being claimed):
N_RECORDS lines across N_FILES .cdxj files, keys spread over 10^4 hosts
so the range sampler sees realistic skew. Shard count is FIXED across
parallelism levels (same output work).

    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_REP=0 python tools/zipnum_scale_bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jcrawler_spark.session import get_spark  # noqa: E402
from jcrawler_spark.sources import cdx as cdxmod  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
N_RECORDS = int(os.environ.get("SPARK_GRAFT_ZN_RECORDS", "2000000"))
N_FILES = int(os.environ.get("SPARK_GRAFT_ZN_FILES", "64"))
SHARDS = int(os.environ.get("SPARK_GRAFT_ZN_SHARDS", "16"))
REP = int(os.environ.get("SPARK_GRAFT_REP", "0"))


def main() -> None:
    spark = get_spark(f"local[{CPUS}]", app_name="zipnum-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- input .cdxj files (untimed, reused across parallelism levels) ----
    adir = f"/tmp/zipnum-bench-{N_RECORDS}-{N_FILES}"
    marker = os.path.join(adir, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(adir, ignore_errors=True)
        i = F.col("id")
        line = F.concat(
            # key: SURT + ts14 — 10^4 hosts, mega-host skew via id%7==0
            F.lit("example,host"),
            F.when(i % 7 == 0, F.lit(0)).otherwise(i % 10000).cast("string"),
            F.lit(")/p/"), i.cast("string"),
            F.lit(" 2026010100"),
            F.format_string("%04d", (i % 3600).cast("int")),
            # meta: the exact json read_cdx parses (cdxj is space-separated)
            F.lit(" "),
            F.to_json(F.struct(
                F.concat(F.lit("https://www.host"), (i % 10000).cast("string"),
                         F.lit(".example/p/"), i.cast("string")).alias("url"),
                F.lit("text/html").alias("mime"),
                F.lit(200).alias("status"),
                F.sha2(i.cast("string"), 256).substr(1, 32).alias("digest"),
                (i % 900 + 300).alias("length"),
                (i * 1000 % (1 << 30)).alias("offset"),
                F.format_string("part-%05d.warc.gz", (i % N_FILES).cast("int")
                                ).alias("filename"),
            )),
        )
        (
            spark.range(N_RECORDS).repartition(N_FILES)
            .select(line.alias("value"))
            .write.mode("overwrite").text(adir)
        )
        for f in os.listdir(adir):
            if f.startswith("part-") and not f.endswith(".crc"):
                os.rename(
                    os.path.join(adir, f),
                    os.path.join(adir, f.split(".")[0] + ".cdxj"),
                )
        open(marker, "w").close()
    in_bytes = sum(
        os.path.getsize(os.path.join(adir, f))
        for f in os.listdir(adir)
        if f.endswith(".cdxj")
    )

    # warm-up: JVM + one Python worker wave (untimed)
    from jcrawler_spark.sources import warc as warcmod

    warcmod.read_cdx(spark, adir).limit(1000).count()

    # ---- timed: the whole build (shuffle + sort + shard write + idx) ----
    out_dir = f"/tmp/zipnum-bench-out-{CPUS}-{REP}"
    shutil.rmtree(out_dir, ignore_errors=True)
    t0 = time.monotonic()
    n = cdxmod.build_zipnum(spark, adir, out_dir, shards=SHARDS)
    build_s = round(time.monotonic() - t0, 3)
    assert n == N_RECORDS, (n, N_RECORDS)
    out_bytes = sum(
        os.path.getsize(os.path.join(out_dir, f))
        for f in os.listdir(out_dir)
    )
    n_blocks = sum(
        1 for _ in open(os.path.join(out_dir, cdxmod.CLUSTER_IDX))
    )
    shutil.rmtree(out_dir, ignore_errors=True)

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
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip() or None

    print(json.dumps({
        "rep": REP,
        "cpus": CPUS,
        "git_sha": sha,
        "host_probe_s": probe,
        "n_records": n,
        "n_input_files": N_FILES,
        "shards": SHARDS,
        "n_blocks": n_blocks,
        "input_bytes": in_bytes,
        "index_bytes": out_bytes,
        "build_s": build_s,
        "records_per_sec": round(n / build_s, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
