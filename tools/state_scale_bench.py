"""Seen-state scale bench (VERDICT r2 #1 done-criterion).

One big-wave superstep against K accumulated seen rows (default 10^7 —
~12x the wave, the 'state >> wave' regime a long crawl lives in), with
per-phase timings, at a chosen parallelism. The injected rows are
committed seen_index deltas in the engine's own bucketed store — the slim
key table the per-superstep seen anti-join and pending compose actually
scan — so the superstep scans 10^7 bucketed state rows while shuffling
only the wave side (the plan explain_audit.py asserts).

Run once per parallelism level on the SAME corpus dir:

    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_CORPUS_DIR=/tmp/bench_corpus \
    SPARK_GRAFT_K_SEEN=10000000 SPARK_GRAFT_WAVE=800000 \
    python tools/state_scale_bench.py

Prints one JSON line with phase wall times; compare local[2] vs local[8]
per phase (BENCH/BASELINE.md protocol: min over reps, CPU-control
ceiling from tools/scaling_run.py).
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jcrawler_spark import corpus  # noqa: E402
from jcrawler_spark.config import CrawlConfig  # noqa: E402
from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher  # noqa: E402
from jcrawler_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
K_SEEN = int(os.environ.get("SPARK_GRAFT_K_SEEN", "10000000"))
WAVE = int(os.environ.get("SPARK_GRAFT_WAVE", "800000"))
BODY_REPEAT = int(os.environ.get("SPARK_GRAFT_BODY_REPEAT", "25"))
CORPUS_DIR = os.environ.get("SPARK_GRAFT_CORPUS_DIR", "")
BUCKETS = 32
# Seen-prefilter mode for the VERDICT r3 #4 comparison row:
#   on      — Bloom (broadcast below BROADCAST_BLOOM_MAX_BYTES)
#   sharded — force the Bloom shard-join prefilter (10^10-frontier form)
#   cuckoo  — cuckoo-filter kind (operators/cuckoo.py; O(wave) key-material
#             merge instead of O(m_bits) bitmap merge)
#   off     — no prefilter; the bucketed exact anti-join stands alone
BLOOM_MODE = os.environ.get("SPARK_GRAFT_BLOOM", "on")


def main() -> None:
    spark = get_spark(f"local[{CPUS}]", app_name="state-scale-bench")
    spark.sparkContext.setLogLevel("ERROR")

    n_pages = WAVE
    n_hosts = max(8, n_pages // 100)

    # ---- corpus (untimed, reused across parallelism levels) ----
    if CORPUS_DIR:
        corpus_path = os.path.join(
            CORPUS_DIR, f"pages-bkt-{n_pages}-b{BODY_REPEAT}"
        )
    else:
        corpus_path = os.path.join(
            tempfile.mkdtemp(prefix="state-bench-"), "pages-bkt"
        )
    if os.path.isdir(corpus_path):
        pages_df = corpus.read_pages_bucketed(
            spark, corpus_path, "statebench_pages", BUCKETS
        )
    else:
        pages_df = corpus.write_pages_bucketed(
            spark, corpus_path, "statebench_pages", n_pages, n_hosts,
            partitions=max(CPUS * 2, 16), buckets=BUCKETS,
            body_repeat=BODY_REPEAT,
        )

    if BLOOM_MODE == "sharded":
        from jcrawler_spark.operators import bloom as bloom_ops

        bloom_ops.BROADCAST_BLOOM_MAX_BYTES = 0  # force the shard-join path

    state_root = tempfile.mkdtemp(prefix="state-bench-state-")
    cfg = CrawlConfig(
        max_docs=WAVE,
        max_connections=None,
        bloom_enabled=BLOOM_MODE != "off",
        bloom_shards=16,
        seen_filter_kind="cuckoo" if BLOOM_MODE == "cuckoo" else "bloom",
        # sized for K_SEEN + wave at <0.7 load: 16 shards x 2^18 buckets
        # x 4 slots = 16.8M slots (33.5 MB — broadcast regime)
        cuckoo_buckets_per_shard=1 << 18,
        debug_timing=True,
        state_compression=os.environ.get(
            "SPARK_GRAFT_STATE_COMPRESSION", "snappy"
        ),
    )
    eng = CrawlEngine(
        spark, cfg, SyntheticFetcher(pages_df), os.path.join(state_root, "s")
    )
    eng.seed([corpus.url_of(i, n_hosts) for i in range(WAVE)])
    eng.accept_set = ["https://host", "http://host"]

    # ---- inject K_SEEN committed seen rows (superstep 1) ----
    # hash-disjoint from the corpus; the slim bucketed seen_index is the
    # table every superstep's seen anti-join and pending compose actually
    # scan — exactly the state a crawl that already visited K URLs carries
    # into its next superstep.
    t_inj = time.monotonic()
    inj = spark.range(K_SEEN).select(
        F.sha2(
            F.concat(F.lit("seen:"), F.col("id").cast("string")), 256
        ).alias("url_hash"),
        F.lit(1).alias("superstep"),
    )
    eng.store.stage_append("seen_index", inj, 1)
    eng.store.commit(1, eng._counters())
    eng.superstep = 1
    inject_s = round(time.monotonic() - t_inj, 2)

    # ---- ONE timed superstep: 800k wave vs 10^7-row seen state ----
    buf = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            return len(s)

    t0 = time.monotonic()
    with contextlib.redirect_stdout(Tee()):
        st = eng.step()
    total_s = round(time.monotonic() - t0, 2)

    phases: dict[str, float] = {}
    for m in re.finditer(r"\[step \d+\] ([^:]+): ([0-9.]+)s", buf.getvalue()):
        phases[m.group(1)] = phases.get(m.group(1), 0.0) + float(m.group(2))

    print(
        json.dumps(
            {
                "cpus": CPUS,
                "bloom": BLOOM_MODE,
                "k_seen": K_SEEN,
                "wave": st.wave if st else 0,
                "emitted": st.emitted_total if st else 0,
                "inject_s": inject_s,
                "total_s": total_s,
                "urls_per_sec": round((st.wave / total_s), 1) if st else 0.0,
                "phases": {k: round(v, 2) for k, v in phases.items()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
