"""Rewriter join-strategy scale proof (VERDICT round-1 item 2 done
criterion): run `rewrite.localize(strategy='join')` over a corpus too
large to collect comfortably (default 10^6 pages), with the driver capped
tight enough that a driver-side url-map collect would OOM — proving the
no-broadcast path really is driver-free — and spot-check correctness by
comparing a deterministic sample of pages against the broadcast strategy
run on just that sample's closure.

Usage: python tools/localize_scale_check.py [n_pages=1000000] [cpus=16]
Prints one JSON line: {"n_pages": ..., "join_wall_s": ..., "rows": ...,
"sample_checked": ..., "sample_mismatches": 0}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.driver.memory", "6g")  # tight: full-map collect dies
        .config("spark.sql.shuffle.partitions", str(cpus * 2))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from jcrawler_spark import corpus
    from jcrawler_spark.operators import rewrite

    pages = corpus.build_pages_df(spark, n_pages, 64, partitions=cpus * 2)
    src = pages.select("url", "html", "status", "content_type")

    t0 = time.monotonic()
    out = rewrite.localize(src, strategy="join")
    # count + a non-trivial aggregate so every page is actually rewritten
    rows = out.where(F.col("path").isNotNull()).count()
    wall = time.monotonic() - t0

    # correctness spot check, EXACT: a page's rewrite is a pure function of
    # (page, the map entries its html can reference). The corpus is
    # closed-form, so each sample page's reference closure — children,
    # cross-link, self, fragment URLs — is computable in Python without
    # collecting the 10^6-entry map; variant keys of corpus URLs never
    # collide across pages (no trailing-slash/%-encoded/space urls), so
    # the closure map's winners equal the full map's winners.
    sample_ids = [i * (n_pages // 200) for i in range(200)]
    sample_urls = {corpus.url_of(i, 64) for i in sample_ids}
    joined_sample = {
        r["url"]: (r["path"], r["html_local"])
        for r in out.where(F.col("url").isin(list(sample_urls))).collect()
    }
    mismatches = 0
    for i in sample_ids:
        rec = corpus.page_record(i, n_pages, 64)
        url = rec["url"]
        closure_ids = set(corpus.child_ids(i, n_pages)) | {i, (i * 7) % n_pages}
        pairs = []
        for j in closure_ids:
            ju = corpus.url_of(j, 64)
            jr_status = corpus.status_of(j)
            pairs.append((ju, rewrite.local_path(ju, jr_status, "text/html; charset=utf-8")))
        # fragment/static URLs referenced by the page but not crawled are
        # NOT in the index — identical on both paths (left unlocalized)
        url_map = rewrite.build_url_map(pairs)
        own_path = url_map.get(url) or rewrite.local_path(
            url, rec["status"], rec["content_type"]
        )
        if rec["status"] == 200:
            expected = rewrite.rewrite_html_py(
                rec["html"].decode(), url, url_map, own_path=own_path
            )
        else:
            expected = rec["html"].decode()
        got_path, got_html = joined_sample.get(url, (None, None))
        if got_html != expected or got_path != own_path:
            mismatches += 1
    print(
        json.dumps(
            {
                "n_pages": n_pages,
                "join_wall_s": round(wall, 1),
                "rows": rows,
                "sample_checked": len(joined_sample),
                "sample_mismatches": mismatches,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
