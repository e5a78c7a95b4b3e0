"""Structured Streaming surface tests (SURVEY.md §2.6 delta): watermarked
windowed host metrics over a pages file-stream, the stateful per-host
running aggregator, and checkpointed exactly-once sink semantics."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from jcrawler_spark import schemas
from jcrawler_spark.functions import urlops
from jcrawler_spark.streaming import ingest

_UTC = dt.timezone.utc


def _page(url: str, ts: dt.datetime, status: int = 200, error: str | None = None):
    host = url.split("/")[2]
    return {
        "url": url,
        "warc_ts": ts,
        "html": b"<html><body>x</body></html>" if error is None else None,
        "text": "x",
        "lang": "en",
        "status": None if error else status,
        "location": None,
        "content_type": "text/html",
        "host": host,
        "url_hash": urlops.url_hash(url),
        "fetch_ts": ts,
        "error": error,
    }


def _write_batch(spark, path: str, rows, name: str) -> None:
    """Land ONE flat parquet file in the stream-source dir (the file source
    does not recurse into non-partition subdirectories)."""
    import glob
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp()
    spark.createDataFrame(rows, schema=schemas.PAGES).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(path, f"{name}.parquet"))
    shutil.rmtree(tmp, ignore_errors=True)


def _drain(q) -> None:
    q.awaitTermination(120)


def test_windowed_host_metrics_with_watermark(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2026, 1, 1, 10, 0, 0, tzinfo=_UTC)

    # window [10:00,10:01): host a ×2 (one error), host b ×1
    _write_batch(spark, src, [
        _page("https://a.example/1", t0),
        _page("https://a.example/2", t0 + dt.timedelta(seconds=20),
              error="connect error: x"),
        _page("https://b.example/1", t0 + dt.timedelta(seconds=40)),
    ], "batch1")

    def run_once():
        stream = ingest.read_pages_stream(spark, src)
        q = ingest.start_to_parquet(
            ingest.host_fetch_windows(stream, "1 minute", "2 minutes"),
            out, ckpt,
        )
        _drain(q)

    run_once()

    # a LATE record for the first window, still within the 2-min watermark,
    # plus an advancer at 10:10 that closes the first window
    _write_batch(spark, src, [
        _page("https://a.example/3", t0 + dt.timedelta(seconds=50)),
        _page("https://c.example/1", t0 + dt.timedelta(minutes=10)),
    ], "batch2")
    run_once()
    # one more advancer so the no-data batch finalizes anything pending
    _write_batch(spark, src, [
        _page("https://c.example/2", t0 + dt.timedelta(minutes=20)),
    ], "batch3")
    run_once()

    got = {
        (r["host"], r["window_start"].minute): r
        for r in spark.read.parquet(out).collect()
    }
    a = got[("a.example", 0)]
    # the late record was folded into the window before it closed
    assert a["n_pages"] == 3 and a["n_errors"] == 1 and a["n_ok"] == 2
    b = got[("b.example", 0)]
    assert b["n_pages"] == 1 and b["n_errors"] == 0
    # exactly-once: no duplicate (window, host) rows across restarts
    rows = spark.read.parquet(out).groupBy("window_start", "host").count()
    assert rows.where(F.col("count") > 1).count() == 0


def test_host_running_stats_stateful(spark, tmp_path):
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0, tzinfo=_UTC)

    _write_batch(spark, src, [
        _page("https://a.example/1", t0),
        _page("https://a.example/2", t0 + dt.timedelta(seconds=5),
              error="connect error: x"),
        _page("https://b.example/1", t0 + dt.timedelta(seconds=9)),
    ], "b1")

    out = str(tmp_path / "out2")

    def run_once():
        stream = ingest.read_pages_stream(spark, src)

        def sink(batch_df, batch_id):  # update-mode rows → append parquet
            batch_df.write.mode("append").parquet(out)

        q = (
            ingest.host_running_stats(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)

    run_once()
    # second batch arrives later; state must CARRY ACROSS the restart
    _write_batch(spark, src, [
        _page("https://a.example/3", t0 + dt.timedelta(minutes=1)),
    ], "b2")
    run_once()

    rows = spark.read.parquet(out).orderBy("n_pages").collect()
    latest = {r["host"]: r for r in rows}  # last write wins per host
    assert latest["a.example"]["n_pages"] == 3
    assert latest["a.example"]["n_errors"] == 1
    assert latest["a.example"]["last_fetch_ts"].minute == 1
    assert latest["b.example"]["n_pages"] == 1


def test_streaming_matches_batch_engine_host_totals(spark, tmp_path):
    """Streaming↔engine bridge (VERDICT r2 #7): host_running_stats is the
    streaming analogue of the engine's host_state/lineage — streaming the
    pages the batch engine fetched (in two file batches) must converge to
    the SAME per-host totals as a batch aggregation over the engine's
    pages table."""
    import shutil

    from pyspark.sql import Window

    from jcrawler_spark import corpus
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher

    N, H = 120, 8
    accepts = [f"host{i}.example" for i in range(H)]
    pages_corpus = corpus.build_pages_df(spark, N, H, partitions=4)
    cfg = CrawlConfig(accept=accepts, max_docs=500, max_connections=None)
    root = str(tmp_path / "eng")
    shutil.rmtree(root, ignore_errors=True)
    eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages_corpus), root)
    eng.run(seeds=[corpus.url_of(0, H)], max_supersteps=60)

    fetched = eng.store.read("pages").where(~F.col("skipped"))
    batch_totals = {
        r["host"]: (r["n_pages"], r["n_errors"])
        for r in fetched.groupBy("host")
        .agg(
            F.count("*").alias("n_pages"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
        )
        .collect()
    }
    assert len(batch_totals) >= 4  # several hosts reached; n_errors compared
    # per-host regardless (0 is a valid total — equality is the contract)

    # the fetch fleet lands the same pages as parquet batches — built from
    # the engine's own pages table (it includes 404s for corpus-missing
    # children, which a corpus join would lose); fetch_ts = logical clock
    streamed = fetched.select(
        "url",
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        "status",
        "location",
        "content_type",
        "host",
        "url_hash",
        F.to_timestamp(
            F.lit("2026-01-01 12:00:00").cast("timestamp")
            + F.make_interval(secs=F.col("superstep").cast("double"))
        ).alias("fetch_ts"),
        "error",
    ).select(*[f.name for f in schemas.PAGES.fields])
    src = str(tmp_path / "srcb")
    os.makedirs(src, exist_ok=True)
    rows = [r.asDict() for r in streamed.collect()]
    _write_batch(spark, src, rows[: len(rows) // 2], "b1")
    _write_batch(spark, src, rows[len(rows) // 2 :], "b2")

    out = str(tmp_path / "outb")
    ckpt = str(tmp_path / "ckptb")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    q = (
        ingest.host_running_stats(ingest.read_pages_stream(spark, src))
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)

    final = {
        r["host"]: (r["n_pages"], r["n_errors"])
        for r in spark.read.parquet(out)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("host").orderBy(F.col("n_pages").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .collect()
    }
    assert final == batch_totals
