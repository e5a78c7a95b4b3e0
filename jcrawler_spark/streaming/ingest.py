"""Structured Streaming surface (SURVEY.md §2.6 delta).

The reference has no streaming runtime — its "streaming" is lazy pull
iteration (RichIterable, JCrawler.java:699-711) and the crawl itself is
correctly batch-iterative here (superstep = snapshot). What a production
deployment DOES stream is the other direction: pages arriving from fetcher
fleets land as files/Kafka records, and operators downstream want
incremental, exactly-once consumption without waiting for a crawl round.
This module provides that surface over the SAME pages schema:

  * `read_pages_stream`   — readStream over a directory the fetch fleet
    appends parquet page batches to (swap for Kafka/Iceberg CDC in prod;
    the schema and everything downstream is unchanged);
  * `host_fetch_windows`  — event-time windowed per-host fetch/error/bytes
    rates with a WATERMARK on fetch_ts, so late page records (stragglers
    from slow fetchers) are folded in until the watermark closes the
    window — append-mode output is final-only, exactly-once per window;
  * `host_running_stats`  — custom stateful operator via
    applyInPandasWithState: per-host running totals + last-fetch event
    time, emitted on every update (the streaming analogue of the engine's
    host_state table);
  * `start_to_parquet`    — checkpointed append sink (exactly-once file
    sink; restart resumes from the checkpoint like the engine's snapshot
    resume).

Scale: windowed aggregation state is per (window, host) — partitioned by
the grouping keys across executors; the watermark bounds state size. The
stateful operator holds one row per host. Neither holds per-URL state —
URL-level dedup belongs to the batch engine's Bloom+anti-join gate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from jcrawler_spark import schemas


def read_pages_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of pages batches (schemas.PAGES parquet)."""
    reader = spark.readStream.schema(schemas.PAGES)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def host_fetch_windows(
    pages: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Per-host event-time fetch metrics: tumbling windows on fetch_ts with
    a watermark for late records. Append-mode semantics: a (window, host)
    row is emitted exactly once, when the watermark passes window end."""
    return (
        pages.withWatermark("fetch_ts", watermark)
        .groupBy(F.window("fetch_ts", window).alias("w"), "host")
        .agg(
            F.count("*").alias("n_pages"),
            F.count(F.when(F.col("error").isNotNull(), 1)).alias("n_errors"),
            F.count(F.when(F.col("status") == 200, 1)).alias("n_ok"),
            F.sum(F.coalesce(F.length("html"), F.lit(0))).alias("bytes_in"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "host",
            "n_pages",
            "n_errors",
            "n_ok",
            "bytes_in",
        )
    )


_RUNNING_STATE = T.StructType(
    [
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("last_fetch_ts", T.TimestampType()),
    ]
)

_RUNNING_OUT = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("n_pages", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("last_fetch_ts", T.TimestampType()),
    ]
)


def host_running_stats(pages: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-host running
    totals, updated as page batches stream in — the streaming form of the
    engine's host_state table. State = one tiny row per host."""

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_pages, n_errors, last_ts = (
            state.get if state.exists else (0, 0, None)
        )
        for b in batches:
            n_pages += len(b)
            n_errors += int(b["error"].notna().sum())
            mx = b["fetch_ts"].max()
            if pd.notna(mx) and (last_ts is None or mx > last_ts):
                last_ts = mx.to_pydatetime() if hasattr(mx, "to_pydatetime") else mx
        state.update((n_pages, n_errors, last_ts))
        yield pd.DataFrame(
            [
                {
                    "host": key[0],
                    "n_pages": n_pages,
                    "n_errors": n_errors,
                    "last_fetch_ts": last_ts,
                }
            ]
        )

    return pages.groupBy("host").applyInPandasWithState(
        update,
        outputStructType=_RUNNING_OUT,
        stateStructType=_RUNNING_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def start_to_parquet(
    df: DataFrame,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    output_mode: str = "append",
) -> Any:
    """Checkpointed exactly-once parquet sink. `available_now=True` drains
    everything currently in the source then stops (the batch-drive mode the
    tests and backfills use); False = continuous micro-batches."""
    writer = (
        df.writeStream.format("parquet")
        .outputMode(output_mode)
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
