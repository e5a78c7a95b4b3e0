"""Deterministic global dense rank — the scalable replacement for a
single-partition `row_number() OVER (ORDER BY ...)` window.

Shape: range-repartition on the sort key (Spark samples the key
distribution — ranges are in key order), sort within partitions, collect the
tiny per-partition count vector, then add `offset[pid] + local_index` via an
Arrow-batched mapInPandas (no per-row Python, no extra shuffle — partition
layout is preserved). Total cost: the range shuffle + one counts job;
everything is distributed and the driver only ever sees one integer per
partition.

Used by the crawl engine to assign FIFO `order_key`s to newly discovered
frontier rows (SURVEY.md §2.4 T8) — at 10^10-frontier scale a global window
would funnel the wave through one task; this never does."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_global_rank(
    df: DataFrame,
    sort_cols: list[str],
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, DataFrame]:
    """Returns (ranked_df, n, cache_handle).

    ranked_df = df + out_col (long rank 0..n-1 ordered by sort_cols);
    cache_handle is the persisted intermediate the counts job materialized —
    callers unpersist it once downstream consumers are done."""
    spark = df.sparkSession
    npart = num_partitions or spark.sparkContext.defaultParallelism
    # cache the input: repartitionByRange runs a SAMPLING pass before the
    # shuffle — without this the (often expensive) upstream pipeline would
    # evaluate twice
    df = df.persist()
    # bake the partition id into the cached rows: TaskContext.partitionId()
    # is only stable within one consuming stage (a later union/join renumbers
    # partitions), but a column captured at cache time is plan-independent
    parted = (
        df.repartitionByRange(npart, *[F.col(c) for c in sort_cols])
        .sortWithinPartitions(*sort_cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    counts = parted.groupBy("__pid").count().collect()
    df.unpersist()  # parted is materialized now; the input cache is done
    counts.sort(key=lambda r: r["__pid"])
    offsets: dict[int, int] = {}
    total = 0
    for r in counts:
        offsets[int(r["__pid"])] = total
        total += int(r["count"])
    bc = spark.sparkContext.broadcast(offsets)

    out_fields = [f for f in parted.schema.fields if f.name != "__pid"]
    out_schema = T.StructType(
        out_fields + [T.StructField(out_col, T.LongType(), False)]
    )

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cursors: dict[int, int] = {}
        for b in batches:
            b = b.copy()
            pid = int(b["__pid"].iloc[0]) if len(b) else 0
            nxt = cursors.get(pid, bc.value.get(pid, 0))
            b = b.drop(columns=["__pid"])
            b[out_col] = range(nxt, nxt + len(b))
            cursors[pid] = nxt + len(b)
            yield b

    ranked = parted.mapInPandas(add_rank, schema=out_schema)
    return ranked, total, parted


def pid_expr(key, npart: int, span: int) -> F.Column:
    """Monotone bucket id over a LONG sort key with a KNOWN domain
    [0, span): floor(key * npart / span), clamped. Double math is safe —
    x/span and *npart are monotone non-decreasing, and monotone is all a
    range id needs (two near keys folding into one bucket is fine).

    This replaces repartitionByRange's SAMPLING job when the caller already
    knows the key domain (the crawl engine: successor src_order_keys all
    lie in [0, order_counter)) — the round-5 inline-rank path."""
    p = F.floor(key.cast("double") * F.lit(float(npart)) / F.lit(float(max(span, 1))))
    return F.greatest(F.lit(0), F.least(F.lit(npart - 1), p)).cast("int")


def rank_from_offsets(
    df: DataFrame,
    sort_cols: list[str],
    offsets: dict[int, int],
    npart: int,
    out_col: str = "rank",
    pid_col: str = "__pid",
) -> DataFrame:
    """Dense global rank when per-pid counts are ALREADY known (the engine
    folds the counts into its lineage collect — zero extra jobs here):
    shuffle by the precomputed monotone pid, sort (pid, keys) within
    partitions, then assign offsets[pid] + position via one Arrow pass.
    Unlike with_global_rank's one-pid-per-partition layout, a physical
    partition here may hold SEVERAL pids (hash(pid) collisions), so the
    Arrow pass walks pid runs; a pid never spans two partitions, so
    per-pid cursors stay partition-local and the rank is exact."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(offsets)
    out_fields = [f for f in df.schema.fields if f.name != pid_col]
    out_schema = T.StructType(
        out_fields + [T.StructField(out_col, T.LongType(), False)]
    )

    def add_rank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        cursors: dict[int, int] = {}
        for b in batches:
            pids = b[pid_col].to_numpy()
            ranks = np.empty(len(b), dtype="int64")
            i = 0
            while i < len(b):
                pid = int(pids[i])
                j = i
                while j < len(b) and pids[j] == pid:
                    j += 1
                nxt = cursors.get(pid, bc.value.get(pid, 0))
                ranks[i:j] = np.arange(nxt, nxt + (j - i))
                cursors[pid] = nxt + (j - i)
                i = j
            b = b.drop(columns=[pid_col])
            b[out_col] = ranks
            yield b

    parted = df.repartition(npart, F.col(pid_col)).sortWithinPartitions(
        pid_col, *sort_cols
    )
    return parted.mapInPandas(add_rank, schema=out_schema)
