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
