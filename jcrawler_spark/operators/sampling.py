"""Deterministic stratified sampling — the corpus-rebalancing step of a
training-data pipeline (downsample over-represented languages / quality
buckets / domains before tokenization).

No reference analogue (jcrawler stops at the crawl); this is part of the
beyond-reference training-data family (SURVEY §2.8). Design constraints,
in order:

1. **Deterministic and engine-portable.** The keep/drop decision for a
   row is a pure function of its id string: an md5-derived uniform in
   [0, 1) compared against the stratum's rate. md5 is bit-identical in
   Spark and DuckDB (the same trick as `dedup.hash60`), so the oracle
   re-derives the exact sample — no RNG, no seed plumbing, reruns and
   retried tasks agree row-for-row.
2. **Map-only.** Rate lookup is a broadcast join on the stratum key
   (strata counts are small — languages, buckets — never corpus-sized);
   the decision is a Column expression. ZERO shuffles over the corpus at
   100 TB; AQE never sees a wide exchange.
3. **Exact target semantics.** `stratified_sample` takes explicit
   per-stratum rates; `rates_for_cap` derives them from observed stratum
   counts against a per-stratum cap (min(1, cap/count)) — the common
   "no stratum may exceed N docs" policy. The count pass is one
   aggregation; at 10^10 rows it is a map-side-combined groupBy on a
   low-cardinality key.

The uniform: the first 15 hex chars of md5(id || salt) as an integer,
divided by 16^15 — 60 bits of the digest, far below float53 precision
loss for rate comparisons. Salt lets two independent samples of the same
corpus decorrelate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_DENOM = float(1 << 60)  # 16^15


def sample_uniform_col(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform in [0, 1) from an id string: first 15 hex
    chars of md5(id || salt) / 16^15. Bit-identical in DuckDB as
    ('0x' || substr(md5(id || salt), 1, 15))::BIGINT / 16^15."""
    payload = F.concat(id_col, F.lit(salt)) if salt else id_col
    return (
        F.conv(F.substring(F.md5(payload), 1, 15), 16, 10).cast("double")
        / F.lit(_DENOM)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "url",
    default_rate: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Keep each row iff uniform(id) < rate(stratum). Strata absent from
    `rates` use `default_rate`. Map-only: the rate table is broadcast on
    the stratum key; row count of the table = |rates|."""
    spark = df.sparkSession
    if not rates:
        if default_rate >= 1.0:
            return df
        return df.where(
            sample_uniform_col(F.col(id_col), salt) < F.lit(default_rate)
        )
    rt = spark.createDataFrame(
        [(k, float(v)) for k, v in sorted(rates.items())],
        f"{stratum_col} string, _rate double",
    )
    return (
        df.join(F.broadcast(rt), stratum_col, "left")
        .where(
            sample_uniform_col(F.col(id_col), salt)
            < F.coalesce(F.col("_rate"), F.lit(float(default_rate)))
        )
        .drop("_rate")
    )


def rates_for_cap(
    df: DataFrame, stratum_col: str, cap: int
) -> dict[str, float]:
    """Per-stratum keep rates so no stratum EXPECTS more than `cap` rows:
    min(1, cap/count). One low-cardinality aggregation (map-side
    combine); the collected dict is strata-sized (languages, buckets),
    never corpus-sized."""
    counts = df.groupBy(stratum_col).count().collect()
    return {
        r[stratum_col]: min(1.0, cap / r["count"])
        for r in counts
        if r[stratum_col] is not None and r["count"] > 0
    }
