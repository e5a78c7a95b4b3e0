"""BM25 keyword search over the crawled corpus — beyond the reference
(jcrawler stops at mirroring; this is the "now query what you crawled"
leg of the pipeline, Robertson/Spärck-Jones BM25 per the public
Okapi formulation).

Scale design (the 100 TB answers):
- The corpus side is filtered to the QUERY'S terms *before* any shuffle
  (`tok.isin(terms)` lands in the scan filter), so the postings shuffle
  carries only matching (doc, term) rows — proportional to the result
  candidate set, not the corpus.
- The per-term document frequencies and the global (N, avgdl) stats are
  1-row / |terms|-row aggregates, broadcast back; no corpus-side join
  shuffle.
- Top-k is `orderBy(score desc, id).limit(k)` — Spark plans
  TakeOrderedAndProject (per-partition heap + driver merge of k), never
  a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jcrawler_spark.operators.quality import _words_col


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` documents for a bag-of-words query under Okapi BM25:
    ``(id_col, score)``, ordered by (score desc, id). Tokenization is the
    repo's whitespace-lowercase convention (quality._words_col); idf is
    the standard ``ln(1 + (N - df + 0.5) / (df + 0.5))``."""
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    base = docs.select(
        F.col(id_col), _words_col(F.col(text_col)).alias("ws")
    ).withColumn("dl", F.size("ws"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tok = base.select(
        F.col(id_col), F.col("dl"), F.explode("ws").alias("tok")
    ).where(F.col("tok").isin(*terms))
    tf = tok.groupBy(id_col, "dl", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(contrib).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
