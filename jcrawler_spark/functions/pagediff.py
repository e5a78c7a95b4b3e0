"""Page diff — the JScraper mirror-diff analogue (VERDICT r3 #5).

The reference diffs a freshly-crawled page against the stored copy with a
vendored diff_match_patch over the Jsoup-normalized serialization
(/root/reference/src/main/java/org/raisercostin/jscraper/JScraper.java:45-57),
so a recrawl audit shows REAL content changes, not markup noise. This module
is the PySpark-native completion of that workflow on top of
``normalize_html``: both sides are canonicalized first (cosmetic mirror
variation diffs to zero), then diffed LINE-wise with stdlib ``difflib``
unified-diff.

DIVERGENCE (documented in DIVERGENCES.md): the reference's dmp produces
character-level patches; this module emits line-level unified diffs. The
observable contract the workflow needs — "did the page change, how much,
where" — is preserved; the patch grammar differs. Line granularity composes
with the normalizer's one-block-per-line output, so a changed paragraph is
one -/+ pair, which is what an auditor reads.

Spark surfaces
  * ``page_diff_col(old, new)`` — Arrow pandas_udf (the repo's 5th declared
    Python-UDF surface; per-row text diffing has no Column form). Returns a
    struct (n_insertions, n_deletions, patch); NULL when either side is
    NULL. Scale: embarrassingly parallel map, no shuffle.
  * ``recrawl_diff(pages)`` — per-URL diff of consecutive crawled versions:
    one hash(url) shuffle to co-locate a URL's versions, ``lag()`` window,
    then the map-side diff. At 10^10 URLs the window never sees more rows
    per group than the recrawl count of one URL.
"""

from __future__ import annotations

import difflib

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .htmlnorm import normalize_html

DIFF_STRUCT = T.StructType(
    [
        T.StructField("n_insertions", T.IntegerType()),
        T.StructField("n_deletions", T.IntegerType()),
        T.StructField("patch", T.StringType()),
    ]
)


def page_diff(
    old_html: str | None, new_html: str | None, normalize: bool = True
) -> tuple[int, int, str] | None:
    """Diff two HTML documents after canonicalization.

    Returns (n_insertions, n_deletions, patch) where patch is a unified
    diff with fixed ``old``/``new`` labels and zero context lines (hunks
    carry their own @@ positions — deterministic for identical inputs
    across runs/partitions). Identical-after-normalization pages return
    (0, 0, ""). None if either side is None (nothing to compare)."""
    if old_html is None or new_html is None:
        return None
    if normalize:
        old_html = normalize_html(old_html)
        new_html = normalize_html(new_html)
    if old_html == new_html:
        return (0, 0, "")
    a = old_html.splitlines()
    b = new_html.splitlines()
    lines = list(
        difflib.unified_diff(a, b, fromfile="old", tofile="new", n=0, lineterm="")
    )
    n_ins = sum(1 for ln in lines if ln.startswith("+") and not ln.startswith("+++"))
    n_del = sum(1 for ln in lines if ln.startswith("-") and not ln.startswith("---"))
    return (n_ins, n_del, "\n".join(lines))


@F.pandas_udf(DIFF_STRUCT)
def page_diff_udf(old: pd.Series, new: pd.Series) -> pd.DataFrame:
    rows = [page_diff(o, n) for o, n in zip(old, new)]
    return pd.DataFrame(
        [(None, None, None) if r is None else r for r in rows],
        columns=["n_insertions", "n_deletions", "patch"],
    )


def page_diff_col(old: Column | str, new: Column | str) -> Column:
    """Column form over string or binary html columns (binary decodes as
    UTF-8 the way the pages table stores bodies)."""
    o = F.col(old) if isinstance(old, str) else old
    n = F.col(new) if isinstance(new, str) else new
    return page_diff_udf(o.cast("string"), n.cast("string"))


def recrawl_diff(
    pages: DataFrame,
    html_col: str = "html",
    key_col: str = "url",
    order_col: str = "superstep",
) -> DataFrame:
    """Diff every stored version of a URL against its previous version —
    the recrawl-audit table (S10 expiry re-fetches produce the version
    rows; JCrawler.java:762-788). Output: one row per (url, version>first)
    with (url, prev_<order>, <order>, n_insertions, n_deletions, patch).

    Plan: one Exchange on hash(url) for the window (versions of a URL are
    co-located), lag(1) to pair consecutive versions, Arrow-batched diff.
    No join, no second shuffle; at scale the group size is the per-URL
    recrawl count (small), so skew is bounded by the most-recrawled URL."""
    w = Window.partitionBy(key_col).orderBy(F.col(order_col).asc())
    paired = pages.select(
        key_col,
        F.col(order_col),
        F.lag(order_col).over(w).alias("prev_" + order_col),
        F.lag(html_col).over(w).alias("__prev_html"),
        F.col(html_col).alias("__html"),
    ).where(F.col("prev_" + order_col).isNotNull())
    d = page_diff_col(F.col("__prev_html"), F.col("__html"))
    return paired.select(
        key_col,
        "prev_" + order_col,
        order_col,
        d["n_insertions"].alias("n_insertions"),
        d["n_deletions"].alias("n_deletions"),
        d["patch"].alias("patch"),
    )
