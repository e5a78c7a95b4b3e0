"""Page-diff goldens (VERDICT r3 #5) — the JScraper mirror-diff analogue
(JScraper.java:45-57): diffs run over normalize_html output, so cosmetic
mirror variation diffs to ZERO and content changes show as -/+ line pairs.
Line-level difflib semantics (not dmp char-level) per DIVERGENCES.md."""

from __future__ import annotations

from pyspark.sql import functions as F

from jcrawler_spark import corpus
from jcrawler_spark.functions.pagediff import page_diff, page_diff_col, recrawl_diff

from test_htmlnorm import LEGISLATIE_ALT, LEGISLATIE_RAW

LEGISLATIE_AMENDED = LEGISLATIE_RAW.replace(
    "Art. 1 &#8211; Text&nbsp;lege.", "Art. 1 &#8211; Text&nbsp;modificat."
).replace("</BODY>", "  <p>Art. 3 — Articol nou.</p>\n</BODY>")


def test_identical_pages_diff_to_zero():
    assert page_diff(LEGISLATIE_RAW, LEGISLATIE_RAW) == (0, 0, "")


def test_mirror_variants_diff_to_zero():
    # different markup style, same content: the normalize step must make
    # the diff empty — the whole point of the mirror-diff workflow
    assert page_diff(LEGISLATIE_RAW, LEGISLATIE_ALT) == (0, 0, "")


def test_amended_page_golden():
    n_ins, n_del, patch = page_diff(LEGISLATIE_RAW, LEGISLATIE_AMENDED)
    # one modified line (a -/+ pair) + one inserted article
    assert (n_ins, n_del) == (2, 1)
    assert "-      <p>Art. 1 – Text lege.</p>" in patch
    assert "+      <p>Art. 1 – Text modificat.</p>" in patch
    assert "+    <p>Art. 3 — Articol nou.</p>" in patch
    # deterministic unified-diff grammar: fixed labels, @@ hunks
    assert patch.startswith("--- old\n+++ new\n@@")


def test_null_side_is_null():
    assert page_diff(None, LEGISLATIE_RAW) is None
    assert page_diff(LEGISLATIE_RAW, None) is None


def test_insertion_only_counts():
    old = "<body><p>a</p><p>b</p></body>"
    new = "<body><p>a</p><p>x</p><p>b</p></body>"
    n_ins, n_del, _ = page_diff(old, new)
    assert (n_ins, n_del) == (1, 0)
    # symmetric deletion
    n_ins, n_del, _ = page_diff(new, old)
    assert (n_ins, n_del) == (0, 1)


def test_udf_matches_pure_python(spark):
    """The Arrow UDF surface computes exactly the per-row function over the
    recrawl fixture pairs, with ONE UDF evaluation per row (the struct is
    projected, not re-computed per field)."""
    pairs = corpus.build_recrawl_df(spark, 30, n_hosts=4)
    got = {
        r["url"]: (r["d"]["n_insertions"], r["d"]["n_deletions"], r["d"]["patch"])
        for r in pairs.select(
            "url", page_diff_col("old_html", "new_html").alias("d")
        ).collect()
    }
    assert len(got) == 30
    for i in range(30):
        rec = corpus.page_record(i, 30, 4)
        expect = page_diff(
            rec["html"].decode("utf-8"), corpus.recrawl_html(i, 30, 4)
        )
        assert got[rec["url"]] == expect, rec["url"]
        if i % 3 == 0:  # cosmetic family really is invisible after normalize
            assert got[rec["url"]][:2] == (0, 0)


def test_recrawl_diff_consecutive_versions(spark):
    """recrawl_diff pairs CONSECUTIVE supersteps per url and diffs them."""
    rows = [
        ("u1", 1, "<body><p>a</p></body>"),
        ("u1", 3, "<body><p>a</p><p>b</p></body>"),
        ("u1", 7, "<body><p>b</p></body>"),
        ("u2", 2, "<body><p>only</p></body>"),
    ]
    df = spark.createDataFrame(rows, ["url", "superstep", "html"])
    got = {
        (r["url"], r["prev_superstep"], r["superstep"]): (
            r["n_insertions"],
            r["n_deletions"],
        )
        for r in recrawl_diff(df).collect()
    }
    # u2 has a single version -> no diff row; u1 has exactly two pairs:
    # 1->3 inserts <p>b</p>; 3->7 deletes <p>a</p>
    assert got == {("u1", 1, 3): (1, 0), ("u1", 3, 7): (0, 1)}


def test_single_udf_evaluation_in_plan(spark):
    """Projecting three fields out of the diff struct must not evaluate the
    pandas UDF three times (ArrowEvalPython appears once with one udf)."""
    pairs = corpus.build_recrawl_df(spark, 10, n_hosts=4)
    out = pairs.withColumn(
        "__d", page_diff_col("old_html", "new_html")
    ).select(
        "url",
        F.col("__d.n_insertions").alias("n_insertions"),
        F.col("__d.n_deletions").alias("n_deletions"),
        F.sha2(F.col("__d.patch"), 256).alias("patch_sha"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    first = plan[plan.index("ArrowEvalPython"):].splitlines()[0]
    assert first.count("page_diff_udf") == 1
