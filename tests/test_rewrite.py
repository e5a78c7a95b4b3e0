"""Rewriter/localization tests (RewriterTest.java analogues + the
no-external-URLs property invariant, AnalysisTest.java:22-80 /
LocalizationInvariantTest.java:35-99)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from jcrawler_spark import corpus
from jcrawler_spark.config import CrawlConfig
from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher
from jcrawler_spark.operators import rewrite


def test_relative_path():
    assert rewrite.relative_path("a/b/page.html", "a/b/img.png") == "img.png"
    assert rewrite.relative_path("a/b/page.html", "a/c/img.png") == "../c/img.png"
    assert rewrite.relative_path("page.html", "img/x.png") == "img/x.png"


def test_url_map_variants():
    m = rewrite.build_url_map([("https://x.example/a/", "x.example/a/index.html")])
    assert m["https://x.example/a/"] == "x.example/a/index.html"
    assert m["https://x.example/a"] == "x.example/a/index.html"
    m2 = rewrite.build_url_map([("https://x.example/a%20b", "p")])
    assert m2["https://x.example/a b"] == "p"


def test_rewrite_single_page_golden():
    url_map = {
        "https://s.example/page/1": "s.example/page/1.html",
        "https://s.example/img/logo.png": "s.example/img/logo.png",
        "https://s.example/deep/two": "s.example/deep/two.html",
    }
    html = (
        "<a href='https://s.example/deep/two'>x</a>"
        '<img src="https://s.example/img/logo.png">'
        "<a href='https://other.example/keep'>ext</a>"
        "<script>var u='https://s.example/img/logo.png';</script>"
        "<div style=\"background:url('/img/logo.png')\">y</div>"
    )
    out = rewrite.rewrite_html_py(html, "https://s.example/page/1", url_map)
    assert "<a href='../deep/two.html'>x</a>" in out
    assert '<img src="../img/logo.png">' in out
    assert "https://other.example/keep" in out  # unknown URL untouched
    assert "var u='../img/logo.png';" in out  # J2 inline replacement
    assert "url('../img/logo.png')" in out  # relative url() resolved


def test_localization_invariant_over_crawled_corpus(spark, tmp_path):
    """Crawl the synthetic site, localize the crawled set, and assert the
    reference's property: no internal absolute URL survives in any
    localized page (external domains are the allowed exception)."""
    N, H = 120, 8
    pages_df = corpus.build_pages_df(spark, N, H, partitions=4).cache()
    cfg = CrawlConfig(accept=[f"host{i}.example" for i in range(H)], max_docs=500, max_connections=None)
    root = str(tmp_path / "state")
    shutil.rmtree(root, ignore_errors=True)
    eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages_df), root)
    eng.run(seeds=[corpus.url_of(0, H)], max_supersteps=40)

    crawled = (
        eng.store.read("pages")
        .where(~F.col("skipped"))
        .select("url", "status", "content_type")
        .join(pages_df.select("url", F.col("html").alias("html")), "url", "left")
        .withColumn(
            "content_type",
            F.coalesce(F.col("content_type"), F.lit("text/html")),
        )
    )
    local = rewrite.localize(crawled).collect()
    assert len(local) > 50
    offenders = []
    for r in local:
        h = r["html_local"] or ""
        if "https://host" in h or "http://host" in h:
            offenders.append(r["url"])
    assert offenders == [], f"absolute internal URLs remain in {offenders[:5]}"
    # paths are unique (no two URLs localize onto each other)
    paths = [r["path"] for r in local]
    assert len(paths) == len(set(paths))
    pages_df.unpersist()


def test_srcset_rewrite_golden():
    """Relative AND absolute srcset candidates localize, descriptors kept,
    commas inside URLs survive (Rewriter.java:284-360 + Wix golden)."""
    url_map = {
        "https://s.example/media/a,b.jpg": "s.example/media/a,b.jpg",
        "https://s.example/img/two.png": "s.example/img/two.png",
        "https://s.example/page/1": "s.example/page/1.html",
    }
    html = (
        '<img srcset="https://s.example/media/a,b.jpg 1x, /img/two.png 2x">'
        "<source srcset='https://unknown.example/x.jpg 1x'>"
    )
    out = rewrite.rewrite_html_py(html, "https://s.example/page/1", url_map)
    assert '<img srcset="../media/a,b.jpg 1x, ../img/two.png 2x">' in out
    # unknown srcset URL untouched
    assert "https://unknown.example/x.jpg 1x" in out


def test_srcset_split_reference_delimiters():
    s = (
        "https://h.example/media/a.jpg/v1/fill,w_60,h_60/a.jpg 1x, "
        "https://h.example/media/a.jpg/v1/fill,w_120,h_120/a.jpg 2x"
    )
    assert rewrite.split_srcset(s) == [
        "https://h.example/media/a.jpg/v1/fill,w_60,h_60/a.jpg 1x",
        "https://h.example/media/a.jpg/v1/fill,w_120,h_120/a.jpg 2x",
    ]


def test_join_strategy_equals_broadcast(spark):
    """The no-broadcast join strategy must produce byte-identical localized
    output to the broadcast strategy over the full synthetic corpus
    (VERDICT round-1 item 2: the scale path must be real, not documented)."""
    pages = corpus.build_pages_df(spark, 150, 8, partitions=4).select(
        "url", "html", "status", "content_type"
    ).cache()
    a = {
        r["url"]: (r["path"], r["html_local"])
        for r in rewrite.localize(pages, strategy="broadcast").collect()
    }
    b = {
        r["url"]: (r["path"], r["html_local"])
        for r in rewrite.localize(pages, strategy="join").collect()
    }
    pages.unpersist()
    assert a.keys() == b.keys()
    diff = [u for u in a if a[u] != b[u]]
    assert diff == [], f"strategy mismatch for {diff[:3]}: {a[diff[0]]} vs {b[diff[0]]}" if diff else ""
