"""Sitemap seeder tests (operators/sitemap.py): XML urlset/sitemapindex
parsing (namespaced and bare), plain-text and gzipped forms, robots.txt
Sitemap: harvesting, the distributed explode, lastmod parsing, and the
seeds projection feeding engine.set_priority_scores."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jcrawler_spark.functions import urlops
from jcrawler_spark.operators import sitemap


def _entries(n: int, host: str = "s.example") -> list[dict]:
    return [
        {
            "loc": f"https://{host}/p/{i}",
            "lastmod": f"2024-01-{(i % 28) + 1:02d}",
            "changefreq": "daily" if i % 2 == 0 else None,
            "priority": round(0.1 * (i % 10), 1),
        }
        for i in range(n)
    ]


def test_parse_urlset_namespaced_and_bare():
    ents = _entries(5)
    for ns in (True, False):
        kind, got = sitemap.parse_sitemap(
            sitemap.build_urlset(ents, namespace=ns)
        )
        assert kind == "urlset"
        assert [e["loc"] for e in got] == [e["loc"] for e in ents]
        assert got[3]["priority"] == pytest.approx(0.3)
        assert got[0]["changefreq"] == "daily" and got[1]["changefreq"] is None
        assert got[0]["lastmod"] == "2024-01-01"


def test_parse_sitemapindex_and_gzip():
    locs = [f"https://s.example/sitemap-{i}.xml.gz" for i in range(3)]
    blob = sitemap.build_sitemapindex(locs, gz=True)
    assert blob[:2] == b"\x1f\x8b"
    kind, got = sitemap.parse_sitemap(blob)
    assert kind == "sitemapindex"
    assert [e["loc"] for e in got] == locs
    assert all(e["priority"] is None for e in got)


def test_parse_text_form():
    kind, got = sitemap.parse_sitemap(
        b"https://a.example/1\n\n  https://a.example/2  \n"
    )
    assert kind == "text"
    assert [e["loc"] for e in got] == ["https://a.example/1", "https://a.example/2"]


def test_entries_without_loc_skipped_and_bad_xml_loud():
    raw = (
        b"<urlset><url><lastmod>2024-01-01</lastmod></url>"
        b"<url><loc>https://a.example/x</loc></url></urlset>"
    )
    kind, got = sitemap.parse_sitemap(raw)
    assert [e["loc"] for e in got] == ["https://a.example/x"]
    with pytest.raises(Exception):
        sitemap.parse_sitemap(b"<urlset><url></urlset>")  # mismatched tags
    with pytest.raises(ValueError, match="not a sitemap root"):
        sitemap.parse_sitemap(b"<html><body>nope</body></html>")


def test_malformed_priority_is_null_not_fatal():
    raw = (
        b"<urlset><url><loc>https://a.example/1</loc>"
        b"<priority>0,8</priority></url>"
        b"<url><loc>https://a.example/2</loc>"
        b"<priority>high</priority></url>"
        b"<url><loc>https://a.example/3</loc>"
        b"<priority>0.7</priority></url></urlset>"
    )
    kind, got = sitemap.parse_sitemap(raw)
    assert [e["priority"] for e in got] == [None, None, 0.7]


def test_parse_bom_prefixed_xml():
    blob = b"\xef\xbb\xbf" + sitemap.build_urlset(_entries(2))
    kind, got = sitemap.parse_sitemap(blob)
    assert kind == "urlset" and len(got) == 2


def test_sitemap_urls_from_robots():
    txt = (
        "User-agent: *\nDisallow: /tmp\n"
        "sitemap: https://a.example/sitemap.xml\n"
        "SITEMAP: https://a.example/s2.xml # comment\n"
        "Sitemap:\n"  # empty value skipped
    )
    assert sitemap.sitemap_urls_from_robots(txt) == [
        "https://a.example/sitemap.xml",
        "https://a.example/s2.xml",
    ]


def test_harvest_sitemaps_distributed(spark):
    rows = [
        ("https://a.example/sitemap.xml", sitemap.build_urlset(_entries(4))),
        (
            "https://b.example/sitemap_index.xml",
            sitemap.build_sitemapindex(
                ["https://b.example/s-0.xml", "https://b.example/s-1.xml"]
            ),
        ),
        ("https://c.example/urls.txt", b"https://c.example/only\n"),
    ]
    snaps = spark.createDataFrame(rows, "url string, body binary").repartition(3)
    got = sitemap.harvest_sitemaps(snaps).orderBy("sitemap_url", "order_in_map")
    out = got.collect()
    assert len(out) == 7
    a = [r for r in out if r["sitemap_url"].startswith("https://a")]
    assert [r["loc"] for r in a] == [f"https://s.example/p/{i}" for i in range(4)]
    assert [r["order_in_map"] for r in a] == [0, 1, 2, 3]
    idx = [r for r in out if r["kind"] == "sitemapindex"]
    assert [r["loc"] for r in idx] == [
        "https://b.example/s-0.xml",
        "https://b.example/s-1.xml",
    ]
    assert [r["kind"] for r in out].count("text") == 1


def test_lastmod_ts_forms(spark):
    df = spark.createDataFrame(
        [("2024-01-05",), ("2024-01-05T10:20:30",), ("2024-01-05T10:20:30+02:00",),
         ("garbage",), (None,)],
        "lastmod string",
    )
    got = df.select(sitemap.lastmod_ts("lastmod").alias("ts")).collect()
    assert got[0]["ts"] is not None and got[1]["ts"] is not None
    assert got[2]["ts"] is not None
    assert got[3]["ts"] is None and got[4]["ts"] is None


def test_seeds_from_entries_feeds_priority_scores(spark):
    ents = [
        {"loc": "https://a.example/hot", "lastmod": None, "changefreq": None,
         "priority": 0.9},
        # duplicate loc with lower priority — max wins
        {"loc": "https://a.example/hot", "lastmod": None, "changefreq": None,
         "priority": 0.2},
        {"loc": "https://a.example/default", "lastmod": None,
         "changefreq": None, "priority": None},
    ]
    snaps = spark.createDataFrame(
        [("https://a.example/sitemap.xml", sitemap.build_urlset(ents))],
        "url string, body binary",
    )
    seeds = sitemap.seeds_from_entries(sitemap.harvest_sitemaps(snaps))
    got = {r["url"]: r for r in seeds.collect()}
    assert got["https://a.example/hot"]["score"] == pytest.approx(0.9)
    assert got["https://a.example/default"]["score"] == pytest.approx(0.5)
    assert (
        got["https://a.example/hot"]["url_hash"]
        == urlops.url_hash("https://a.example/hot")
    )
    # shape matches engine.set_priority_scores' contract (url_hash, score)
    assert {"url", "url_hash", "score"} <= set(seeds.columns)
    # index child pointers are not seeds
    assert not any(u.endswith(".xml") for u in got)
