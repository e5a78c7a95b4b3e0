"""S7 search seeder tests: URL construction + SERP harvesting goldens
pinned to JSeeder.java semantics, plus a stub-HTTP end-to-end seed →
crawl flow (the live-network leg is the only environmental part)."""

from __future__ import annotations

import http.server
import threading
import urllib.parse

import pytest

from jcrawler_spark.operators import seeder


def test_serp_url_matches_reference_shape():
    # JSeeder.java:16-21: google + URLEncoder.encode(q, UTF-8) + &num=N&start=0
    u = seeder.serp_url("best coffee shops", 25)
    assert u == (
        "http://www.google.com/search?q=best+coffee+shops&num=25&start=0"
    )
    # URLEncoder semantics: '+' for space, UTF-8 percent-escapes otherwise
    u2 = seeder.serp_url("café & tea", 5)
    q = urllib.parse.urlparse(u2).query
    assert "q=caf%C3%A9+%26+tea" in q


SERP = """<html><body>
<a href="/url?q=https://shop1.example/&sa=U&ved=abc">Shop 1</a>
<a class="nav" href="/search?q=next&start=10">next page</a>
<a href='/url?q=http://shop2.example/path?x=1&sa=U'>Shop 2</a>
<a href="/url?q=ftp://not-http.example/&sa=U">skipped: not http(s)</a>
<a href="/url?q=https://tricky.example/a&sa=b&sa=U">greedy</a>
<a href="/imghp">images</a>
</body></html>"""


def test_extract_serp_links_golden():
    links = seeder.extract_serp_links(SERP)
    assert links == [
        "https://shop1.example/",
        "http://shop2.example/path?x=1",
        # Java's greedy (https?://.+)&sa captures through the FIRST &sa to
        # the LAST one in the href (JSeeder.java:26) — pinned verbatim
        "https://tricky.example/a&sa=b",
    ]


def test_extract_serp_links_empty_and_plain_pages():
    assert seeder.extract_serp_links("<html><body>no anchors</body></html>") == []
    assert seeder.extract_serp_links(
        '<a href="https://direct.example/">not a SERP redirect</a>'
    ) == []


class _SerpHandler(http.server.BaseHTTPRequestHandler):
    last_path = None
    last_ua = None

    def log_message(self, *a):
        pass

    def do_GET(self):
        _SerpHandler.last_path = self.path
        _SerpHandler.last_ua = self.headers.get("User-Agent", "")
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.end_headers()
        self.wfile.write(SERP.encode())


@pytest.fixture()
def serp_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _SerpHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/search?q="
    srv.shutdown()


def test_seed_from_search_end_to_end(serp_server):
    seeds = seeder.seed_from_search("coffee shops", count=3, base=serp_server)
    assert seeds[0] == "https://shop1.example/"
    assert len(seeds) == 3
    # request shape: encoded query, count, start=0, declared bot UA
    assert _SerpHandler.last_path.endswith("?q=coffee+shops&num=3&start=0")
    assert _SerpHandler.last_ua == "ExampleBot 1.0 (+http://example.com/bot)"


def test_seeds_feed_the_engine(spark, serp_server, tmp_path):
    # the harvested list is a valid engine seed list (S7 -> S5 handoff)
    from jcrawler_spark import corpus
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher

    seeds = seeder.seed_from_search("q", count=3, base=serp_server)
    pages = corpus.build_pages_df(spark, 20, 2).cache()
    eng = CrawlEngine(
        spark,
        CrawlConfig(max_docs=10, max_connections=None),
        SyntheticFetcher(pages),
        str(tmp_path / "st"),
    )
    eng.seed(seeds)
    st = eng.step()  # seeds fetch as 404s (not in corpus) without error
    assert st is not None and st.wave == len(seeds)
    pages.unpersist()


def test_serp_links_udf_bulk_harvest(spark):
    # Arrow surface over a SERP-snapshot table: same harvest as the pure
    # function, document order preserved, greedy-to-last-&sa semantics.
    from pyspark.sql import functions as F

    html = (
        '<a href="/url?q=https://a.example/p&sa=1&q=2&sa=Z">g</a>'
        "<a href='/url?q=http://b.example/&sa=D'>s</a>"
        '<a href="/skip">n</a>'
    )
    df = spark.createDataFrame([(1, html), (2, None)], "id int, html string")
    rows = (
        df.select("id", seeder.serp_links_udf(F.col("html")).alias("seeds"))
        .orderBy("id")
        .collect()
    )
    assert rows[0].seeds == [
        "https://a.example/p&sa=1&q=2",
        "http://b.example/",
    ]
    assert rows[1].seeds is None
