"""CLI parity (JCrawler.java:594-697) + production fetchers: HttpFetcher
against a local stub HTTP server, CachedFetcher links-memoization."""

from __future__ import annotations

import gzip
import http.server
import json
import os
import sys
import threading

import pytest
from pyspark.sql import functions as F

from jcrawler_spark import corpus
from jcrawler_spark.config import CrawlConfig
from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher
from jcrawler_spark.operators.fetch import (
    CachedFetcher,
    HttpFetcher,
    fetch_one,
    request_headers,
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, H = 80, 8
ACCEPTS = [f"host{i}.example" for i in range(H)]


# ---------------------------------------------------------------------------
# HttpFetcher vs a stub server (200 / 301 / 404 / gzip / connect-error)
# ---------------------------------------------------------------------------


class _StubHandler(http.server.BaseHTTPRequestHandler):
    # in-flight tracking for the concurrency tests (class-level, reset
    # by the tests that use it)
    _lock = threading.Lock()
    inflight = 0
    max_inflight = 0

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path.startswith("/slow"):
            import time as _t

            with _StubHandler._lock:
                _StubHandler.inflight += 1
                _StubHandler.max_inflight = max(
                    _StubHandler.max_inflight, _StubHandler.inflight
                )
            _t.sleep(0.5)
            with _StubHandler._lock:
                _StubHandler.inflight -= 1
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html>slow</html>")
        elif self.path == "/ok":
            body = b"<html><body><a href='/next'>n</a></body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/gz":
            body = gzip.compress(b"<html><body>zipped</body></html>")
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Encoding", "gzip")
            self.end_headers()
            self.wfile.write(body)
        elif self.path == "/moved":
            self.send_response(301)
            self.send_header("Location", "/ok")
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"moved")
        elif self.path == "/headers":
            ua = self.headers.get("User-Agent", "")
            self.send_response(200)
            self.send_header("Content-Type", "text/plain")
            self.end_headers()
            self.wfile.write(ua.encode())
        else:
            self.send_response(404)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"nope")


@pytest.fixture(scope="module")
def stub_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _StubHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_fetch_one_matches_reference_semantics(stub_server):
    ok = fetch_one(f"{stub_server}/ok", 5, 1 << 20)
    assert ok["status"] == 200 and b"/next" in ok["html"] and ok["error"] is None
    assert ok["content_type"].startswith("text/html")

    gz = fetch_one(f"{stub_server}/gz", 5, 1 << 20)
    assert gz["html"] == b"<html><body>zipped</body></html>"  # decoded

    # 3xx NOT followed; status + Location captured (HttpClient Redirect.NEVER)
    mv = fetch_one(f"{stub_server}/moved", 5, 1 << 20)
    assert mv["status"] == 301 and mv["location"] == "/ok"
    assert mv["error"] is None

    # 404 is a valid response, not an error row
    nf = fetch_one(f"{stub_server}/missing", 5, 1 << 20)
    assert nf["status"] == 404 and nf["error"] is None

    # connect failure → error row (reference failing-host semantics)
    err = fetch_one("http://127.0.0.1:9/never", 2, 1 << 20)
    assert err["status"] is None and err["error"].startswith("connect error")

    # the reference's browser headers are actually sent (minus excluded)
    hx = fetch_one(f"{stub_server}/headers", 5, 1 << 20)
    assert b"Chrome/130" in hx["html"]
    names = {n for n, _ in request_headers()}
    assert "User-Agent" in names and "Referer" not in names


def test_http_fetcher_row_shape_matches_synthetic(spark, stub_server):
    """HttpFetcher output columns/types are byte-identical in shape to
    SyntheticFetcher's (the engine contract)."""
    wave = spark.createDataFrame(
        [
            (f"{stub_server}/ok", "h", 0),
            (f"{stub_server}/moved", "h", 0),
            (f"{stub_server}/missing", "h", 0),
        ],
        ["url", "host", "depth"],
    )
    out = HttpFetcher(timeout_s=5).fetch(wave, approx_rows=3)
    rows = {r["url"].rsplit("/", 1)[1]: r for r in out.collect()}
    assert rows["ok"]["status"] == 200 and rows["ok"]["error"] is None
    assert rows["moved"]["status"] == 301 and rows["moved"]["location"] == "/ok"
    assert rows["missing"]["status"] == 404

    pages = corpus.build_pages_df(spark, 10, 2, partitions=2)
    syn = SyntheticFetcher(pages).fetch(
        wave.withColumn("url", F.lit(corpus.url_of(0, 2))), approx_rows=3
    )
    # same column set and per-column types (order is join-shape dependent;
    # the engine selects by name)
    http_cols = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    syn_cols = {f.name: f.dataType.simpleString() for f in syn.schema.fields}
    assert http_cols == syn_cols


def test_http_fetcher_concurrent_within_batch(spark, stub_server):
    """N slow URLs in ONE Arrow batch complete in ~1 slow-URL time when the
    per-host cap allows it (VERDICT r2 #2: the reference's token pool is
    concurrent, JCrawler.java:868,892-897 — serial Σ-latency is wrong)."""
    import time

    n = 8
    wave = spark.createDataFrame(
        [(f"{stub_server}/slow/{i}", "127.0.0.1", 0) for i in range(n)],
        ["url", "host", "depth"],
    ).coalesce(1)
    _StubHandler.max_inflight = 0
    t0 = time.monotonic()
    out = HttpFetcher(timeout_s=10, max_connections=n).fetch(
        wave, approx_rows=n
    )
    rows = out.collect()
    elapsed = time.monotonic() - t0
    assert len(rows) == n and all(r["status"] == 200 for r in rows)
    # serial would be n*0.5 = 4.0s; concurrent ≈ 0.5s + overhead
    assert elapsed < 2.5, f"batch fetch not concurrent: {elapsed:.2f}s"
    assert _StubHandler.max_inflight > 1


def test_http_fetcher_per_host_cap_honored(spark, stub_server):
    """max_connections bounds in-flight requests per host even when the
    pool has spare threads (politeness cap, reference token semantics)."""
    n, cap = 6, 2
    wave = spark.createDataFrame(
        [(f"{stub_server}/slow/{i}", "127.0.0.1", 0) for i in range(n)],
        ["url", "host", "depth"],
    ).coalesce(1)
    _StubHandler.max_inflight = 0
    out = HttpFetcher(timeout_s=10, max_connections=cap, pool_size=16).fetch(
        wave, approx_rows=n
    )
    rows = out.collect()
    assert len(rows) == n and all(r["status"] == 200 for r in rows)
    assert _StubHandler.max_inflight <= cap, (
        f"per-host cap violated: {_StubHandler.max_inflight} > {cap}"
    )


# ---------------------------------------------------------------------------
# CachedFetcher: links memoization + recompute_links
# ---------------------------------------------------------------------------


def test_cached_fetcher_memoized_links_no_refetch(spark, tmp_path):
    pages = corpus.build_pages_df(spark, N, H, partitions=4).cache()
    cfg = CrawlConfig(accept=ACCEPTS, max_docs=200, max_connections=None)
    eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages), str(tmp_path / "a"))
    eng.run(seeds=[corpus.url_of(0, H)], max_supersteps=20)
    cache = eng.store.read("pages")
    # every fetched page carries its memoized links array
    assert "links" in cache.columns
    n_with_links = cache.where(
        ~F.col("skipped") & F.col("error").isNull() & (F.col("status") == 200)
        & (F.size("links") > 0)
    ).count()
    assert n_with_links > 10

    # second crawl: cache-only (inner=None marks any miss as an error row)
    # must reproduce the exact emission with ZERO misses — no refetch, and
    # no re-extraction input (cache hits have html=NULL; links come from
    # the memoized column)
    eng2 = CrawlEngine(
        spark, cfg, CachedFetcher(cache, inner=None), str(tmp_path / "b")
    )
    eng2.run(seeds=[corpus.url_of(0, H)], max_supersteps=20)
    assert eng2.emitted_urls() == eng.emitted_urls()
    assert (
        eng2.store.read("pages").where(F.col("error").isNotNull()).count() == 0
    ), "a cache miss reached the offline path"

    # recompute_links ignores the memoized column: with html=NULL cache rows
    # extraction yields nothing, so the crawl stops after the seed wave —
    # pinning that the memoized column really is what fed crawl B
    cfg3 = CrawlConfig(
        accept=ACCEPTS, max_docs=200, max_connections=None, recompute_links=True
    )
    eng3 = CrawlEngine(
        spark, cfg3, CachedFetcher(cache, inner=None), str(tmp_path / "c")
    )
    eng3.run(seeds=[corpus.url_of(0, H)], max_supersteps=5)
    assert eng3.emitted_count < eng.emitted_count
    pages.unpersist()


# ---------------------------------------------------------------------------
# CLI (main.py): flags reach the engine; result sink has reference fields
# ---------------------------------------------------------------------------


def test_cli_end_to_end(spark, tmp_path, capsys):
    import main as cli

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state,
            "--maxDocs", "60",
            "--maxConnections", "0",
            "--max-supersteps", "12",
        ],
        stop_session=False,  # the pytest session owns the SparkSession
    )
    assert rc == 0
    out = capsys.readouterr().out
    # reference suggestion block (JCrawler.java:672-684)
    assert "Suggestion: The following external domains were encountered:" in out
    # external links exist on pages i%10==7, i.e. i mod 5 == 2 → external2
    assert "--accept external2.example" in out
    # result sink (.crawl-result.yaml analogue, JCrawler.java:686-694)
    with open(os.path.join(state, ".crawl-result.json")) as f:
        res = json.load(f)
    assert set(res) == {"config", "ignoredExternalDomains", "stats"}
    assert res["stats"]["totalLinks"] > 0
    assert res["config"]["max_docs"] == 60
    assert res["ignoredExternalDomains"]
    # YAML twin (reference parity, JCrawler.java:686-694): same content
    import yaml

    with open(os.path.join(state, ".crawl-result.yaml")) as f:
        assert yaml.safe_load(f) == res


def test_cli_postorder_and_expire_reachable():
    import main as cli

    p = cli.build_parser()
    a = p.parse_args(["u", "--traversal", "DEPTH_FIRST_POSTORDER",
                      "--expire", "3600", "--recomputeLinks", "--http"])
    assert a.traversal == "DEPTH_FIRST_POSTORDER"
    assert a.expire == 3600 and a.recomputeLinks and a.http


def test_link_graph_from_memoized_pages(spark, tmp_path):
    """Offline re-analysis: the edge list rebuilt from the memoized links
    column equals re-extraction from the raw corpus html."""
    from jcrawler_spark.operators import extract, graph

    pages_src = corpus.build_pages_df(spark, N, H, partitions=4).cache()
    cfg = CrawlConfig(accept=ACCEPTS, max_docs=200, max_connections=None)
    eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages_src), str(tmp_path / "g"))
    eng.run(seeds=[corpus.url_of(0, H)], max_supersteps=20)
    edges = graph.link_graph_from_pages(eng.store.read("pages"))

    crawled_urls = {
        r["src_url"] for r in edges.select("src_url").distinct().collect()
    }
    reex = (
        pages_src.where(F.col("url").isin(list(crawled_urls)))
        .select(
            F.col("url").alias("src_url"),
            F.explode(
                extract.extract_links_dedup_udf(
                    "html", "url", "status", "content_type", "location"
                )
            ).alias("l"),
        )
        .select("src_url", F.col("l.url").alias("dst_url"))
    )
    a = {(r["src_url"], r["dst_url"]) for r in edges.select("src_url", "dst_url").collect()}
    b = {(r["src_url"], r["dst_url"]) for r in reex.collect()}
    assert a == b and len(a) > 50
    pages_src.unpersist()


def test_cli_priority_scores_flag(spark, tmp_path):
    """--priority-scores wires a (url_hash, score) parquet into
    engine.set_priority_scores: the scored URL is fetched first after the
    seed (wave_budget via --maxConnections 1)."""
    import main as cli

    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.functions import urlops
    from jcrawler_spark.plans.tableio import SnapshotStore

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)

    # baseline FIFO order to pick a late depth-1 target
    st0 = str(tmp_path / "st0")
    eng0 = CrawlEngine(
        spark,
        CrawlConfig(
            accept=[f"host{i}.example" for i in range(H)],
            max_docs=10,
            max_connections=1,
        ),
        SyntheticFetcher(spark.read.parquet(corpus_path)),
        st0,
    )
    eng0.run(seeds=[corpus.url_of(0, H)], max_supersteps=12)
    base_order = eng0.emitted_urls()
    assert len(base_order) >= 4
    target = base_order[3]  # fetched 4th by default

    scores_path = str(tmp_path / "scores")
    spark.createDataFrame(
        [(urlops.url_hash(target), 99.0)], "url_hash string, score double"
    ).write.parquet(scores_path)

    state = str(tmp_path / "state_prio")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state,
            "--maxDocs", "10",
            "--maxConnections", "1",
            "--max-supersteps", "12",
            "--priority-scores", scores_path,
        ],
        stop_session=False,
    )
    assert rc == 0
    # mirror engine.emitted()'s BFS ordering: (superstep, order_key)
    pages = SnapshotStore(state, spark).read("pages")
    emitted = [
        r.url
        for r in pages.orderBy("superstep", "order_key").select("url").collect()
    ]
    assert emitted[0] == base_order[0]
    assert emitted[1] == target


def test_cli_warc_replay_matches_corpus(spark, tmp_path):
    """--warc DIR: a crawl replayed from an archive emits the identical
    URL set + order as the same crawl over the parquet corpus."""
    import main as cli

    from jcrawler_spark.plans.tableio import SnapshotStore
    from jcrawler_spark.sources import warc as warc_mod

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    archive = str(tmp_path / "archive")
    warc_mod.write_warc_files(
        spark.read.parquet(corpus_path).repartition(3), archive
    ).collect()

    def run(extra, state):
        rc = cli.main(
            [
                corpus.url_of(0, H),
                *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
                *extra,
                "--state", state,
                "--maxDocs", "30",
                "--maxConnections", "0",
                "--max-supersteps", "12",
            ],
            stop_session=False,
        )
        assert rc == 0
        pages = SnapshotStore(state, spark).read("pages")
        return [
            r.url
            for r in pages.orderBy("superstep", "order_key")
            .select("url").collect()
        ]

    base = run(["--corpus", corpus_path], str(tmp_path / "st-corpus"))
    replay = run(["--warc", archive], str(tmp_path / "st-warc"))
    assert base == replay and len(base) == 30


def test_cli_export_warc_roundtrip(spark, tmp_path, capsys):
    """--export-warc DIR archives exactly the fetched pages; a replay
    crawl from the export emits the identical URL sequence, and archived
    bodies are byte-identical to the corpus html."""
    import main as cli

    from jcrawler_spark.plans.tableio import SnapshotStore
    from jcrawler_spark.sources import warc as warc_mod

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)

    def run(extra, state):
        rc = cli.main(
            [
                corpus.url_of(0, H),
                *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
                *extra,
                "--state", state,
                "--maxDocs", "25",
                "--maxConnections", "0",
                "--max-supersteps", "10",
            ],
            stop_session=False,
        )
        assert rc == 0
        pages = SnapshotStore(state, spark).read("pages")
        return [
            r.url
            for r in pages.orderBy("superstep", "order_key")
            .select("url").collect()
        ]

    export = str(tmp_path / "export")
    index = str(tmp_path / "index")
    base = run(
        ["--corpus", corpus_path, "--export-warc", export,
         "--cdx-index", index],
        str(tmp_path / "st-orig"),
    )
    out_text = capsys.readouterr().out
    assert "archived " in out_text and "indexed " in out_text

    # the ZipNum index replays any crawled URL without a Spark job
    from jcrawler_spark.functions.urlops import surt
    from jcrawler_spark.sources import cdx as cdx_mod

    zn = cdx_mod.ZipNumIndex(index)
    recs = zn.fetch(export, surt(base[0]))
    assert recs and recs[0]["url"] == base[0]

    # archived bodies == corpus bodies for every archived 200 URL
    arch = warc_mod.to_pages(warc_mod.read_warc(spark, export))
    mismatched = (
        arch.where(F.col("status") == 200)
        .alias("a")
        .join(
            spark.read.parquet(corpus_path).alias("c"),
            F.col("a.url") == F.col("c.url"),
        )
        .where(F.col("a.html") != F.col("c.html"))
        .count()
    )
    assert mismatched == 0
    assert set(r.url for r in arch.select("url").collect()) == set(base)

    replay = run(["--warc", export], str(tmp_path / "st-replay"))
    assert replay == base and len(base) == 25


def test_cli_export_warc_requires_bodies_source(tmp_path, capsys):
    """--export-warc with --http is refused up front: the state store is
    html-free, so there is nothing to archive."""
    import main as cli

    rc = cli.main(
        [
            "https://host0.example/p/0/0",
            "--http",
            "--export-warc", str(tmp_path / "exp"),
            "--state", str(tmp_path / "st"),
        ],
        stop_session=False,
    )
    assert rc == 2
    assert "bodies source" in capsys.readouterr().err


def test_cli_seed_sitemaps(spark, tmp_path, capsys):
    """--seed-sitemaps DIR: <loc> entries become extra seeds and
    <priority> orders the first waves (highest authority first)."""
    import main as cli

    from jcrawler_spark.operators import sitemap as sitemap_mod
    from jcrawler_spark.plans.tableio import SnapshotStore

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    # two sitemap seeds with opposite priorities; neither is the
    # positional seed
    hot, cold = corpus.url_of(5, H), corpus.url_of(6, H)
    smdir = tmp_path / "sitemaps"
    smdir.mkdir()
    (smdir / "sitemap.xml").write_bytes(
        sitemap_mod.build_urlset(
            [
                {"loc": cold, "priority": 0.2},
                {"loc": hot, "priority": 0.9},
            ]
        )
    )
    state = str(tmp_path / "st-sm")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--seed-sitemaps", str(smdir),
            "--state", state,
            "--maxDocs", "20",
            "--maxConnections", "1",
            "--max-supersteps", "25",
        ],
        stop_session=False,
    )
    assert rc == 0
    assert "seeded 2 URLs from sitemaps" in capsys.readouterr().out
    pages = SnapshotStore(state, spark).read("pages")
    emitted = [
        r.url
        for r in pages.orderBy("superstep", "order_key").select("url").collect()
    ]
    # all three seeds crawled; the high-priority sitemap seed beats the
    # low-priority one in the schedule (wave budget 1)
    assert {corpus.url_of(0, H), hot, cold} <= set(emitted)
    assert emitted.index(hot) < emitted.index(cold)


def test_cli_cdx_index_requires_export(tmp_path, capsys):
    import main as cli

    rc = cli.main(
        [
            "https://host0.example/p/0/0",
            "--corpus", str(tmp_path / "nope"),
            "--cdx-index", str(tmp_path / "idx"),
            "--state", str(tmp_path / "st"),
        ],
        stop_session=False,
    )
    assert rc == 2
    assert "--export-warc" in capsys.readouterr().err


def test_cli_analyze_end_to_end(spark, tmp_path, capsys):
    """VERDICT r4 #6: crawl → `analyze` (near-dup dedup + quality/lang
    filters + PageRank export) → filtered corpus parquet, then a second
    crawl consumes the exported scores via --priority-scores."""
    import main as cli

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state,
            "--maxDocs", "80",
            "--maxConnections", "0",
            "--max-supersteps", "12",
        ],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()

    out_dir = str(tmp_path / "filtered")
    pr_path = str(tmp_path / "pagerank")
    rc = cli.main(
        [
            "analyze",
            "--state", state,
            "--corpus", corpus_path,
            "--out", out_dir,
            "--min-quality", "0.0",
            "--lang", "en,ro,unknown",
            "--export-pagerank", pr_path,
        ],
        stop_session=False,
    )
    assert rc == 0
    import json as _json

    counts = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts["crawled_docs"] > 0
    assert 0 < counts["kept"] <= counts["after_filters"] <= counts["crawled_docs"]

    kept = spark.read.parquet(out_dir)
    assert set(kept.columns) == {"url", "url_hash", "text"}
    # keepers are unique per url and all genuinely crawled
    assert kept.count() == kept.select("url").distinct().count()

    scores = spark.read.parquet(pr_path)
    assert set(scores.columns) == {"url_hash", "score"}
    assert counts["pagerank_rows"] == scores.count() > 0

    # --priority-scores round trip: the exported parquet drives scheduling
    state2 = str(tmp_path / "state2")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state2,
            "--maxDocs", "20",
            "--maxConnections", "1",
            "--max-supersteps", "25",
            "--priority-scores", pr_path,
        ],
        stop_session=False,
    )
    assert rc == 0


def test_cli_analyze_gopher_paragraph_pii_flags(spark, tmp_path, capsys):
    """Round-5 analyze flags: --gopher is a (possibly empty) subset filter;
    --dedup-paragraphs makes every non-empty line globally unique across
    the output corpus (the CCNet invariant); --scrub-pii leaves no
    email/phone match in any output text."""
    import re as _re

    import main as cli
    from jcrawler_spark.functions import textops

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state,
            "--maxDocs", "40",
            "--maxConnections", "0",
            "--max-supersteps", "8",
        ],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()

    out1 = str(tmp_path / "clean")
    rc = cli.main(
        [
            "analyze", "--state", state, "--corpus", corpus_path,
            "--out", out1, "--no-dedup",
            "--dedup-paragraphs", "--scrub-pii",
        ],
        stop_session=False,
    )
    assert rc == 0
    counts1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    texts = [r["text"] for r in spark.read.parquet(out1).collect()]
    assert counts1["kept"] == len(texts) > 0
    lines = [l for t in texts for l in t.split("\n") if l.strip()]
    assert len(lines) == len(set(lines))  # CCNet global-uniqueness invariant
    for t in texts:
        assert not _re.search(textops.EMAIL_PATTERN, t)
        assert not _re.search(textops.PHONE_PATTERN, t)

    out2 = str(tmp_path / "gopher")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", out2, "--no-dedup", "--gopher"],
        stop_session=False,
    )
    assert rc == 0
    counts2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert counts2["after_filters"] <= counts2["crawled_docs"]
    # every survivor really clears the pure-twin rule set
    kept2 = spark.read.parquet(out2)
    assert counts2["kept"] == kept2.count()
    for r in kept2.collect():
        assert textops.gopher_pass(r["text"])


def test_cli_analyze_sampling_flags(spark, tmp_path, capsys):
    """--sample-rate deterministically downsamples (same command twice ->
    identical output set); --cap-per-lang bounds the expected per-language
    count; both leave only rows that existed in the unsampled output."""
    import main as cli

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state,
            "--maxDocs", "40",
            "--maxConnections", "0",
            "--max-supersteps", "8",
        ],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()

    full = str(tmp_path / "full")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", full, "--no-dedup"],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    full_urls = {r["url"] for r in spark.read.parquet(full).collect()}

    outs = []
    for name in ("s1", "s2"):
        out = str(tmp_path / name)
        rc = cli.main(
            ["analyze", "--state", state, "--corpus", corpus_path,
             "--out", out, "--no-dedup", "--sample-rate", "0.5"],
            stop_session=False,
        )
        assert rc == 0
        capsys.readouterr()
        outs.append({r["url"] for r in spark.read.parquet(out).collect()})
    assert outs[0] == outs[1], "sampling must be rerun-deterministic"
    assert outs[0] < full_urls  # strict subset at rate 0.5
    assert len(outs[0]) > 0

    capped = str(tmp_path / "capped")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", capped, "--no-dedup", "--cap-per-lang", "5"],
        stop_session=False,
    )
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    kept = spark.read.parquet(capped)
    assert counts["kept"] == kept.count() > 0
    assert {r["url"] for r in kept.collect()} <= full_urls


def test_cli_analyze_gopher_full_flag(spark, tmp_path, capsys):
    """--gopher-full applies the complete Table-A1 rule set: output is a
    subset of --gopher's, and every survivor clears the pure full
    composite."""
    import main as cli
    from jcrawler_spark.functions import textops

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path, "--state", state,
            "--maxDocs", "30", "--maxConnections", "0",
            "--max-supersteps", "6",
        ],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()

    base = str(tmp_path / "g")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", base, "--no-dedup", "--gopher"],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    base_urls = {r["url"] for r in spark.read.parquet(base).collect()}

    full = str(tmp_path / "gf")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", full, "--no-dedup", "--gopher-full"],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    rows = spark.read.parquet(full).collect()
    assert {r["url"] for r in rows} <= base_urls
    for r in rows:
        assert textops.gopher_full_pass(r["text"])


def test_cli_analyze_ccnet_decontaminate_c4_hoststats(spark, tmp_path, capsys):
    """Round-5 second batch of analyze flags: --ccnet-buckets partitions the
    corpus into terciles (union of all three == unfiltered set, a single
    bucket is a proper subset); --decontaminate drops exactly the docs
    sharing a word 8-gram with the benchmark parquet; --c4 survivors carry
    only lines satisfying the C4 line rules; --export-host-stats writes the
    per-host roll-up; --max-cross-dup 1.0 is a no-op."""
    import main as cli
    from jcrawler_spark.functions import c4 as c4_fns

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state,
            "--maxDocs", "40",
            "--maxConnections", "0",
            "--max-supersteps", "8",
        ],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()

    full = str(tmp_path / "full")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", full, "--no-dedup"],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    full_rows = spark.read.parquet(full).collect()
    full_urls = {r["url"] for r in full_rows}
    assert len(full_urls) > 3

    # union of the three buckets (+ a no-op cross-dup cap + host stats)
    allb = str(tmp_path / "allb")
    hs_path = str(tmp_path / "hs")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", allb, "--no-dedup",
         "--ccnet-buckets", "head,middle,tail",
         "--max-cross-dup", "1.0",
         "--export-host-stats", hs_path],
        stop_session=False,
    )
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["url"] for r in spark.read.parquet(allb).collect()} == full_urls
    hs = spark.read.parquet(hs_path)
    assert set(hs.columns) == {
        "source", "n_docs", "total_tokens", "avg_quality", "en_frac"
    }
    assert counts["host_stats_rows"] == hs.count() > 0
    assert sum(r["n_docs"] for r in hs.collect()) == len(full_urls)

    # a single bucket is a proper, non-empty subset
    headb = str(tmp_path / "headb")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", headb, "--no-dedup", "--ccnet-buckets", "head"],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    head_urls = {r["url"] for r in spark.read.parquet(headb).collect()}
    assert 0 < len(head_urls) < len(full_urls)
    assert head_urls < full_urls

    # unknown bucket name is a hard CLI error
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", str(tmp_path / "x"), "--no-dedup",
         "--ccnet-buckets", "head,bogus"],
        stop_session=False,
    )
    assert rc == 2
    capsys.readouterr()

    # decontaminate against one crawled doc's text: that doc must drop
    victim = max(full_rows, key=lambda r: len(r["text"].split()))
    assert len(victim["text"].split()) >= 8
    bench_path = str(tmp_path / "bench")
    spark.createDataFrame(
        [(victim["text"],)], "text string"
    ).write.parquet(bench_path)
    decon = str(tmp_path / "decon")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", decon, "--no-dedup", "--decontaminate", bench_path],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    decon_urls = {r["url"] for r in spark.read.parquet(decon).collect()}
    assert victim["url"] not in decon_urls
    assert decon_urls < full_urls
    assert len(decon_urls) > 0

    # C4: every surviving line obeys the line rules (gate may keep 0 docs)
    c4out = str(tmp_path / "c4out")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", c4out, "--no-dedup", "--c4"],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    for r in spark.read.parquet(c4out).collect():
        assert r["url"] in full_urls
        for line in r["text"].split("\n"):
            assert c4_fns.line_kept(line)


def test_cli_search_and_host_graph_export(spark, tmp_path, capsys):
    """`search` subcommand: BM25 top-k over an analyze-style corpus parquet
    (ranked, k-bounded, term-normalized); analyze --export-host-graph
    writes the domain-level roll-up rebuilt from memoized links."""
    import main as cli

    # search over a hand-made corpus: no crawl needed
    corpus_pq = str(tmp_path / "docs")
    spark.createDataFrame(
        [
            ("https://a.example/1", "spark table scan fast table table"),
            ("https://a.example/2", "table merge join"),
            ("https://b.example/3", "nothing relevant here"),
        ],
        "url string, text string",
    ).write.parquet(corpus_pq)
    rc = cli.main(
        ["search", "--corpus", corpus_pq, "--terms", "Table,merge", "-k", "2"],
        stop_session=False,
    )
    assert rc == 0
    hits = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(hits) == 2
    assert hits[0]["score"] >= hits[1]["score"] > 0
    assert {h["url"] for h in hits} <= {
        "https://a.example/1", "https://a.example/2"
    }
    # empty terms is a hard error
    assert cli.main(
        ["search", "--corpus", corpus_pq, "--terms", " , "],
        stop_session=False,
    ) == 2
    capsys.readouterr()

    # host-graph export off a real crawl state
    pages_path = str(tmp_path / "pages")
    corpus.write_pages(spark, pages_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", pages_path,
            "--state", state,
            "--maxDocs", "30",
            "--maxConnections", "0",
            "--max-supersteps", "6",
        ],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    hg_path = str(tmp_path / "hg")
    out = str(tmp_path / "flt")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", pages_path,
         "--out", out, "--no-dedup", "--export-host-graph", hg_path],
        stop_session=False,
    )
    assert rc == 0
    counts = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    hg = spark.read.parquet(hg_path)
    assert set(hg.columns) == {
        "src_host", "dst_host", "n_links", "n_src_pages"
    }
    assert counts["host_graph_rows"] == hg.count() > 0
    for r in hg.collect():
        assert r["n_links"] >= r["n_src_pages"] >= 1
        assert r["src_host"].startswith("host")


def test_cli_analyze_remove_dup_spans(spark, tmp_path, capsys):
    """--remove-dup-spans leaves a corpus with no word-10-gram occurring
    more than once (the Lee et al. post-condition), while the unfiltered
    run keeps the synthetic corpus's repeated template spans."""
    import main as cli
    from jcrawler_spark.operators import quality as quality_ops

    corpus_path = str(tmp_path / "corpus")
    corpus.write_pages(spark, corpus_path, N, H, partitions=4)
    state = str(tmp_path / "state")
    rc = cli.main(
        [
            corpus.url_of(0, H),
            *[x for i in range(H) for x in ("--accept", f"host{i}.example")],
            "--corpus", corpus_path,
            "--state", state,
            "--maxDocs", "30",
            "--maxConnections", "0",
            "--max-supersteps", "6",
        ],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    out = str(tmp_path / "cut")
    rc = cli.main(
        ["analyze", "--state", state, "--corpus", corpus_path,
         "--out", out, "--no-dedup", "--remove-dup-spans"],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()
    cleaned = spark.read.parquet(out)
    assert cleaned.count() > 0
    # post-condition: zero cross-document duplicated 10-gram starts remain
    post = quality_ops.cross_dup_ngram_stats(
        cleaned, n=10, id_col="url", text_col="text"
    )
    assert post.agg(F.sum(F.col("dup_frac"))).collect()[0][0] == 0.0
