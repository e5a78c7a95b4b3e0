"""Synthetic corpus generator tests (FIXTURES.md §1/§3): determinism, graph
shape, status mix, host skew, and the byte-identical text invariant."""

from __future__ import annotations

from jcrawler_spark import corpus
from jcrawler_spark.functions import textops
from jcrawler_spark.operators import extract


def test_depth_of_tree():
    assert corpus.depth_of(0) == 0
    assert [corpus.depth_of(i) for i in (1, 2, 3)] == [1, 1, 1]
    assert [corpus.depth_of(i) for i in (4, 12)] == [2, 2]
    assert corpus.depth_of(13) == 3


def test_host_skew_megahost():
    hosts = [corpus.host_of(i, 8) for i in range(10_000)]
    frac0 = hosts.count(0) / len(hosts)
    assert 0.25 < frac0 < 0.35  # host 0 ≈ 30%
    assert set(hosts) <= set(range(8))


def test_record_determinism_and_invariant():
    a = corpus.page_record(5, 1000, 8)
    b = corpus.page_record(5, 1000, 8)
    assert a == b
    # the input_hint invariant by construction: text == extract_text(html)
    assert a["text"] == textops.extract_text(a["html"].decode("utf-8"))


def test_status_mix():
    pages = corpus.local_pages(1000, 8)
    statuses = [p["status"] for p in pages]
    assert statuses.count(301) == 20  # 2%
    assert statuses.count(404) == 10  # 1%
    for p in pages:
        if p["status"] == 301:
            assert p["location"] is not None


def test_children_links_extractable():
    pages = corpus.local_pages(100, 8)
    p0 = pages[0]
    links = extract.extract_links_py(p0["html"].decode("utf-8"), p0["url"])
    urls = [l["url"] for l in links]
    for c in corpus.child_ids(0, 100):
        assert corpus.url_of(c, 8) in urls


def test_self_and_external_links_present():
    pages = corpus.local_pages(100, 8)
    p50 = pages[50]
    links = extract.extract_links_py(p50["html"].decode("utf-8"), p50["url"])
    assert p50["url"] in [l["url"] for l in links]  # self-link emitted
    p17 = pages[17]
    links17 = extract.extract_links_py(p17["html"].decode("utf-8"), p17["url"])
    assert any("external" in l["url"] for l in links17)


def test_spark_build_matches_local(spark):
    n = 64
    df = corpus.build_pages_df(spark, n, 8, partitions=4)
    got = {r["url"]: r for r in df.collect()}
    exp = corpus.local_pages(n, 8)
    assert len(got) == n
    for e in exp:
        g = got[e["url"]]
        assert bytes(g["html"]) == e["html"]
        assert g["text"] == e["text"]
        assert g["status"] == e["status"]
        assert g["url_hash"] == e["url_hash"]


def test_pagerank_matches_numpy_power_iteration(spark):
    # operators/graph.pagerank == the same recurrence in dense numpy:
    # r' = (1-d)/N + d*(M r + dangling/N), parallel edges count separately.
    import numpy as np

    from jcrawler_spark.operators import graph

    n = 12
    edges_py = [(i, (i * 3 + 1) % n) for i in range(n) if i % 4 != 3]
    edges_py += [(0, 5), (0, 5), (7, 2)]  # parallel edge: counts twice
    edges = spark.createDataFrame(edges_py, "src long, dst long")
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    got = {
        r.doc_id: r.rank
        for r in graph.pagerank(edges, nodes, n_iter=10, damping=0.85).collect()
    }

    M = np.zeros((n, n))
    outd = np.zeros(n)
    for s, _ in edges_py:
        outd[s] += 1
    for s, d in edges_py:
        M[d, s] += 1.0 / outd[s]
    r = np.full(n, 1.0 / n)
    for _ in range(10):
        dangling = r[outd == 0].sum()
        r = (1 - 0.85) / n + 0.85 * (M @ r + dangling / n)
    for i in range(n):
        assert abs(got[i] - r[i]) < 1e-12, (i, got[i], r[i])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
