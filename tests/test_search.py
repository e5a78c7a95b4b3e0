"""BM25 search (operators/search.py) + host-graph roll-up
(operators/graph.host_graph). Exact portability is covered by the
`bm25_search` / `host_graph` oracles; these pin the scoring math against
a hand model, the ranking/limit contract, and the plan shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from jcrawler_spark.operators import graph, search


def _docs(spark):
    rows = [
        (0, "spark table scan fast table table"),
        (1, "table merge join"),
        (2, "scan scan scan scan"),
        (3, "nothing relevant here at all"),
        (4, "table"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hand_bm25(rows, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in rows}
    n = len(rows)
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for term in terms:
        df = sum(1 for v in toks.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for i, v in toks.items():
            tf = v.count(term)
            if tf == 0:
                continue
            dl = len(v)
            scores[i] = scores.get(i, 0.0) + (
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
            )
    return scores


def test_bm25_matches_hand_model(spark):
    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    want = _hand_bm25(rows, ["table", "scan"])
    got = {
        r["doc_id"]: r["score"]
        for r in search.bm25_topk(_docs(spark), ["table", "scan"], k=10).collect()
    }
    assert set(got) == set(want)  # doc 3 (no hit) absent
    for i, s in want.items():
        assert math.isclose(got[i], s, rel_tol=1e-12)


def test_bm25_ranking_and_limit(spark):
    out = search.bm25_topk(_docs(spark), ["table"], k=2).collect()
    assert len(out) == 2
    assert out[0]["score"] >= out[1]["score"]
    # doc 4 ("table", dl=1) wins: BM25 length normalization beats raw tf
    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    want = _hand_bm25(rows, ["table"])
    best = max(want, key=lambda i: (want[i], -i))
    assert out[0]["doc_id"] == best == 4


def test_bm25_empty_terms_raises(spark):
    with pytest.raises(ValueError):
        search.bm25_topk(_docs(spark), [])


def test_bm25_plan_filters_before_shuffle_and_takeordered(spark):
    plan = (
        search.bm25_topk(_docs(spark), ["table"], k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan  # no global sort
    # both stats/df joins are broadcast — the corpus never shuffles for them
    assert "SortMergeJoin" not in plan


def test_host_graph_rollup(spark):
    edges = spark.createDataFrame(
        [
            (1, "a.com", "b.com"),
            (2, "a.com", "b.com"),
            (1, "a.com", "b.com"),  # same page links twice
            (3, "b.com", "a.com"),
        ],
        "src long, src_host string, dst_host string",
    )
    out = {
        (r["src_host"], r["dst_host"]): r
        for r in graph.host_graph(edges, src_id_col="src").collect()
    }
    assert out[("a.com", "b.com")]["n_links"] == 3
    assert out[("a.com", "b.com")]["n_src_pages"] == 2
    assert out[("b.com", "a.com")]["n_links"] == 1
    # one-shuffle form without the distinct
    slim = graph.host_graph(edges).columns
    assert slim == ["src_host", "dst_host", "n_links"]


def test_host_graph_feeds_pagerank(spark):
    edges = spark.createDataFrame(
        [(1, "a", "b"), (2, "a", "b"), (3, "b", "a"), (4, "b", "c")],
        "src long, src_host string, dst_host string",
    )
    hg = graph.host_graph(edges)
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], ["doc_id"])
    e = hg.select(
        F.xxhash64("src_host").alias("src"), F.xxhash64("dst_host").alias("dst")
    )
    pr = graph.pagerank(
        e, nodes.select(F.xxhash64("doc_id").alias("doc_id")), n_iter=5
    )
    ranks = [r["rank"] for r in pr.collect()]
    assert len(ranks) == 3
    assert abs(sum(ranks) - 1.0) < 1e-6
