"""Batch-iterative graph primitives used by the crawl engine's traversal
semantics (SURVEY.md §2.4 T1) expressed as standalone operators.

`bfs_min_depth` is the wave loop distilled: frontier expansion with
min-depth dedup per superstep — exactly the shape the crawl scheduler runs,
minus fetch/extract. Joins shuffle on the node id; the visited set stays a
DataFrame (no driver collect), so the loop scales with executors. AQE
handles skewed hubs; the loop is depth-synchronous (one Spark job per
level, not per node)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_min_depth(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 30,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "doc_id",
) -> DataFrame:
    """Minimum BFS depth of every node reachable from `sources`.

    edges: (src, dst); sources: (id_col). Returns (id_col, depth) with
    depth = length of the shortest path. Each superstep: join the frontier
    to edges, anti-join the visited set, advance."""
    visited = sources.select(
        F.col(id_col).cast("long").alias("id"), F.lit(0).cast("long").alias("depth")
    ).persist()
    frontier = visited
    depth = 0
    while depth < max_depth:
        depth += 1
        nxt = (
            frontier.join(edges, frontier["id"] == edges[src_col])
            .select(F.col(dst_col).cast("long").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("depth", F.lit(depth).cast("long"))
            .persist()
        )
        if nxt.isEmpty():
            nxt.unpersist()
            break
        new_visited = visited.unionByName(nxt).persist()
        # cut the growing lineage chain: localCheckpoint keeps the loop's
        # plan O(1) per superstep instead of O(depth)
        new_visited = new_visited.localCheckpoint(eager=True)
        visited.unpersist()
        frontier = nxt
        visited = new_visited
    return visited.select(F.col("id").alias(id_col), "depth")


def link_graph_from_pages(pages: DataFrame) -> DataFrame:
    """Offline re-analysis over the MEMOIZED links column (S11,
    JCrawler.java:1379-1398): rebuild the crawl's edge list
    (src_url, dst_url, is_resource, is_redirect, order_in_page) straight
    from a committed pages table — no html, no re-extraction, one explode.
    Feeds bfs_min_depth (joined through url_hash ids) or any link-analysis
    pass; with config.recompute_links the caller re-extracts instead."""
    return (
        pages.where(
            ~F.col("skipped") & F.col("error").isNull() & F.col("links").isNotNull()
        )
        .select(
            F.col("url").alias("src_url"),
            F.col("url_hash").alias("src_hash"),
            F.explode("links").alias("l"),
        )
        .select(
            "src_url",
            "src_hash",
            F.col("l.url").alias("dst_url"),
            F.col("l.is_resource").alias("is_resource"),
            F.col("l.is_redirect").alias("is_redirect"),
            F.col("l.order_in_page").alias("order_in_page"),
        )
    )
