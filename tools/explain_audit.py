"""Physical-plan audit: .explain("formatted") for the contract queries +
one engine wave, grepping for the properties that matter at 100 TB:

  * PushedFilters / ReadSchema on parquet scans (pushdown + pruning)
  * BroadcastHashJoin where a small side exists (no accidental SMJ)
  * WholeStageCodegen spans covering the Column-expression pipeline
  * no CartesianProduct outside the intentional probe crossJoin

Writes PLANS.md. Run when the machine is idle (it executes explain() only —
no jobs — but spins up a session).
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"

CHECKS = {
    "url_hash": [r"\* Project", "ReadSchema"],
    "first_wins_dedup": ["ReadSchema"],
    "politeness_window": ["Window"],
    "cosine_topk": ["BroadcastNestedLoopJoin|BroadcastHashJoin|CartesianProduct"],
    "lsh_ann_topk": ["BroadcastHashJoin"],
    "lsh_pairs": ["HashAggregate"],
    "dedup_exact": ["HashAggregate"],
    "localize_join": ["BroadcastHashJoin"],
    "cosine_near_dup": ["SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"],
    "ivf_ann_topk": ["BroadcastHashJoin"],
}


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    from jcrawler_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = ["# PLANS — physical-plan audit (explain formatted, sf0.01)\n"]
    summary = []
    for name, markers in CHECKS.items():
        plan = plan_of(qs[name](spark, SF))
        found = {
            m: bool(re.search(m, plan)) for m in markers
        }
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
        schemas = re.findall(r"ReadSchema: [^\n]*", plan)
        summary.append(f"- **{name}**: markers {found}")
        out.append(f"## {name}\n")
        out.append("markers: " + ", ".join(f"{m}={v}" for m, v in found.items()))
        if pushed:
            out.append("\npushdown: " + "; ".join(pushed[:4]))
        if schemas:
            out.append("\nread schemas: " + "; ".join(s[:160] for s in schemas[:4]))
        # formatted explain marks codegen operators with a "* " prefix
        wsc = len(re.findall(r"^\s*[*+\-]*\s*\* ", plan, re.M))
        out.append(f"\nwhole-stage codegen spans: {wsc}\n")
        excerpt = "\n".join(plan.splitlines()[:40])
        out.append("```\n" + excerpt + "\n```\n")

    # round 5: training-data additions. The repetition/PII signal queries
    # are higher-order-function Column pipelines and must stay MAP-ONLY
    # (0 Exchanges — they run at scan speed at 100 TB). paragraph_dedup is
    # allowed exactly its designed shuffles: window on paragraph text,
    # totals groupBy, kept groupBy (the totals/kept join reuses the
    # doc_id partitioning).
    for qname, max_ex in (
        ("repetition_stats", 0),
        ("gopher_filter", 0),
        ("pii_scrub", 0),
        ("paragraph_dedup", 3),
        # round-5 second batch: c4 is a pure scan-speed gate; source_stats
        # one groupBy; host_graph groupBy + count_distinct expansion;
        # ccnet is measured post-localCheckpoint (the LM pipeline runs
        # once inside the cut); decontaminate's corpus side must stay
        # broadcast-only; cross_dup pays its designed gram groupBy+join;
        # bm25's corpus side is term-filtered before its groupBys.
        ("c4_filter", 0),
        ("source_stats", 1),
        ("host_graph", 2),
        ("ccnet_bucket", 4),
        ("decontaminate", 4),
        # cross-dup pair: the skew-proof min/max + owner-aggregate forms
        # (one extra Exchange in removal vs the window form — the price
        # of no per-gram sort task on boilerplate mega-grams)
        ("cross_dup_spans", 4),
        ("dup_span_removal", 6),
        ("bm25_search", 7),
        # two vocab-bounded groupBys + the vocab join
        ("vocab_topk", 3),
    ):
        plan = plan_of(qs[qname](spark, SF))
        # count physical NODES once: formatted explain prints every node
        # twice (tree line + "(N) Exchange" detail header) — the raw
        # substring count double-counts, which mislabeled paragraph_dedup
        # as 6 when its plan is 3 Exchanges (window-on-para, doc groupBy,
        # broadcast count join)
        n_ex = len(re.findall(r"^\(\d+\) (?:Broadcast)?Exchange", plan, re.M))
        summary.append(f"- **{qname}**: exchanges={n_ex} (bound {max_ex})")
        out.append(
            f"## {qname} (round 5)\n\nExchange count: {n_ex} "
            f"(bound {max_ex}).\n\n```\n"
            + "\n".join(plan.splitlines()[:30])
            + "\n```\n"
        )
        assert n_ex <= max_ex, f"{qname}: {n_ex} Exchanges > bound {max_ex}"
    out.insert(1, "\n".join(summary) + "\n")

    # engine fetch join vs a bucketed corpus (the large-wave path): must be
    # a ONE-Exchange plan — only the wave shuffles, the corpus FileScan is
    # bucketed (the Iceberg bucket-partitioned pages-table shape)
    import tempfile

    from pyspark.sql import functions as F

    from jcrawler_spark import corpus
    from jcrawler_spark.engine import SyntheticFetcher

    bdir = tempfile.mkdtemp(prefix="plans-bkt-")
    tbl = corpus.write_pages_bucketed(
        spark, bdir, "plans_pages_b", 2000, 8, partitions=4, buckets=8
    )
    wave = spark.range(500).select(
        F.concat(F.lit("https://hostx/p/"), F.col("id")).alias("url"),
        F.lit("hostx").alias("host"),
        F.lit(0).alias("depth"),
    )
    fetch_plan = (
        SyntheticFetcher(tbl)
        .fetch(wave, approx_rows=500_000)  # force the large-wave join path
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchange = len(re.findall(r"Exchange", fetch_plan))
    lines = [
        ln.rstrip()[:110]
        for ln in fetch_plan.splitlines()
        if re.search(r"Exchange|SortMergeJoin|Scan parquet|Bucketed", ln)
    ]
    out.append(
        "## engine fetch join vs bucketed corpus (large-wave path)\n\n"
        f"Exchange count: {n_exchange} (must be 1 — wave side only; the "
        "corpus scan is bucketed).\n\n```\n" + "\n".join(lines) + "\n```\n"
    )
    summary.append(f"- **fetch_join_bucketed**: exchanges={n_exchange}")
    spark.sql("DROP TABLE IF EXISTS plans_pages_b")
    assert n_exchange == 1, (
        f"bucketed fetch join must shuffle only the wave side, got "
        f"{n_exchange} Exchanges"
    )

    # crawl-state anti-joins vs the bucketed snapshot store (VERDICT r2 #1):
    # the per-superstep seen gate (engine._seen_hashes left_anti) and the
    # pending compose (frontier_add ∖ consumed seen_index) must NEVER
    # re-shuffle the accumulated state — only the wave side may exchange.
    # The store keeps the slim KEY tables (seen_index, frontier_add) as
    # CLUSTERED BY (url_hash) catalog tables, so their scans carry
    # HashPartitioning(url_hash, nb); the payload-bearing pages deltas are
    # plain appends that no per-superstep join ever scans.
    from jcrawler_spark.plans.tableio import SnapshotStore

    nb = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sroot = tempfile.mkdtemp(prefix="plans-state-")
    store = SnapshotStore(
        sroot, spark, bucketed={"seen_index": nb, "frontier_add": nb},
        bucketed_scan_min_bytes=0,  # force the at-scale catalog path at toy size
    )

    def fake_state(s, tag, n):
        return spark.range(n).select(
            F.sha2(F.concat(F.lit(tag), F.col("id").cast("string")), 256).alias(
                "url_hash"
            ),
            F.lit(s).alias("superstep"),
        )

    for s in (1, 2):
        store.stage_all(
            s,
            {"seen_index": fake_state(s, "p", 4000), "frontier_add": fake_state(s, "f", 4000)},
            {},
        )
        store.commit(s, {})

    wave = spark.range(500).select(
        F.sha2(F.concat(F.lit("w"), F.col("id").cast("string")), 256).alias(
            "url_hash"
        )
    )

    def audit_anti(name, plan_df, max_exchanges):
        """Count SHUFFLE exchanges only (at toy size the planner rightly
        broadcasts the small side instead of using the buckets; broadcast
        is disabled around these audits to surface the at-scale SMJ plan)."""
        plan = (
            plan_df._jdf.queryExecution().executedPlan().toString()
        )
        n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        lines = [
            ln.rstrip()[:110]
            for ln in plan.splitlines()
            if re.search(r"Exchange|SortMergeJoin|Scan parquet|Bucketed", ln)
        ]
        out.append(
            f"## {name}\n\nShuffle-Exchange count: {n_ex} (must be ≤ "
            f"{max_exchanges} — wave side only; the state scan is bucketed)."
            "\n\n```\n" + "\n".join(lines) + "\n```\n"
        )
        summary.append(f"- **{name}**: shuffle_exchanges={n_ex}")
        assert n_ex <= max_exchanges, (
            f"{name}: accumulated state must not re-shuffle "
            f"({n_ex} shuffle Exchanges > {max_exchanges})"
        )
        n_state_scans = len(re.findall(r"FileScan parquet \S*jc_state", plan))
        n_bucketed = len(re.findall(r"Bucketed: true", plan))
        assert n_state_scans and n_bucketed == n_state_scans, (
            f"{name}: every state scan must be bucketed "
            f"({n_bucketed}/{n_state_scans})"
        )

    prev_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    seen = store.read("seen_index").select("url_hash")
    audit_anti("seen anti-join vs bucketed seen_index", wave.join(seen, "url_hash", "left_anti"), 1)

    # the pending compose: BOTH sides bucketed on url_hash → zero Exchange
    adds = store.read("frontier_add")
    consumed = store.read("seen_index").select(
        F.col("url_hash").alias("c_hash"), F.col("superstep").alias("c_superstep")
    )
    pending = adds.join(
        consumed,
        (adds["url_hash"] == consumed["c_hash"])
        & (consumed["c_superstep"] >= adds["superstep"]),
        "left_anti",
    )
    audit_anti("pending compose (adds ∖ consumed), both bucketed", pending, 0)

    # CachedFetcher cache-hit join (VERDICT r3 #3): the deduped cache
    # projection is persisted ONCE at construction, so the per-superstep
    # join must (a) never re-execute the dedup Window, (b) shuffle only
    # the wave side — the InMemoryRelation (built with AQE off) keeps
    # hashpartitioning(url). Lines inside the InMemoryRelation subtree are
    # the one-time population plan, not per-superstep work — strip them.
    from jcrawler_spark import schemas
    from jcrawler_spark.operators.fetch import CachedFetcher

    def strip_cached_subtrees(plan: str) -> str:
        kept, skip_indent = [], None
        for ln in plan.splitlines():
            indent = len(ln) - len(ln.lstrip(" :+-"))
            if skip_indent is not None:
                if indent > skip_indent:
                    continue
                skip_indent = None
            if "InMemoryRelation" in ln:
                skip_indent = indent
            kept.append(ln)
        return "\n".join(kept)

    cache_pages = corpus.build_pages_df(spark, 2000, 8).select(
        "url",
        F.lit(1).alias("superstep"),
        F.lit(False).alias("skipped"),
        F.lit(None).cast("string").alias("error"),
        F.lit(200).alias("status"),
        F.lit(None).cast("string").alias("location"),
        F.lit("text/html").alias("content_type"),
        F.lit(None).cast(schemas.LINKS_ARRAY).alias("links"),
    )
    cf = CachedFetcher(cache_pages, inner=None)
    cwave = spark.range(300).select(
        F.concat(F.lit("https://hostx/p/"), F.col("id")).alias("url"),
        F.lit("hostx").alias("host"),
        F.lit(0).alias("depth"),
    )
    cfetch_plan = (
        cf.fetch(cwave)._jdf.queryExecution().executedPlan().toString()
    )
    stripped = strip_cached_subtrees(cfetch_plan)
    n_win = len(re.findall(r"\bWindow\b", stripped))
    n_ex = len(re.findall(r"Exchange hashpartitioning", stripped))
    n_ims = len(re.findall(r"InMemoryTableScan", stripped))
    lines = [
        ln.rstrip()[:110]
        for ln in stripped.splitlines()
        if re.search(r"Exchange|Join|Window|InMemory", ln)
    ]
    out.append(
        "## cached-fetcher join (per-superstep, cache persisted at "
        "construction)\n\n"
        f"Window re-executions: {n_win} (must be 0 — dedup served from the "
        f"cache); shuffle Exchanges: {n_ex} (must be ≤2 — ONE wave-side "
        "exchange per hit/miss leg, zero on the cache side); "
        f"InMemoryTableScans: {n_ims}.\n\n```\n" + "\n".join(lines) + "\n```\n"
    )
    summary.append(
        f"- **cached_fetcher_join**: windows={n_win} shuffle_exchanges={n_ex}"
    )
    assert n_win == 0, "cache dedup Window must not re-execute per superstep"
    assert n_ex <= 2, f"cache-hit join shuffles the cache side ({n_ex} > 2)"
    assert n_ims >= 2, "cache projection must be served from the persisted plan"
    cf.close()

    # politeness wave selection (VERDICT r3 #6): the per-host top-k
    # (engine._select_wave two-phase salted row_number) must carry a
    # MAP-SIDE WindowGroupLimit *below* each hashpartitioning Exchange —
    # Spark's Partial WindowGroupLimit prunes every input partition to k
    # rows per (host, salt) group BEFORE the shuffle, so the (host, salt)
    # exchange moves at most k × n_salt × n_hosts rows, never O(frontier).
    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine

    peng = CrawlEngine(
        spark,
        CrawlConfig(per_host_budget=2),
        SyntheticFetcher(tbl),
        tempfile.mkdtemp(prefix="plans-polite-") + "/s",
    )
    peng._pending_count = 1 << 40  # unbounded pending: no cap branch
    pfrontier = spark.range(1000).select(
        F.concat(
            F.lit("https://h"), (F.col("id") % 7).cast("string"),
            F.lit("/p/"), F.col("id"),
        ).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.lit(1).alias("depth"),
        F.col("id").cast("double").alias("priority"),
        F.col("id").alias("order_key"),
    )
    pwave, _ = peng._select_wave(pfrontier)
    pplan = pwave._jdf.queryExecution().executedPlan().toString()
    plines = pplan.splitlines()

    def _idx(pat):
        for i, ln in enumerate(plines):
            if re.search(pat, ln):
                return i
        return None

    # printed tree order: a child (executed EARLIER) appears BELOW its
    # parent — "Partial after Exchange in the listing" = map-side prune
    i_ex_salt = _idx(r"Exchange hashpartitioning\(host#\d+, salt")
    i_part_salt = _idx(r"WindowGroupLimit \[host#\d+, salt#\d+L?\].*Partial")
    i_ex_host = _idx(r"Exchange hashpartitioning\(host#\d+,")
    i_part_host = _idx(r"WindowGroupLimit \[host#\d+\],.*Partial")
    wlines = [
        ln.rstrip()[:120]
        for ln in plines
        if re.search(r"Exchange|WindowGroupLimit|Window \[|Range", ln)
    ]
    out.append(
        "## politeness wave selection (two-phase salted per-host top-k)\n\n"
        "Both row_number phases carry a map-side (Partial) WindowGroupLimit "
        "BELOW their hashpartitioning Exchange: each input partition is "
        "pruned to k rows per (host, salt) group before any shuffle, so the "
        "exchange moves ≤ k·n_salt rows per host — never O(frontier).\n\n"
        "```\n" + "\n".join(wlines) + "\n```\n"
    )
    summary.append(
        "- **politeness_wave_select**: partial_window_group_limits="
        f"{len(re.findall(r'WindowGroupLimit.*Partial', pplan))}"
    )
    assert None not in (i_ex_salt, i_part_salt, i_ex_host, i_part_host), (
        "politeness plan lost its WindowGroupLimit/Exchange structure:\n"
        + pplan
    )
    assert i_part_salt > i_ex_salt, (
        "phase-1 (host, salt) top-k must prune map-side before its Exchange"
    )
    assert i_part_host > i_ex_host, (
        "phase-2 (host) top-k must prune map-side before its Exchange"
    )

    # shard-join prefilter (the 10^10-frontier form, Bloom and cuckoo
    # kinds): candidates cogroup with the per-shard filter table, so NO
    # task ever holds the whole filter and there is no driver broadcast
    # of the blob — the plan must be a FlatMapCoGroupsInPandas over two
    # shard-hash Exchanges (one per side), with the filter side's input
    # a tiny local table.
    from jcrawler_spark.operators import bloom as bloom_ops
    from jcrawler_spark.operators import cuckoo as cuckoo_ops

    pf_cand = spark.range(5000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash")
    )
    pf_sections = []
    for kind, mk, fn in (
        (
            "bloom",
            lambda: bloom_ops.GenerationalBloom(8, 1 << 14, 3),
            bloom_ops.prefilter_unseen_sharded,
        ),
        (
            "cuckoo",
            lambda: cuckoo_ops.ShardedCuckoo(8, 1 << 8),
            cuckoo_ops.prefilter_unseen_sharded,
        ),
    ):
        filt = mk()
        plan = (
            fn(pf_cand, filt)
            ._jdf.queryExecution().executedPlan().toString()
        )
        n_cg = len(re.findall(r"FlatMapCoGroupsInPandas", plan))
        n_ex = len(re.findall(r"Exchange hashpartitioning", plan))
        n_bc = len(re.findall(r"Broadcast", plan))
        assert n_cg == 1, f"{kind} shard prefilter must cogroup: {plan}"
        assert n_ex == 2, (
            f"{kind} shard prefilter must shuffle exactly both cogroup "
            f"sides by shard ({n_ex} exchanges)"
        )
        assert n_bc == 0, (
            f"{kind} shard prefilter must not broadcast the filter blob"
        )
        pf_sections.append(
            f"- **{kind}**: cogroups={n_cg} shard_exchanges={n_ex} "
            f"broadcasts={n_bc}"
        )
        summary.append(
            f"- **{kind}_shard_prefilter**: cogroups={n_cg} "
            f"exchanges={n_ex} broadcasts={n_bc}"
        )
    out.append(
        "## shard-join seen-prefilter (10^10 form, both kinds)\n\n"
        "Candidates cogroup with the per-shard filter table on the shard "
        "hash: exactly one FlatMapCoGroupsInPandas over two shard "
        "Exchanges, zero Broadcast nodes — no task holds more than one "
        "shard of the filter, no driver broadcast of the blob.\n\n"
        + "\n".join(pf_sections) + "\n"
    )

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thresh)
    for t in ("seen_index", "frontier_add"):
        spark.sql(f"DROP TABLE IF EXISTS {store._catalog_name(t)}")

    # WARC ingest (sources/warc.py): archive → pages must be a pure
    # map-only pipeline — binaryFile scan → ArrowEvalPython/MapInPandas →
    # project. ZERO Exchanges: at 100k-file scale any shuffle here would
    # move the decompressed archive bytes across the cluster.
    import os as _os

    from jcrawler_spark.sources import warc as warc_ops

    wdir = tempfile.mkdtemp(prefix="plans-warc-")
    with open(_os.path.join(wdir, "a.warc.gz"), "wb") as fh:
        fh.write(
            warc_ops.build_warc(
                [{"url": "https://a.example/x", "body": b"<html/>"}]
            )
        )
    warc_plan = (
        warc_ops.to_pages(warc_ops.read_warc(spark, wdir))
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_ex_warc = len(re.findall(r"Exchange", warc_plan))
    n_map_warc = len(re.findall(r"MapInPandas", warc_plan))
    assert n_ex_warc == 0, (
        f"warc ingest must be map-only, got {n_ex_warc} Exchanges"
    )
    assert n_map_warc == 1, "warc ingest must parse via one MapInPandas"
    out.append(
        "## warc ingest → pages projection (map-only)\n\n"
        f"Exchange count: {n_ex_warc} (must be 0 — one task per archive "
        "file, parse + derived columns stay on the executor).\n\n```\n"
        + "\n".join(
            ln.rstrip()[:110]
            for ln in warc_plan.splitlines()
            if re.search(r"Exchange|MapInPandas|Scan|Project", ln)
        )
        + "\n```\n"
    )
    summary.append(
        f"- **warc_ingest_map_only**: exchanges={n_ex_warc} "
        f"map_in_pandas={n_map_warc}"
    )

    # CDX index (sources/warc.py): the lookup side must be pure JVM —
    # text scan → split/from_json project, ZERO Python nodes and ZERO
    # Exchanges (a cc-index join is one-sided against this scan); the
    # random-access fetch must be map-only — a local sort + ONE
    # MapInPandas, no Exchange (I/O O(selected records), never a shuffle
    # of archive bytes).
    cdx_dir = tempfile.mkdtemp(prefix="plans-cdx-")
    cdx_src = spark.createDataFrame(
        [("https://a.example/x", bytearray(b"<html/>"), 200, None,
          "text/html", None)],
        "url string, html binary, status int, location string, "
        "content_type string, warc_ts timestamp",
    )
    warc_ops.write_warc_files(cdx_src, cdx_dir).collect()
    cdx_df = warc_ops.read_cdx(spark, cdx_dir)
    cdx_plan = cdx_df._jdf.queryExecution().executedPlan().toString()
    n_ex_cdx = len(re.findall(r"Exchange", cdx_plan))
    n_py_cdx = len(
        re.findall(r"MapInPandas|ArrowEvalPython|BatchEvalPython", cdx_plan)
    )
    assert n_ex_cdx == 0, f"read_cdx must not shuffle ({n_ex_cdx} Exchanges)"
    assert n_py_cdx == 0, "read_cdx must stay JVM-side (no Python nodes)"
    fetch_plan = (
        warc_ops.fetch_records(cdx_df, cdx_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_ex_fetch = len(re.findall(r"Exchange", fetch_plan))
    n_map_fetch = len(re.findall(r"MapInPandas", fetch_plan))
    assert n_ex_fetch == 0, (
        f"fetch_records must be map-only ({n_ex_fetch} Exchanges)"
    )
    assert n_map_fetch == 1, "fetch_records must read via one MapInPandas"
    out.append(
        "## cdx index: JVM-only lookup scan + map-only random access\n\n"
        f"read_cdx: Exchanges={n_ex_cdx}, Python nodes={n_py_cdx} (both "
        "must be 0 — the index scan is pure JVM, so a cc-index lookup "
        "join is one-sided). fetch_records: Exchanges="
        f"{n_ex_fetch} (must be 0), MapInPandas={n_map_fetch} (must be 1 "
        "— seek-read of selected gzip members only).\n\n```\n"
        + "\n".join(
            ln.rstrip()[:110]
            for ln in (cdx_plan + "\n" + fetch_plan).splitlines()
            if re.search(r"Exchange|MapInPandas|Scan|Project|Sort", ln)
        )
        + "\n```\n"
    )
    summary.append(
        f"- **cdx_paths**: lookup_exchanges={n_ex_cdx} "
        f"lookup_python_nodes={n_py_cdx} fetch_exchanges={n_ex_fetch} "
        f"fetch_map_in_pandas={n_map_fetch}"
    )

    # ZipNum global index build (sources/cdx.py): exactly ONE Exchange and
    # it must be RANGE partitioning on the index key (a sampled, balanced
    # global sort of ~150-byte index lines — never archive bytes), then
    # one MapInPandas shard writer. Any hashpartitioning here would break
    # the global key order the cluster.idx binary search depends on.
    from jcrawler_spark.sources import cdx as cdx_mod

    # shards pinned >1: the range-partitioning claim is about the
    # multi-shard build (auto-sizing on this 1-record fixture would give
    # shards=1, which Spark legitimately collapses to SinglePartition)
    zn_plan = (
        cdx_mod.zipnum_plan(
            spark, cdx_dir, tempfile.mkdtemp(prefix="plans-zn-"), shards=4
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    n_ex_zn = len(re.findall(r"Exchange", zn_plan))
    n_range_zn = len(re.findall(r"Exchange rangepartitioning", zn_plan))
    n_map_zn = len(re.findall(r"MapInPandas", zn_plan))
    assert n_ex_zn == 1 and n_range_zn == 1, (
        f"zipnum build must have exactly one RANGE Exchange "
        f"(got {n_ex_zn} total, {n_range_zn} range):\n{zn_plan}"
    )
    assert n_map_zn == 1, "zipnum build must write via one MapInPandas"
    out.append(
        "## zipnum global index build (one range Exchange)\n\n"
        f"Exchanges: {n_ex_zn} (exactly 1, rangepartitioning on the index "
        "key — sampled and balanced, moving index lines only); "
        f"MapInPandas: {n_map_zn} (the shard writer).\n\n```\n"
        + "\n".join(
            ln.rstrip()[:110]
            for ln in zn_plan.splitlines()
            if re.search(r"Exchange|MapInPandas|Scan|Project|Sort", ln)
        )
        + "\n```\n"
    )
    summary.append(
        f"- **zipnum_build**: range_exchanges={n_range_zn} "
        f"total_exchanges={n_ex_zn} map_in_pandas={n_map_zn}"
    )

    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("\n".join(summary))
    spark.stop()


if __name__ == "__main__":
    main()
