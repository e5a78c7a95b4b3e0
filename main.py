"""spark-submit entry point: the reference CLI re-expressed
(/root/reference/src/main/java/org/raisercostin/jcrawler/JCrawler.java:594-697).

    spark-submit --py-files jcrawler_spark.zip main.py \
        https://example.com --maxDocs 1000 --maxConnections 3 \
        --state ./crawl-state --corpus ./pages-parquet

Option names mirror the picocli CLI where observable behavior matches;
sandbox-only options (--corpus: the synthetic pages table standing in for
the network, SyntheticFetcher; --http enables the real HttpFetcher) are
documented as such. Exit behavior mirrors JCrawler.call
(JCrawler.java:655-697): the ignored-external-domain `--accept` suggestion
block is printed in the reference's format, and the full crawl result
(config echo + ignoredExternalDomains + stats) is written next to the
state dir as `.crawl-result.json` (JSON instead of the reference's YAML —
no YAML writer in the runtime; key set matches, DIVERGENCES.md)."""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="jcrawl-spark")
    p.add_argument("urls", nargs="+", help="seed URL patterns (Generators syntax)")
    p.add_argument("--accept", action="append", default=[],
                   help="additional accept prefixes/hosts (JCrawler --accept)")
    p.add_argument("--maxDocs", type=int, default=10_000)
    p.add_argument("--maxConnections", type=int, default=3,
                   help="global politeness budget: max fetches per wave "
                        "(the reference's connection token pool); 0 = unlimited")
    p.add_argument("--perHostBudget", type=int, default=None,
                   help="per-host fetches allowed in one wave (ours)")
    p.add_argument("-l", "--level", type=int, default=100, dest="depth")
    p.add_argument("--traversal", default="PARALLEL_BREADTH_FIRST",
                   choices=["PARALLEL_BREADTH_FIRST", "BREADTH_FIRST",
                            "DEPTH_FIRST_PREORDER", "DEPTH_FIRST_POSTORDER"])
    p.add_argument("--expire", type=int, default=100 * 24 * 3600,
                   metavar="SECONDS",
                   help="cache expiry horizon (JCrawler --expire, default "
                        "100 days); with --resume, pages whose latest fetch "
                        "is older than this (logical clock) re-queue first")
    p.add_argument("--recomputeLinks", action="store_true",
                   help="ignore memoized links columns; re-extract "
                        "(JCrawler --recomputeLinks)")
    p.add_argument("--enforce-robots", action="store_true")
    p.add_argument("--crawl-delay", type=int, default=0,
                   help="per-host delay in logical seconds (0 = off)")
    p.add_argument("--real-clock", action="store_true",
                   help="pace supersteps on wall time (each takes at least "
                        "one logical tick of real seconds), so --crawl-delay "
                        "is real-world politeness, like the reference's "
                        "sleeping token pool")
    p.add_argument("--state", default="./crawl-state",
                   help="snapshot-store root (Iceberg-style commit log)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the last committed superstep")
    p.add_argument("--corpus", default=None,
                   help="parquet pages table for the synthetic fetcher "
                        "(sandbox stand-in for HTTP)")
    p.add_argument("--cache-from", default=None, metavar="STATE_DIR",
                   help="serve cache hits (with memoized links) from a "
                        "prior crawl's state dir before fetching")
    p.add_argument("--http", action="store_true",
                   help="fetch with the real HTTP fetcher (mapInPandas; "
                        "reference browser headers) instead of --corpus")
    p.add_argument("--synthesize", type=int, default=0, metavar="N",
                   help="generate an N-page synthetic corpus at --corpus")
    p.add_argument("--master", default=None)
    p.add_argument("--max-supersteps", type=int, default=None)
    p.add_argument("--seen-filter", default="off",
                   choices=["off", "bloom", "cuckoo"],
                   help="opt-in seen-prefilter kind (default off: the "
                        "bucketed exact anti-join is the measured-fastest "
                        "gate — BENCH/BASELINE.md 'Bloom prefilter policy'; "
                        "cuckoo additionally forgets expiry-requeued URLs)")
    p.add_argument("--warc", default=None, metavar="DIR",
                   help="replay-crawl a WARC archive directory: the web is "
                        "the archive (sources/warc.py ingest feeding the "
                        "fetch join; absent URLs are 404s)")
    p.add_argument("--seed-sitemaps", default=None, metavar="DIR",
                   help="harvest sitemap.xml/.gz snapshots in DIR: <loc> "
                        "entries become seeds and <priority> becomes the "
                        "authority score ordering politeness waves")
    p.add_argument("--export-warc", default=None, metavar="DIR",
                   help="after the crawl, archive the fetched pages as "
                        "one .warc.gz per partition in DIR (crawl metadata "
                        "joined back to the source bodies) — interchanges "
                        "with --warc replay and Common-Crawl tooling; "
                        "needs a bodies source (--corpus or --warc)")
    p.add_argument("--cdx-index", default=None, metavar="DIR",
                   help="after --export-warc, roll the archive's .cdxj "
                        "companions into a ZipNum global index in DIR "
                        "(cc-index layout: sorted gzip-blocked shards + "
                        "cluster.idx) — any URL then replays with two "
                        "range reads, no Spark job")
    p.add_argument("--priority-scores", default=None, metavar="PARQUET",
                   help="opt-in authority-ordered scheduling: a parquet "
                        "table (url_hash, score) — e.g. graph.pagerank over "
                        "a prior crawl's link graph — reorders each wave to "
                        "fetch high-score URLs first; unscored URLs keep "
                        "the depth-FIFO default")
    return p


def build_analyze_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="jcrawl-spark analyze",
        description="Training-data pipeline over a finished crawl: "
        "near-dup dedup + language/quality filters + optional PageRank "
        "export reusable as --priority-scores for the next crawl.",
    )
    p.add_argument("--state", required=True,
                   help="crawl state dir (pages table = what was crawled)")
    p.add_argument("--corpus", required=True,
                   help="bodies parquet the crawl fetched from (url, text/html)")
    p.add_argument("--out", required=True,
                   help="output parquet dir for the filtered corpus")
    p.add_argument("--no-dedup", action="store_true",
                   help="skip MinHash/LSH near-dup clustering")
    p.add_argument("--min-quality", type=float, default=None,
                   help="drop docs with textops.quality_score below this")
    p.add_argument("--gopher", action="store_true",
                   help="apply the Gopher/MassiveWeb rule set "
                        "(textops.gopher_pass_col: word/line stats + "
                        "line/bigram repetition signals, map-only)")
    p.add_argument("--gopher-full", action="store_true",
                   help="--gopher plus the full Table-A1 n-gram rows "
                        "(top 2-4-gram / duplicate 5-10-gram char "
                        "fractions; map-only, ~30s one-time driver "
                        "analysis for the 21-signal predicate)")
    p.add_argument("--dedup-paragraphs", action="store_true",
                   help="CCNet-style corpus-wide paragraph dedup: rewrite "
                        "each doc keeping only globally-first paragraphs")
    p.add_argument("--scrub-pii", action="store_true",
                   help="redact emails/phone numbers in the output text")
    p.add_argument("--c4", action="store_true",
                   help="C4 cleaning (Raffel et al. 2020 §2.2): page gate "
                        "(>=5 sentences, no lorem ipsum/brace/banned word) "
                        "then keep only the filtered lines")
    p.add_argument("--ccnet-buckets", default=None, metavar="B,B",
                   help="comma-set of head,middle,tail — CCNet-style "
                        "unigram-LM tercile bucketing over the surviving "
                        "docs, keeping only the named buckets")
    p.add_argument("--decontaminate", default=None, metavar="PARQUET",
                   help="parquet of benchmark rows (text column); drop docs "
                        "sharing any word n-gram with it")
    p.add_argument("--contam-ngram", type=int, default=8, metavar="N",
                   help="n-gram size for --decontaminate (default 8)")
    p.add_argument("--max-cross-dup", type=float, default=None, metavar="R",
                   help="drop docs whose cross-document duplicated "
                        "word-10-gram fraction exceeds R")
    p.add_argument("--remove-dup-spans", action="store_true",
                   help="cut cross-document duplicated word-10-gram spans "
                        "from the text, keeping only the globally first "
                        "occurrence (Lee et al. 2022 semantics)")
    p.add_argument("--export-host-stats", default=None, metavar="PARQUET",
                   help="write a per-host roll-up (n_docs, total_tokens, "
                        "avg_quality, en_frac) of the kept corpus")
    p.add_argument("--export-host-graph", default=None, metavar="PARQUET",
                   help="write the domain-level link graph (src_host, "
                        "dst_host, n_links, n_src_pages) rebuilt from the "
                        "memoized links column")
    p.add_argument("--lang", default=None,
                   help="comma-separated lang_id whitelist (e.g. en,ro)")
    p.add_argument("--cap-per-lang", type=int, default=None, metavar="N",
                   help="deterministically downsample so no detected "
                        "language expects more than N docs "
                        "(operators/sampling.py: md5-uniform vs "
                        "min(1, N/count) per-stratum rates, map-only)")
    p.add_argument("--sample-rate", type=float, default=None, metavar="R",
                   help="deterministic uniform keep-rate in (0,1]; "
                        "composes multiplicatively with --cap-per-lang")
    p.add_argument("--export-pagerank", default=None, metavar="PARQUET",
                   help="write (url_hash, score) PageRank over the memoized "
                        "link graph — feed it back via --priority-scores")
    p.add_argument("--master", default=None)
    return p


def analyze_main(argv: list[str], stop_session: bool = True) -> int:
    """The `analyze` subcommand (round 5, VERDICT r4 #6): drive the
    LLM-training-data operator family end-to-end from the CLI —
    crawl state + bodies → duplicate_groups → dedup_corpus → quality/lang
    filters → filtered corpus parquet (+ optional PageRank export)."""
    args = build_analyze_parser().parse_args(argv)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from jcrawler_spark.functions import textops, urlops
    from jcrawler_spark.operators import dedup as dedup_ops
    from jcrawler_spark.operators import graph as graph_ops
    from jcrawler_spark.plans.tableio import SnapshotStore
    from jcrawler_spark.session import get_spark

    spark = get_spark(args.master, app_name="jcrawl-analyze")
    store = SnapshotStore(args.state, spark)
    meta = store.read("pages")
    if meta is None:
        print("error: no pages table in --state", file=sys.stderr)
        return 2
    # latest successful observation per URL (expiry re-fetch appends rows)
    latest = Window.partitionBy("url").orderBy(
        F.desc("superstep"), F.desc("order_key")
    )
    crawled = (
        meta.where(
            ~F.col("skipped") & F.col("error").isNull()
            & (F.col("status") == 200)
        )
        .withColumn("_rn", F.row_number().over(latest))
        .where(F.col("_rn") == 1)
        .select("url", "url_hash")
    )
    bodies = spark.read.parquet(args.corpus)
    text_expr = (
        F.coalesce(F.col("text"), F.decode(F.col("html"), "UTF-8"))
        if "text" in bodies.columns and "html" in bodies.columns
        else (F.col("text") if "text" in bodies.columns
              else F.decode(F.col("html"), "UTF-8"))
    )
    docs = (
        crawled.join(bodies.select("url", text_expr.alias("_text")), "url")
        .where(F.col("_text").isNotNull())
        # the url IS the doc id (round-5 review fix): a 64-bit url hash
        # has expected birthday collisions at the 10^10-doc design scale,
        # silently merging two unrelated documents through the dedup
        # joins — the same failure dedup_paragraphs' design notes reject
        # for paragraph keys. String group keys cost a wider shuffle and
        # buy exactness.
        .withColumn("doc_id", F.col("url"))
    )
    counts = {"crawled_docs": docs.count()}

    if args.lang:
        langs = [x.strip() for x in args.lang.split(",") if x.strip()]
        docs = docs.where(textops.lang_id_col(F.col("_text")).isin(langs))
    if args.min_quality is not None:
        docs = docs.where(
            textops.quality_score_col(F.col("_text")) >= args.min_quality
        )
    if args.gopher_full:
        docs = docs.where(textops.gopher_full_pass_col(F.col("_text")))
    elif args.gopher:
        docs = docs.where(textops.gopher_pass_col(F.col("_text")))
    if args.c4:
        from jcrawler_spark.functions import c4 as c4_fns

        # gate on the raw page, then keep only the C4-clean lines
        docs = docs.where(
            c4_fns.c4_page_pass_col(F.col("_text"))
        ).withColumn("_text", c4_fns.c4_clean_col(F.col("_text")))
    docs = docs.persist()
    counts["after_filters"] = docs.count()

    if args.ccnet_buckets:
        from jcrawler_spark.operators import quality as quality_ops

        wanted = {b.strip() for b in args.ccnet_buckets.split(",") if b.strip()}
        bad = wanted - {"head", "middle", "tail"}
        if bad:
            print(f"error: unknown ccnet bucket(s) {sorted(bad)}",
                  file=sys.stderr)
            return 2
        buckets = quality_ops.ccnet_buckets(
            docs, id_col="doc_id", text_col="_text"
        )
        docs = docs.join(
            buckets.where(F.col("bucket").isin(*wanted)).select("doc_id"),
            "doc_id", "left_semi",
        )

    if not args.no_dedup:
        groups = dedup_ops.duplicate_groups(docs, text_col="_text",
                                            id_col="doc_id")
        kept = dedup_ops.dedup_corpus(docs, groups, id_col="doc_id")
    else:
        kept = docs
    if args.dedup_paragraphs:
        cleaned = dedup_ops.dedup_paragraphs(
            kept, text_col="_text", id_col="doc_id"
        ).select("doc_id", F.col("clean_text").alias("_ptext"))
        kept = kept.drop("_ptext").join(cleaned, "doc_id").select(
            "url", "url_hash", F.col("_ptext").alias("_text")
        )
    if args.scrub_pii:
        kept = kept.withColumn(
            "_text", textops.pii_scrub_col(F.col("_text"))
        )
    if args.decontaminate:
        from jcrawler_spark.operators import quality as quality_ops

        bench = spark.read.parquet(args.decontaminate)
        flags = quality_ops.contamination_flags(
            kept, bench, n=args.contam_ngram, id_col="url",
            text_col="_text", bench_text_col="text",
        )
        kept = kept.join(
            flags.where(~F.col("contaminated")).select("url"),
            "url", "left_semi",
        )
    if args.max_cross_dup is not None:
        from jcrawler_spark.operators import quality as quality_ops

        cd = quality_ops.cross_dup_ngram_stats(
            kept, n=10, id_col="url", text_col="_text"
        )
        kept = kept.join(
            cd.where(F.col("dup_frac") <= args.max_cross_dup).select("url"),
            "url", "left_semi",
        )
    if args.remove_dup_spans:
        from jcrawler_spark.operators import quality as quality_ops

        cleaned = quality_ops.remove_cross_dup_spans(
            kept, n=10, id_col="url", text_col="_text"
        ).select("url", "clean_text")
        kept = kept.drop("_text").join(cleaned, "url").withColumn(
            "_text", F.col("clean_text")
        ).drop("clean_text")
    if args.cap_per_lang is not None or args.sample_rate is not None:
        from jcrawler_spark.operators import sampling

        base_rate = args.sample_rate if args.sample_rate is not None else 1.0
        kept = kept.withColumn("_lang", textops.lang_id_col(F.col("_text")))
        rates = (
            sampling.rates_for_cap(kept, "_lang", args.cap_per_lang)
            if args.cap_per_lang is not None
            else {}
        )
        # --sample-rate composes multiplicatively with the per-lang cap
        rates = {k: v * base_rate for k, v in rates.items()}
        kept = sampling.stratified_sample(
            kept, rates, "_lang", id_col="url", default_rate=base_rate
        ).drop("_lang")
    out_df = kept.select("url", "url_hash", F.col("_text").alias("text"))
    out_df.write.mode("overwrite").parquet(args.out)
    counts["kept"] = spark.read.parquet(args.out).count()
    docs.unpersist()

    if args.export_host_stats:
        from jcrawler_spark.operators import quality as quality_ops

        final = spark.read.parquet(args.out).select(
            urlops.host_col(F.col("url")).alias("host"),
            "text",
            textops.lang_id_col(F.col("text")).alias("lang"),
        )
        hs = quality_ops.source_stats(final, source_col="host")
        hs.write.mode("overwrite").parquet(args.export_host_stats)
        counts["host_stats_rows"] = spark.read.parquet(
            args.export_host_stats
        ).count()

    if args.export_host_graph:
        edges = graph_ops.link_graph_from_pages(meta).select(
            F.col("src_url").alias("src"),
            urlops.host_col(F.col("src_url")).alias("src_host"),
            urlops.host_col(F.col("dst_url")).alias("dst_host"),
        )
        hg = graph_ops.host_graph(edges, src_id_col="src")
        hg.write.mode("overwrite").parquet(args.export_host_graph)
        counts["host_graph_rows"] = spark.read.parquet(
            args.export_host_graph
        ).count()

    if args.export_pagerank:
        # memoized link graph → authority scores keyed by url_hash, the
        # shape engine.set_priority_scores consumes
        edges_raw = graph_ops.link_graph_from_pages(meta)
        nodes = meta.select("url_hash").distinct()
        edges = edges_raw.select(
            F.xxhash64("src_hash").alias("src"),
            F.xxhash64(urlops.url_hash_col(F.col("dst_url"))).alias("dst"),
        )
        pr = graph_ops.pagerank(
            edges, nodes.select(F.xxhash64("url_hash").alias("doc_id")),
        )
        scores = (
            nodes.withColumn("_id", F.xxhash64("url_hash"))
            .join(pr, F.col("_id") == F.col("doc_id"))
            .select("url_hash", F.col("rank").alias("score"))
        )
        scores.write.mode("overwrite").parquet(args.export_pagerank)
        counts["pagerank_rows"] = spark.read.parquet(
            args.export_pagerank
        ).count()

    print(json.dumps(counts))
    if stop_session:
        spark.stop()
    return 0


def build_search_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="jcrawl-spark search",
        description="Okapi BM25 keyword search over an analyze-produced "
                    "corpus parquet (url + text columns)",
    )
    p.add_argument("--corpus", required=True,
                   help="parquet directory with url + text columns")
    p.add_argument("--terms", required=True,
                   help="comma-separated query terms")
    p.add_argument("-k", type=int, default=10, dest="k",
                   help="number of results (default 10)")
    p.add_argument("--master", default=None)
    return p


def search_main(argv: list[str], stop_session: bool = True) -> int:
    """The `search` subcommand: BM25 top-k over a corpus parquet — the
    "query what you crawled" leg (operators/search.py)."""
    args = build_search_parser().parse_args(argv)
    terms = [t.strip().lower() for t in args.terms.split(",") if t.strip()]
    if not terms:
        print("error: --terms needs at least one term", file=sys.stderr)
        return 2
    from jcrawler_spark.operators import search as search_ops
    from jcrawler_spark.session import get_spark

    spark = get_spark(args.master, app_name="jcrawl-search")
    docs = spark.read.parquet(args.corpus)
    from pyspark.sql import functions as F

    out = search_ops.bm25_topk(
        docs, terms, k=args.k, id_col="url", text_col="text"
    ).select("url", F.round("score", 4).alias("score"))
    print(json.dumps([r.asDict() for r in out.collect()]))
    if stop_session:
        spark.stop()
    return 0


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    if argv is None:
        argv = sys.argv[1:]
    if argv and argv[0] == "analyze":
        return analyze_main(argv[1:], stop_session=stop_session)
    if argv and argv[0] == "search":
        return search_main(argv[1:], stop_session=stop_session)
    args = build_parser().parse_args(argv)
    if args.cdx_index and not args.export_warc:
        print("error: --cdx-index indexes a fresh archive; it needs "
              "--export-warc", file=sys.stderr)
        return 2

    from jcrawler_spark import corpus as corpus_mod
    from jcrawler_spark.config import CrawlConfig, TraversalType
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher
    from jcrawler_spark.operators.fetch import CachedFetcher, HttpFetcher
    from jcrawler_spark.plans.tableio import SnapshotStore
    from jcrawler_spark.session import get_spark

    spark = get_spark(args.master, app_name="jcrawl")
    if args.synthesize and args.corpus:
        corpus_mod.write_pages(spark, args.corpus, args.synthesize)

    source_pages = None  # bodies table, when the source retains one
    if args.http:
        fetcher = HttpFetcher()
    elif args.warc:
        from jcrawler_spark.sources import warc as warc_mod

        source_pages = warc_mod.to_pages(warc_mod.read_warc(spark, args.warc))
        fetcher = SyntheticFetcher(source_pages)
    elif args.corpus:
        source_pages = spark.read.parquet(args.corpus)
        fetcher = SyntheticFetcher(source_pages)
    else:
        print("error: --corpus, --warc or --http required", file=sys.stderr)
        return 2
    if args.export_warc and source_pages is None:
        # the state store is deliberately html-free (metadata + links), so
        # an archive export needs the source bodies to join back against
        print("error: --export-warc needs a bodies source (--corpus or "
              "--warc)", file=sys.stderr)
        return 2
    if args.cache_from:
        cache_pages = SnapshotStore(args.cache_from, spark).read("pages")
        if cache_pages is not None:
            fetcher = CachedFetcher(cache_pages, inner=fetcher)

    cfg = CrawlConfig(
        urls=args.urls,
        accept=args.accept,
        max_docs=args.maxDocs,
        max_connections=args.maxConnections if args.maxConnections > 0 else None,
        per_host_budget=args.perHostBudget,
        depth=args.depth,
        cache_expiry_seconds=args.expire,
        recompute_links=args.recomputeLinks,
        traversal=TraversalType[args.traversal],
        enforce_robots=args.enforce_robots,
        enforce_crawl_delay=args.crawl_delay > 0,
        crawl_delay_seconds=max(args.crawl_delay, 1),
        real_clock=args.real_clock,
        bloom_enabled=args.seen_filter != "off",
        seen_filter_kind=(
            "cuckoo" if args.seen_filter == "cuckoo" else "bloom"
        ),
    )
    # sitemap seeding: harvest snapshot files into (url, score) seeds —
    # the collect is the one O(seeds) driver step the engine already has
    # (engine.seed); <priority> doubles as the authority score
    sitemap_seed_urls: list[str] = []
    sitemap_scores = None
    if args.seed_sitemaps:
        from pyspark.sql import functions as F

        from jcrawler_spark.operators import sitemap as sitemap_mod

        snaps = (
            spark.read.format("binaryFile")
            .option("pathGlobFilter", "*.xml*")
            .load(args.seed_sitemaps)
            .select(F.col("path").alias("url"), F.col("content").alias("body"))
        )
        seeds_df = sitemap_mod.seeds_from_entries(
            sitemap_mod.harvest_sitemaps(snaps)
        )
        srows = seeds_df.collect()
        sitemap_seed_urls = sorted(r["url"] for r in srows)
        sitemap_scores = seeds_df.select("url_hash", "score")
        print(f"seeded {len(sitemap_seed_urls)} URLs from sitemaps")

    eng = CrawlEngine(spark, cfg, fetcher, args.state)
    if args.priority_scores:
        eng.set_priority_scores(spark.read.parquet(args.priority_scores))
    elif sitemap_scores is not None:
        eng.set_priority_scores(sitemap_scores)
    if args.resume:
        eng.resume()
        requeued = eng.requeue_expired()  # --expire horizon on the logical clock
        if requeued:
            print(f"requeued {requeued} expired pages (expire={args.expire}s)")
        stats = eng.run(seeds=None, max_supersteps=args.max_supersteps)
    else:
        stats = eng.run(
            seeds=list(args.urls) + sitemap_seed_urls,
            max_supersteps=args.max_supersteps,
        )

    # ---- result sink, reference format (JCrawler.java:672-694) ----
    ignored = eng.ignored_domains()
    if ignored:
        print("\n--------------------------------------------------------------")
        print("Suggestion: The following external domains were encountered:")
        for domain in sorted(ignored):
            print(f"  - {domain}")
        print("\nTo include them in the crawl, add the following arguments:")
        print(" ".join(f"--accept {d}" for d in sorted(ignored)))
        print("--------------------------------------------------------------\n")

    config_echo = dataclasses.asdict(cfg)
    config_echo["traversal"] = cfg.traversal.value
    final_result = {
        "config": config_echo,
        "ignoredExternalDomains": sorted(ignored),
        "stats": {"totalLinks": eng.emitted_count, "supersteps": len(stats)},
    }
    # ---- WARC export: archive exactly the pages this crawl fetched ----
    # Crawl metadata (latest observation per URL — expiry re-fetch appends
    # a fresh row) joined back to the source bodies on url: at corpus
    # scale this is the fetch join's one-sided shape against a bucketed
    # pages table (operators/fetch.py docstring); rows the engine skipped
    # (no HTTP transaction) carry NULL status and are excluded up front.
    if args.export_warc:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from jcrawler_spark.sources import warc as warc_mod

        meta = SnapshotStore(args.state, spark).read("pages")
        latest = Window.partitionBy("url").orderBy(
            F.desc("superstep"), F.desc("order_key")
        )
        crawled = (
            meta.where(F.col("status").isNotNull())
            .withColumn("_rn", F.row_number().over(latest))
            .where(F.col("_rn") == 1)
            .select("url", "status", "location", "content_type")
        )
        export = crawled.join(
            source_pages.select("url", "html", "warc_ts"), "url", "left"
        )
        sink_stats = warc_mod.write_warc_files(export, args.export_warc).collect()
        n_arch = sum(r["n_records"] for r in sink_stats)
        print(f"archived {n_arch} records to {args.export_warc} "
              f"({len(sink_stats)} files)")
        if args.cdx_index:
            from jcrawler_spark.sources import cdx as cdx_mod

            n_idx = cdx_mod.build_zipnum(
                spark, args.export_warc, args.cdx_index
            )
            print(f"indexed {n_idx} records to {args.cdx_index}")

    os.makedirs(args.state, exist_ok=True)
    # result sink parity (JCrawler.java:686-694): the reference writes
    # `.crawl-result.yaml` {config, ignoredExternalDomains, stats} via
    # Nodes.yml; same keys here. JSON twin kept for machine consumers.
    try:
        import yaml

        with open(os.path.join(args.state, ".crawl-result.yaml"), "w") as f:
            yaml.safe_dump(final_result, f, sort_keys=False)
    except ImportError:
        pass  # YAML lib absent: the JSON twin below is the record
    result_path = os.path.join(args.state, ".crawl-result.json")
    with open(result_path, "w") as f:
        json.dump(final_result, f, indent=2)
    print(json.dumps({**final_result["stats"],
                      "ignoredExternalDomains": sorted(ignored),
                      "state": args.state}, indent=2))
    if stop_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
