"""spark-submit entry point: the reference CLI re-expressed
(/root/reference/src/main/java/org/raisercostin/jcrawler/JCrawler.java:594-697).

    spark-submit --py-files jcrawler_spark.zip main.py \
        https://example.com --maxDocs 1000 --maxConnections 3 \
        --state ./crawl-state --corpus ./pages-parquet

Option names mirror the picocli CLI where observable behavior matches;
sandbox-only options (--corpus: the synthetic pages table standing in for
the network, SyntheticFetcher) are documented as such. Exit writes a
crawl-result summary like `.crawl-result.yaml` (JCrawler.java:686-694).
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="jcrawl-spark")
    p.add_argument("urls", nargs="+", help="seed URL patterns (Generators syntax)")
    p.add_argument("--accept", action="append", default=[],
                   help="additional accept prefixes/hosts (JCrawler --accept)")
    p.add_argument("--maxDocs", type=int, default=10_000)
    p.add_argument("--maxConnections", type=int, default=3,
                   help="per-wave per-host budget analogue of the token pool")
    p.add_argument("-l", "--level", type=int, default=100, dest="depth")
    p.add_argument("--traversal", default="PARALLEL_BREADTH_FIRST",
                   choices=["PARALLEL_BREADTH_FIRST", "BREADTH_FIRST",
                            "DEPTH_FIRST_PREORDER"])
    p.add_argument("--enforce-robots", action="store_true")
    p.add_argument("--crawl-delay", type=int, default=0,
                   help="per-host delay in logical seconds (0 = off)")
    p.add_argument("--state", default="./crawl-state",
                   help="snapshot-store root (Iceberg-style commit log)")
    p.add_argument("--resume", action="store_true",
                   help="resume from the last committed superstep")
    p.add_argument("--corpus", default=None,
                   help="parquet pages table for the synthetic fetcher "
                        "(sandbox stand-in for HTTP)")
    p.add_argument("--synthesize", type=int, default=0, metavar="N",
                   help="generate an N-page synthetic corpus at --corpus")
    p.add_argument("--master", default=None)
    p.add_argument("--max-supersteps", type=int, default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from jcrawler_spark import corpus as corpus_mod
    from jcrawler_spark.config import CrawlConfig, TraversalType
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher
    from jcrawler_spark.session import get_spark

    spark = get_spark(args.master, app_name="jcrawl")
    if args.synthesize and args.corpus:
        corpus_mod.write_pages(spark, args.corpus, args.synthesize)
    if not args.corpus:
        print("error: --corpus required (no live HTTP fetcher in sandbox)",
              file=sys.stderr)
        return 2
    pages = spark.read.parquet(args.corpus)

    cfg = CrawlConfig(
        urls=args.urls,
        accept=args.accept,
        max_docs=args.maxDocs,
        per_host_budget=args.maxConnections if args.maxConnections > 0 else None,
        depth=args.depth,
        traversal=TraversalType[args.traversal],
        enforce_robots=args.enforce_robots,
        enforce_crawl_delay=args.crawl_delay > 0,
        crawl_delay_seconds=max(args.crawl_delay, 1),
    )
    eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages), args.state)
    stats = eng.run(
        seeds=None if args.resume else args.urls,
        max_supersteps=args.max_supersteps,
    )
    result = {
        "totalLinks": eng.emitted_count,
        "supersteps": len(stats),
        "ignoredExternalDomains": eng.ignored_domains(),
        "state": args.state,
    }
    print(json.dumps(result, indent=2))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
