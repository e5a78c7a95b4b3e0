"""Production fetchers (SURVEY.md §2.1 S8/S9/S11).

HttpFetcher is the reference CrawlerWorker.download re-expressed
(/root/reference/src/main/java/org/raisercostin/jcrawler/JCrawler.java:1263-1326):
an Arrow-batched ``mapInPandas`` over the wave — each executor task issues
the HTTP GETs for its own partition of the wave, with the reference's fixed
browser header block (JCrawler.java:1271-1303, minus the excluded
Cookie/Referer/Connection/Host, :1304-1305). There is no corpus side, no
broadcast, and no driver state: fetch cost scales with the wave and with
executors, which is the production shape the SyntheticFetcher's join only
stands in for.

Semantics matched to the reference:
  * redirects are NOT followed (java.net.http.HttpClient's default policy
    NEVER, JCrawler.java:1265) — the 3xx status plus its Location header is
    captured so the engine's redirect pseudo-link appends downstream
    (JCrawler.java:1428-1444);
  * Content-Encoding is honored (gzip/deflate via functions.compress —
    br/zstd raise their gated stub errors, JCrawler.java:790-821);
  * a transport failure produces an ERROR ROW (url kept, error message set,
    status NULL) — the reference marks the host failing and records error
    metadata rather than crashing the crawl (JCrawler.java:1126-1131).

CachedFetcher is the disk-cache path (S9/S11, JCrawler.java:762-788,
1379-1398): wave rows whose URL exists in a prior crawl's committed pages
table are served from it — including the MEMOIZED LINKS COLUMN, so the
engine skips re-extraction for them (links.json memoization) — and only
cache misses are forwarded to an inner fetcher. With ``inner=None`` the
crawl runs fully offline from the cache.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jcrawler_spark import schemas
from jcrawler_spark.functions import compress
from jcrawler_spark.functions.headers import parse_headers

# the reference's fixed browser request headers (JCrawler.java:1271-1303);
# br/zstd stay advertised like the reference — servers that use them will
# surface the gated stub error rather than silently mis-decode
REFERENCE_HEADER_BLOCK = """
Accept: text/html,application/xhtml+xml,application/xml;q=0.9,image/avif,image/webp,image/apng,*/*;q=0.8,application/signed-exchange;v=b3;q=0.7
Accept-Encoding: gzip, deflate, br, zstd, identity
Accept-Language: en-US,en;q=0.9,ro;q=0.8,hu;q=0.7
Referer: https://cgi.njoyn.com/
Upgrade-Insecure-Requests: 1
User-Agent: Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/130.0.0.0 Safari/537.36
Cache-Control: no-cache
Pragma: no-cache
Sec-Fetch-Dest: document
Sec-Fetch-Mode: navigate
Sec-Fetch-Site: none
Sec-Fetch-User: ?1
sec-ch-ua: "Chromium";v="130", "Google Chrome";v="130", "Not?A_Brand";v="99"
sec-ch-ua-mobile: ?0
sec-ch-ua-platform: "Windows"
"""
# the reference excludes these before sending (JCrawler.java:1304-1305)
EXCLUDED_HEADERS = ("Cookie", "Referer", "Connection", "Host")

_FETCH_COLS = T.StructType(
    [
        T.StructField("html", T.BinaryType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def request_headers() -> list[tuple[str, str]]:
    """The exact (name, value) pairs the reference sends, via the same
    header-block parser (functions.headers, JCrawler.java:1328-1366)."""
    pairs = []
    for line in parse_headers(REFERENCE_HEADER_BLOCK, *EXCLUDED_HEADERS):
        name, _, value = line.partition(":")
        pairs.append((name.strip(), value.strip()))
    return pairs


def fetch_one(url: str, timeout_s: float, max_bytes: int) -> dict:
    """One GET, reference semantics (no redirect follow, error rows)."""
    import urllib.error
    import urllib.request

    class _NoRedirect(urllib.request.HTTPRedirectHandler):
        def redirect_request(self, req, fp, code, msg, headers, newurl):
            return None  # HttpClient default: Redirect.NEVER

    out = {
        "html": None,
        "status": None,
        "location": None,
        "content_type": None,
        "text": None,
        "error": None,
    }
    opener = urllib.request.build_opener(_NoRedirect)
    req = urllib.request.Request(url, method="GET")
    for name, value in request_headers():
        req.add_header(name, value)
    try:
        with opener.open(req, timeout=timeout_s) as resp:
            body = resp.read(max_bytes)
            enc = resp.headers.get("Content-Encoding")
            try:
                body = compress.decompress(body, enc)
            except NotImplementedError as e:  # gated br/zstd stub
                out["error"] = f"decode error: {e}"
                body = None
            out["html"] = body
            out["status"] = int(resp.status)
            out["location"] = resp.headers.get("Location")
            out["content_type"] = resp.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        # non-2xx WITH a response: a valid fetch result, not an error row
        # (the reference records 3xx/4xx pages and extracts their redirect
        # links, JCrawler.java:1417-1444)
        body = e.read(max_bytes) if e.fp is not None else None
        out["status"] = int(e.code)
        out["location"] = e.headers.get("Location") if e.headers else None
        out["content_type"] = e.headers.get("Content-Type") if e.headers else None
        out["html"] = body
    except Exception as e:  # transport failure → error row
        out["error"] = f"connect error: {e}"
    return out


class HttpFetcher:
    """mapInPandas HTTP fetcher over the wave (see module docstring).

    Engine contract: ``fetch(wave, approx_rows=None)`` returns the wave's
    columns + (html, status, location, content_type, text, error) — the
    exact shape SyntheticFetcher produces.

    GETs within each Arrow batch run CONCURRENTLY on a bounded thread pool,
    with a per-host semaphore capping in-flight requests at
    ``max_connections`` — the reference's token pool
    (JCrawler.java:868,892-897: a Semaphore-guarded connection budget that
    workers acquire per request). Task wall-time is therefore
    ~max(per-host ceil(n/max_connections) × latency), not Σ latencies.
    Threads waiting on a host token occupy a pool slot — same blocking
    semantics as the reference's ``semaphore.acquire()``; size ``pool_size``
    ≥ expected distinct hosts per batch × max_connections to avoid it."""

    def __init__(self, timeout_s: float = 20.0, max_bytes: int = 64 << 20,
                 fetch_partitions: int | None = None,
                 max_connections: int = 3, pool_size: int = 32):
        self.timeout_s = timeout_s
        self.max_bytes = max_bytes
        # spread the wave across this many tasks (politeness upstream
        # already capped per-host rows; more tasks = more parallel hosts)
        self.fetch_partitions = fetch_partitions
        # per-host concurrent-request cap (reference token pool); None/0 =
        # unbounded within the pool
        self.max_connections = max_connections
        # total concurrent GETs per task (pool threads per Arrow batch)
        self.pool_size = pool_size

    def fetch(self, wave: DataFrame, approx_rows: int | None = None) -> DataFrame:
        out_schema = T.StructType(
            list(wave.schema.fields) + list(_FETCH_COLS.fields)
        )
        timeout_s, max_bytes = self.timeout_s, self.max_bytes
        max_conn, pool_size = self.max_connections, self.pool_size

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import threading
            from concurrent.futures import ThreadPoolExecutor
            from urllib.parse import urlsplit

            for b in batches:
                urls = list(b["url"])
                if "host" in b.columns:
                    hosts = list(b["host"])
                else:
                    hosts = [urlsplit(u).hostname or "" for u in urls]
                results: list[dict | None] = [None] * len(urls)
                sems = (
                    {h: threading.Semaphore(max_conn) for h in set(hosts)}
                    if max_conn
                    else None
                )

                def work(i: int) -> None:
                    if sems is None:
                        results[i] = fetch_one(urls[i], timeout_s, max_bytes)
                        return
                    with sems[hosts[i]]:
                        results[i] = fetch_one(urls[i], timeout_s, max_bytes)

                n_workers = max(1, min(pool_size, len(urls)))
                if n_workers == 1:
                    for i in range(len(urls)):
                        work(i)
                else:
                    with ThreadPoolExecutor(max_workers=n_workers) as ex:
                        list(ex.map(work, range(len(urls))))
                r = pd.DataFrame(results, columns=[f.name for f in _FETCH_COLS])
                yield pd.concat(
                    [b.reset_index(drop=True), r.reset_index(drop=True)], axis=1
                )

        src = wave
        if self.fetch_partitions:
            src = src.repartition(self.fetch_partitions)
        return src.mapInPandas(run, schema=out_schema)


class CachedFetcher:
    """Serve wave rows from a committed pages table; forward misses.

    ``cache_pages`` is an engine pages table (SnapshotStore ``read("pages")``
    of a prior crawl): rows that were actually fetched (not gate-skipped,
    no error) become cache entries, latest superstep wins. Hits return with
    their memoized ``links`` array — the engine coalesces it in place of
    re-extraction (JCrawler.java:1379-1398 links.json memoization) unless
    ``config.recompute_links`` is set. Because the state table stores
    metadata+links rather than bodies, ``recompute_links`` with a
    CachedFetcher refetches through ``inner`` (the body cache of the
    reference maps to the corpus/content store here — DIVERGENCES.md #14).
    """

    def __init__(self, cache_pages: DataFrame, inner=None):
        from pyspark.sql import Window

        w = Window.partitionBy("url").orderBy(F.col("superstep").desc())
        # The deduped projection is STATIC for the whole crawl, so it is
        # materialized ONCE (persist): without this, every superstep's
        # cache-hit join re-ran the Window + full-cache shuffle (VERDICT r3
        # #3 — an O(cache-state) cost per wave). The persisted plan ends at
        # the Window's hash(url) Exchange, so InMemoryRelation reports
        # outputPartitioning = hashpartitioning(url): each per-superstep
        # join shuffles ONLY the wave side (asserted by explain_audit
        # "cached-fetcher join"). AQE is switched off for the persist call
        # only — an AdaptiveSparkPlan cached representation reports
        # UnknownPartitioning, which re-inserts a cache-side Exchange into
        # every join (observed on 4.1.2). On a real cluster the same
        # projection is a bucketed-by-url table (Iceberg bucket
        # transform), which this persist stands in for at sandbox scale.
        proj = (
            cache_pages.where(~F.col("skipped") & F.col("error").isNull())
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(
                "url",
                F.col("status").alias("c_status"),
                F.col("location").alias("c_location"),
                F.col("content_type").alias("c_content_type"),
                F.col("links").alias("c_links"),
            )
        )
        spark = cache_pages.sparkSession
        prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            # CacheManager compiles the cached physical plan at persist()
            # time, so the AQE-off window need only cover this call
            self.cache = proj.persist()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        self.inner = inner

    def close(self) -> None:
        """Release the materialized cache projection."""
        self.cache.unpersist()

    def fetch(self, wave: DataFrame, approx_rows: int | None = None) -> DataFrame:
        # never broadcast the cache side (may be huge); the persisted,
        # hash(url)-partitioned projection makes this a one-sided shuffle
        joined = wave.join(self.cache, "url", "left")
        hit = F.col("c_status").isNotNull()
        hits = (
            joined.where(hit)
            .select(
                *[F.col(c) for c in wave.columns],
                F.lit(None).cast("binary").alias("html"),
                F.col("c_status").alias("status"),
                F.col("c_location").alias("location"),
                F.col("c_content_type").alias("content_type"),
                F.lit(None).cast("string").alias("text"),
                F.lit(None).cast("string").alias("error"),
                F.col("c_links").alias("links"),
            )
        )
        misses = joined.where(~hit).select(*[F.col(c) for c in wave.columns])
        if self.inner is not None:
            try:
                fetched = self.inner.fetch(misses, approx_rows=approx_rows)
            except TypeError:
                fetched = self.inner.fetch(misses)
            fetched = fetched.withColumn(
                "links", F.lit(None).cast(schemas.LINKS_ARRAY)
            )
        else:
            fetched = misses.select(
                "*",
                F.lit(None).cast("binary").alias("html"),
                F.lit(None).cast("int").alias("status"),
                F.lit(None).cast("string").alias("location"),
                F.lit(None).cast("string").alias("content_type"),
                F.lit(None).cast("string").alias("text"),
                F.lit("cache miss: offline (no inner fetcher)").alias("error"),
                F.lit(None).cast(schemas.LINKS_ARRAY).alias("links"),
            )
        return hits.unionByName(fetched)
