"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator family from
SURVEY.md §2 (crawl dataflow: scalars, extraction, filters, dedup,
scheduling, traversal) plus the training-data-pipeline operators
(exact/MinHash-LSH/SimHash/Jaccard dedup, cosine/LSH similarity search,
language-ID, quality scoring, token counting, fingerprinting, multimodal
plumbing). `oracle_sql()` carries the DuckDB-equivalent ANSI SQL for every
SQL-expressible query; genuinely non-SQL ops (the crawl wave itself, media
feature extraction) are rows-only by design.

Column names and types are aligned pairwise (ints as BIGINT, floats rounded
where summation order could differ). Deterministic synthesized columns
(URLs, links, statuses) are derived from the sf tables by identical
arithmetic on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from media_oracle import MEDIA_SQL as _MEDIA_SQL

from jcrawler_spark import corpus
from jcrawler_spark.functions import c4, generators, htmlnorm, pagediff, textops, urlops
from jcrawler_spark.operators import accept as accept_ops
from jcrawler_spark.operators import dedup, extract, graph, multimodal, quality, similarity

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

_SHIPPED: set[int] = set()


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship jcrawler_spark to executors via addPyFile — works even when the
    caller's JVM predates this import (env-var PYTHONPATH fixes cannot)."""
    key = id(spark.sparkContext)
    if key in _SHIPPED:
        return
    import os
    import tempfile
    import zipfile

    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "jcrawler_spark")
    zpath = os.path.join(tempfile.gettempdir(), "jcrawler_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                    z.write(full, rel)
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception:
        pass  # already added in this context
    _SHIPPED.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# deterministic URL synthesized from documents — same arithmetic in SQL
_URL_SQL = (
    "'https://docs' || (doc_id % 7) || '.example/' || source || '/doc-' || doc_id"
    " || (CASE WHEN doc_id % 3 = 0 THEN '?ref=' || lang ELSE '' END)"
    " || (CASE WHEN doc_id % 5 = 0 THEN '#frag' ELSE '' END)"
)


def _url_col() -> F.Column:
    return F.concat(
        F.lit("https://docs"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/"),
        F.col("source"),
        F.lit("/doc-"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit("?ref="), F.col("lang"))
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#frag")).otherwise(F.lit("")),
    )


# ---------------------------------------------------------------------------
# crawl scalar operators (SURVEY.md §2.5; Slug.java goldens)
# ---------------------------------------------------------------------------


def q_url_hash(spark, sf_dir):
    """Slug.urlHash: sha-256 of the sanitized URL (Slug.java:176-196)."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_col())
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "url",
        urlops.url_hash_col(F.col("url")).alias("url_hash"),
    )


# Lockstep note: the synthetic URLs contain no '%'/'+' escapes, so
# sanitize's decode leg (fixed-point iterated in urlops.sanitize, 4×
# unrolled in sanitize_col — DIVERGENCES.md #1) is the identity here and
# the SQL form needs only strip-fragment + lowercase.
_URL_HASH_SQL = f"""
SELECT doc_id, url, sha256(lower(regexp_replace(url, '#.*$', ''))) AS url_hash
FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents)
"""


def q_slug_path(spark, sf_dir):
    """Slug.path: wget-style relative path, '?'->'@' (Slug.java:198-233)."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_col())
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        urlops.slug_path_col(F.col("url")).alias("path"),
    )


_SLUG_PATH_SQL = f"""
SELECT doc_id,
  (CASE WHEN p LIKE '%/' THEN p || '/index.html' ELSE p END) AS path
FROM (
  SELECT doc_id,
    translate(
      regexp_replace(replace(lower(regexp_replace(url, '#.*$', '')), '?', '@'),
                     '^[^:]+://', ''),
      ':*"<>|', '') AS p
  FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents)
)
"""


def q_host_extract(spark, sf_dir):
    """P5 hostname extraction (HyperLink.java:77-82)."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _url_col())
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        urlops.host_col(F.col("url")).alias("host"),
    )


_HOST_SQL = f"""
SELECT doc_id, regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host
FROM (SELECT doc_id, {_URL_SQL} AS url FROM documents)
"""

# SURT fixture URLs: every structural branch of the transform — www + port +
# unsorted multi-param query + fragment, userinfo, all-uppercase, bare host
# (no path), no authority at all, and a dangling '?'.
_SURT_URL_SQL = (
    "(CASE doc_id % 6"
    " WHEN 0 THEN 'https://www.docs' || (doc_id % 7) || '.example:8080/'"
    "   || source || '/doc-' || doc_id || '?b=' || doc_id || '&a=1#frag'"
    " WHEN 1 THEN 'http://u:p@sub.docs' || (doc_id % 7) || '.example/doc-'"
    "   || doc_id"
    " WHEN 2 THEN 'HTTPS://WWW.DOCS' || (doc_id % 7) || '.EXAMPLE/UP '"
    "   || doc_id || '?Z=9&A=' || doc_id"
    " WHEN 3 THEN 'https://docs' || (doc_id % 7) || '.example'"
    " WHEN 4 THEN 'doc-' || doc_id || chr(10) || '/relative?x=1#f'"
    "   || chr(10) || 'rag'"
    " ELSE 'https://docs' || (doc_id % 7) || '.example/p?' END)"
)


def _surt_url_col() -> F.Column:
    d = F.col("doc_id").cast("string")
    h = (F.col("doc_id") % 7).cast("string")
    return (
        F.when(
            F.col("doc_id") % 6 == 0,
            F.concat(
                F.lit("https://www.docs"), h, F.lit(".example:8080/"),
                F.col("source"), F.lit("/doc-"), d, F.lit("?b="), d,
                F.lit("&a=1#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 6 == 1,
            F.concat(
                F.lit("http://u:p@sub.docs"), h, F.lit(".example/doc-"), d
            ),
        )
        .when(
            F.col("doc_id") % 6 == 2,
            F.concat(
                # raw space in the path: the key must percent-encode it
                F.lit("HTTPS://WWW.DOCS"), h, F.lit(".EXAMPLE/UP "), d,
                F.lit("?Z=9&A="), d,
            ),
        )
        .when(
            F.col("doc_id") % 6 == 3,
            F.concat(F.lit("https://docs"), h, F.lit(".example")),
        )
        .when(
            # no authority + raw newline + fragment straddling a newline:
            # exercises the whitespace escapes AND the (?s) dotall parity
            # of the fragment strip across all three engines
            F.col("doc_id") % 6 == 4,
            F.concat(F.lit("doc-"), d, F.lit("\n/relative?x=1#f\nrag")),
        )
        .otherwise(F.concat(F.lit("https://docs"), h, F.lit(".example/p?")))
    )


def q_surt_key(spark, sf_dir):
    """SURT canonical key (Common-Crawl cc-index / CDXJ interchange): the
    sort-friendly URL transform every CDX consumer binary-searches archives
    by — the key write_warc_files stamps into its .cdxj companions
    (sources/warc.py). Pure Column form (urlops.surt_col: regex/array
    built-ins, whole-stage codegen); the oracle re-derives the transform
    step-by-step in DuckDB list/regexp functions."""
    docs = _t(spark, sf_dir, "documents").withColumn("url", _surt_url_col())
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("url"),
        urlops.surt_col(F.col("url")).alias("surt"),
    )


_SURT_SQL = f"""
WITH t AS (
  SELECT doc_id, url,
         regexp_replace(lower(trim(url)), '(?s)#.*$', '') AS u
  FROM (SELECT doc_id, {_SURT_URL_SQL} AS url FROM documents)
), a AS (
  SELECT doc_id, url, u,
         regexp_matches(u, '^[a-z][a-z0-9+.-]*://') AS has_auth,
         regexp_replace(
           regexp_extract(u, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1),
           '^.*@', '') AS auth,
         regexp_replace(u, '^[a-z][a-z0-9+.-]*://[^/?#]*', '') AS rest
  FROM t
), b AS (
  SELECT doc_id, url, u, has_auth, rest,
         regexp_extract(auth, '(:[0-9]+)$', 1) AS port,
         regexp_replace(
           regexp_replace(auth, ':[0-9]+$', ''), '^www\\.', '') AS host,
         CASE WHEN regexp_replace(rest, '(?s)\\?.*$', '') = '' THEN '/'
              ELSE regexp_replace(rest, '(?s)\\?.*$', '') END AS path,
         CASE WHEN contains(rest, '?')
              THEN regexp_extract(rest, '(?s)\\?(.*)$', 1) ELSE '' END AS q
  FROM a
)
SELECT doc_id, url,
  replace(replace(replace(replace(
    CASE WHEN has_auth THEN
      (CASE WHEN host = '' THEN ''
            ELSE array_to_string(list_reverse(string_split(host, '.')), ',')
       END) || port || ')' || path ||
      (CASE WHEN q = '' THEN ''
            ELSE '?' || array_to_string(list_sort(string_split(q, '&')), '&')
       END)
    ELSE u END,
    ' ', '%20'), chr(9), '%09'), chr(13), '%0d'), chr(10), '%0a') AS surt
FROM b
"""

_LINK_SQL = (
    "(CASE doc_id % 4"
    " WHEN 0 THEN 'https://ok.example/' || doc_id"
    " WHEN 1 THEN 'tel:+40' || doc_id"
    " WHEN 2 THEN 'mailto:u' || doc_id || '@x.y'"
    " ELSE 'javascript:void(' || doc_id || ')' END)"
)


def _link_col() -> F.Column:
    d = F.col("doc_id").cast("string")
    return (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.lit("https://ok.example/"), d))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.lit("tel:+40"), d))
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("mailto:u"), d, F.lit("@x.y")),
        )
        .otherwise(F.concat(F.lit("javascript:void("), d, F.lit(")")))
    )


def q_protocol_filter(spark, sf_dir):
    """F1 unsupported-protocol filter (JCrawler.java:908-914,942-943)."""
    docs = _t(spark, sf_dir, "documents").withColumn("link", _link_col())
    return docs.where(~urlops.unsupported_protocol_col(F.col("link"))).select(
        F.col("doc_id").cast("long").alias("doc_id"), "link"
    )


_PROTOCOL_SQL = f"""
SELECT doc_id, link FROM (SELECT doc_id, {_LINK_SQL} AS link FROM documents)
WHERE NOT regexp_matches(lower(link),
  '^(tel|mailto|javascript|data|blob|file|ftp|ssh|git):')
"""

_RES_URL_SQL = (
    "('https://r.example/f' || doc_id ||"
    " (CASE doc_id % 6 WHEN 0 THEN '.pdf' WHEN 1 THEN '.jpg' WHEN 2 THEN '.css'"
    " WHEN 3 THEN '.js' WHEN 4 THEN '.html' ELSE '' END))"
)


def q_resource_classify(spark, sf_dir):
    """P2 resource classification by extension (JCrawler.java:443-449)."""
    d = F.col("doc_id").cast("string")
    ext = (
        F.when(F.col("doc_id") % 6 == 0, F.lit(".pdf"))
        .when(F.col("doc_id") % 6 == 1, F.lit(".jpg"))
        .when(F.col("doc_id") % 6 == 2, F.lit(".css"))
        .when(F.col("doc_id") % 6 == 3, F.lit(".js"))
        .when(F.col("doc_id") % 6 == 4, F.lit(".html"))
        .otherwise(F.lit(""))
    )
    docs = _t(spark, sf_dir, "documents").withColumn(
        "res_url", F.concat(F.lit("https://r.example/f"), d, ext)
    )
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "res_url",
        urlops.is_resource_ext_col(F.col("res_url")).alias("is_resource"),
    )


_RESOURCE_SQL = f"""
SELECT doc_id, res_url,
  regexp_matches(lower(res_url), '\\.(pdf|zip|mp3|avi|jpg|png|css|js)$') AS is_resource
FROM (SELECT doc_id, {_RES_URL_SQL} AS res_url FROM documents)
"""


def q_seed_range(spark, sf_dir):
    """S1 range seed generator, Spark-side (Generators.java:115-128)."""
    return generators.range_seeds(spark, "https://h.example/p/%s", 1, 200)


_SEED_RANGE_SQL = """
SELECT 'https://h.example/p/' || i AS url FROM generate_series(1, 200) t(i)
"""


def q_seed_alternatives(spark, sf_dir):
    """S2+S3 alternatives/cartesian generators (Generators.java:131-159)."""
    urls = generators.generate("https://{www.|}h{1-3}.example/{a|b}")
    return spark.createDataFrame([(u,) for u in urls], ["url"])


_SEED_ALT_SQL = """
SELECT 'https://' || w || 'h' || i || '.example/' || p AS url
FROM unnest(['www.', '']) t1(w), generate_series(1, 3) t2(i), unnest(['a', 'b']) t3(p)
"""


# ---------------------------------------------------------------------------
# link extraction + redirects (SURVEY.md §2.3)
# ---------------------------------------------------------------------------


def _synth_pages(spark, sf_dir) -> DataFrame:
    d = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit('<a href="/p/'), d, F.lit('">'), F.col("source"), F.lit("</a>"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<img src="/img/'), d, F.lit('.png">')),
        ).otherwise(F.lit("")),
    )
    return (
        _t(spark, sf_dir, "documents")
        .withColumn(
            "url",
            F.concat(
                F.lit("https://d"), (F.col("doc_id") % 7).cast("string"),
                F.lit(".example/page/"), d,
            ),
        )
        .withColumn("html", html.cast("binary"))
        .withColumn("status", F.lit(200))
        .withColumn("content_type", F.lit("text/html"))
        .withColumn("location", F.lit(None).cast("string"))
    )


def q_link_extract(spark, sf_dir):
    """The 16-matcher regex extractor as an Arrow UDF + explode
    (JCrawler.java:344-417,420-559), URL resolution included."""
    pages = _synth_pages(spark, sf_dir)
    return (
        pages.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.explode(
                extract.extract_links_udf(
                    "html", "url", "status", "content_type", "location"
                )
            ).alias("l"),
        )
        .select(
            "doc_id",
            F.col("l.url").alias("link_url"),
            F.col("l.text").alias("anchor_text"),
            F.col("l.is_resource").alias("is_resource"),
            F.col("l.order_in_page").cast("long").alias("pos"),
        )
    )


# NOTE: anchor_text is '' even for <a> links — the shipped reference
# captures the (?<text>...) group but passes `directive != null ?
# directive : ""` as the HyperLink text (JCrawler.java:500-501), so
# anchor text is discarded; we replicate that observable behavior.
_LINK_EXTRACT_SQL = """
SELECT doc_id,
  'https://d' || (doc_id % 7) || '.example/p/' || doc_id AS link_url,
  '' AS anchor_text, false AS is_resource, 0::BIGINT AS pos
FROM documents
UNION ALL
SELECT doc_id,
  'https://d' || (doc_id % 7) || '.example/img/' || doc_id || '.png' AS link_url,
  '' AS anchor_text, true AS is_resource, 1::BIGINT AS pos
FROM documents WHERE doc_id % 2 = 0
"""


def q_redirect_links(spark, sf_dir):
    """3xx redirect pseudo-links (JCrawler.java:1428-1444): depth+1,
    text 'Moved - http status N', extension-classified."""
    n = _t(spark, sf_dir, "documents").count()
    d = F.col("doc_id")
    target = F.concat(
        F.lit("https://d"), (((d * 13 + 1) % n) % 7).cast("string"),
        F.lit(".example/t/"), ((d * 13 + 1) % n).cast("string"),
        F.when(d % 100 == 51, F.lit(".pdf")).otherwise(F.lit("")),
    )
    pages = (
        _t(spark, sf_dir, "documents")
        .where(d % 50 == 1)
        .withColumn(
            "url",
            F.concat(F.lit("https://d"), (d % 7).cast("string"),
                     F.lit(".example/page/"), d.cast("string")),
        )
        .withColumn("html", F.lit(None).cast("binary"))
        .withColumn("status", F.lit(301))
        .withColumn("content_type", F.lit("text/html"))
        .withColumn("location", target)
    )
    return (
        pages.select(
            F.col("url").alias("src_url"),
            F.explode(
                extract.extract_links_udf(
                    "html", "url", "status", "content_type", "location"
                )
            ).alias("l"),
        )
        .select(
            "src_url",
            F.col("l.url").alias("target_url"),
            F.col("l.text").alias("text"),
            F.col("l.is_resource").alias("is_resource"),
            F.col("l.is_redirect").alias("is_redirect"),
        )
    )


_REDIRECT_SQL = """
SELECT
  'https://d' || (doc_id % 7) || '.example/page/' || doc_id AS src_url,
  'https://d' || (((doc_id*13+1) % (SELECT count(*) FROM documents)) % 7)
    || '.example/t/' || ((doc_id*13+1) % (SELECT count(*) FROM documents))
    || (CASE WHEN doc_id % 100 = 51 THEN '.pdf' ELSE '' END) AS target_url,
  'Moved - http status 301' AS text,
  (doc_id % 100 = 51) AS is_resource,
  true AS is_redirect
FROM documents WHERE doc_id % 50 = 1
"""

_EXT_LINK_SQL = (
    "(CASE doc_id % 3"
    " WHEN 0 THEN 'https://accepted.example/p/' || doc_id"
    " WHEN 1 THEN 'https://ext' || (doc_id % 4) || '.example/x'"
    " ELSE 'mailto:a@b' || doc_id || '.c' END)"
)


def q_ignored_domains(spark, sf_dir):
    """F6/A3 external-domain side-output: sorted distinct rejected hosts
    (JCrawler.java:916-937,672-684)."""
    d = F.col("doc_id").cast("string")
    link = (
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit("https://accepted.example/p/"), d))
        .when(F.col("doc_id") % 3 == 1,
              F.concat(F.lit("https://ext"), (F.col("doc_id") % 4).cast("string"),
                       F.lit(".example/x")))
        .otherwise(F.concat(F.lit("mailto:a@b"), d, F.lit(".c")))
    )
    links = _t(spark, sf_dir, "documents").select(
        link.alias("url"),
        F.lit(0).alias("depth"),
        F.lit(False).alias("is_resource"),
        F.lit(False).alias("is_redirect"),
    )
    return accept_ops.ignored_domains(
        accept_ops.with_accept(links, ["https://accepted.example"])
    )


_IGNORED_SQL = f"""
SELECT DISTINCT regexp_extract(link, '^[a-z]+://([^/]+)', 1) AS host
FROM (SELECT {_EXT_LINK_SQL} AS link FROM documents)
WHERE link LIKE 'https://ext%'
ORDER BY host
"""


# ---------------------------------------------------------------------------
# dedup / scheduling / traversal (SURVEY.md §2.4)
# ---------------------------------------------------------------------------


def q_first_wins_dedup(spark, sf_dir):
    """A1 first-occurrence-wins dedup (JCrawler.java:1236-1238) over
    lineitem (l_orderkey,l_partkey) keyed groups ordered by l_linenumber."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey", "l_partkey").orderBy("l_linenumber")
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("l_orderkey").cast("long").alias("l_orderkey"),
            F.col("l_partkey").cast("long").alias("l_partkey"),
            F.col("l_linenumber").cast("long").alias("first_line"),
        )
    )


_FIRST_WINS_SQL = """
SELECT l_orderkey, l_partkey, l_linenumber AS first_line FROM (
  SELECT l_orderkey, l_partkey, l_linenumber,
    row_number() OVER (PARTITION BY l_orderkey, l_partkey ORDER BY l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def q_politeness_window(spark, sf_dir):
    """T7 per-host politeness budget as the two-phase salted top-k the
    engine uses (JCrawler.java:868,892-897 token pool → per-host window):
    first 3 events per user_id by (ts,event_id)."""
    ev = _t(spark, sf_dir, "events")
    b, nsalt = 3, 16
    w1 = Window.partitionBy("user_id", "salt").orderBy("ts", "event_id")
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(nsalt)))
        .withColumn("rn1", F.row_number().over(w1))
        .where(F.col("rn1") <= b)
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= b)
        .select(
            F.col("user_id").cast("long").alias("user_id"),
            F.col("event_id").cast("long").alias("event_id"),
            F.col("rn").cast("long").alias("rn"),
        )
    )


_POLITENESS_SQL = """
SELECT user_id, event_id, rn FROM (
  SELECT user_id, event_id,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn <= 3
"""


def q_failing_host_gate(spark, sf_dir):
    """F7 failing-host backoff (JCrawler.java:870-872,1000-1003): drop
    events within 600s after the user's previous 'error' event."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_err = F.max(
        F.when(F.col("event_type") == "error", F.col("ts"))
    ).over(w)
    return (
        ev.withColumn("last_err", last_err)
        .where(
            F.col("last_err").isNull()
            | (F.col("ts") > F.col("last_err") + F.expr("INTERVAL 600 SECONDS"))
        )
        .select(
            F.col("event_id").cast("long").alias("event_id"),
            F.col("user_id").cast("long").alias("user_id"),
        )
    )


_FAILING_GATE_SQL = """
SELECT event_id, user_id FROM (
  SELECT event_id, user_id, ts,
    max(CASE WHEN event_type = 'error' THEN ts END) OVER (
      PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_err
  FROM events
) WHERE last_err IS NULL OR ts > last_err + INTERVAL 600 SECOND
"""


def q_bfs_reachability(spark, sf_dir):
    """T1 BFS traversal distilled: min-depth over the synthetic K=3 tree +
    cross-links graph (the engine's wave loop, JCrawler.java:568-574),
    verified against a recursive-CTE oracle."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    tree = None
    for j in (1, 2, 3):
        e = ids.select(
            F.col("doc_id").alias("src"), (F.col("doc_id") * 3 + j).alias("dst")
        ).where(F.col("dst") < n)
        tree = e if tree is None else tree.unionByName(e)
    cross = ids.where(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 7) % n).alias("dst")
    )
    edges = tree.unionByName(cross)
    sources = spark.createDataFrame([(0,)], ["doc_id"])
    return graph.bfs_min_depth(edges, sources, max_depth=25)


_BFS_SQL = """
WITH RECURSIVE edges AS (
  SELECT doc_id AS src, doc_id*3 + j AS dst
  FROM documents, unnest([1,2,3]) t(j)
  WHERE doc_id*3 + j < (SELECT count(*) FROM documents)
  UNION ALL
  SELECT doc_id, (doc_id*7) % (SELECT count(*) FROM documents)
  FROM documents WHERE doc_id % 10 = 3
),
r AS (
  SELECT 0::BIGINT AS id, 0::BIGINT AS depth
  UNION
  SELECT e.dst, r.depth + 1 FROM r JOIN edges e ON e.src = r.id
  WHERE r.depth < 25
)
SELECT id AS doc_id, min(depth) AS depth FROM r GROUP BY id
"""


def q_pagerank(spark, sf_dir):
    """Frontier-prioritization PageRank over the same synthetic link graph
    as bfs_reachability (K=3 tree + cross-links): 8 power iterations,
    damping 0.85, dangling mass shared uniformly (operators/graph.pagerank
    — the scheduler input for authority-ordered politeness waves). The
    oracle is the identical recurrence unrolled into 8 DuckDB CTE stages;
    ranks rounded to 8 decimals on both sides (sum-order ulp)."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    tree = None
    for j in (1, 2, 3):
        e = ids.select(
            F.col("doc_id").alias("src"), (F.col("doc_id") * 3 + j).alias("dst")
        ).where(F.col("dst") < n)
        tree = e if tree is None else tree.unionByName(e)
    cross = ids.where(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 7) % n).alias("dst")
    )
    edges = tree.unionByName(cross)
    ranks = graph.pagerank(edges, ids, n_iter=8, damping=0.85)
    return ranks.select("doc_id", F.round("rank", 8).alias("rank_r8"))


def _pagerank_oracle_sql(n_iter: int = 8) -> str:
    """The pagerank recurrence unrolled: one (dangling, contrib, ranks)
    CTE triple per iteration — independent DuckDB arithmetic over the
    same synthesized edge list as _BFS_SQL. Every CTE is MATERIALIZED:
    DuckDB inlines CTEs by default, and pr{k-1} is referenced 3x per
    iteration, so inlining is a 3^n_iter plan blowup (measured: 211 s
    inlined vs 0.1 s materialized at n_iter=8)."""
    parts = [
        """
WITH edges AS MATERIALIZED (
  SELECT doc_id AS src, doc_id*3 + j AS dst
  FROM documents, unnest([1,2,3]) t(j)
  WHERE doc_id*3 + j < (SELECT count(*) FROM documents)
  UNION ALL
  SELECT doc_id, (doc_id*7) % (SELECT count(*) FROM documents)
  FROM documents WHERE doc_id % 10 = 3
),
nodes AS MATERIALIZED (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS MATERIALIZED (
  SELECT src, CAST(count(*) AS DOUBLE) AS outd FROM edges GROUP BY src),
pr0 AS MATERIALIZED (SELECT id, 1.0/(SELECT n FROM nn) AS rank FROM nodes)"""
    ]
    for k in range(1, n_iter + 1):
        parts.append(
            f""",
d{k} AS MATERIALIZED (SELECT COALESCE(SUM(p.rank), 0) AS dangling
         FROM pr{k - 1} p LEFT JOIN deg ON deg.src = p.id
         WHERE deg.src IS NULL),
c{k} AS MATERIALIZED (SELECT e.dst AS id, SUM(p.rank / dg.outd) AS s
         FROM pr{k - 1} p
         JOIN edges e ON e.src = p.id
         JOIN deg dg ON dg.src = e.src
         GROUP BY e.dst),
pr{k} AS MATERIALIZED (SELECT nodes.id,
            (1 - 0.85)/(SELECT n FROM nn)
            + 0.85 * (COALESCE(c.s, 0)
                      + (SELECT dangling FROM d{k})/(SELECT n FROM nn)) AS rank
          FROM nodes LEFT JOIN c{k} c ON c.id = nodes.id)"""
        )
    parts.append(
        f"""
SELECT id AS doc_id, round(rank, 8) AS rank_r8 FROM pr{n_iter}"""
    )
    return "".join(parts)


def q_content_path_final(spark, sf_dir):
    """Slug.contentPathFinal (Slug.java:88-110): status-aware final path
    with content-type extension."""
    d = F.col("doc_id")
    status = (
        F.when(d % 50 == 1, F.lit(301))
        .when(d % 100 == 2, F.lit(404))
        .otherwise(F.lit(200))
    )
    docs = (
        _t(spark, sf_dir, "documents")
        .withColumn(
            "url",
            F.concat(F.lit("https://docs"), (d % 7).cast("string"),
                     F.lit(".example/"), F.col("source"), F.lit("/doc-"),
                     d.cast("string")),
        )
        .withColumn("status", status)
    )
    base = urlops.slug_path_col(F.col("url"), strip_query_params=True)
    path = F.concat(
        base,
        F.when(F.col("status") != 200,
               F.concat(F.lit(".E"), F.col("status").cast("string"))
               ).otherwise(F.lit("")),
        F.lit(".html"),
    )
    return docs.select(
        d.cast("long").alias("doc_id"), path.alias("path")
    )


_CPF_SQL = """
SELECT doc_id,
  'docs' || (doc_id % 7) || '.example/' || source || '/doc-' || doc_id
  || (CASE WHEN s != 200 THEN '.E' || s ELSE '' END) || '.html' AS path
FROM (
  SELECT doc_id, source,
    (CASE WHEN doc_id % 50 = 1 THEN 301
          WHEN doc_id % 100 = 2 THEN 404 ELSE 200 END) AS s
  FROM documents
)
"""


def q_localize_join(spark, sf_dir):
    """J1 URL→file localization join (Rewriter.java:363-409): every page's
    outgoing ref looked up in the broadcast url→path map."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    d = F.col("doc_id")
    url = F.concat(F.lit("https://m.example/p/"), d.cast("string"))
    path = F.concat(F.lit("m.example/p/"), d.cast("string"), F.lit(".html"))
    pages = docs.select(url.alias("t_url"), path.alias("path"))
    refs = docs.select(
        url.alias("src_url"),
        F.concat(
            F.lit("https://m.example/p/"), (((d * 3) + 1) % n).cast("string")
        ).alias("ref_url"),
    )
    return refs.join(
        F.broadcast(pages), refs["ref_url"] == pages["t_url"], "left"
    ).select("src_url", "ref_url", F.col("path").alias("local_path"))


_LOCALIZE_SQL = """
WITH pages AS (
  SELECT 'https://m.example/p/' || doc_id AS t_url,
         'm.example/p/' || doc_id || '.html' AS path
  FROM documents
),
refs AS (
  SELECT 'https://m.example/p/' || doc_id AS src_url,
         'https://m.example/p/' ||
           (((doc_id*3)+1) % (SELECT count(*) FROM documents)) AS ref_url
  FROM documents
)
SELECT r.src_url, r.ref_url, p.path AS local_path
FROM refs r LEFT JOIN pages p ON r.ref_url = p.t_url
"""


# ---------------------------------------------------------------------------
# training-data dedup family
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash over a corpus with injected duplicates."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    return dedup.exact_duplicates(docs.unionByName(dup))


_DEDUP_EXACT_SQL = """
WITH u AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
)
SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id,
       count(*) AS n_copies
FROM u GROUP BY md5(text) HAVING count(*) > 1
"""

_SHINGLES = dedup.shingles_sql("text", 3)
_SH_GUARDED = f"(CASE WHEN len({_SHINGLES}) > 0 THEN {_SHINGLES} ELSE [text] END)"


def q_minhash_signatures(spark, sf_dir):
    """MinHash signatures (word-3-gram shingles, 4 permutations)."""
    return dedup.minhash_signatures(
        _t(spark, sf_dir, "documents"), k=3, n_perm=4
    ).select(
        F.col("id").cast("long").alias("id"), "mh0", "mh1", "mh2", "mh3"
    )


_MINHASH_SQL = f"""
SELECT doc_id AS id,
  {dedup.minhash_sql('s', 0)} AS mh0,
  {dedup.minhash_sql('s', 1)} AS mh1,
  {dedup.minhash_sql('s', 2)} AS mh2,
  {dedup.minhash_sql('s', 3)} AS mh3
FROM (SELECT doc_id, {_SH_GUARDED} AS s FROM documents)
"""


def q_lsh_pairs(spark, sf_dir):
    """MinHash-LSH candidate pairs: band the signatures, bucket-join."""
    sigs = dedup.minhash_signatures(_t(spark, sf_dir, "documents"), k=3, n_perm=4)
    return dedup.lsh_candidate_pairs(sigs, n_perm=4, band_size=2).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
    )


_LSH_PAIRS_SQL = f"""
WITH sig AS (
  SELECT doc_id AS id,
    {dedup.minhash_sql('s', 0)} AS mh0, {dedup.minhash_sql('s', 1)} AS mh1,
    {dedup.minhash_sql('s', 2)} AS mh2, {dedup.minhash_sql('s', 3)} AS mh3
  FROM (SELECT doc_id, {_SH_GUARDED} AS s FROM documents)
),
bands AS (
  SELECT id, 0 AS band,
    {dedup.hash60_sql("mh0::VARCHAR || ',' || mh1::VARCHAR")} AS bh FROM sig
  UNION ALL
  SELECT id, 1 AS band,
    {dedup.hash60_sql("mh2::VARCHAR || ',' || mh3::VARCHAR")} AS bh FROM sig
)
SELECT DISTINCT a.id AS id_a, b.id AS id_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
"""


def q_ngram_jaccard(spark, sf_dir):
    """n-gram Jaccard verify over the LSH candidate pairs (near-dup pass)."""
    docs = _t(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(docs, k=3, n_perm=4)
    pairs = dedup.lsh_candidate_pairs(sigs, n_perm=4, band_size=2)
    j = dedup.ngram_jaccard(pairs, docs, k=3)
    return j.where(F.col("jaccard") >= 0.2).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        F.round("jaccard", 3).alias("jaccard_r3"),
    )


_NGRAM_JACCARD_SQL = f"""
WITH sig AS (
  SELECT doc_id AS id,
    {dedup.minhash_sql('s', 0)} AS mh0, {dedup.minhash_sql('s', 1)} AS mh1,
    {dedup.minhash_sql('s', 2)} AS mh2, {dedup.minhash_sql('s', 3)} AS mh3
  FROM (SELECT doc_id, {_SH_GUARDED} AS s FROM documents)
),
bands AS (
  SELECT id, 0 AS band,
    {dedup.hash60_sql("mh0::VARCHAR || ',' || mh1::VARCHAR")} AS bh FROM sig
  UNION ALL
  SELECT id, 1 AS band,
    {dedup.hash60_sql("mh2::VARCHAR || ',' || mh3::VARCHAR")} AS bh FROM sig
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
sh AS (SELECT doc_id AS id, list_distinct({_SHINGLES}) AS s FROM documents)
SELECT p.id_a, p.id_b,
  round(len(list_intersect(sa.s, sb.s))::DOUBLE /
        (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))), 3)
    AS jaccard_r3
FROM pairs p JOIN sh sa ON sa.id = p.id_a JOIN sh sb ON sb.id = p.id_b
WHERE len(list_intersect(sa.s, sb.s))::DOUBLE /
      (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.2
"""


def q_dedup_groups(spark, sf_dir):
    """Near-duplicate clustering end-to-end: MinHash-LSH candidates →
    n-gram Jaccard verify (≥0.2) → connected components. One row per doc
    with a verified duplicate: (doc_id, group_id=component min id,
    is_keeper=canonical member)."""
    docs = _t(spark, sf_dir, "documents")
    g = dedup.duplicate_groups(
        docs, k=3, n_perm=4, band_size=2, threshold=0.2
    )
    return g.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("group_id").cast("long").alias("group_id"),
        "is_keeper",
    )


_DEDUP_GROUPS_SQL = f"""
WITH RECURSIVE sig AS (
  SELECT doc_id AS id,
    {dedup.minhash_sql('s', 0)} AS mh0, {dedup.minhash_sql('s', 1)} AS mh1,
    {dedup.minhash_sql('s', 2)} AS mh2, {dedup.minhash_sql('s', 3)} AS mh3
  FROM (SELECT doc_id, {_SH_GUARDED} AS s FROM documents)
),
bands AS (
  SELECT id, 0 AS band,
    {dedup.hash60_sql("mh0::VARCHAR || ',' || mh1::VARCHAR")} AS bh FROM sig
  UNION ALL
  SELECT id, 1 AS band,
    {dedup.hash60_sql("mh2::VARCHAR || ',' || mh3::VARCHAR")} AS bh FROM sig
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
),
sh AS (SELECT doc_id AS id, list_distinct({_SHINGLES}) AS s FROM documents),
verified AS (
  SELECT p.id_a, p.id_b
  FROM pairs p JOIN sh sa ON sa.id = p.id_a JOIN sh sb ON sb.id = p.id_b
  WHERE len(list_intersect(sa.s, sb.s))::DOUBLE /
        (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s))) >= 0.2
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION
  SELECT id_b AS src, id_a AS dst FROM verified
),
reach AS (
  SELECT src AS id, src AS comp FROM edges
  UNION
  SELECT e.dst AS id, r.comp AS comp FROM reach r JOIN edges e ON e.src = r.id
)
SELECT id AS doc_id, min(comp) AS group_id, (min(comp) = id) AS is_keeper
FROM reach GROUP BY id
"""


def q_simhash(spark, sf_dir):
    """SimHash-32 signatures over whitespace tokens."""
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        dedup.simhash_col(F.col("text"), bits=32).alias("simhash32"),
    )


_SIMHASH_SQL = f"""
SELECT doc_id, {dedup.simhash_sql('text', 32)} AS simhash32 FROM documents
"""


# ---------------------------------------------------------------------------
# similarity search (embeddings)
# ---------------------------------------------------------------------------


def q_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-5 for 8 probe vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    return similarity.brute_force_topk(emb, probes, k=5).select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
        "sim_r3",
    )


_COSINE_SQL = f"""
WITH p AS (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 8),
s AS (
  SELECT p.probe_id, e.vec_id AS neighbor_id,
    {similarity.cosine_sql('p.pv', 'e.embedding')} AS sim
  FROM embeddings e, p WHERE e.vec_id != p.probe_id
)
SELECT probe_id, neighbor_id, rank, round(sim, 3) AS sim_r3 FROM (
  SELECT probe_id, neighbor_id, sim,
    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


def q_lsh_ann_topk(spark, sf_dir):
    """LSH-bucketed approximate top-5 (6 deterministic hyperplanes)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    return similarity.lsh_topk(emb, probes, n_planes=6, dim=64, k=5).select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
    )


_LSH_ANN_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding,
    {similarity.lsh_bucket_sql('embedding', 6, 64)} AS bucket
  FROM embeddings
),
p AS (SELECT vec_id AS probe_id, embedding AS pv, bucket FROM b WHERE vec_id < 8),
s AS (
  SELECT p.probe_id, e.vec_id AS neighbor_id,
    {similarity.cosine_sql('p.pv', 'e.embedding')} AS sim
  FROM b e JOIN p ON e.bucket = p.bucket AND e.vec_id != p.probe_id
)
SELECT probe_id, neighbor_id, rank FROM (
  SELECT probe_id, neighbor_id,
    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""




def q_multiprobe_ann_topk(spark, sf_dir):
    """Flip-one-bit multi-probe ANN (VERDICT r2 #6): same bucket-local join
    as lsh_ann_topk with 7x probe keys (own bucket + 6 one-bit flips);
    recall ≥ single-probe by construction (candidate superset — pinned by
    tests/test_dedup_similarity.py::test_multiprobe_recall)."""
    emb = _t(spark, sf_dir, "embeddings")
    probes = emb.where(F.col("vec_id") < 8)
    return similarity.multiprobe_topk(
        emb, probes, n_planes=6, dim=64, k=5
    ).select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
    )


_MULTIPROBE_ANN_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding,
    {similarity.lsh_bucket_sql('embedding', 6, 64)} AS bucket
  FROM embeddings
),
p0 AS (SELECT vec_id AS probe_id, embedding AS pv, bucket FROM b WHERE vec_id < 8),
p AS (
  SELECT probe_id, pv,
    unnest([bucket, xor(bucket, 1), xor(bucket, 2), xor(bucket, 4),
            xor(bucket, 8), xor(bucket, 16), xor(bucket, 32)]) AS bucket
  FROM p0
),
s AS (
  SELECT p.probe_id, e.vec_id AS neighbor_id,
    {similarity.cosine_sql('p.pv', 'e.embedding')} AS sim
  FROM b e JOIN p ON e.bucket = p.bucket AND e.vec_id != p.probe_id
)
SELECT probe_id, neighbor_id, rank FROM (
  SELECT probe_id, neighbor_id,
    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM s
) WHERE rank <= 5
"""


def q_ivf_trained_topk(spark, sf_dir):
    """IVF ANN with TRAINED centroids (VERDICT r3 #8): Spark-native Lloyd
    k-means (similarity.train_ivf_centroids — deterministic init, rounded
    updates) feeds the same ivf_topk plan. Self-contained deterministic
    embeddings (corpus.embedding_record — integer-derived rationals, so
    Spark and the pure-Python oracle produce byte-identical doubles); the
    oracle replays training via train_ivf_centroids_local and pins the
    search as VALUES."""
    emb = corpus.build_embeddings_df(spark, 240, dim=8, n_clusters=6)
    cents = similarity.train_ivf_centroids(emb, k=6, n_iters=5)
    probes = emb.where(F.col("vec_id") < 8)
    return similarity.ivf_topk(emb, probes, cents, k=5).select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
    )


def _ivf_trained_oracle_sql() -> str:
    import math

    n, dim, ncl, k_cells, iters, topk = 240, 8, 6, 6, 5, 5
    vecs = [
        corpus.embedding_record(i, dim, ncl)["embedding"] for i in range(n)
    ]
    cents = similarity.train_ivf_centroids_local(vecs, k=k_cells, n_iters=iters)

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    def cell_of(v):
        sims = [cos(v, c) for c in cents]
        m = max(sims)
        return min(i for i, s in enumerate(sims) if s == m)

    cells = [cell_of(v) for v in vecs]
    rows = []
    for pid in range(8):
        cands = [
            (cos(vecs[pid], vecs[j]), j)
            for j in range(n)
            if j != pid and cells[j] == cells[pid]
        ]
        cands.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_, j) in enumerate(cands[:topk], start=1):
            rows.append(f"  ({pid}, {j}, {rank})")
    return (
        "SELECT CAST(probe_id AS BIGINT) AS probe_id, "
        "CAST(neighbor_id AS BIGINT) AS neighbor_id, "
        "CAST(rank AS BIGINT) AS rank FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(probe_id, neighbor_id, rank)"
    )


def q_ivf_ann_topk(spark, sf_dir):
    """IVF-style ANN: cells = the 4 lowest-id embeddings standing in for
    k-means centroids (deterministic; production swaps real centroids into
    the IDENTICAL assign/search plan). Corpus bucketed once, probes search
    only their own cell."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("long").alias("cell_id"),
        F.col("embedding").alias("centroid"),
    )
    probes = emb.where((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
    return similarity.ivf_topk(emb, probes, cents, k=5).select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
    )


_IVF_ANN_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings WHERE vec_id < 4
),
assign AS (
  SELECT id, vec, cell_id FROM (
    SELECT e.vec_id AS id, e.embedding AS vec, c.cell_id,
      row_number() OVER (
        PARTITION BY e.vec_id
        ORDER BY {similarity.cosine_sql('e.embedding', 'c.centroid')} DESC, c.cell_id
      ) AS rn
    FROM embeddings e CROSS JOIN cents c
  ) WHERE rn = 1
),
probes AS (
  SELECT id AS probe_id, vec AS probe_vec, cell_id FROM assign
  WHERE id >= 8 AND id < 16
),
sims AS (
  SELECT p.probe_id, a.id AS neighbor_id,
    {similarity.cosine_sql('p.probe_vec', 'a.vec')} AS sim
  FROM assign a JOIN probes p ON a.cell_id = p.cell_id
  WHERE a.id != p.probe_id
)
SELECT probe_id, neighbor_id, rank FROM (
  SELECT probe_id, neighbor_id,
    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
) WHERE rank <= 5
"""


def q_ivf_nprobe_topk(spark, sf_dir):
    """IVF ANN with nprobe=2 (the standard recall knob): each probe
    searches its TWO nearest cells; the corpus stays single-cell-bucketed,
    so the candidate set doubles on the probe side only and recall@k is
    monotone in nprobe (similarity.ivf_topk(nprobe=...))."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = emb.where(F.col("vec_id") < 4).select(
        F.col("vec_id").cast("long").alias("cell_id"),
        F.col("embedding").alias("centroid"),
    )
    probes = emb.where((F.col("vec_id") >= 8) & (F.col("vec_id") < 16))
    return similarity.ivf_topk(emb, probes, cents, k=5, nprobe=2).select(
        F.col("probe_id").cast("long").alias("probe_id"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "rank",
    )


_IVF_NPROBE_SQL = f"""
WITH cents AS (
  SELECT vec_id AS cell_id, embedding AS centroid FROM embeddings WHERE vec_id < 4
),
ranked AS (
  SELECT e.vec_id AS id, e.embedding AS vec, c.cell_id,
    row_number() OVER (
      PARTITION BY e.vec_id
      ORDER BY {similarity.cosine_sql('e.embedding', 'c.centroid')} DESC, c.cell_id
    ) AS rn
  FROM embeddings e CROSS JOIN cents c
),
assign AS (
  SELECT id, vec, cell_id FROM ranked WHERE rn = 1
),
probes AS (
  SELECT id AS probe_id, vec AS probe_vec, cell_id FROM ranked
  WHERE rn <= 2 AND id >= 8 AND id < 16
),
sims AS (
  SELECT p.probe_id, a.id AS neighbor_id,
    {similarity.cosine_sql('p.probe_vec', 'a.vec')} AS sim
  FROM assign a JOIN probes p ON a.cell_id = p.cell_id
  WHERE a.id != p.probe_id
)
SELECT probe_id, neighbor_id, rank FROM (
  SELECT probe_id, neighbor_id,
    row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM sims
) WHERE rank <= 5
"""



def q_cosine_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (dedup family): hyperplane
    bucket → within-bucket pairs → cosine threshold. The synthetic
    embeddings are near-orthogonal (max in-bucket cosine ≈0.45), so the
    contract threshold sits in the populated region (0.33) to produce a
    non-empty verifiable pair set; real near-dup corpora use ≥0.9 with the
    identical plan. Cap disabled here — the SQL oracle is exact all-pairs
    within buckets (test buckets are tiny)."""
    emb = _t(spark, sf_dir, "embeddings")
    return similarity.cosine_near_duplicates(
        emb, threshold=0.33, n_planes=6, dim=64, max_bucket=None
    ).select(
        F.col("id_a").cast("long").alias("id_a"),
        F.col("id_b").cast("long").alias("id_b"),
        "sim_r3",
    )


_COSINE_NEAR_DUP_SQL = f"""
WITH v AS (
  SELECT vec_id AS id, embedding AS vec,
         {similarity.lsh_bucket_sql('embedding', 6, 64)} AS bucket
  FROM embeddings
),
pr AS (
  SELECT a.id AS id_a, b.id AS id_b,
         {similarity.cosine_sql('a.vec', 'b.vec')} AS sim
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.id < b.id
)
SELECT DISTINCT id_a, id_b, round(sim, 3) AS sim_r3 FROM pr WHERE sim >= 0.33
"""


# ---------------------------------------------------------------------------
# text analysis family
# ---------------------------------------------------------------------------


def q_lang_id(spark, sf_dir):
    """Marker-stopword language ID (en/ro/und)."""
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        textops.lang_id_col(F.col("text")).alias("lang_guess"),
    )


_EN = "['the','and','of','to','in','is','that','for','with']"
_RO = "['și','de','la','cu','este','pentru','din','care','sunt']"

_LANG_SQL = f"""
SELECT doc_id,
  (CASE WHEN en = 0 AND ro = 0 THEN 'und'
        WHEN en >= ro THEN 'en' ELSE 'ro' END) AS lang_guess
FROM (
  SELECT doc_id,
    len(list_filter(string_split_regex(lower(text), '\\s+'),
        w -> list_contains({_EN}, w))) AS en,
    len(list_filter(string_split_regex(lower(text), '\\s+'),
        w -> list_contains({_RO}, w))) AS ro
  FROM documents
)
"""


def q_quality_score(spark, sf_dir):
    """Composite quality (length/alpha/stopword ratios) averaged by source."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select("source", textops.quality_score_col(F.col("text")).alias("q"))
        .groupBy("source")
        .agg(F.round(F.avg("q"), 4).alias("avg_quality"))
    )


_QUALITY_SQL = f"""
SELECT source, round(avg(q), 4) AS avg_quality FROM (
  SELECT source,
    (CASE WHEN n = 0 THEN 0.0 ELSE
      (least(n / 500.0, 1.0)
       + alpha / n
       + (CASE WHEN nw = 0 THEN 0.0
               ELSE least(hits / (nw / 10.0), 1.0) END)) / 3.0 END) AS q
  FROM (
    SELECT source,
      length(text)::DOUBLE AS n,
      length(regexp_replace(text, '[^A-Za-zăâîșțĂÂÎȘȚ]', '', 'g'))::DOUBLE AS alpha,
      len(string_split_regex(lower(text), '\\s+'))::DOUBLE AS nw,
      (len(list_filter(string_split_regex(lower(text), '\\s+'),
           w -> list_contains({_EN}, w)))
       + len(list_filter(string_split_regex(lower(text), '\\s+'),
           w -> list_contains({_RO}, w))))::DOUBLE AS hits
    FROM documents
  )
) GROUP BY source
"""


def q_token_count(spark, sf_dir):
    """BPE-ish + whitespace token counts."""
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        textops.token_count_col(F.col("text")).cast("long").alias("n_tokens"),
        textops.whitespace_token_count_col(F.col("text"))
        .cast("long")
        .alias("n_ws_tokens"),
    )


_TOKEN_SQL = r"""
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^\sA-Za-z0-9_]'))::BIGINT AS n_tokens,
  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_ws_tokens
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir):
    """Winnowing-style fingerprint: min 60-bit hash over word-3-grams."""
    sh = dedup.shingles_col(F.col("text"), 3)
    sh = F.when(F.size(sh) > 0, sh).otherwise(F.array(F.col("text")))
    return _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.array_min(F.transform(sh, lambda s: dedup.hash60(s))).alias("fingerprint"),
    )


_FINGERPRINT_SQL = f"""
SELECT doc_id,
  list_min([{dedup.hash60_sql('s')} for s in {_SH_GUARDED}]) AS fingerprint
FROM documents
"""


# Deterministic multi-line synthesis shared by the repetition / paragraph
# queries: the documents table is single-line, so both engines rebuild the
# SAME line structure from substrings (lines 1 and 3 identical -> real
# intra-doc duplicates; first-80-char prefixes + a global footer -> real
# cross-doc duplicates).


def _multiline_col():
    return F.concat_ws(
        "\n",
        F.substring(F.col("text"), 1, 80),
        F.substring(F.col("text"), 41, 80),
        F.substring(F.col("text"), 1, 80),
        F.substring(F.col("text"), 81, 60),
    )


_MULTILINE_SQL = (
    "substr(text,1,80) || chr(10) || substr(text,41,80) || chr(10) || "
    "substr(text,1,80) || chr(10) || substr(text,81,60)"
)


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals (dup-line fraction, dup-line char
    fraction, top word-2-gram fraction) — map-only higher-order-function
    forms, zero shuffles (textops.py 'repetition signals')."""
    docs = _t(spark, sf_dir, "documents")
    mt = _multiline_col()
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round(textops.dup_line_frac_col(mt), 4).alias("dup_line_frac"),
        F.round(textops.dup_line_char_frac_col(mt), 4).alias(
            "dup_line_char_frac"
        ),
        F.round(textops.top_bigram_frac_col(F.col("text")), 4).alias(
            "top_bigram_frac"
        ),
    )


_REPETITION_SQL = f"""
WITH m AS (
  SELECT doc_id, {_MULTILINE_SQL} AS mt, text FROM documents
), l AS (
  SELECT doc_id, u.s AS line
  FROM m, unnest(list_filter(string_split(mt, chr(10)),
                             x -> trim(x) <> '')) u(s)
), lc AS (
  SELECT doc_id, line,
         count(*) OVER (PARTITION BY doc_id, line) AS cnt
  FROM l
), lstats AS (
  SELECT doc_id,
         count(*) AS n_lines,
         count(DISTINCT line) AS n_distinct,
         sum(length(line)) AS total_chars,
         sum(CASE WHEN cnt > 1 THEN length(line) ELSE 0 END) AS dup_chars
  FROM lc GROUP BY doc_id
), w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM m
), g AS (
  SELECT doc_id, u.s AS gram
  FROM w, unnest(
    CASE WHEN len(ws) < 2 THEN []::VARCHAR[]
         ELSE list_transform(list_slice(ws, 1, len(ws) - 1),
                             (x, i) -> x || ' ' || list_extract(ws, i + 1))
    END) u(s)
), gc AS (
  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
), gstats AS (
  SELECT doc_id, max(c) AS best, sum(c) AS tot FROM gc GROUP BY doc_id
)
SELECT d.doc_id,
  round(coalesce((n_lines - n_distinct) * 1.0 / nullif(n_lines, 0), 0), 4)
    AS dup_line_frac,
  round(coalesce(dup_chars * 1.0 / nullif(total_chars, 0), 0), 4)
    AS dup_line_char_frac,
  round(coalesce(best * 1.0 / nullif(tot, 0), 0), 4) AS top_bigram_frac
FROM documents d
LEFT JOIN lstats USING (doc_id)
LEFT JOIN gstats USING (doc_id)
"""


def q_pii_scrub(spark, sf_dir):
    """PII redaction (emails, then phone-like digit runs) over documents
    augmented with synthesized deterministic PII — the corpus itself is
    clean, so both engines append the same addresses/numbers keyed on
    doc_id, giving known-ground-truth redaction counts."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                did.cast("string"),
                F.lit("@example.org or admin@ex.co"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 5 == 0,
            F.concat(
                F.lit(" call +40 (721) 555-00"),
                (did % 89 + 10).cast("string"),
                F.lit(" today"),
            ),
        ).otherwise(F.lit("")),
    )
    return docs.select(
        did.cast("long").alias("doc_id"),
        textops.email_count_col(aug).cast("long").alias("n_emails"),
        textops.phone_count_col(aug).cast("long").alias("n_phones"),
        F.sha2(textops.pii_scrub_col(aug), 256).alias("scrub_sha"),
    )


_PII_SQL = f"""
WITH a AS (
  SELECT doc_id,
    text
    || (CASE WHEN doc_id % 3 = 0
         THEN ' contact user' || doc_id || '@example.org or admin@ex.co'
         ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
         THEN ' call +40 (721) 555-00' || (doc_id % 89 + 10) || ' today'
         ELSE '' END) AS aug
  FROM documents
), e AS (
  SELECT doc_id, aug,
    len(regexp_extract_all(aug, '{textops.EMAIL_PATTERN}')) AS n_emails,
    regexp_replace(aug, '{textops.EMAIL_PATTERN}', '<EMAIL>', 'g') AS noem
  FROM a
)
SELECT doc_id,
  n_emails::BIGINT AS n_emails,
  len(regexp_extract_all(noem, '{textops.PHONE_PATTERN}'))::BIGINT AS n_phones,
  sha256(regexp_replace(noem, '{textops.PHONE_PATTERN}', '<PHONE>', 'g'))
    AS scrub_sha
FROM e
"""


def q_paragraph_dedup(spark, sf_dir):
    """CCNet-style corpus-wide paragraph dedup (operators/dedup.py
    dedup_paragraphs): per-source headers survive once per source, the
    global footer survives exactly once, duplicated substring lines keep
    only their (doc_id, pos)-first occurrence."""
    docs = _t(spark, sf_dir, "documents")
    multi = docs.select(
        F.col("doc_id"),
        F.concat_ws(
            "\n",
            F.concat(F.lit("source: "), F.col("source")),
            F.substring(F.col("text"), 1, 80),
            F.substring(F.col("text"), 41, 80),
            F.lit("(c) corpus footer - all rights reserved"),
        ).alias("text"),
    )
    out = dedup.dedup_paragraphs(multi)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_paras").cast("long").alias("n_paras"),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.sha2(F.col("clean_text"), 256).alias("clean_sha"),
    )


_PARAGRAPH_DEDUP_SQL = """
WITH m AS (
  SELECT doc_id,
    'source: ' || source || chr(10) ||
    substr(text,1,80) || chr(10) ||
    substr(text,41,80) || chr(10) ||
    '(c) corpus footer - all rights reserved' AS mt
  FROM documents
), p AS (
  SELECT doc_id, u.s['pos'] AS pos, u.s['para'] AS para
  FROM m, unnest(list_transform(string_split(mt, chr(10)),
                 (x, i) -> {'para': x, 'pos': i})) u(s)
  WHERE trim(u.s['para']) <> ''
), r AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM p
), tot AS (
  -- from ALL docs (not the filtered paragraphs) so a document with no
  -- non-empty paragraphs still appears with n_paras=0 — lockstep with
  -- dedup_paragraphs' docs-frame totals (round-5 review fix)
  SELECT doc_id,
         len(list_filter(string_split(mt, chr(10)),
                         x -> trim(x) <> '')) AS n_paras
  FROM m
), k AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(para, chr(10) ORDER BY pos) AS clean_text
  FROM r WHERE rn = 1 GROUP BY doc_id
)
SELECT t.doc_id,
       t.n_paras::BIGINT AS n_paras,
       coalesce(k.n_kept, 0)::BIGINT AS n_kept,
       sha256(coalesce(k.clean_text, '')) AS clean_sha
FROM tot t LEFT JOIN k USING (doc_id)
"""


def q_gopher_ngrams(spark, sf_dir):
    """Full Gopher Table-A1 n-gram repetition rows (textops
    top/dup_ngram_char_frac_col, round-5 — closes DIVERGENCES #28's
    documented omission): top n-gram char fraction for n=2..4, duplicate
    n-gram char fraction for n=5..10, plus the 9-threshold verdict. The
    corpus is augmented per doc_id so both signal families fire: %7 adds
    a repeated 6-word phrase (dup n-grams), %9 a spam run (top
    n-grams)."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    mt = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.lit(
                " alpha beta gamma delta epsilon zeta"
                " alpha beta gamma delta epsilon zeta"
            ),
        ).otherwise(F.lit("")),
        F.when(did % 9 == 0, F.lit(" spam spam spam spam spam")).otherwise(
            F.lit("")
        ),
    )
    cols = textops.ngram_repetition_cols(mt)
    # materialize each heavy signal ONCE, then round/threshold the column
    # REFERENCES — inlining them twice (round + verdict) hands Catalyst a
    # double-size lambda forest and minutes of single-core analysis
    raw = docs.select(
        did.cast("long").alias("doc_id"),
        *[c.alias(k) for k, c in cols.items()],
    )
    ngram_pass = F.lit(True)
    for n, mx in textops.GOPHER_TOP_NGRAM_MAX.items():
        ngram_pass = ngram_pass & (F.col(f"top{n}_frac") <= F.lit(mx))
    for n, mx in textops.GOPHER_DUP_NGRAM_MAX.items():
        ngram_pass = ngram_pass & (F.col(f"dup{n}_frac") <= F.lit(mx))
    return raw.select(
        "doc_id",
        *[F.round(F.col(k), 4).alias(k) for k in cols],
        ngram_pass.alias("ngram_pass"),
    )


_GOPHER_NGRAMS_SQL = """
WITH m AS (
  SELECT doc_id,
    text
    || (CASE WHEN doc_id % 7 = 0
        THEN ' alpha beta gamma delta epsilon zeta'
          || ' alpha beta gamma delta epsilon zeta' ELSE '' END)
    || (CASE WHEN doc_id % 9 = 0
        THEN ' spam spam spam spam spam' ELSE '' END) AS mt
  FROM documents
), w AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(mt), '\\s+'), x -> x <> '') AS ws
  FROM m
), tot AS (
  SELECT doc_id, ws, len(ws) AS nw,
    coalesce(list_aggregate(list_transform(ws, x -> length(x)), 'sum'), 0)
      AS total
  FROM w
), g AS (
  SELECT doc_id, n.n AS n, total,
         unnest(range(1, nw - n.n + 2)) AS i, ws
  FROM tot CROSS JOIN (VALUES (2),(3),(4),(5),(6),(7),(8),(9),(10)) n(n)
  WHERE nw >= n.n
), g2 AS (
  SELECT doc_id, n, i, total,
         array_to_string(list_slice(ws, i, i + n - 1), chr(31)) AS gram
  FROM g
), cnt AS (
  SELECT doc_id, n, gram, any_value(total) AS total, count(*) AS c
  FROM g2 GROUP BY doc_id, n, gram
), top AS (
  SELECT doc_id, n,
         max(c * (length(gram) - (n - 1)))::DOUBLE
           / any_value(total) AS frac
  FROM cnt WHERE n <= 4 GROUP BY doc_id, n
), cov AS (
  SELECT DISTINCT g2.doc_id, g2.n, g2.i + k.k AS pos
  FROM g2
  JOIN cnt USING (doc_id, n, gram)
  CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9)) k(k)
  WHERE g2.n >= 5 AND cnt.c > 1 AND k.k < g2.n
), dup AS (
  SELECT c.doc_id, c.n,
         sum(length(list_extract(t.ws, c.pos)))::DOUBLE
           / any_value(t.total) AS frac
  FROM cov c JOIN tot t USING (doc_id) GROUP BY c.doc_id, c.n
), pivoted AS (
  SELECT d.doc_id,
    coalesce(max(CASE WHEN t.n = 2 THEN t.frac END), 0.0) AS top2_frac,
    coalesce(max(CASE WHEN t.n = 3 THEN t.frac END), 0.0) AS top3_frac,
    coalesce(max(CASE WHEN t.n = 4 THEN t.frac END), 0.0) AS top4_frac,
    coalesce(max(CASE WHEN u.n = 5 THEN u.frac END), 0.0) AS dup5_frac,
    coalesce(max(CASE WHEN u.n = 6 THEN u.frac END), 0.0) AS dup6_frac,
    coalesce(max(CASE WHEN u.n = 7 THEN u.frac END), 0.0) AS dup7_frac,
    coalesce(max(CASE WHEN u.n = 8 THEN u.frac END), 0.0) AS dup8_frac,
    coalesce(max(CASE WHEN u.n = 9 THEN u.frac END), 0.0) AS dup9_frac,
    coalesce(max(CASE WHEN u.n = 10 THEN u.frac END), 0.0) AS dup10_frac
  FROM documents d
  LEFT JOIN top t ON t.doc_id = d.doc_id
  LEFT JOIN dup u ON u.doc_id = d.doc_id
  GROUP BY d.doc_id
)
SELECT doc_id,
  round(top2_frac, 4) AS top2_frac,
  round(top3_frac, 4) AS top3_frac,
  round(top4_frac, 4) AS top4_frac,
  round(dup5_frac, 4) AS dup5_frac,
  round(dup6_frac, 4) AS dup6_frac,
  round(dup7_frac, 4) AS dup7_frac,
  round(dup8_frac, 4) AS dup8_frac,
  round(dup9_frac, 4) AS dup9_frac,
  round(dup10_frac, 4) AS dup10_frac,
  (top2_frac <= 0.20 AND top3_frac <= 0.18 AND top4_frac <= 0.16
   AND dup5_frac <= 0.15 AND dup6_frac <= 0.14 AND dup7_frac <= 0.13
   AND dup8_frac <= 0.12 AND dup9_frac <= 0.11 AND dup10_frac <= 0.10)
    AS ngram_pass
FROM pivoted
"""


_SAMPLE_RATES = {"src0": 0.0, "src1": 0.2, "src2": 0.5, "src3": 0.8}
_SAMPLE_SALT = "s1"


def q_stratified_sample(spark, sf_dir):
    """Deterministic stratified downsampling (operators/sampling.py):
    keep a row iff its md5-derived uniform < the source-stratum's rate.
    Map-only (broadcast rate table + Column decision); md5 is
    bit-identical in DuckDB so the oracle re-derives the exact sample."""
    from jcrawler_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents").withColumn(
        "_sid", F.col("doc_id").cast("string")
    )
    kept = sampling.stratified_sample(
        docs, _SAMPLE_RATES, "source", id_col="_sid",
        default_rate=1.0, salt=_SAMPLE_SALT,
    )
    return kept.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("source").alias("source"),
    )


_STRATIFIED_SAMPLE_SQL = f"""
SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || '{_SAMPLE_SALT}'), 1, 15))::BIGINT
      / 1152921504606846976.0
    < CASE source
        WHEN 'src0' THEN 0.0
        WHEN 'src1' THEN 0.2
        WHEN 'src2' THEN 0.5
        WHEN 'src3' THEN 0.8
        ELSE 1.0 END
"""


def _c4_multiline_col():
    """Deterministic C4 test page per doc: 1+doc_id%6 keepable lines, three
    always-dropped lines, and per-doc-id contamination injections (lorem
    ipsum %11, code brace %13, banned word %17)."""
    did = F.col("doc_id")
    keeps = F.transform(
        F.sequence(F.lit(1), (F.lit(1) + did % 6).cast("int")),
        lambda j: F.concat(
            F.lit("Keep line "),
            j.cast("string"),
            F.lit(" of "),
            F.col("text").substr(j * 10 + 1, F.lit(25)),
            F.lit(" ok."),
        ),
    )
    return F.concat(
        F.array_join(keeps, "\n"),
        F.lit(
            "\nno terminal punctuation line"
            "\nEnable javascript to proceed now."
            "\nTiny."
        ),
        F.when(did % 11 == 0, F.lit("\nlorem ipsum dolor sit amet")).otherwise(
            F.lit("")
        ),
        F.when(did % 13 == 0, F.lit("\ncode { sample }")).otherwise(F.lit("")),
        F.when(did % 17 == 0, F.lit("\nthis unsafeword here")).otherwise(
            F.lit("")
        ),
    )


def q_c4_filter(spark, sf_dir):
    """C4 cleaning pass (functions/c4.py; Raffel et al. 2020 §2.2): line
    retention (terminal punctuation, >=3 words, no javascript) + page gate
    (>=5 sentences, no lorem ipsum / brace / banned token) over synthesized
    multi-line pages. Map-only Column forms — zero Exchanges."""
    docs = _t(spark, sf_dir, "documents")
    mt = _c4_multiline_col()
    stats = c4.c4_stats_cols(mt)
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        stats["c4_kept_lines"].cast("long").alias("kept_lines"),
        stats["c4_sentences"].cast("long").alias("n_sentences"),
        stats["c4_pass"].alias("c4_pass"),
        stats["c4_cleaned"].alias("cleaned"),
    )


_C4_MULTILINE_SQL = """
array_to_string(list_transform(range(1, (2 + doc_id % 6)::INT),
    j -> 'Keep line ' || j || ' of ' || substr(text, (j*10+1)::INT, 25)
         || ' ok.'), chr(10))
|| chr(10) || 'no terminal punctuation line'
|| chr(10) || 'Enable javascript to proceed now.'
|| chr(10) || 'Tiny.'
|| (CASE WHEN doc_id % 11 = 0
    THEN chr(10) || 'lorem ipsum dolor sit amet' ELSE '' END)
|| (CASE WHEN doc_id % 13 = 0
    THEN chr(10) || 'code { sample }' ELSE '' END)
|| (CASE WHEN doc_id % 17 = 0
    THEN chr(10) || 'this unsafeword here' ELSE '' END)
"""

_C4_FILTER_SQL = f"""
WITH m AS (
  SELECT doc_id, {_C4_MULTILINE_SQL} AS mt FROM documents
), k AS (
  SELECT doc_id, mt,
    list_filter(
      list_transform(string_split(mt, chr(10)), x -> trim(x, ' ')),
      t -> t <> ''
        AND list_contains(['.', '!', '?', '"', ''''], right(t, 1))
        AND len(list_filter(string_split_regex(t, '\\s+'),
                            w -> w <> '')) >= 3
        AND NOT contains(lower(t), 'javascript')) AS kept
  FROM m
), c AS (
  SELECT doc_id, mt, kept,
         array_to_string(kept, chr(10)) AS cleaned FROM k
)
SELECT doc_id,
  len(kept) AS kept_lines,
  len(regexp_extract_all(cleaned, '[.!?]')) AS n_sentences,
  (NOT contains(lower(mt), 'lorem ipsum')
   AND NOT contains(mt, '{{')
   AND len(list_filter(string_split_regex(lower(mt), '\\s+'),
           w -> w IN ('unsafeword', 'blockedterm'))) = 0
   AND len(regexp_extract_all(cleaned, '[.!?]')) >= 5) AS c4_pass,
  cleaned
FROM c
"""


def q_ccnet_bucket(spark, sf_dir):
    """CCNet-style LM quality terciles (operators/quality.py): corpus-
    trained unigram LM (one token groupBy), per-doc mean token logprob,
    head/middle/tail split on exact global terciles (1-row broadcast)."""
    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    out = quality.ccnet_buckets(docs)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("mean_logprob", 4).alias("mean_logprob"),
        "bucket",
    )


_CCNET_SQL = """
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
), t AS (
  SELECT doc_id, u.tok FROM w, unnest(ws) u(tok)
), v AS (
  SELECT tok, count(*) AS cnt FROM t GROUP BY tok
), tot AS (
  SELECT sum(cnt)::DOUBLE AS total FROM v
), pd AS (
  SELECT doc_id, count(*) AS n_tokens, avg(ln(cnt / total)) AS mlp
  FROM t JOIN v USING (tok) CROSS JOIN tot GROUP BY doc_id
), cuts AS (
  SELECT quantile_cont(mlp, [1.0/3.0, 2.0/3.0]) AS c FROM pd
)
SELECT d.doc_id,
  coalesce(n_tokens, 0) AS n_tokens,
  round(mlp, 4) AS mean_logprob,
  (CASE WHEN mlp IS NULL OR mlp <= c[1] THEN 'tail'
        WHEN mlp <= c[2] THEN 'middle' ELSE 'head' END) AS bucket
FROM documents d LEFT JOIN pd USING (doc_id) CROSS JOIN cuts
"""


# fixed synthetic benchmark set for the decontamination contract query —
# distinctive tokens so only the injected overlaps (doc_id % 13) can match
_BENCH_ROWS = [
    "qza wsx edc rfv tgb yhn ujm ikl opq azq",
    "benchb lorq mirv tazo quen velp sorn gatu hilm rodk",
    "benchc nuvo qeth zolm varn kipt selo wund yarb motx",
]
_BENCH_SNIPPET = "qza wsx edc rfv tgb yhn ujm ikl"  # 8 tokens of row 0
_BENCH_SHORT = "benchb lorq mirv tazo quen"  # 5 tokens: below n=8


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (operators/quality.py, GPT-3 appendix-C
    style): flag documents sharing any word 8-gram with a broadcast
    benchmark set. Docs %13 get a full 8-gram injected (flagged); docs
    %21 get only a 5-token fragment — proving sub-n overlaps alone do
    NOT flag."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(did % 13 == 0, F.lit(" " + _BENCH_SNIPPET)).otherwise(
            F.lit("")
        ),
        F.when(did % 21 == 0, F.lit(" " + _BENCH_SHORT)).otherwise(F.lit("")),
    )
    bench = spark.createDataFrame(
        [(t,) for t in _BENCH_ROWS], "text string"
    )
    flagged = quality.contamination_flags(
        docs.select(did.cast("long").alias("doc_id"), aug.alias("text")),
        bench,
        n=8,
    )
    return flagged.select("doc_id", "contaminated")


_DECONTAMINATE_SQL = f"""
WITH m AS (
  SELECT doc_id,
    text
    || (CASE WHEN doc_id % 13 = 0 THEN ' {_BENCH_SNIPPET}' ELSE '' END)
    || (CASE WHEN doc_id % 21 = 0 THEN ' {_BENCH_SHORT}' ELSE '' END) AS mt
  FROM documents
), b AS (
  SELECT unnest(['{_BENCH_ROWS[0]}', '{_BENCH_ROWS[1]}',
                 '{_BENCH_ROWS[2]}']) AS text
), bw AS (
  SELECT list_filter(string_split_regex(lower(text), '\\s+'),
                     x -> x <> '') AS ws
  FROM b
), bg AS (
  SELECT DISTINCT array_to_string(list_slice(ws, i, i + 7), ' ') AS g
  FROM bw, unnest(range(1, len(ws) - 8 + 2)) t(i) WHERE len(ws) >= 8
), w AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(mt), '\\s+'), x -> x <> '') AS ws
  FROM m
), dg AS (
  SELECT doc_id, array_to_string(list_slice(ws, i, i + 7), ' ') AS g
  FROM w, unnest(range(1, len(ws) - 8 + 2)) t(i) WHERE len(ws) >= 8
), hit AS (
  SELECT DISTINCT doc_id FROM dg JOIN bg USING (g)
)
SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated
FROM documents d LEFT JOIN hit h USING (doc_id)
"""


_DUPSPAN_PASSAGE = "qq ww ee rr tt yy uu ii oo pp aa ss"  # 12 fixed tokens


def q_cross_dup_spans(spark, sf_dir):
    """Cross-document duplicated-substring rate (operators/quality.py;
    the detection half of Lee et al. 2022 at word-10-gram granularity):
    docs %7 share one of three injected passages, so their trailing
    grams occur in ~24 other docs; everything else is unique."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" dupspan"),
                (did % 3).cast("string"),
                F.lit(" " + _DUPSPAN_PASSAGE),
            ),
        ).otherwise(F.lit("")),
    )
    out = quality.cross_dup_ngram_stats(
        docs.select(did.cast("long").alias("doc_id"), aug.alias("text")),
        n=10,
    )
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.round("dup_frac", 4).alias("dup_frac"),
    )


_CROSS_DUP_SQL = f"""
WITH m AS (
  SELECT doc_id,
    text || (CASE WHEN doc_id % 7 = 0
             THEN ' dupspan' || (doc_id % 3) || ' {_DUPSPAN_PASSAGE}'
             ELSE '' END) AS mt
  FROM documents
), w AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(mt), '\\s+'), x -> x <> '') AS ws
  FROM m
), g AS (
  SELECT doc_id, array_to_string(list_slice(ws, i, i + 9), ' ') AS gram
  FROM w, unnest(range(1, len(ws) - 10 + 2)) t(i) WHERE len(ws) >= 10
), s AS (
  SELECT gram, count(DISTINCT doc_id) AS nd FROM g GROUP BY gram
), pd AS (
  SELECT doc_id, count(*) AS n_grams,
         avg(CASE WHEN nd > 1 THEN 1.0 ELSE 0.0 END) AS df
  FROM g JOIN s USING (gram) GROUP BY doc_id
)
SELECT d.doc_id,
  coalesce(n_grams, 0) AS n_grams,
  round(coalesce(df, 0.0), 4) AS dup_frac
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def q_dup_span_removal(spark, sf_dir):
    """Cross-document duplicated-span REMOVAL (quality.
    remove_cross_dup_spans; the removal half of Lee et al. 2022,
    first-occurrence-wins): the globally first occurrence of each
    repeated word-10-gram span survives, every other covered token is
    cut. Same %7 injected shared passages as `cross_dup_spans` — the
    lowest doc_id per variant keeps its passage, the rest lose exactly
    the injected tokens."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            did % 7 == 0,
            F.concat(
                F.lit(" dupspan"),
                (did % 3).cast("string"),
                F.lit(" " + _DUPSPAN_PASSAGE),
            ),
        ).otherwise(F.lit("")),
    )
    return quality.remove_cross_dup_spans(
        docs.select(did.cast("long").alias("doc_id"), aug.alias("text")),
        n=10,
    )


_DUP_SPAN_REMOVAL_SQL = f"""
WITH m AS (
  SELECT doc_id,
    text || (CASE WHEN doc_id % 7 = 0
             THEN ' dupspan' || (doc_id % 3) || ' {_DUPSPAN_PASSAGE}'
             ELSE '' END) AS mt
  FROM documents
), w AS (
  SELECT doc_id,
    list_filter(string_split_regex(mt, '\\s+'), x -> x <> '') AS ws
  FROM m
), occ AS (
  SELECT doc_id, i, array_to_string(list_slice(ws, i, i + 9), ' ') AS gram
  FROM w, unnest(range(1, len(ws) - 10 + 2)) t(i) WHERE len(ws) >= 10
), dup AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i,
           row_number() OVER (PARTITION BY gram ORDER BY doc_id, i) AS rn
    FROM occ
  ) WHERE rn > 1
), cov AS (
  SELECT DISTINCT doc_id, u.p FROM dup, unnest(range(i, i + 10)) u(p)
), tok AS (
  SELECT doc_id, t.p, ws[t.p] AS tok
  FROM w, unnest(range(1, len(ws) + 1)) t(p)
), kept AS (
  SELECT t.doc_id, t.p, t.tok
  FROM tok t LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.p = c.p
  WHERE c.p IS NULL
), reb AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id,
  coalesce(r.clean_text, '') AS clean_text,
  len(w.ws)::BIGINT AS n_tokens,
  (len(w.ws) - coalesce(r.n_kept, 0))::BIGINT AS n_removed
FROM w LEFT JOIN reb r USING (doc_id)
"""


_BM25_TERMS = ["table", "scan", "merge", "window"]


def q_bm25_search(spark, sf_dir):
    """Okapi BM25 top-30 over the documents table (operators/search.py):
    corpus filtered to the query's terms BEFORE any shuffle, |terms|-row
    df table + 1-row (N, avgdl) stats broadcast back, TakeOrdered top-k."""
    from jcrawler_spark.operators import search

    docs = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("long").alias("doc_id"), "text"
    )
    out = search.bm25_topk(docs, _BM25_TERMS, k=30)
    return out.select("doc_id", F.round("score", 4).alias("score"))


_BM25_SQL = f"""
WITH d AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
), dd AS (
  SELECT doc_id, len(ws) AS dl, ws FROM d
), stats AS (
  SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dd
), tok AS (
  SELECT doc_id, dl, u.tok FROM dd, unnest(ws) u(tok)
  WHERE u.tok IN ('{_BM25_TERMS[0]}', '{_BM25_TERMS[1]}',
                  '{_BM25_TERMS[2]}', '{_BM25_TERMS[3]}')
), tf AS (
  SELECT doc_id, dl, tok, count(*) AS tf
  FROM tok GROUP BY doc_id, dl, tok
), dfreq AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), scored AS (
  SELECT doc_id,
    sum(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        * tf * 2.2
        / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))) AS score
  FROM tf JOIN dfreq USING (tok) CROSS JOIN stats GROUP BY doc_id
)
SELECT doc_id, round(score, 4) AS score FROM (
  SELECT doc_id, score FROM scored ORDER BY score DESC, doc_id LIMIT 30
)
"""


def q_host_graph(spark, sf_dir):
    """Domain-level link graph (operators/graph.host_graph; the
    Common-Crawl host-graph dataset shape) over the synthetic K=3 tree +
    cross-links edges, hosts = doc_id % 37: per host pair, link count +
    distinct source pages."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    ids = docs.select(F.col("doc_id").cast("long").alias("doc_id"))
    tree = None
    for j in (1, 2, 3):
        e = ids.select(
            F.col("doc_id").alias("src"),
            (F.col("doc_id") * 3 + j).alias("dst"),
        ).where(F.col("dst") < n)
        tree = e if tree is None else tree.unionByName(e)
    cross = ids.where(F.col("doc_id") % 10 == 3).select(
        F.col("doc_id").alias("src"), ((F.col("doc_id") * 7) % n).alias("dst")
    )
    edges = tree.unionByName(cross).select(
        "src",
        F.concat(F.lit("h"), (F.col("src") % 37).cast("string")).alias(
            "src_host"
        ),
        F.concat(F.lit("h"), (F.col("dst") % 37).cast("string")).alias(
            "dst_host"
        ),
    )
    return graph.host_graph(edges, src_id_col="src")


_HOST_GRAPH_SQL = """
WITH edges AS (
  SELECT doc_id AS src, doc_id*3 + j AS dst
  FROM documents, unnest([1,2,3]) t(j)
  WHERE doc_id*3 + j < (SELECT count(*) FROM documents)
  UNION ALL
  SELECT doc_id, (doc_id*7) % (SELECT count(*) FROM documents)
  FROM documents WHERE doc_id % 10 = 3
)
SELECT 'h' || (src % 37) AS src_host,
       'h' || (dst % 37) AS dst_host,
       count(*) AS n_links,
       count(DISTINCT src) AS n_src_pages
FROM edges GROUP BY 1, 2
"""


def q_vocab_topk(spark, sf_dir):
    """Corpus vocabulary head (quality.vocab_topk): top-100 tokens by
    occurrence with document frequency — two map-side-combining
    groupBys + TakeOrdered, shuffles bounded by vocab not corpus."""
    return quality.vocab_topk(
        _t(spark, sf_dir, "documents"), k=100
    ).select(
        "tok",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("n_docs").cast("long").alias("n_docs"),
    )


_VOCAB_TOPK_SQL = """
WITH w AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
  FROM documents
), occ AS (
  SELECT u.tok, count(*) AS n_occurrences
  FROM w, unnest(ws) u(tok) GROUP BY u.tok
), pd AS (
  SELECT u.tok, count(*) AS n_docs
  FROM w, unnest(list_distinct(ws)) u(tok) GROUP BY u.tok
)
SELECT tok, n_occurrences, n_docs FROM occ JOIN pd USING (tok)
ORDER BY n_occurrences DESC, tok LIMIT 100
"""


def q_source_stats(spark, sf_dir):
    """Per-source corpus roll-up (operators/quality.py): doc count, token
    volume, mean quality, English share — one map-side-combining groupBy."""
    return quality.source_stats(_t(spark, sf_dir, "documents")).select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        "avg_quality",
        "en_frac",
    )


_SOURCE_STATS_SQL = f"""
WITH q AS (
  SELECT source, lang,
    len(list_filter(string_split_regex(lower(text), '\\s+'),
                    x -> x <> '')) AS ntok,
    (CASE WHEN n = 0 THEN 0.0 ELSE
      (least(n / 500.0, 1.0)
       + alpha / n
       + (CASE WHEN nw = 0 THEN 0.0
               ELSE least(hits / (nw / 10.0), 1.0) END)) / 3.0 END) AS q
  FROM (
    SELECT source, lang, text,
      length(text)::DOUBLE AS n,
      length(regexp_replace(text, '[^A-Za-zăâîșțĂÂÎȘȚ]', '', 'g'))::DOUBLE
        AS alpha,
      len(string_split_regex(lower(text), '\\s+'))::DOUBLE AS nw,
      (len(list_filter(string_split_regex(lower(text), '\\s+'),
           w -> list_contains({_EN}, w)))
       + len(list_filter(string_split_regex(lower(text), '\\s+'),
           w -> list_contains({_RO}, w))))::DOUBLE AS hits
    FROM documents
  )
)
SELECT source,
  count(*) AS n_docs,
  sum(ntok)::BIGINT AS total_tokens,
  round(avg(q), 4) AS avg_quality,
  round(avg(CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END), 4) AS en_frac
FROM q GROUP BY source
"""


def q_gopher_filter(spark, sf_dir):
    """Gopher/MassiveWeb quality filter (Rae et al. 2021 Appendix A) —
    the seven document-level signals plus the composite pass verdict
    (which also applies the repetition rules). The corpus is augmented
    deterministically per doc_id so every rule fires on some subset:
    %13 truncation (word-count floor), %3 stop-word completion, %11
    symbol spam, %5 ellipsis lines, %16 bullet walls."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    base = F.when(did % 13 == 0, F.substring(F.col("text"), 1, 100)).otherwise(
        F.col("text")
    )
    mt = F.concat(
        base,
        F.when(did % 3 == 0, F.lit(" and that have with")).otherwise(F.lit("")),
        F.when(did % 11 == 0, F.lit(" # # # # # # # # # # # #")).otherwise(
            F.lit("")
        ),
        F.when(
            did % 5 == 0, F.lit("\nread more...\ncontinued...")
        ).otherwise(F.lit("")),
        F.when(did % 16 == 0, F.repeat(F.lit("\n• promo item"), 9)).otherwise(
            F.lit("")
        ),
    )
    s = textops.gopher_stats_cols(mt)
    return docs.select(
        did.cast("long").alias("doc_id"),
        s["word_count"].cast("long").alias("word_count"),
        F.round(s["mean_word_len"], 4).alias("mean_word_len"),
        F.round(s["symbol_ratio"], 4).alias("symbol_ratio"),
        F.round(s["bullet_frac"], 4).alias("bullet_frac"),
        F.round(s["ellipsis_frac"], 4).alias("ellipsis_frac"),
        F.round(s["alpha_word_frac"], 4).alias("alpha_word_frac"),
        s["stop_hits"].cast("long").alias("stop_hits"),
        textops.gopher_pass_col(mt).alias("passes"),
    )


_GOPHER_SQL = """
WITH m AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 13 = 0 THEN substr(text,1,100) ELSE text END)
    || (CASE WHEN doc_id % 3 = 0 THEN ' and that have with' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN ' # # # # # # # # # # # #' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
        THEN chr(10) || 'read more...' || chr(10) || 'continued...'
        ELSE '' END)
    || (CASE WHEN doc_id % 16 = 0
        THEN repeat(chr(10) || '• promo item', 9) ELSE '' END) AS mt
  FROM documents
), s AS (
  SELECT doc_id, mt,
    list_filter(string_split_regex(mt, '\\s+'), x -> x <> '') AS ws,
    list_filter(string_split(mt, chr(10)), x -> trim(x) <> '') AS ls
  FROM m
), t AS (
  SELECT doc_id, mt, len(ws) AS nw, len(ls) AS nl,
    coalesce(list_aggregate(list_transform(ws, w -> length(w)), 'sum') * 1.0
             / nullif(len(ws), 0), 0.0) AS mwl,
    (length(mt) - length(replace(mt, '#', '')))
      + len(regexp_extract_all(mt, '\\.\\.\\.'))
      + (length(mt) - length(replace(mt, '…', ''))) AS nsym,
    len(list_filter(ls, l -> ltrim(l, ' ') LIKE '•%'
                          OR ltrim(l, ' ') LIKE '- %'
                          OR ltrim(l, ' ') LIKE '* %')) AS nbul,
    len(list_filter(ls, l -> rtrim(l, ' ') LIKE '%...'
                          OR rtrim(l, ' ') LIKE '%…')) AS nell,
    len(list_filter(ws, w -> regexp_matches(w, '[A-Za-z]'))) AS nalpha,
    len(list_filter(['the','be','to','of','and','that','have','with'],
        s -> list_contains(list_transform(ws, w -> lower(w)), s))) AS nstop
  FROM s
), rl AS (
  SELECT doc_id, u.s AS line
  FROM m, unnest(list_filter(string_split(mt, chr(10)),
                             x -> trim(x) <> '')) u(s)
), rlc AS (
  SELECT doc_id, line,
         count(*) OVER (PARTITION BY doc_id, line) AS cnt
  FROM rl
), rstats AS (
  SELECT doc_id,
         count(*) AS r_lines,
         count(DISTINCT line) AS r_distinct,
         sum(length(line)) AS r_chars,
         sum(CASE WHEN cnt > 1 THEN length(line) ELSE 0 END) AS r_dupchars
  FROM rlc GROUP BY doc_id
), w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(mt), '\\s+'),
                     x -> x <> '') AS lws
  FROM m
), g AS (
  SELECT doc_id, u.s AS gram
  FROM w, unnest(
    CASE WHEN len(lws) < 2 THEN []::VARCHAR[]
         ELSE list_transform(list_slice(lws, 1, len(lws) - 1),
                             (x, i) -> x || ' ' || list_extract(lws, i + 1))
    END) u(s)
), gc AS (
  SELECT doc_id, gram, count(*) AS c FROM g GROUP BY doc_id, gram
), gstats AS (
  SELECT doc_id, max(c) AS best, sum(c) AS tot FROM gc GROUP BY doc_id
), f AS (
  SELECT t.doc_id, nw, nl, mwl, nsym, nbul, nell, nalpha, nstop,
    coalesce(nsym * 1.0 / nullif(nw, 0), 0.0) AS symr,
    coalesce(nbul * 1.0 / nullif(nl, 0), 0.0) AS bulf,
    coalesce(nell * 1.0 / nullif(nl, 0), 0.0) AS ellf,
    coalesce(nalpha * 1.0 / nullif(nw, 0), 0.0) AS alpf,
    coalesce((r_lines - r_distinct) * 1.0 / nullif(r_lines, 0), 0.0) AS dlf,
    coalesce(r_dupchars * 1.0 / nullif(r_chars, 0), 0.0) AS dlcf,
    coalesce(best * 1.0 / nullif(tot, 0), 0.0) AS tbf
  FROM t
  LEFT JOIN rstats USING (doc_id)
  LEFT JOIN gstats ON t.doc_id = gstats.doc_id
)
SELECT doc_id,
  nw::BIGINT AS word_count,
  round(mwl, 4) AS mean_word_len,
  round(symr, 4) AS symbol_ratio,
  round(bulf, 4) AS bullet_frac,
  round(ellf, 4) AS ellipsis_frac,
  round(alpf, 4) AS alpha_word_frac,
  nstop::BIGINT AS stop_hits,
  (nw >= 50 AND nw <= 100000 AND mwl >= 3.0 AND mwl <= 10.0
   AND symr < 0.1 AND bulf < 0.9 AND ellf < 0.3 AND alpf > 0.8
   AND nstop >= 2 AND dlf <= 0.3 AND dlcf <= 0.2 AND tbf <= 0.2) AS passes
FROM f
"""


def q_normalize_html(spark, sf_dir):
    """JScraper normalize analogue (JScraper.java:101-126) over synthetic
    crawled pages: canonical-form sha256 per url. The oracle pins the exact
    digests a pure-Python run of the same normalize_html produces
    (corpus.local_pages and the UDF share one code path), so the contract
    verifies the Arrow UDF plumbing byte-for-byte."""
    pages = corpus.build_pages_df(spark, 60, n_hosts=8)
    return pages.select(
        "url",
        F.sha2(htmlnorm.normalize_html_col("html"), 256).alias("norm_sha"),
    )


def _normalize_html_oracle_sql() -> str:
    import hashlib

    rows = []
    for rec in corpus.local_pages(60, 8):
        norm = htmlnorm.normalize_html(rec["html"].decode("utf-8"))
        sha = hashlib.sha256(norm.encode("utf-8")).hexdigest()
        url = rec["url"].replace("'", "''")
        rows.append(f"  ('{url}', '{sha}')")
    return (
        "SELECT url, norm_sha FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(url, norm_sha)"
    )


def q_page_diff(spark, sf_dir):
    """Mirror/recrawl page diff (JScraper.java:45-57 workflow): normalize
    both crawls of each URL, line-diff, report change counts + the patch
    digest. The oracle pins the exact counts and patch sha256 a pure-Python
    run of the same page_diff produces (corpus.recrawl_html and the Arrow
    UDF share one code path). Cosmetic-only variants (i%3==0) MUST land at
    (0, 0, sha256(""))."""
    pairs = corpus.build_recrawl_df(spark, 60, n_hosts=8)
    return (
        pairs.withColumn(
            "__d", pagediff.page_diff_col("old_html", "new_html")
        )
        .select(
            "url",
            F.col("__d.n_insertions").alias("n_insertions"),
            F.col("__d.n_deletions").alias("n_deletions"),
            F.sha2(F.col("__d.patch"), 256).alias("patch_sha"),
        )
    )


def _page_diff_oracle_sql() -> str:
    import hashlib

    rows = []
    for i in range(60):
        rec = corpus.page_record(i, 60, 8)
        old = rec["html"].decode("utf-8")
        new = corpus.recrawl_html(i, 60, 8)
        n_ins, n_del, patch = pagediff.page_diff(old, new)
        sha = hashlib.sha256(patch.encode("utf-8")).hexdigest()
        url = rec["url"].replace("'", "''")
        rows.append(f"  ('{url}', {n_ins}, {n_del}, '{sha}')")
    return (
        "SELECT url, CAST(n_insertions AS INT) AS n_insertions, "
        "CAST(n_deletions AS INT) AS n_deletions, patch_sha FROM (VALUES\n"
        + ",\n".join(rows)
        + "\n) AS t(url, n_insertions, n_deletions, patch_sha)"
    )


# ---------------------------------------------------------------------------
# rows-only (non-SQL-expressible) ops
# ---------------------------------------------------------------------------


def q_crawl_wave(spark, sf_dir):
    """One full crawl wave over the synthetic corpus: fetch-join → Arrow
    extract UDF → self-filter → first-wins dedup → accept → frontier rows
    (the engine pipeline distilled; stateless so no oracle table exists)."""
    n = min(_t(spark, sf_dir, "documents").count(), 500)
    pages = corpus.build_pages_df(spark, n, 8, partitions=8)
    seeds = spark.createDataFrame(
        [(corpus.url_of(0, 8), 0)], ["url", "depth"]
    )
    fetched = seeds.join(pages, "url")
    links = (
        fetched.select(
            F.col("url").alias("src_url"),
            F.col("depth").alias("src_depth"),
            F.explode(
                extract.extract_links_udf(
                    "html", "url", "status", "content_type", "location"
                )
            ).alias("l"),
        )
        .select(
            "src_url",
            (F.col("src_depth") + 1).alias("depth"),
            F.col("l.url").alias("url"),
            F.col("l.is_resource").alias("is_resource"),
            F.col("l.is_redirect").alias("is_redirect"),
            F.col("l.order_in_page").alias("order_in_page"),
        )
        .where(F.col("url") != F.col("src_url"))
    )
    w = Window.partitionBy("src_url", "url").orderBy("order_in_page")
    links = links.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    aset = accept_ops.build_accept_set(
        [corpus.url_of(0, 8)], [f"host{i}.example" for i in range(8)]
    )
    return (
        accept_ops.with_accept(links.drop("rn"), aset)
        .where(F.col("accepted"))
        .select(
            "url",
            F.col("depth").cast("long").alias("depth"),
            "is_resource",
            "is_redirect",
            urlops.url_hash_col(F.col("url")).alias("url_hash"),
        )
    )



# crawl_wave expected rows derived from the INDEPENDENT pure-Python oracle
# (tests/crawl_oracle._links_of over corpus.local_pages): the wave-1
# expansion of the deterministic corpus is closed-form, so the oracle is a
# pinned VALUES table (regenerate: tools/gen_crawl_oracles.py).
_CRAWL_WAVE_SQL = """
SELECT url, depth, is_resource, is_redirect, url_hash FROM (VALUES
  ('https://host0.example/p/1/1', 1::BIGINT, false, false, 'c356c3e1bc64ac392b1c0797396a91d2d217cad6e6b00d6410acb4c0879b0904'),
  ('https://host6.example/p/1/2', 1::BIGINT, false, false, '1bb175111edb6ebd4f8a0582c5e49025c54499e1d7cfb27fa9a175d46e7ac2d7'),
  ('https://host6.example/p/1/3', 1::BIGINT, false, false, '5d60433fd1a0a4cbe0ff11aba435d5e9617df1a629b3205f705303a2ccbcb4eb'),
  ('https://host0.example/static/img0.png', 1::BIGINT, true, false, 'd8d446c7cdab9897633d70dfa74b2299a67aa998ede1d07ee83866b194e2e4a5')
) AS t(url, depth, is_resource, is_redirect, url_hash)
"""


def q_crawl_emission(spark, sf_dir):
    """Driver-verified ENGINE run (the strongest contract row): a BFS crawl
    of the deterministic 500-page corpus — wave budget 20, 60 docs —
    through the full superstep engine (politeness window, Bloom+anti-join
    seen gate, Arrow extraction, ranked frontier, snapshot commits).
    Returns the exact emission order. Oracle: the pure-Python FIFO/wave
    oracle (tests/crawl_oracle.py, an independent implementation of
    ParallelGraphTraverser semantics) serialized as VALUES."""
    import shutil
    import tempfile

    from jcrawler_spark.config import CrawlConfig
    from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher

    pages = corpus.build_pages_df(spark, 500, 8, partitions=8)
    root = tempfile.mkdtemp(prefix="jcrawler-contract-")
    try:
        cfg = CrawlConfig(
            accept=[f"host{i}.example" for i in range(8)],
            max_docs=60,
            wave_budget=20,
        )
        eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages), root)
        eng.run(seeds=[corpus.url_of(0, 8)], max_supersteps=30)
        w = Window.orderBy("superstep", "order_key")  # 60 rows; contract only
        rows = (
            eng.emitted()
            .select("url", "url_hash", "superstep", "order_key")
            .withColumn("seq", (F.row_number().over(w) - 1).cast("long"))
            .select("seq", "url", "url_hash")
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(rows, "seq bigint, url string, url_hash string")


_CRAWL_EMISSION_SQL = """
SELECT seq, url, url_hash FROM (VALUES
  (0, 'https://host0.example/p/0/0', '446f184d6a524623936591d7d0bd5e9b21140c916f24451c4a20158b3978db7a'),
  (1, 'https://host0.example/p/1/1', 'c356c3e1bc64ac392b1c0797396a91d2d217cad6e6b00d6410acb4c0879b0904'),
  (2, 'https://host6.example/p/1/2', '1bb175111edb6ebd4f8a0582c5e49025c54499e1d7cfb27fa9a175d46e7ac2d7'),
  (3, 'https://host6.example/p/1/3', '5d60433fd1a0a4cbe0ff11aba435d5e9617df1a629b3205f705303a2ccbcb4eb'),
  (4, 'https://host0.example/static/img0.png', 'd8d446c7cdab9897633d70dfa74b2299a67aa998ede1d07ee83866b194e2e4a5'),
  (5, 'https://host2.example/p/3/14', 'c1e96aeeb2a2e5a1f694ab148d2b697668c82e0605566e0b7a663bf8888e6352'),
  (6, 'https://host5.example/p/2/10', '2d5cb7dbba16bca51c1b637e5ef72bad2b1e48729cff56963abcd38310693913'),
  (7, 'https://host5.example/p/2/11', 'ed662252cff722f0caa530fd0ab3549511e2f4b65a71f9d0ae0e4aa27ab4a407'),
  (8, 'https://host0.example/p/2/12', 'ba97aea9cad2b5408866558e435919c8725e62c24c114811dea27bc56d78eb5a'),
  (9, 'https://host3.example/p/3/21', 'aa12132690cdc33db0fa952ea3ff5321012c1c5750be2e24c25275f97e35aeef'),
  (10, 'https://host6.example/static/app3.js', 'e3a86efbd63cdc10314d8a2e24a7e0dd88df4c16e5082857c2272df8b84cdc99'),
  (11, 'https://host3.example/p/4/43', '4fb888c008ea62b14457c48494ee8e0c48f68c5940d91d707d581679c8fdb8dd'),
  (12, 'https://host0.example/p/4/44', '3d59d2d257379d37c4af5e94c0dc2636b93b319cb3a19a28d1a73bb8cdf0d121'),
  (13, 'https://host2.example/p/4/45', '08217ae550877b95b08dc8fc2aa8b5b254f76146f473e150a748b2cc471a3773'),
  (14, 'https://host2.example/from-sitemap/14', 'd821cc02b38646d4ff4dba1566a2fcac6c1fdbb08357babd2de0b3a24c534420'),
  (15, 'https://host7.example/p/3/31', 'eeadb6540e57485cab652c4694ff4fdadb9621f02718af1bcc339582b04abee0'),
  (16, 'https://host7.example/p/3/32', '406e66efa8eb67f4412d1b86b1633096d25e37dd727f1b1c7fc97ea12f116aeb'),
  (17, 'https://host5.example/p/3/33', 'f835b98fa0647b85bf33ab392a90da7d2cf9559fb647961aa25da0687c03be89'),
  (18, 'https://host5.example/static/bg10.jpg', '812980e20ddcb52181a785e844ea4d71220f4177be00a4d8fa78bba94003d573'),
  (19, 'https://host4.example/p/3/34', '995defd3f72c6db41a6fadbef73533cbbf9d08acc4734ba9db3f89ef82476f93'),
  (20, 'https://host4.example/p/3/35', '44072dbac4331383d283277ab2f9199aec7a07091db6ab16caa4e48889d19c05'),
  (21, 'https://host2.example/p/3/36', '56cdeedecfb71d30706a60310c5550f6481fa0299d24787d95fb2e9904b3381f'),
  (22, 'https://host5.example/static/app11.js', 'cabd106046810c4d2bce7a554e9430cc00d25a0b380b65189dddfc041c407d18'),
  (23, 'https://host2.example/p/3/37', '1e63fb3eb3c9e3eebff312ce96487142047d8024d4b00afc4fb39df34165302e'),
  (24, 'https://host0.example/p/3/38', '19c85faa58236adc02072281855726db1983213f5c3b83ad679c25a3c07c3d59'),
  (25, 'https://host6.example/p/3/39', 'a9acfbdd254514b510fd9583f30c187f099d3959bb12a1ddc052515421691317'),
  (26, 'https://host0.example/static/favicon12.png', '24bdc1323a8290363b8197e5e7bd7f108a86213e3e819d43a0e600fd1c8d6a72'),
  (27, 'https://host0.example/p/4/64', '1579ccd16284aac3e1c621de8536ba07fde839ca579e358ba157c28875f475f4'),
  (28, 'https://host3.example/p/4/65', '7a7b40d5eb72949ebae97a4eab2c963cfe0956d9c1da43d3c5773b14d14bb918'),
  (29, 'https://host3.example/p/4/66', 'a199e2c2ebeff91402f8926423c17d482de7327fdba6c516696f345d86bd11ec'),
  (30, 'https://host3.example/sitemap1.xml', '085919d41164f0c7c2a98136ab850dfb98e7cfae9ebe0e817d4c8c27250b1bcb'),
  (31, 'https://host3.example/private1/', 'a4c2964f94b53fb8c4c6d0a0a265021dfdbd00a18f05c7b3a22ba465e599edfd'),
  (32, 'https://host0.example/p/5/130', 'e4a45c178b22d7b1efa1cd501231d7a9eae96e457101b07b10b3bd47a485583b'),
  (33, 'https://host0.example/p/5/131', 'a48a786941f993103ffa9742217ccdc24fcdd1d20578ce76b668cfe9243128fd'),
  (34, 'https://host5.example/p/5/132', 'caf1a884b695cdfa22397de3e9ead9a6e0365f41e5bf8bd1587539fb61686216'),
  (35, 'https://host2.example/p/5/301', '0b606a9a9bbecf314defe6bf6b079a1d4b0c00c6e045a5877383d871a667933f'),
  (36, 'https://host3.example/static/app3.js', 'b4899589325885697d6048fde371da1972d8bf8160277b9224c8ddd0aedb4e51'),
  (37, 'https://host0.example/p/5/133', '5fa2b24e8a2cda5ba13906f344cc0ca4b877037be3bf5f9e652e180a26dcb948'),
  (38, 'https://host0.example/p/5/134', '89ae5e74845c1eea7d61d8e41616de7ff9106b6714824ceda2c91ed7cd744aeb'),
  (39, 'https://host2.example/p/5/135', 'a5af1dc10a2be7fc48bb09f1dba873c2f631bacacd444b7975755eb81432c0e6'),
  (40, 'https://host0.example/static/favicon4.png', '146f46aa23cf6342645187c1ad74e18a1b27c904ea7e227822e649e6a1d94441'),
  (41, 'https://host0.example/p/5/136', '09481e8b8fdb331724d3428d2de55f84419f26d344211386c16d4f0291016735'),
  (42, 'https://host7.example/p/5/137', 'a97ee554d87059f6c9b0263e7f9d0470d46491d77e5b663f04612946ce90dd75'),
  (43, 'https://host6.example/p/5/138', '7aaa950d92b23416977bc6848e53355cc6fa319e0e6ebff72254e0ae765a326e'),
  (44, 'https://host2.example/sitemap5.xml', '9d7f383364be25df90db1a6ce0cd09ca79f52e66a638a60b2152ef176ef6f3c8'),
  (45, 'https://host2.example/private5/', 'e09a447e0f6c5b44b378c766781973ea8be212bdd17f71eb8af612c249754738'),
  (46, 'https://host4.example/p/4/94', '3040515b470a49be6566f277ed6eb68a9ed8638d675aa21ea10efbbb80220945'),
  (47, 'https://host4.example/p/4/95', '43fa461d928cfdf34df6fa923b7b396b9c208a57a1b54b81e3fe6382b8e9cb88'),
  (48, 'https://host0.example/p/4/96', '7c1a37cb5da6927a72f95278560aed0465068513586dad86b1624a16f4b0faae'),
  (49, 'https://host3.example/p/4/97', '719844e6668a81803d43d827030ada2df2372e0c1c000c03cf37a83a7a1e8e49'),
  (50, 'https://host1.example/p/4/98', '6bbe804441800013c44b3decd37c161e60c0fb561918771ad9d5007e52fa2d0e'),
  (51, 'https://host7.example/p/4/99', 'aed0667b34a40558c1c670ecf70f344ca5650ec23c19a9a6e2affdb24cfb8ddb'),
  (52, 'https://host7.example/static/img12.png', '54c79c9ccc078813241bebcdc1b6486b528d1fffdaeab100e5591a299eafc5ae'),
  (53, 'https://host7.example/p/4/100', '12c4533190da15bced82f74800fdc3d7e4cf0ea701e13bc8b356bfa4a70612e9'),
  (54, 'https://host5.example/p/4/101', 'c027df1ecdf917efcfd9af815b09d13525305bc7d4b5e4dd8b0d5e15ec310e05'),
  (55, 'https://host4.example/p/4/102', '6bbc18f46a55d9d30cd11052c166297d0eb858cae69656409a5fbcafa8f6ab81'),
  (56, 'https://host4.example/p/5/231', 'c34723748116575c37f88baaf04b60ac907c3764c136950b6152a2210568c6cc'),
  (57, 'https://host5.example/media/a_13.jpg/v1/fill,w_60,h_60/a.jpg', 'b6c48de0e655a0067835a3f65c19ac33db6bd3d23889e400ad8671c40cde7944'),
  (58, 'https://host5.example/media/a_13.jpg/v1/fill,w_120,h_120/a.jpg', 'b64285d6df34e916cac97d604c8138c30e3854b9d1a3b8f509121322da8f1e50'),
  (59, 'https://host4.example/p/4/103', '084064512deb5e41dbd30f98e41277f29dbaf200a3e243e5d44982c050dc633a')
) AS t(seq, url, url_hash)
"""


def q_media_features(spark, sf_dir):
    """Multimodal plumbing, fully oracle-checked (VERDICT r2 #4): byte-level
    features + REAL container decode (BMP pixels / PCM WAV samples — codec
    formats surface decoded=false) over binary media via Arrow mapInPandas.
    The oracle (media_oracle.MEDIA_SQL, generated by
    tools/gen_media_oracle.py) pins the exact float64s a pure-Python run of
    the same row functions produces — so rows+schema+hash verify the Spark
    plumbing bit-for-bit."""
    media = multimodal.synthetic_media(spark, 200, partitions=4)
    byte_f = multimodal.extract_features(media).select(
        "media_id",
        "n_bytes",
        "byte_mean",
        "byte_entropy",
        F.concat_ws(
            ",", F.transform("histogram16", lambda x: x.cast("string"))
        ).alias("hist_csv"),
    )
    dec_f = multimodal.extract_decoded_features(media).select(
        "media_id",
        "decoded",
        F.col("kind").alias("dec_kind"),
        "width",
        "height",
        F.element_at("mean_rgb", 1).alias("mean_r"),
        F.element_at("mean_rgb", 2).alias("mean_g"),
        F.element_at("mean_rgb", 3).alias("mean_b"),
        F.sha2(F.col("thumb64"), 256).alias("thumb_sha"),
        "sample_rate",
        "duration_ms",
        "rms",
    )
    return byte_f.join(dec_f, "media_id")


def q_warc_roundtrip(spark, sf_dir):
    """WARC ingest source (sources/warc.py): the batch-input analogue of the
    reference's live fetch (JCrawler.java:1271-1340) for Common-Crawl-style
    archives. The first 200 documents are serialized into 4 per-record-
    gzipped WARC/1.0 files (deterministic writer; warcinfo + request records
    interleaved so the reader proves it skips non-response types), read back
    DISTRIBUTED via binaryFile + Arrow mapInPandas, and projected. Oracle:
    the same rows straight off the documents table — a genuine round trip
    against an independent source of truth, byte-identical body included.
    warc_ts is compared as its UTC wall-time string (read_warc stores the
    true instant — aware-UTC parse — so rendering via to_utc_timestamp
    makes the check session-timezone-invariant)."""
    import datetime as _dt
    import os
    import shutil
    import tempfile

    from jcrawler_spark.sources import warc as warcmod

    docs = (
        _t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(200)
        .select("doc_id", "text")
        .collect()  # 200 rows, contract fixture synthesis only
    )
    epoch = _dt.datetime(2023, 11, 14, 22, 13, 20)
    root = tempfile.mkdtemp(prefix="jcrawler-warc-")
    try:
        per = (len(docs) + 3) // 4
        for fi in range(4):
            recs = [
                {
                    "url": (
                        f"https://warc{r['doc_id'] % 8}.example/d/{r['doc_id']}"
                    ),
                    "body": r["text"].encode("utf-8"),
                    "date": epoch + _dt.timedelta(seconds=int(r["doc_id"])),
                }
                for r in docs[fi * per : (fi + 1) * per]
            ]
            with open(os.path.join(root, f"part-{fi}.warc.gz"), "wb") as f:
                f.write(warcmod.build_warc(recs, with_requests=True))
        tz = spark.conf.get("spark.sql.session.timeZone")
        rows = (
            warcmod.read_warc(spark, root)
            .select(
                "url",
                F.date_format(
                    F.to_utc_timestamp(F.col("warc_ts"), tz),
                    "yyyy-MM-dd HH:mm:ss",
                ).alias("warc_ts_s"),
                "status",
                "content_type",
                F.decode("html", "UTF-8").alias("text"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "url string, warc_ts_s string, status int, content_type string, "
        "text string",
    )


def q_zipnum_fetch(spark, sf_dir):
    """ZipNum global index end-to-end (sources/cdx.py): the first 200
    documents are archived through the real sink (write_warc_files, which
    also emits the sorted .cdxj companions), rolled into a ZipNum index
    (one range Exchange), then EVERY url is answered the production way —
    cluster.idx binary search (driver, no Spark job) to locate each
    record's (filename, offset, length), and a distributed fetch_records
    range-read of exactly those gzip members. Oracle: the same rows
    straight off the documents table — the chain sink → index → lookup →
    ranged fetch must reproduce every body byte-identically."""
    import datetime as _dt
    import shutil
    import tempfile

    from jcrawler_spark.functions.urlops import surt
    from jcrawler_spark.sources import cdx as cdxmod
    from jcrawler_spark.sources import warc as warcmod

    docs = (
        _t(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .limit(200)
        .select("doc_id", "text")
        .collect()  # 200 rows, contract fixture synthesis only
    )
    epoch = _dt.datetime(2023, 11, 14, 22, 13, 20)
    root = tempfile.mkdtemp(prefix="jcrawler-zipnum-")
    try:
        pages = spark.createDataFrame(
            [
                (
                    f"https://warc{r['doc_id'] % 8}.example/d/{r['doc_id']}",
                    bytearray(r["text"].encode("utf-8")),
                    200,
                    None,
                    "text/html; charset=utf-8",
                    epoch + _dt.timedelta(seconds=int(r["doc_id"])),
                )
                for r in docs
            ],
            "url string, html binary, status int, location string, "
            "content_type string, warc_ts timestamp",
        ).repartition(4)
        arch = root + "/archive"
        idx = root + "/index"
        warcmod.write_warc_files(pages, arch).collect()
        cdxmod.build_zipnum(spark, arch, idx, shards=2, block_lines=32)

        zn = cdxmod.ZipNumIndex(idx)
        entries = []
        for r in docs:
            url = f"https://warc{r['doc_id'] % 8}.example/d/{r['doc_id']}"
            entries.extend(zn.lookup(surt(url)))
        sel = spark.createDataFrame(
            [(e["filename"], e["offset"], e["length"]) for e in entries],
            "filename string, offset long, length long",
        ).repartition(4)
        rows = (
            warcmod.fetch_records(sel, arch)
            .select(
                "url",
                "status",
                F.decode("html", "UTF-8").alias("text"),
            )
            .collect()
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return spark.createDataFrame(
        rows, "url string, status int, text string"
    )


_ZIPNUM_FETCH_SQL = """
SELECT
  'https://warc' || CAST(doc_id % 8 AS VARCHAR) || '.example/d/'
      || CAST(doc_id AS VARCHAR) AS url,
  200 AS status,
  text
FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 200)
"""


_WARC_ROUNDTRIP_SQL = """
SELECT
  'https://warc' || CAST(doc_id % 8 AS VARCHAR) || '.example/d/'
      || CAST(doc_id AS VARCHAR) AS url,
  strftime(TIMESTAMP '2023-11-14 22:13:20' + to_seconds(doc_id),
           '%Y-%m-%d %H:%M:%S') AS warc_ts_s,
  200 AS status,
  'text/html; charset=utf-8' AS content_type,
  text
FROM (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 200)
"""


def q_sitemap_harvest(spark, sf_dir):
    """Sitemap seeder (operators/sitemap.py): explode a table of sitemap.xml
    snapshots into (loc, lastmod, priority) seed entries — the sitemaps.org
    discovery channel the reference lacks (its seeders are lists/patterns/
    SERP, SURVEY §2.1), feeding priority-ordered wave selection. Markup is
    synthesized from documents by identical arithmetic on both sides (the
    seed_search pattern); Spark parses it with the real namespace-tolerant
    ElementTree path via Arrow mapInPandas, the oracle re-harvests with
    DuckDB regexps — two independent implementations. doc_id%3 rows pin the
    missing-priority default-NULL path, doc_id%4 rows the loc-only form."""
    from jcrawler_spark.operators import sitemap as sitemapmod

    d = F.col("doc_id").cast("string")
    xml = F.concat(
        F.lit(
            "<?xml version='1.0' encoding='UTF-8'?>"
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        ),
        F.lit("<url><loc>https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/p/"),
        d,
        F.lit("/a</loc><lastmod>2024-01-"),
        F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod><priority>0.8</priority></url>"),
        F.lit("<url><loc>https://site"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example/p/"),
        d,
        F.lit("/b</loc>"),
        F.when(
            F.col("doc_id") % 3 != 0,
            F.concat(
                F.lit("<priority>0."),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("</priority>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("<url><loc>https://site"),
                (F.col("doc_id") % 7).cast("string"),
                F.lit(".example/extra-"),
                d,
                F.lit("</loc><changefreq>weekly</changefreq></url>"),
            ),
        ).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    snaps = _t(spark, sf_dir, "documents").select(
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example/sitemap-"),
            d,
            F.lit(".xml"),
        ).alias("url"),
        F.encode(xml, "UTF-8").alias("body"),
    )
    ents = sitemapmod.harvest_sitemaps(snaps)
    return ents.select(
        "sitemap_url",
        F.col("order_in_map").cast("long").alias("order_in_map"),
        "loc",
        "lastmod",
        "changefreq",
        "priority",
    )


_SITEMAP_XML_SQL = (
    "'<url><loc>https://site' || (doc_id % 7) || '.example/p/' || doc_id"
    " || '/a</loc><lastmod>2024-01-' || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')"
    " || '</lastmod><priority>0.8</priority></url>'"
    " || '<url><loc>https://site' || (doc_id % 7) || '.example/p/' || doc_id || '/b</loc>'"
    " || (CASE WHEN doc_id % 3 <> 0 THEN '<priority>0.' || (doc_id % 10) || '</priority>' ELSE '' END)"
    " || '</url>'"
    " || (CASE WHEN doc_id % 4 = 0 THEN '<url><loc>https://site' || (doc_id % 7)"
    " || '.example/extra-' || doc_id || '</loc><changefreq>weekly</changefreq></url>' ELSE '' END)"
)

_SITEMAP_HARVEST_SQL = f"""
SELECT
  sitemap_url,
  CAST(generate_subscripts(blocks, 1) AS BIGINT) - 1 AS order_in_map,
  regexp_extract(unnest(blocks), '<loc>([^<]*)</loc>', 1) AS loc,
  nullif(regexp_extract(unnest(blocks), '<lastmod>([^<]*)</lastmod>', 1), '')
      AS lastmod,
  nullif(regexp_extract(unnest(blocks), '<changefreq>([^<]*)</changefreq>', 1),
         '') AS changefreq,
  CAST(nullif(regexp_extract(unnest(blocks), '<priority>([^<]*)</priority>', 1),
              '') AS DOUBLE) AS priority
FROM (
  SELECT
    'https://site' || (doc_id % 7) || '.example/sitemap-' || doc_id || '.xml'
        AS sitemap_url,
    regexp_extract_all({_SITEMAP_XML_SQL}, '<url>(.*?)</url>', 1) AS blocks
  FROM documents
)
"""


def q_robots_precedence(spark, sf_dir):
    """RFC 9309 §2.2.2 rule precedence — the engine's opt-in gate_robots
    expression (accept.robots_allowed_col, round 5; the reference extracts
    robots directives as links, JCrawler.java:362-365, but never enforces
    them — README.md:208). Deterministic per-row rule sets synthesized from
    documents cover: more-specific Allow (allowed), less-specific Allow
    (still blocked), exact length tie (Allow wins), no Allow (blocked),
    NULL rule arrays, and URLs no rule matches."""
    d = F.col("doc_id").cast("long")
    v = (d % 6).cast("int")
    host = F.lit("https://s.example")
    dis = F.concat(host, F.lit("/d"), (d % 5).cast("string"), F.lit("/"))
    url = F.when(
        v.isin(0, 2, 4), F.concat(dis, F.lit("page"), d.cast("string"))
    ).otherwise(F.concat(host, F.lit("/open/p"), d.cast("string")))
    disallow = F.when(
        v != 1, F.array(dis, F.concat(host, F.lit("/never/")))
    )  # v==1 -> NULL array (gate must treat as no rules)
    allow = (
        F.when(v == 0, F.array(F.concat(dis, F.lit("page"))))
        .when(v == 2, F.array(F.concat(host, F.lit("/"))))
        .when(v.isin(4, 5), F.array(dis))
    )  # v in (1,3) -> NULL
    return (
        _t(spark, sf_dir, "documents")
        .select(
            d.alias("doc_id"),
            url.alias("url"),
            disallow.alias("disallow"),
            allow.alias("allow"),
        )
        .select(
            "doc_id",
            "url",
            accept_ops.robots_allowed_col(
                F.col("url"), F.col("disallow"), F.col("allow")
            ).alias("allowed"),
        )
    )


_ROBOTS_PRECEDENCE_SQL = """
WITH t AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         CAST(doc_id % 6 AS INT) AS v,
         'https://s.example/d' || (doc_id % 5) || '/' AS dis
  FROM documents
), u AS (
  SELECT doc_id,
    CASE WHEN v IN (0, 2, 4) THEN dis || 'page' || doc_id
         ELSE 'https://s.example/open/p' || doc_id END AS url,
    CASE WHEN v <> 1 THEN [dis, 'https://s.example/never/'] END AS disallow,
    CASE v WHEN 0 THEN [dis || 'page']
           WHEN 2 THEN ['https://s.example/']
           WHEN 4 THEN [dis]
           WHEN 5 THEN [dis] END AS allow
  FROM t
)
SELECT doc_id, url,
  (coalesce(list_max(list_transform(disallow,
      r -> CASE WHEN starts_with(url, r) THEN length(r) ELSE 0 END)), 0) = 0
   OR coalesce(list_max(list_transform(allow,
      r -> CASE WHEN starts_with(url, r) THEN length(r) ELSE 0 END)), 0)
      >= coalesce(list_max(list_transform(disallow,
      r -> CASE WHEN starts_with(url, r) THEN length(r) ELSE 0 END)), 0)
  ) AS allowed
FROM u
"""


def q_seed_search(spark, sf_dir):
    """S7 search seeder, bulk form (JSeeder.java:13-43): harvest seed URLs
    from a corpus of SERP snapshots — anchor hrefs in document order, the
    reference's greedy ``/url?q=(https?://.+)&sa`` regex (capture runs to
    the LAST ``&sa``). Spark side runs the shared pure harvest
    (seeder.extract_serp_links) as an Arrow pandas_udf; the oracle is an
    independent RE2/list-lambda re-expression in DuckDB. SERP markup is
    synthesized from documents by identical arithmetic on both sides; the
    doc_id%4 row pins the greedy-to-last-&sa semantics."""
    from jcrawler_spark.operators import seeder

    docs = _t(spark, sf_dir, "documents").withColumn(
        "html",
        F.concat(
            F.lit('<html><body><a href="/url?q=https://r'),
            F.col("doc_id").cast("string"),
            F.lit('.example/a&sa=U&ved=0">r1</a><a href="/intl/en/about">skip</a>'),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit('<a href="/url?q=https://s'),
                    F.col("doc_id").cast("string"),
                    F.lit('.example/p&sa=1&q=2&sa=Z">r2</a>'),
                ),
            ).otherwise(F.lit("")),
            F.lit('<a href="/url?q=http://t'),
            (F.col("doc_id") % 13).cast("string"),
            F.lit(".example/path-"),
            F.col("doc_id").cast("string"),
            F.lit('&sa=D&usg=x">r3</a></body></html>'),
        ),
    )
    harvested = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(seeder.serp_links_udf(F.col("html"))).alias("pos0", "seed"),
    )
    return harvested.select(
        "doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "seed"
    )


_SEED_SEARCH_HTML_SQL = (
    "'<html><body><a href=\"/url?q=https://r' || doc_id ||"
    " '.example/a&sa=U&ved=0\">r1</a><a href=\"/intl/en/about\">skip</a>'"
    " || (CASE WHEN doc_id % 4 = 0 THEN"
    " '<a href=\"/url?q=https://s' || doc_id ||"
    " '.example/p&sa=1&q=2&sa=Z\">r2</a>' ELSE '' END)"
    " || '<a href=\"/url?q=http://t' || (doc_id % 13) || '.example/path-'"
    " || doc_id || '&sa=D&usg=x\">r3</a></body></html>'"
)

_SEED_SEARCH_SQL = f"""
SELECT doc_id, CAST(generate_subscripts(seeds, 1) AS BIGINT) AS pos,
       unnest(seeds) AS seed
FROM (
  SELECT doc_id,
    list_filter(
      list_transform(
        regexp_extract_all(html, '<a[^>]*?href="([^"]*)"', 1),
        h -> regexp_extract(h, '/url\\?q=(https?://.+)&sa', 1)),
      s -> s <> '') AS seeds
  FROM (SELECT doc_id, {_SEED_SEARCH_HTML_SQL} AS html FROM documents)
)
"""


def q_content_path_initial_old(spark, sf_dir):
    """Legacy slug migration (Slug.contentPathInitialOld, Slug.java:120-172):
    the old cache layout's (code, slug) pair — NFD diacritics fold, host
    dots -> '--', punctuation class -> '-', slashes+dots -> '--', then the
    70/-#hash-/--and-more/200 filename assembly with the '--sha256-' suffix
    + '.tmp'. Spark side is the shared pure scalar as an Arrow pandas_udf
    (migration cold path); the oracle re-derives every step in DuckDB SQL —
    valid because the synthesized URLs are pure ASCII, where the NFD fold
    is the identity (unicode edges are pinned by the pytest goldens). The
    doc_id%6 rows grow past the 70-split and the --and-more budget."""
    docs = _t(spark, sf_dir, "documents").withColumn(
        "url",
        F.concat(
            _url_col(),
            F.when(
                F.col("doc_id") % 6 == 0,
                F.concat(
                    F.lit("/sub/"),
                    F.repeat(F.lit("ab.c-"), (F.col("doc_id") % 23).cast("int")),
                    F.lit("end"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    pair = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        urlops.content_path_initial_old_udf(F.col("url")).alias("p"),
    )
    return pair.select("doc_id", F.col("p.code").alias("code"), F.col("p.slug").alias("slug"))


_LEGACY_URL_SQL = (
    f"{_URL_SQL} || (CASE WHEN doc_id % 6 = 0 THEN"
    " '/sub/' || repeat('ab.c-', doc_id % 23) || 'end' ELSE '' END)"
)

# Slug.java:120-172 re-derived step-by-step; ASCII input => NFD fold is a
# no-op, so every remaining step is pure string algebra DuckDB can run.
_CPIO_SQL = f"""
WITH u AS (SELECT doc_id, {_LEGACY_URL_SQL} AS url FROM documents),
s AS (SELECT doc_id, lower(regexp_replace(url, '#.*$', '')) AS r FROM u),
h AS (SELECT doc_id, r, sha256(r) AS code_full,
             regexp_extract(r, '^[a-z]+://[^/]*', 0) AS prefix
      FROM s),
t AS (SELECT doc_id, code_full,
        regexp_replace(
          regexp_replace(
            replace(prefix, '.', '--') || substr(r, length(prefix) + 1),
            '[()\\[\\]{{}}_''"`%^+*!×&ƒ:? -]', '-', 'g'),
          '[/.]', '--', 'g') AS folded
      FROM h)
SELECT doc_id, code_full AS code,
  substr(folded, 1, 70)
  || '-#' || substr(code_full, 1, 9) || '-'
  || (CASE WHEN length(substr(folded, 71)) <= 45 THEN substr(folded, 71)
      ELSE substr(folded, 71, 35) || '--and-more' END)
  || '--sha256-' || code_full || '.tmp' AS slug
FROM t
"""


# ---------------------------------------------------------------------------
# the contract
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: one crawl-wave expansion at sf0.001."""
    return q_crawl_wave(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "url_hash": q_url_hash,
        "slug_path": q_slug_path,
        "host_extract": q_host_extract,
        "surt_key": q_surt_key,
        "protocol_filter": q_protocol_filter,
        "resource_classify": q_resource_classify,
        "seed_range": q_seed_range,
        "seed_alternatives": q_seed_alternatives,
        "link_extract": q_link_extract,
        "redirect_links": q_redirect_links,
        "ignored_domains": q_ignored_domains,
        "first_wins_dedup": q_first_wins_dedup,
        "politeness_window": q_politeness_window,
        "failing_host_gate": q_failing_host_gate,
        "bfs_reachability": q_bfs_reachability,
        "pagerank": q_pagerank,
        "content_path_final": q_content_path_final,
        "localize_join": q_localize_join,
        "dedup_exact": q_dedup_exact,
        "minhash_signatures": q_minhash_signatures,
        "lsh_pairs": q_lsh_pairs,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_groups": q_dedup_groups,
        "simhash": q_simhash,
        "cosine_topk": q_cosine_topk,
        "lsh_ann_topk": q_lsh_ann_topk,
        "multiprobe_ann_topk": q_multiprobe_ann_topk,
        "cosine_near_dup": q_cosine_near_dup,
        "ivf_ann_topk": q_ivf_ann_topk,
        "ivf_nprobe_topk": q_ivf_nprobe_topk,
        "ivf_trained_topk": q_ivf_trained_topk,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "repetition_stats": q_repetition_stats,
        "pii_scrub": q_pii_scrub,
        "paragraph_dedup": q_paragraph_dedup,
        "gopher_filter": q_gopher_filter,
        "gopher_ngrams": q_gopher_ngrams,
        "stratified_sample": q_stratified_sample,
        "c4_filter": q_c4_filter,
        "ccnet_bucket": q_ccnet_bucket,
        "decontaminate": q_decontaminate,
        "cross_dup_spans": q_cross_dup_spans,
        "source_stats": q_source_stats,
        "bm25_search": q_bm25_search,
        "host_graph": q_host_graph,
        "dup_span_removal": q_dup_span_removal,
        "vocab_topk": q_vocab_topk,
        "normalize_html": q_normalize_html,
        "page_diff": q_page_diff,
        "seed_search": q_seed_search,
        "robots_precedence": q_robots_precedence,
        "content_path_initial_old": q_content_path_initial_old,
        "crawl_wave": q_crawl_wave,
        "crawl_emission": q_crawl_emission,
        "media_features": q_media_features,
        "warc_roundtrip": q_warc_roundtrip,
        "zipnum_fetch": q_zipnum_fetch,
        "sitemap_harvest": q_sitemap_harvest,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "url_hash": _URL_HASH_SQL,
        "slug_path": _SLUG_PATH_SQL,
        "host_extract": _HOST_SQL,
        "surt_key": _SURT_SQL,
        "protocol_filter": _PROTOCOL_SQL,
        "resource_classify": _RESOURCE_SQL,
        "seed_range": _SEED_RANGE_SQL,
        "seed_alternatives": _SEED_ALT_SQL,
        "link_extract": _LINK_EXTRACT_SQL,
        "redirect_links": _REDIRECT_SQL,
        "ignored_domains": _IGNORED_SQL,
        "first_wins_dedup": _FIRST_WINS_SQL,
        "politeness_window": _POLITENESS_SQL,
        "failing_host_gate": _FAILING_GATE_SQL,
        "bfs_reachability": _BFS_SQL,
        "pagerank": _pagerank_oracle_sql(),
        "content_path_final": _CPF_SQL,
        "localize_join": _LOCALIZE_SQL,
        "dedup_exact": _DEDUP_EXACT_SQL,
        "minhash_signatures": _MINHASH_SQL,
        "lsh_pairs": _LSH_PAIRS_SQL,
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        "dedup_groups": _DEDUP_GROUPS_SQL,
        "simhash": _SIMHASH_SQL,
        "cosine_topk": _COSINE_SQL,
        "lsh_ann_topk": _LSH_ANN_SQL,
        "multiprobe_ann_topk": _MULTIPROBE_ANN_SQL,
        "cosine_near_dup": _COSINE_NEAR_DUP_SQL,
        "ivf_ann_topk": _IVF_ANN_SQL,
        "ivf_nprobe_topk": _IVF_NPROBE_SQL,
        "ivf_trained_topk": _ivf_trained_oracle_sql(),
        "lang_id": _LANG_SQL,
        "quality_score": _QUALITY_SQL,
        "token_count": _TOKEN_SQL,
        "doc_fingerprint": _FINGERPRINT_SQL,
        "repetition_stats": _REPETITION_SQL,
        "pii_scrub": _PII_SQL,
        "paragraph_dedup": _PARAGRAPH_DEDUP_SQL,
        "gopher_filter": _GOPHER_SQL,
        "gopher_ngrams": _GOPHER_NGRAMS_SQL,
        "stratified_sample": _STRATIFIED_SAMPLE_SQL,
        "c4_filter": _C4_FILTER_SQL,
        "ccnet_bucket": _CCNET_SQL,
        "decontaminate": _DECONTAMINATE_SQL,
        "cross_dup_spans": _CROSS_DUP_SQL,
        "source_stats": _SOURCE_STATS_SQL,
        "bm25_search": _BM25_SQL,
        "host_graph": _HOST_GRAPH_SQL,
        "dup_span_removal": _DUP_SPAN_REMOVAL_SQL,
        "vocab_topk": _VOCAB_TOPK_SQL,
        "normalize_html": _normalize_html_oracle_sql(),
        "page_diff": _page_diff_oracle_sql(),
        "seed_search": _SEED_SEARCH_SQL,
        "robots_precedence": _ROBOTS_PRECEDENCE_SQL,
        "content_path_initial_old": _CPIO_SQL,
        "crawl_wave": _CRAWL_WAVE_SQL,
        "crawl_emission": _CRAWL_EMISSION_SQL,
        "media_features": _MEDIA_SQL,
        "warc_roundtrip": _WARC_ROUNDTRIP_SQL,
        "zipnum_fetch": _ZIPNUM_FETCH_SQL,
        "sitemap_harvest": _SITEMAP_HARVEST_SQL,
    }
