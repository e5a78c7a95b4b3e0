"""Fixed StructType schemas (no inference), per the reference's fixed
code-defined schema system (SURVEY.md §1.3; Java classes + Jackson,
JCrawler.java:598,1449).

The authoritative input table shape comes from BASELINE.json `input_hint`:
pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)
plus HTTP-transaction columns mirroring the reference Metadata record
(README.md:108-131): status, location (redirect target), fetch_ts.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---- the pages table (input_hint + Metadata, JCrawler.java:120,1128-1131) ----
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("status", T.IntegerType(), True),
        T.StructField("location", T.StringType(), True),  # 3xx Location header
        T.StructField("content_type", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("url_hash", T.StringType(), True),  # sha2(sanitized,256)
        T.StructField("fetch_ts", T.TimestampType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

# ---- one extracted link (HyperLink.java:18-62) ----
# `url` is the resolved absolute form (externalForm, the identity key,
# HyperLink.java:49-50); `raw_href` the href as found; `text` the anchor text
# or robots directive or srcset descriptor; order_in_page is the emission
# position within the page (matcher declaration order then document order,
# JCrawler.java:401-417 + golden JCrawlerTest.java:304-336).
LINK = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("raw_href", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("is_resource", T.BooleanType(), False),
        T.StructField("is_redirect", T.BooleanType(), False),
        T.StructField("order_in_page", T.IntegerType(), False),
    ]
)

LINKS_ARRAY = T.ArrayType(LINK)

# ---- frontier table (FIXTURES.md §2) ----
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("is_resource", T.BooleanType(), False),
        T.StructField("is_redirect", T.BooleanType(), False),
        T.StructField("src_url", T.StringType(), True),
        T.StructField("status", T.StringType(), False),  # pending|fetched
        T.StructField("superstep", T.IntegerType(), False),
        T.StructField("order_key", T.LongType(), True),
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("superstep", T.IntegerType(), False),
    ]
)

HOST_STATE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("last_fetch_ts", T.TimestampType(), True),
        T.StructField("last_error_ts", T.TimestampType(), True),
        T.StructField("crawl_delay_ms", T.IntegerType(), True),
        T.StructField("robots_disallow", T.ArrayType(T.StringType()), True),
        # RFC 9309 Allow carve-outs (longest-match precedence vs Disallow)
        T.StructField("robots_allow", T.ArrayType(T.StringType()), True),
    ]
)

LINEAGE = T.StructType(
    [
        T.StructField("superstep", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_out", T.LongType(), False),
        T.StructField("fetched", T.LongType(), False),
        T.StructField("errors", T.LongType(), False),
        T.StructField("wall_ms", T.LongType(), False),
    ]
)

# ---- emitted crawl order (visitedOrder, ParallelGraphTraverser.java:24,107) ----
EMITTED = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("superstep", T.IntegerType(), False),
        T.StructField("order_key", T.LongType(), False),
    ]
)
