"""Sitemap seeder: harvest crawl seeds from sitemap.xml / sitemapindex.

The reference seeds crawls from explicit URL lists, generator patterns, a
sampled page's whitelist, or a SERP (SURVEY §2.1; JSeeder.java:13-43). The
web-scale companion the reference lacks is the sitemaps.org protocol — the
discovery channel robots.txt itself advertises (``Sitemap:`` lines) and the
one that carries per-URL scheduling hints (<lastmod>, <changefreq>,
<priority>) a frontier can feed straight into authority/recency-ordered
wave selection (engine.set_priority_scores).

Pure layer (golden-tested, shared by the Spark surface):
- ``parse_sitemap(data)``: XML urlset / sitemapindex (namespace-tolerant,
  stdlib ElementTree) or plain-text one-URL-per-line form; transparent
  gzip (.xml.gz). Returns (kind, entries).
- ``sitemap_urls_from_robots(text)``: the ``Sitemap:`` advertisement lines.

Spark surface: ``harvest_sitemaps(df)`` maps an archived snapshot table
(url, body) — e.g. a WARC ingest filtered to sitemap content-types — through
an Arrow ``mapInPandas`` (the declared-UDF pattern shared with extract/
htmlnorm/pagediff): embarrassingly parallel, bytes never leave executors,
no shuffle. Index rows come back as kind='sitemapindex' child pointers, so
one more fetch wave over those closes the protocol's single indirection
level; ``seeds_from_entries`` turns urlset rows into frontier seeds with
<priority> mapped onto the engine's score ordering.
"""

from __future__ import annotations

import gzip
import io
import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# one harvested row: where it was declared, what it points at, the hints
ENTRY = T.StructType(
    [
        T.StructField("sitemap_url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # urlset|sitemapindex|text
        T.StructField("loc", T.StringType(), False),
        T.StructField("lastmod", T.StringType(), True),  # W3C datetime, verbatim
        T.StructField("changefreq", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("order_in_map", T.IntegerType(), False),
    ]
)


def _local(tag: str) -> str:
    """Strip the XML namespace — sitemaps in the wild mix the 0.9 namespace,
    no namespace, and Google extensions; the protocol names are unambiguous
    by local name."""
    return tag.rsplit("}", 1)[-1].lower()


def _text(el: ET.Element | None) -> str | None:
    if el is None or el.text is None:
        return None
    return el.text.strip() or None


def parse_sitemap(data: bytes) -> tuple[str, list[dict]]:
    """Parse one sitemap document (bytes; transparently gunzipped) into
    (kind, entries): kind 'urlset' | 'sitemapindex' | 'text'; each entry
    ``{loc, lastmod, changefreq, priority}`` in document order. Entries
    without <loc> are skipped (protocol: loc is the one required field);
    malformed XML raises loudly."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    if data[:3] == b"\xef\xbb\xbf":  # UTF-8 BOM (seen in the wild)
        data = data[3:]
    head = data.lstrip()[:256].lower()
    if head.startswith(b"<") or b"<urlset" in head or b"<sitemapindex" in head:
        root = ET.parse(io.BytesIO(data)).getroot()
        kind = _local(root.tag)
        if kind not in ("urlset", "sitemapindex"):
            raise ValueError(f"not a sitemap root element: <{root.tag}>")
        entries = []
        for child in root:
            if _local(child.tag) not in ("url", "sitemap"):
                continue
            fields = {_local(c.tag): _text(c) for c in child}
            loc = fields.get("loc")
            if not loc:
                continue
            prio = fields.get("priority")
            try:
                # a hint, never load-bearing (same policy as lastmod_ts'
                # try_to_timestamp): '0,8' / 'high' seen in the wild → NULL
                prio_f = float(prio) if prio is not None else None
            except ValueError:
                prio_f = None
            entries.append(
                {
                    "loc": loc,
                    "lastmod": fields.get("lastmod"),
                    "changefreq": fields.get("changefreq"),
                    "priority": prio_f,
                }
            )
        return kind, entries
    # plain-text form: one URL per line
    entries = []
    for line in data.decode("utf-8", errors="replace").splitlines():
        line = line.strip()
        if line:
            entries.append(
                {"loc": line, "lastmod": None, "changefreq": None, "priority": None}
            )
    return "text", entries


def sitemap_urls_from_robots(robots_txt: str) -> list[str]:
    """``Sitemap:`` advertisement lines of a robots.txt (case-insensitive
    field name, value to end of line, document order)."""
    out = []
    for line in robots_txt.splitlines():
        line = line.split("#", 1)[0]
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def lastmod_ts(col) -> F.Column:
    """W3C datetime → timestamp, JVM-side: the protocol allows date-only
    and full datetime-with-offset forms; try the common shapes, NULL
    otherwise (hint column — never load-bearing for correctness)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd'T'HH:mm:ss")),
        F.try_to_timestamp(c, F.lit("yyyy-MM-dd")),
    )


def harvest_sitemaps(
    snapshots: DataFrame,
    url_col: str = "url",
    body_col: str = "body",
    batch_rows: int = 4096,
) -> DataFrame:
    """Explode a table of sitemap snapshots into ENTRY rows (Arrow
    mapInPandas generator; one snapshot parsed at a time, emitted in
    bounded batches)."""

    from jcrawler_spark.arrowio import emit_batches

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def rows():
            for pdf in it:
                for u, body in zip(pdf[url_col], pdf[body_col]):
                    if body is None:
                        continue
                    kind, entries = parse_sitemap(bytes(body))
                    for i, e in enumerate(entries):
                        yield (
                            u, kind, e["loc"], e["lastmod"],
                            e["changefreq"], e["priority"], i,
                        )

        return emit_batches(
            rows(), [f.name for f in ENTRY.fields], batch_rows
        )

    return snapshots.select(url_col, body_col).mapInPandas(gen, schema=ENTRY)


def seeds_from_entries(entries: DataFrame) -> DataFrame:
    """urlset/text rows → seed rows (url, score): <priority> (default 0.5
    per protocol) becomes the authority score engine.set_priority_scores
    orders waves by; duplicates keep the max score. One groupBy shuffle on
    url_hash — the same key every downstream frontier join uses."""
    from jcrawler_spark.functions import urlops

    return (
        entries.where(F.col("kind") != "sitemapindex")
        .select(
            F.col("loc").alias("url"),
            F.coalesce(F.col("priority"), F.lit(0.5)).alias("score"),
        )
        .withColumn("url_hash", urlops.url_hash_col(F.col("url")))
        .groupBy("url_hash")
        .agg(F.max_by("url", "score").alias("url"), F.max("score").alias("score"))
    )


# -- deterministic fixture writer (tests/oracle; mirrors warc.build_warc) ----

def build_urlset(
    entries: list[dict], *, gz: bool = False, namespace: bool = True
) -> bytes:
    ns = (
        ' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'
        if namespace
        else ""
    )
    parts = [f"<?xml version='1.0' encoding='UTF-8'?>\n<urlset{ns}>"]
    for e in entries:
        parts.append("<url><loc>" + e["loc"] + "</loc>")
        if e.get("lastmod"):
            parts.append("<lastmod>" + e["lastmod"] + "</lastmod>")
        if e.get("changefreq"):
            parts.append("<changefreq>" + e["changefreq"] + "</changefreq>")
        if e.get("priority") is not None:
            parts.append(f"<priority>{e['priority']}</priority>")
        parts.append("</url>")
    parts.append("</urlset>")
    raw = "".join(parts).encode("utf-8")
    return gzip.compress(raw, mtime=0) if gz else raw


def build_sitemapindex(locs: list[str], *, gz: bool = False) -> bytes:
    parts = [
        "<?xml version='1.0' encoding='UTF-8'?>\n"
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
    ]
    for loc in locs:
        parts.append("<sitemap><loc>" + loc + "</loc></sitemap>")
    parts.append("</sitemapindex>")
    raw = "".join(parts).encode("utf-8")
    return gzip.compress(raw, mtime=0) if gz else raw
