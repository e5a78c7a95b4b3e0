"""Offline-mirror localization — the reference's Rewriter pass re-expressed
(SURVEY.md §2.1 S15/S16, §2.4 J1/J2, §3.3; /root/reference/.../Rewriter.java).

Phase 1 (index): the url→local-path map IS the pages table — one projection
(`Rewriter.indexDirectory` walked .meta.json files, Rewriter.java:42-76).
Variants registered like the reference: trailing-slash pair (:61-65),
URL-decoded and space-normalized fallbacks (:384-406).

Phase 2 (rewrite): one Arrow-batch UDF per page:
  * J1 — attribute URLs (href/src/srcset/url()) matched with the SAME
    extraction matchers, resolved against the page URL, looked up in the
    map, replaced with a relative path (Rewriter.java:363-421);
  * J2 — inline JS/CSS: longest-first substring replacement of every known
    absolute URL (Rewriter.java:199-217) — run on the remaining text so
    quoted URLs in scripts/styles localize too.

Scale: the map is broadcast here (reference holds it fully in memory too,
single-threaded — we're already strictly more scalable). At 10^9+ pages the
broadcast becomes a join: explode page→refs, join refs⟕map on url, then
reassemble per page with a second UDF; same semantics, two shuffles. The
broadcast form is kept because it is byte-faithful to the reference and
covers any corpus whose URL set fits executor memory (~10^7-10^8)."""

from __future__ import annotations

import posixpath
import re
from collections.abc import Iterator
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jcrawler_spark.functions import urlops

# attribute-URL patterns (subset of extract.ALL_LINK_MATCHERS that carry a
# rewritable attribute; declaration order mirrors JCrawler.java:401-417)
_ATTR_PATTERNS = [
    re.compile(r"(?is)(<a[^>]*\s+href=')(?P<url>[^'#]*)((?:#[^']*)?')"),
    re.compile(r'(?is)(<a[^>]*\s+href=")(?P<url>[^"#]*)((?:#[^"]*)?")'),
    re.compile(r"(?is)(<img[^>]*\s+src\b\s*=')(?P<url>[^']*)(')"),
    re.compile(r'(?is)(<img[^>]*\s+src\b\s*=")(?P<url>[^"]*)(")'),
    re.compile(r"(?is)(<link[^>]*\s+href=')(?P<url>[^']*)(')"),
    re.compile(r'(?is)(<link[^>]*\s+href=")(?P<url>[^"]*)(")'),
    re.compile(r"(?is)(<script[^>]*\s+src\b\s*=')(?P<url>[^']*)(')"),
    re.compile(r'(?is)(<script[^>]*\s+src\b\s*=")(?P<url>[^"]*)(")'),
    re.compile(r"(?i)(url\(['\"]?)(?P<url>[^'\")]+)(['\"]?\))"),
]


def local_path(url: str, status: int | None = None, content_type: str | None = None) -> str:
    """The on-disk path a crawled URL localizes to."""
    return urlops.content_path_final(
        url, status if status is not None else 200, content_type or "text/html"
    )


def build_url_map(rows: list[tuple[str, str]]) -> dict[str, str]:
    """url→path with the reference's variant enrichment: trailing-slash
    pair (Rewriter.java:61-65), decoded form, space-normalized form
    (:384-406). First registration wins, like the reference's putIfAbsent
    walk order."""
    m: dict[str, str] = {}

    def put(u: str, p: str) -> None:
        m.setdefault(u, p)

    for url, path in rows:
        put(url, path)
        if url.endswith("/"):
            put(url.rstrip("/"), path)
        else:
            put(url + "/", path)
        dec = unquote(url)
        if dec != url:
            put(dec, path)
        nospace = url.replace(" ", "")
        if nospace != url:
            put(nospace, path)
    return m


def relative_path(from_path: str, to_path: str) -> str:
    """Relative link from the page's own file to the target file
    (Rewriter.java:411-421)."""
    base = posixpath.dirname(from_path)
    return posixpath.relpath(to_path, base or ".")


def rewrite_html_py(html_str: str, own_url: str, url_map: dict[str, str]) -> str:
    """Rewrite one page: attribute pass (J1) then longest-first inline
    replacement (J2)."""
    own_path = url_map.get(own_url) or local_path(own_url)

    def lookup(raw: str) -> str | None:
        resolved = urlops.resolve_url(own_url, raw.strip())
        for candidate in (
            resolved,
            resolved.rstrip("/") if resolved.endswith("/") else resolved + "/",
            unquote(resolved),
            resolved.replace(" ", ""),
        ):
            p = url_map.get(candidate)
            if p is not None:
                return p
        return None

    def sub_attr(m: re.Match) -> str:
        raw = m.group("url")
        p = lookup(raw)
        if p is None:
            return m.group(0)
        return m.group(1) + relative_path(own_path, p) + m.group(3)

    out = html_str
    for pat in _ATTR_PATTERNS:
        out = pat.sub(sub_attr, out)

    # J2: longest URL first so prefixes don't clobber longer matches
    # (Rewriter.java:199-217)
    for url in sorted(url_map, key=len, reverse=True):
        if url.startswith(("http://", "https://")) and url in out:
            out = out.replace(url, relative_path(own_path, url_map[url]))
    return out


def localize(pages: DataFrame, allow_external: bool = True) -> DataFrame:
    """J1+J2 over the pages table → (url, path, html_local).

    Only 200-status HTML pages are rewritten; others map verbatim
    (Rewriter.processDirectory copies non-HTML as-is, Rewriter.java:93-100).
    """
    spark = pages.sparkSession
    idx = [
        (r["url"], local_path(r["url"], r["status"], r["content_type"]))
        for r in pages.select("url", "status", "content_type").collect()
    ]
    url_map = build_url_map(idx)
    bc = spark.sparkContext.broadcast(url_map)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = bc.value
        for b in batches:
            rows = []
            for url, html, status, ct in zip(
                b["url"], b["html"], b["status"], b["content_type"]
            ):
                path = m.get(url) or local_path(url, status, ct)
                if (
                    html is not None
                    and status == 200
                    and ct is not None
                    and ct.startswith("text/html")
                ):
                    text = bytes(html).decode("utf-8", errors="replace")
                    out = rewrite_html_py(text, url, m)
                else:
                    out = (
                        bytes(html).decode("utf-8", errors="replace")
                        if html is not None
                        else None
                    )
                rows.append({"url": url, "path": path, "html_local": out})
            yield pd.DataFrame(rows, columns=["url", "path", "html_local"])

    return pages.select("url", "html", "status", "content_type").mapInPandas(
        run, schema="url string, path string, html_local string"
    )
