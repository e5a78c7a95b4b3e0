"""Link extraction — the reference's biggest operator (SURVEY.md §2.3).

Re-implements the observable semantics of
JCrawler.extractLinksFromContent (/root/reference/.../JCrawler.java:420-559)
and the 16 compiled matchers (JCrawler.java:344-417): regex-based, NOT
DOM-based, with the matchers applied in declaration order so links are
emitted grouped by matcher then by document position (golden
JCrawlerTest.java:304-336 ordering).

The Spark surface is a single Arrow-batch UDF (`extract_links_udf`) applied
via withColumn + explode; regexes are compiled once per executor at module
import (the reference notes named-group regexes cost ~17% of runtime,
JCrawler.java:350-351 — batch amortization is our answer).

Divergence note (see DIVERGENCES.md): the reference's own
JCrawlerTest.testLinkExtractor/testLinkExtractor2 srcset goldens predate its
shipped srcset splitter and contradict each other; we implement the shipped
splitter (JCrawler.java:505-553), which is the one its self-consistent
SrcsetExtractionTest.java:19-157 suite exercises.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import functions as F

from jcrawler_spark import schemas
from jcrawler_spark.functions import urlops


@dataclass(frozen=True)
class LinkMatcher:
    pattern: re.Pattern
    has_url: bool
    has_srcset: bool
    has_directive: bool
    is_resource: bool


def _exp(sep: str) -> LinkMatcher:
    # <a ... href='url(#frag)?' ...>text</a>  (JCrawler.java:344-348);
    # fragment captured separately and dropped
    p = re.compile(
        rf"(?is)<a[^>]*\s+href={sep}(?P<url>[^{sep}#]*)(#[^{sep}]*)?{sep}[^>]*>(?P<text>.*?)</a>"
    )
    return LinkMatcher(p, True, False, False, False)


def _img_exp(sep: str) -> LinkMatcher:
    p = re.compile(rf"(?is)<img[^>]*\s+src\b\s*={sep}(?P<url>[^{sep}]*){sep}[^>]*>")
    return LinkMatcher(p, True, False, False, True)


def _srcset_exp(tag: str, sep: str) -> LinkMatcher:
    p = re.compile(
        rf"(?is)<{tag}[^>]*\s+srcset\b\s*={sep}(?P<srcset>[^{sep}]*){sep}[^>]*>"
    )
    return LinkMatcher(p, False, True, False, True)


def _url_in_style_exp() -> LinkMatcher:
    p = re.compile(r"(?i)url\(['\"]?(?P<url>[^'\")]+)['\"]?\)")
    return LinkMatcher(p, True, False, False, True)


def _link_tag_exp(sep: str) -> LinkMatcher:
    p = re.compile(rf"(?i)<link[^>]*\s+href={sep}(?P<url>[^{sep}]*){sep}[^>]*>")
    return LinkMatcher(p, True, False, False, True)


def _robots_txt_exp() -> LinkMatcher:
    p = re.compile(r"(?i)(?P<directive>Sitemap|Allow|Disallow):\s*(?P<url>[^\s]+)")
    return LinkMatcher(p, True, False, True, True)


def _xml_stylesheet_exp() -> LinkMatcher:
    p = re.compile(
        r"(?i)<\?xml-stylesheet[^>]*\s+href\b\s*=['\"](?P<url>[^'\"]+)['\"][^>]*\?>"
    )
    return LinkMatcher(p, True, False, False, True)


def _sitemap_loc_exp() -> LinkMatcher:
    p = re.compile(r"(?i)<loc>(?P<url>[^<]+)</loc>")
    return LinkMatcher(p, True, False, False, True)


def _script_src(sep: str) -> LinkMatcher:
    p = re.compile(rf"(?is)<script[^>]*\s+src\b\s*={sep}(?P<url>[^{sep}]*){sep}")
    return LinkMatcher(p, True, False, False, True)


# declaration order matters for emission order (JCrawler.java:401-417)
ALL_LINK_MATCHERS: list[LinkMatcher] = [
    _exp("'"),
    _exp('"'),
    _img_exp("'"),
    _img_exp('"'),
    _srcset_exp("img", "'"),
    _srcset_exp("img", '"'),
    _srcset_exp("source", "'"),
    _srcset_exp("source", '"'),
    _url_in_style_exp(),
    _link_tag_exp("'"),
    _link_tag_exp('"'),
    _robots_txt_exp(),
    _xml_stylesheet_exp(),
    _sitemap_loc_exp(),
    _script_src('"'),
    _script_src("'"),
]

# ---------------------------------------------------------------------------
# srcset splitter (JCrawler.java:505-553)
#
# Java splits on:  (?<=\s\d{1,5}(?:\.\d+)?[wx])\s*,\s+  |  ,\s+(?=(?:https?://|/))
# The first alternative has a variable-width lookbehind Python `re` can't
# express, so we emulate the exact Java Matcher.find() scan manually
# (left-to-right positions, first alternative preferred at equal position).
# ---------------------------------------------------------------------------

_ALT1_BODY = re.compile(r"\s*,\s+")
_ALT1_LOOKBEHIND = re.compile(r"\s\d{1,5}(?:\.\d+)?[wx]$")
_ALT2 = re.compile(r",\s+(?=https?://|/)")
_WS = re.compile(r"\s+")


def split_srcset(srcset: str) -> list[str]:
    """Split a srcset attribute into entries, handling commas inside URLs
    (Wix-style) exactly like the reference's heuristic splitter."""
    parts: list[str] = []
    last = 0
    i = 0
    n = len(srcset)
    while i < n:
        m1 = _ALT1_BODY.match(srcset, i)
        if m1 and _ALT1_LOOKBEHIND.search(srcset, 0, i):
            parts.append(srcset[last:i])
            last = i = m1.end()
            continue
        m2 = _ALT2.match(srcset, i)
        if m2:
            parts.append(srcset[last:i])
            last = i = m2.end()
            continue
        i += 1
    parts.append(srcset[last:])
    return parts


def parse_srcset_entries(srcset: str) -> list[tuple[str, str]]:
    """(url, descriptor) pairs per the reference's per-entry logic:
    last-space split, inner whitespace removed from the URL, data: URIs
    skipped, descriptorless entries dropped (JCrawler.java:519-552)."""
    out: list[tuple[str, str]] = []
    for entry in split_srcset(srcset):
        entry = entry.strip()
        if not entry:
            continue
        last_space = entry.rfind(" ")
        if last_space > 0:
            url = _WS.sub("", entry[:last_space].strip())
            descriptor = entry[last_space + 1 :].strip()
            if url.lower().startswith("data:"):
                continue
            out.append((url, descriptor))
    return out


# ---------------------------------------------------------------------------
# per-page extraction (pure Python; shared by the Arrow UDF and the oracle)
# ---------------------------------------------------------------------------

_TEMPLATE_RAW = ("${", "}")
_TEMPLATE_ENC = ("$%7B", "%7D")
_DATA_PREFIXES = ("data:", "data", "dataimage/")


def _skip_data_uri(url_lower: str) -> bool:
    return url_lower.startswith(_DATA_PREFIXES)


def _skip_template(url: str) -> bool:
    return (_TEMPLATE_RAW[0] in url and _TEMPLATE_RAW[1] in url) or (
        _TEMPLATE_ENC[0] in url and _TEMPLATE_ENC[1] in url
    )


def extract_links_py(
    content: str, source_url: str | None, depth: int = 0
) -> list[dict]:
    """Extract links from one page, reproducing the reference's per-match
    pipeline (JCrawler.java:431-502): trim -> data-URI skip -> template skip
    -> >2000-char skip -> URL-decode normalize -> resolve to absolute.

    Returns dicts matching schemas.LINK (url resolved, raw_href as found,
    text = robots directive / srcset descriptor / "", is_resource,
    is_redirect=False, order_in_page)."""
    links: list[dict] = []
    order = 0

    def emit(raw: str, text: str, is_resource: bool) -> None:
        nonlocal order
        links.append(
            {
                "url": urlops.resolve_url(source_url, raw),
                "raw_href": raw,
                "text": text,
                "is_resource": is_resource,
                "is_redirect": False,
                "order_in_page": order,
            }
        )
        order += 1

    for matcher in ALL_LINK_MATCHERS:
        for m in matcher.pattern.finditer(content):
            url = None
            if matcher.has_url:
                g = m.group("url")
                url = g.strip() if g is not None else None
            directive = ""
            if matcher.has_directive:
                g = m.group("directive")
                directive = g.strip() if g is not None else ""
            srcset = ""
            if matcher.has_srcset:
                g = m.group("srcset")
                srcset = g.strip() if g is not None else ""

            if url is None and not srcset:
                continue

            is_resource = matcher.is_resource
            if not is_resource and url is not None and urlops.is_resource_ext(url):
                is_resource = True

            if url is not None:
                low = url.lower()
                if _skip_data_uri(low):
                    continue
                if _skip_template(url):
                    continue
                if len(url) > 2000:
                    continue
                decoded = urlops.url_decode(url).strip()
                if decoded != url:
                    low_dec = decoded.lower()
                    if _skip_data_uri(low_dec):
                        continue
                    if _skip_template(decoded):
                        continue
                    url = decoded
                emit(url, directive, is_resource)

            if srcset:
                for s_url, desc in parse_srcset_entries(srcset):
                    emit(s_url, desc, is_resource)

    return links


def is_extractable(status: int | None, content_type: str | None) -> bool:
    """Extraction gate (JCrawler.java:1417-1426): status 200 AND content type
    is text/* or */xml."""
    if status != 200 or not content_type:
        return False
    main, _, sub = content_type.partition(";")[0].strip().partition("/")
    return main.strip().lower() == "text" or sub.strip().lower() == "xml"


def redirect_link(
    status: int | None, location: str | None, source_url: str | None
) -> dict | None:
    """The appended redirect pseudo-link for 3xx responses
    (JCrawler.java:1428-1444)."""
    if status is None or location is None or not (300 <= status < 400):
        return None
    return {
        "url": urlops.resolve_url(source_url, location),
        "raw_href": location,
        "text": f"Moved - http status {status}",
        "is_resource": urlops.is_resource_ext(location),
        "is_redirect": True,
        "order_in_page": 1_000_000,  # after all content links
    }


# ---------------------------------------------------------------------------
# Spark surface: one vectorized Arrow-batch UDF
# ---------------------------------------------------------------------------


# robots.txt Crawl-delay directive (RFC 9309 §2.2's common extension) —
# NOT part of the reference's 16-matcher contract (JCrawler.java:362-365
# harvests Sitemap/Allow/Disallow only), so harvesting is OPT-IN via
# links_extractor_udf(include_crawl_delay=True): the default path stays
# bit-identical to the reference goldens.
_CRAWL_DELAY_RE = re.compile(r"(?i)Crawl-delay:\s*(?P<val>[0-9]+(?:\.[0-9]+)?)")


def _extract_batch(
    html, url, status, content_type, location, dedup: bool,
    include_crawl_delay: bool = False,
):
    out = []
    for h, u, st, ct, loc in zip(html, url, status, content_type, location):
        st = int(st) if st is not None and not pd.isna(st) else None
        rows: list[dict] = []
        if h is not None and is_extractable(st, ct):
            text = bytes(h).decode("utf-8", errors="replace")
            rows = extract_links_py(text, u, 0)
            if include_crawl_delay:
                # pseudo-links: url 'crawl-delay:<seconds>' can never match
                # an accept prefix (never enters the frontier) and never
                # collides with a page URL (self-filter safe); the engine's
                # host_state harvest keys them by src_url's host
                for m in _CRAWL_DELAY_RE.finditer(text):
                    rows.append(
                        {
                            "url": f"crawl-delay:{m.group('val')}",
                            "raw_href": m.group("val"),
                            "text": "Crawl-delay",
                            "is_resource": False,
                            "is_redirect": False,
                            "order_in_page": len(rows),
                        }
                    )
        r = redirect_link(st, loc if isinstance(loc, str) else None, u)
        if r is not None:
            r = dict(r)
            r["order_in_page"] = len(rows)
            rows.append(r)
        if dedup:
            # self-filter + per-page first-wins dedup IN the batch
            # (JCrawler.java:1233-1238) — removes a full shuffle+window from
            # the engine's wave pipeline; semantics identical
            seen: set[str] = set()
            deduped = []
            for row in rows:
                if row["url"] == u or row["url"] in seen:
                    continue
                seen.add(row["url"])
                deduped.append(row)
            rows = deduped
        out.append(rows)
    return pd.Series(out)


@F.pandas_udf(schemas.LINKS_ARRAY)
def extract_links_udf(
    html: pd.Series, url: pd.Series, status: pd.Series, content_type: pd.Series,
    location: pd.Series,
) -> pd.Series:
    """Vectorized link extraction over an Arrow batch of pages. Returns the
    full ordered link array per page (content links if the page is
    extractable, plus the redirect pseudo-link for 3xx)."""
    return _extract_batch(html, url, status, content_type, location, dedup=False)


@F.pandas_udf(schemas.LINKS_ARRAY)
def extract_links_dedup_udf(
    html: pd.Series, url: pd.Series, status: pd.Series, content_type: pd.Series,
    location: pd.Series,
) -> pd.Series:
    """extract_links_udf + self-filter + per-page first-occurrence dedup
    (the successor pipeline of JCrawler.java:1233-1238) done batch-side."""
    return _extract_batch(html, url, status, content_type, location, dedup=True)


def links_extractor_udf(include_crawl_delay: bool = False):
    """Engine-facing factory: the dedup extraction UDF, optionally also
    harvesting robots 'Crawl-delay' directives as pseudo-links (opt-in —
    only the enforce_crawl_delay engine turns it on; the default path is
    extract_links_dedup_udf exactly)."""
    if not include_crawl_delay:
        return extract_links_dedup_udf

    @F.pandas_udf(schemas.LINKS_ARRAY)
    def extract_links_dedup_delay_udf(
        html: pd.Series, url: pd.Series, status: pd.Series,
        content_type: pd.Series, location: pd.Series,
    ) -> pd.Series:
        return _extract_batch(
            html, url, status, content_type, location,
            dedup=True, include_crawl_delay=True,
        )

    return extract_links_dedup_delay_udf
