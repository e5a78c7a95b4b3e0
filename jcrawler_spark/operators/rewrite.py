"""Offline-mirror localization — the reference's Rewriter pass re-expressed
(SURVEY.md §2.1 S15/S16, §2.4 J1/J2, §3.3; /root/reference/.../Rewriter.java).

Phase 1 (index): the url→local-path map IS the pages table — one projection
(`Rewriter.indexDirectory` walked .meta.json files, Rewriter.java:42-76).
Variants registered like the reference: trailing-slash pair (:61-65),
URL-decoded and space-normalized fallbacks (:384-406). Conflicting
registrations resolve deterministically by (variant-priority, path) — the
reference's putIfAbsent walk order is filesystem-dependent (DIVERGENCES.md).

Phase 2 (rewrite), per page:
  * J1 — attribute URLs (a/link[href], img/script[src], url()) matched with
    the extraction-style matchers, resolved against the page URL, looked up
    in the map, replaced with a relative path (Rewriter.java:153-162,363-421);
  * srcset — img/source[srcset] entries split on the reference's
    ", http(s)://" / ", /" delimiters (URLs may contain commas,
    Rewriter.java:284-360), each candidate URL rewritten, descriptors kept;
  * J2 — inline JS/CSS (Rewriter.java:199-217): known absolute URLs found
    in text are replaced longest-first. Candidates are discovered by a URL
    tokenizer + boundary prefixes (O(page) instead of the reference's
    O(|map|) scan per page); map keys containing whitespace (decoded
    variants) keep a contains-scan fallback so no reference-replaceable key
    is missed.

Two execution strategies, one semantics (property-tested equal):
  * broadcast — the url→path map is broadcast; right whenever the URL set
    fits executor memory (~10^7-10^8). The driver only ever holds the
    (url,path) string pairs, built from a column projection.
  * join — the 100 TB path, no driver or executor ever holds the full map:
    page → candidate ref keys (Arrow UDF) → shuffle join against the
    variant-exploded index → per-page mini-map (collect_list) → second
    Arrow UDF rewrites each page with only ITS OWN matched entries.
    Three shuffles, all key-partitioned, no broadcast, no collect.
"""

from __future__ import annotations

import posixpath
import re
from collections.abc import Iterator
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import DataFrame, Window
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

# srcset attributes on img/source (Rewriter.java:273-282)
_SRCSET_PATTERNS = [
    re.compile(r"(?is)(<(?:img|source)[^>]*\s+srcset\s*=\s*')(?P<val>[^']*)(')"),
    re.compile(r'(?is)(<(?:img|source)[^>]*\s+srcset\s*=\s*")(?P<val>[^"]*)(")'),
]

# inline-URL tokenizer for J2 candidate discovery
_URL_TOKEN = re.compile(r"https?://[^\s\"'<>\\]+")
_BOUNDARY_CHARS = "/?#&=,"
_TRAILING_PUNCT = ".,;:!)'\""


def local_path(url: str, status: int | None = None, content_type: str | None = None) -> str:
    """The on-disk path a crawled URL localizes to."""
    return urlops.content_path_final(
        url, status if status is not None else 200, content_type or "text/html"
    )


def url_variants(url: str) -> list[tuple[str, int]]:
    """(variant, priority) registrations for one crawled URL: the exact
    form, its trailing-slash pair (Rewriter.java:61-65), the URL-decoded
    and the space-normalized forms (:384-406)."""
    out = [(url, 0)]
    out.append((url.rstrip("/") if url.endswith("/") else url + "/", 1))
    dec = unquote(url)
    if dec != url:
        out.append((dec, 2))
    nospace = url.replace(" ", "")
    if nospace != url:
        out.append((nospace, 3))
    return out


def build_url_map(rows: list[tuple[str, str]]) -> dict[str, str]:
    """url→path with the reference's variant enrichment. Winner per key is
    min(variant-priority, path) — deterministic under any row order (the
    reference's first-wins depends on directory walk order)."""
    best: dict[str, tuple[int, str]] = {}
    for url, path in rows:
        for key, prio in url_variants(url):
            cand = (prio, path)
            cur = best.get(key)
            if cur is None or cand < cur:
                best[key] = cand
    return {k: v[1] for k, v in best.items()}


def relative_path(from_path: str, to_path: str) -> str:
    """Relative link from the page's own file to the target file
    (Rewriter.java:411-421)."""
    base = posixpath.dirname(from_path)
    return posixpath.relpath(to_path, base or ".")


def _lookup_keys(resolved: str) -> list[str]:
    """The key forms J1 lookup tries, in precedence order
    (Rewriter.java:384-406)."""
    return [
        resolved,
        resolved.rstrip("/") if resolved.endswith("/") else resolved + "/",
        unquote(resolved),
        resolved.replace(" ", ""),
    ]


def split_srcset(srcset: str) -> list[str]:
    """Split a srcset value into entries on the reference's delimiters:
    ', http://', ', https://', ', /' — NOT bare commas, because URLs may
    contain commas (w_945,h_915 …; Rewriter.java:289-324)."""
    entries: list[str] = []
    start = pos = 0
    n = len(srcset)
    while pos < n:
        cands = [
            srcset.find(", http://", pos),
            srcset.find(", https://", pos),
            srcset.find(", /", pos),
        ]
        cands = [c for c in cands if c != -1]
        if not cands:
            entries.append(srcset[start:].strip())
            break
        d = min(cands)
        entries.append(srcset[start:d].strip())
        start = pos = d + 2  # skip ", "
    return entries


def transform_srcset(srcset: str, transform) -> str | None:
    """Rewrite each srcset candidate URL, keeping its size descriptor
    (Rewriter.java:326-360). `transform(url) -> str` returns the rewritten
    or original URL. Returns None when nothing changed."""
    if not srcset or not srcset.strip():
        return None
    parts_out: list[str] = []
    changed = False
    for entry in split_srcset(srcset):
        if not entry:
            continue
        parts = entry.split()
        if len(parts) > 1:
            url, desc = " ".join(parts[:-1]), parts[-1]
        else:
            url, desc = parts[0], ""
        new_url = transform(url)
        if new_url != url:
            changed = True
        parts_out.append(f"{new_url} {desc}" if desc else new_url)
    return ", ".join(parts_out) if changed else None


def _candidate_tokens(text: str) -> set[str]:
    """J2 candidate keys: maximal absolute-URL tokens plus their natural
    boundary prefixes (so a map key that is a PREFIX of a longer token —
    which the reference's contains-scan would still replace — is found)."""
    out: set[str] = set()
    for m in _URL_TOKEN.finditer(text):
        tok = m.group(0)
        out.add(tok)
        stripped = tok.rstrip(_TRAILING_PUNCT)
        if stripped != tok:
            out.add(stripped)
        for i, ch in enumerate(tok):
            if ch in _BOUNDARY_CHARS and i > 8:  # past "https://"
                out.add(tok[:i])
                out.add(tok[: i + 1])
    return out


def rewrite_html_py(
    html_str: str,
    own_url: str,
    url_map: dict[str, str],
    own_path: str | None = None,
    ws_keys: list[str] | None = None,
) -> str:
    """Rewrite one page: J1 attribute pass, srcset pass, then J2 inline
    replacement (longest-first over candidate keys present in the map).

    `ws_keys`: map keys containing whitespace (never found by the
    tokenizer) — precomputed once by the caller; defaults to scanning the
    map (fine for per-page mini-maps in the join strategy)."""
    own_path = own_path or url_map.get(own_url) or local_path(own_url)

    def lookup(raw: str) -> str | None:
        resolved = urlops.resolve_url(own_url, raw.strip())
        for candidate in _lookup_keys(resolved):
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

    def sub_srcset(m: re.Match) -> str:
        def tx(u: str) -> str:
            p = lookup(u)
            return relative_path(own_path, p) if p is not None else u

        new = transform_srcset(m.group("val"), tx)
        if new is None:
            return m.group(0)
        return m.group(1) + new + m.group(3)

    for pat in _SRCSET_PATTERNS:
        out = pat.sub(sub_srcset, out)

    # J2 (Rewriter.java:199-217): longest URL first so prefixes don't
    # clobber longer matches; candidates from the page, not the whole map
    present = [k for k in _candidate_tokens(out) if k in url_map]
    if ws_keys is None:
        ws_keys = [k for k in url_map if " " in k or "\t" in k]
    for k in ws_keys:
        if k in out and k not in present:
            present.append(k)
    for url in sorted(present, key=len, reverse=True):
        if url.startswith(("http://", "https://")) and url in out:
            out = out.replace(url, relative_path(own_path, url_map[url]))
    return out


# ---------------------------------------------------------------------------
# distributed strategies
# ---------------------------------------------------------------------------

_PAGE_COLS = ["url", "html", "status", "content_type"]
_OUT_SCHEMA = "url string, path string, html_local string"


def _is_rewritable(status, ct) -> bool:
    return status == 200 and ct is not None and str(ct).startswith("text/html")


def _localize_broadcast(pages: DataFrame) -> DataFrame:
    spark = pages.sparkSession
    idx = [
        (r["url"], local_path(r["url"], r["status"], r["content_type"]))
        for r in pages.select("url", "status", "content_type").collect()
    ]
    url_map = build_url_map(idx)
    ws_keys = [k for k in url_map if " " in k or "\t" in k]
    bc = spark.sparkContext.broadcast((url_map, ws_keys))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m, ws = bc.value
        for b in batches:
            rows = []
            for url, html, status, ct in zip(
                b["url"], b["html"], b["status"], b["content_type"]
            ):
                path = m.get(url) or local_path(url, status, ct)
                if html is not None and _is_rewritable(status, ct):
                    text = bytes(html).decode("utf-8", errors="replace")
                    out = rewrite_html_py(text, url, m, own_path=path, ws_keys=ws)
                else:
                    out = (
                        bytes(html).decode("utf-8", errors="replace")
                        if html is not None
                        else None
                    )
                rows.append({"url": url, "path": path, "html_local": out})
            yield pd.DataFrame(rows, columns=["url", "path", "html_local"])

    return pages.select(*_PAGE_COLS).mapInPandas(run, schema=_OUT_SCHEMA)


def _ref_keys_py(html_str: str, own_url: str) -> list[str]:
    """Candidate map keys one page can possibly use: J1/srcset lookup keys
    for every attribute URL, plus the J2 tokenizer candidates."""
    keys: set[str] = set()
    for pat in _ATTR_PATTERNS:
        for m in pat.finditer(html_str):
            keys.update(_lookup_keys(urlops.resolve_url(own_url, m.group("url").strip())))
    for pat in _SRCSET_PATTERNS:
        for m in pat.finditer(html_str):
            for entry in split_srcset(m.group("val")):
                parts = entry.split()
                if not parts:
                    continue
                u = " ".join(parts[:-1]) if len(parts) > 1 else parts[0]
                keys.update(_lookup_keys(urlops.resolve_url(own_url, u.strip())))
    keys.update(_candidate_tokens(html_str))
    return list(keys)


def _localize_join(pages: DataFrame) -> DataFrame:
    """No-broadcast strategy (module doc): page→keys, join against the
    variant-exploded index, reassemble per-page mini-maps, rewrite.

    Limitation vs the broadcast strategy (documented, DIVERGENCES.md):
    whitespace-containing variant keys are only replaced where the page
    also references the URL in an attribute — the inline contains-scan
    fallback needs the full map and has no distributed equivalent."""
    src = pages.select(*_PAGE_COLS)

    # variant-exploded index with deterministic winner per key (Arrow UDF:
    # decoded/nospace variants need Python's unquote)
    import pyspark.sql.types as T

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("key", T.StringType()),
                    T.StructField("prio", T.IntegerType()),
                ]
            )
        )
    )
    def url_variants_udf(url: pd.Series) -> pd.Series:
        return pd.Series(
            [[{"key": k, "prio": p} for k, p in url_variants(u)] for u in url]
        )

    idx = (
        src.select(
            "url",
            F.col("status").alias("i_status"),
            F.col("content_type").alias("i_ct"),
        )
        .withColumn("v", F.explode(url_variants_udf(F.col("url"))))
        .select(
            F.col("v.key").alias("key"),
            F.col("v.prio").alias("prio"),
            "url",
            "i_status",
            "i_ct",
        )
    )

    @F.pandas_udf("string")
    def path_udf(url: pd.Series, status: pd.Series, ct: pd.Series) -> pd.Series:
        return pd.Series(
            [
                local_path(u, int(s) if pd.notna(s) else None, c)
                for u, s, c in zip(url, status, ct)
            ]
        )

    idx = idx.withColumn("path", path_udf("url", "i_status", "i_ct")).select(
        "key", "prio", "path"
    )
    w = Window.partitionBy("key").orderBy("prio", "path")
    idx_best = (
        idx.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("key", "path")
    )

    @F.pandas_udf("array<string>")
    def ref_keys_udf(html: pd.Series, url: pd.Series, status: pd.Series,
                     ct: pd.Series) -> pd.Series:
        out = []
        for h, u, s, c in zip(html, url, status, ct):
            if h is not None and _is_rewritable(
                int(s) if pd.notna(s) else None, c
            ):
                out.append(_ref_keys_py(bytes(h).decode("utf-8", "replace"), u))
            else:
                out.append([])
        return pd.Series(out)

    refs = src.select(
        F.col("url").alias("page_url"),
        F.explode(ref_keys_udf("html", "url", "status", "content_type")).alias(
            "key"
        ),
    )
    matched = refs.join(idx_best, "key").groupBy("page_url").agg(
        F.collect_list(F.struct("key", "path")).alias("entries")
    )

    joined = src.join(
        matched, src["url"] == matched["page_url"], "left"
    ).drop("page_url")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for url, html, status, ct, entries in zip(
                b["url"], b["html"], b["status"], b["content_type"], b["entries"]
            ):
                mini = (
                    {e["key"]: e["path"] for e in entries}
                    if entries is not None
                    else {}
                )
                path = mini.get(url) or local_path(url, status, ct)
                if html is not None and _is_rewritable(status, ct):
                    text = bytes(html).decode("utf-8", errors="replace")
                    out = rewrite_html_py(text, url, mini, own_path=path)
                else:
                    out = (
                        bytes(html).decode("utf-8", errors="replace")
                        if html is not None
                        else None
                    )
                rows.append({"url": url, "path": path, "html_local": out})
            yield pd.DataFrame(rows, columns=["url", "path", "html_local"])

    return joined.mapInPandas(run, schema=_OUT_SCHEMA)


def localize(
    pages: DataFrame,
    allow_external: bool = True,
    strategy: str = "auto",
    broadcast_max_urls: int = 2_000_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """J1+srcset+J2 over the pages table → (url, path, html_local).

    Only 200-status HTML pages are rewritten; others map verbatim
    (Rewriter.processDirectory copies non-HTML as-is, Rewriter.java:93-100).
    strategy: 'broadcast' | 'join' | 'auto' (join above broadcast_max_urls).
    'auto' uses the caller's ``approx_rows`` hint when given (the engine
    always knows its table sizes) and only falls back to a count() job
    when it genuinely has no idea.
    """
    if strategy == "broadcast":
        return _localize_broadcast(pages)
    if strategy == "join":
        return _localize_join(pages)
    n = approx_rows if approx_rows is not None else pages.select("url").count()
    if n <= broadcast_max_urls:
        return _localize_broadcast(pages)
    return _localize_join(pages)
