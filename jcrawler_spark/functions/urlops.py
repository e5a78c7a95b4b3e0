"""URL scalar functions — pure-Python and Spark Column forms.

Pure forms are used inside the Arrow-batch extractor UDF and the tiny
pure-Python BFS oracle; Column forms keep the DataFrame pipeline JVM-side
(whole-stage codegen) wherever possible.

Behavior contract comes from the reference goldens:
  - url_hash:  JCrawlerTest.java:166 (europa URL -> 9cf4918b…),
               JCrawlerTest.java:188-189 (Wget URL hashed AFTER lowercasing)
  - path:      JCrawlerTest.java:167,190 ("?"->"@"), SlugTest.java:9-16
  - sanitize:  SlugTest.java:18-26 (no trim), JCrawlerTest.java:188
               (".../Wget?param=value" -> ".../wget?param=value", i.e.
               sanitize lowercases)
  - content_path_initial: SlugEscapeTest.java:9-40 (no hash suffix)

Documented divergences from the reference *code* (tests win, per the
observable contract; see DIVERGENCES.md):
  - Slug.java:188-196 does not lowercase and its fragment-strip regex is a
    no-op; the goldens above require lowercase, and the docstring intent is
    fragment removal — we implement decode -> strip #fragment -> lowercase.
  - Slug.java:83 appends "--<hash8>.tmp2" but SlugEscapeTest expects plain
    "<path>.tmp2"; we follow the test.

Decode semantics mirror java.net.URLDecoder (used in Slug.urlSanitized and
the extractor, JCrawler.java:474-499): '+' decodes to space, malformed '%'
sequences raise (we fall back to the original string), malformed UTF-8 bytes
become U+FFFD.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import unquote_plus, urljoin, urlparse

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# pure-Python forms
# ---------------------------------------------------------------------------

_BAD_PERCENT = re.compile(r"%(?![0-9a-fA-F]{2})")
_FRAGMENT = re.compile(r"#.*$", re.DOTALL)
_SCHEME = re.compile(r"^([^:]+://)")
# resource extensions, JCrawler.java:443-449
_RESOURCE_EXT = (".pdf", ".zip", ".mp3", ".avi", ".jpg", ".png", ".css", ".js")
# Windows-unsafe char replacements, Slug.java:221-233
_CHAR_REPLACEMENTS = str.maketrans(
    {
        ":": "",
        "*": "",
        "?": "",
        '"': "",
        "<": "",
        ">": "",
        "|": "",
    }
)
# protocols rejected before anything else, JCrawler.java:964-965
UNSUPPORTED_PROTOCOLS = (
    "tel:", "mailto:", "javascript:", "data:", "blob:", "file:", "ftp:",
    "ssh:", "git:",
)


def url_decode(url: str) -> str:
    """java.net.URLDecoder.decode(url, UTF_8); original kept on failure."""
    if _BAD_PERCENT.search(url):
        return url
    return unquote_plus(url, errors="replace")


def sanitize(url: str) -> str:
    """Slug.urlSanitized: strip #fragment + decode to a FIXED POINT, then
    lowercase. No trim (SlugTest.java:18-26).

    Round-5 fix (VERDICT r4 #1): a single decode pass is not idempotent —
    decoding can surface a new fragment ('%23…'), a new escape ('%25xx'),
    or a new '+' ('%2B'), and a malformed '%' inside the fragment blocks
    the first decode entirely (pinned golden: 'http://0/+#%').  sanitize
    feeds url_hash, the visited-set/dedup key, so
    sanitize(sanitize(u)) == sanitize(u) is a hard requirement
    (tests/test_urlops.py::test_sanitize_total_and_idempotent).

    Termination: a changing step either shrinks the string (fragment strip,
    '%xx' -> 1 char) or converts '+' -> ' ' (new '+' only from '%2B', which
    shrinks), so (len, '+'-count) strictly decreases lexicographically.
    Lowercasing last is safe: it cannot create a '#', a '+', or turn a
    malformed '%'-escape valid (hex test is case-insensitive)."""
    cur = url
    while True:
        nxt = url_decode(_FRAGMENT.sub("", cur))
        if nxt == cur:
            return cur.lower()
        cur = nxt


def url_hash(url: str) -> str:
    """sha-256 hex of the sanitized URL (Slug.java:176-182)."""
    return hashlib.sha256(sanitize(url).encode("utf-8")).hexdigest()


def slug_path(url: str, strip_query: bool = False) -> str:
    """Slug.path: relative filesystem path for a URL (Slug.java:198-219).
    '?' -> '@' like wget (or query stripped), scheme removed, Windows-unsafe
    chars mapped to presentation-forms, trailing '/' -> '/index.html'."""
    result = sanitize(url)
    if strip_query:
        result = re.sub(r"\?.*$", "", result, flags=re.DOTALL)
    else:
        result = result.replace("?", "@")
    result = _SCHEME.sub("", result)
    result = result.translate(_CHAR_REPLACEMENTS)
    if result.endswith("/"):
        return result + "/index.html"
    return result


def content_uid(url: str) -> str:
    """Slug.contentUid: the sha256 is both code and slug (Slug.java:75-79)."""
    return url_hash(url)


def content_path_initial(url: str) -> str:
    """Slug.contentPathInitial per SlugEscapeTest goldens (no hash suffix)."""
    return slug_path(url, strip_query=True) + ".tmp2"


_EXT_RE = re.compile(r"^(.*/.*)\.(.{2,5})$", re.DOTALL)


def content_path_final(url: str, status: int = 200, content_type: str | None = None) -> str:
    """Slug.contentPathFinal (Slug.java:88-110): strip .tmp2, keep a 2-5 char
    extension if the path has one, else use the content-type subtype; append
    .E{status} before the extension when status != 200."""
    path = content_path_initial(url)
    path = path[: -len(".tmp2")]
    ext = ""
    m = _EXT_RE.match(path)
    if m:
        path, ext = m.group(1), "." + m.group(2)
    if not ext and content_type and "/" in content_type:
        ext = "." + content_type.split("/", 1)[1].split(";", 1)[0].strip()
    if status != 200:
        path = path + ".E" + str(status)
    return path + ext


# Slug.java:52-56 — legacy slug constants, verbatim
_OLD_MAX_FS_FILENAME = 200
_OLD_SPLIT_AT = 70
_OLD_ABBREV_MARKER = "--and-more"
# Java: [()\[\]{}_'"`%^+_*!×&ƒ\:? -]  (note: includes space AND hyphen)
_OLD_NON_URL_CHARS = re.compile(r"[()\[\]{}_'\"`%^+*!×&ƒ:? -]")
_OLD_NON_URL_PATH_CHARS = re.compile(r"[/.]")
# Java \p{InCombiningDiacriticalMarks}: the U+0300–U+036F block exactly
_OLD_COMBINING = re.compile("[̀-ͯ]+")


def _abbreviate(s: str, marker: str, max_width: int) -> str:
    """Apache Commons StringUtils.abbreviate(str, marker, maxWidth):
    unchanged when it fits, else truncate and append the marker."""
    if len(s) <= max_width:
        return s
    return s[: max_width - len(marker)] + marker


def content_path_initial_old(url: str) -> tuple[str, str]:
    """Slug.contentPathInitialOld (Slug.java:120-172) — the LEGACY slug
    layout, kept so a store written by an old jcrawler cache can be
    located/migrated. Returns (code, slug) like the Java Slug pair:
    NFD-fold diacritics (combining-marks block stripped), host dots →
    '--', punctuation class → '-', slashes+dots → '--', then the
    70/--and-more/200 filename assembly with the embedded short hash and
    the full '--sha256-<hex>' suffix + '.tmp'.

    DIVERGENCE (same as url_hash): the repo's canonical sanitize
    lowercases (SlugTest goldens win over the shipped non-lowercasing
    urlSanitized), so code/slug for mixed-case URLs differ from the dead
    Java path by case only."""
    result = sanitize(url)
    code_full = hashlib.sha256(result.encode("utf-8")).hexdigest()
    short_code = "-#" + code_full[:9] + "-"
    code = "--sha256-" + code_full
    import unicodedata

    result = _OLD_COMBINING.sub("", unicodedata.normalize("NFD", result))
    extension = ""  # Slug.java:127-129 — extension split is commented out
    protocol_ends = result.find("//")
    first_slash = result.find("/", protocol_ends + 2)
    if first_slash == -1:
        result = result.replace(".", "--")
    elif protocol_ends != -1:
        result = (
            result[:first_slash].replace(".", "--") + result[first_slash:]
        )
    result = _OLD_NON_URL_CHARS.sub("-", result)
    result = _OLD_NON_URL_PATH_CHARS.sub("--", result)
    max_width = (
        _OLD_MAX_FS_FILENAME
        - len(short_code)
        - len(code)
        - len(extension)
        - _OLD_SPLIT_AT
    )
    slug = (
        result[:_OLD_SPLIT_AT]
        + short_code
        + _abbreviate(result[_OLD_SPLIT_AT:], _OLD_ABBREV_MARKER, max_width)
        + code
        + extension
        + ".tmp"
    )
    return code_full, slug


def hostname(url: str) -> str | None:
    """URI.getHost() analogue (HyperLink.java:77-82)."""
    try:
        return urlparse(url).hostname
    except ValueError:
        return None


def hostname_for_accept(url: str) -> str | None:
    """HyperLink.hostnameForAccept strips a leading 'wwww.' — sic, four w's,
    a reference quirk preserved verbatim (HyperLink.java:85-88)."""
    h = hostname(url)
    if h is not None and h.startswith("wwww."):
        return h[len("wwww.") :]
    return h


def is_resource_ext(url: str) -> bool:
    """Extension-based resource classification (JCrawler.java:443-449)."""
    return url.lower().endswith(_RESOURCE_EXT)


def strip_query(url: str) -> str:
    """HyperLink.withoutQuery (HyperLink.java:73-75)."""
    return re.sub(r"\?.*$", "", url, flags=re.DOTALL)


def resolve_url(base: str | None, href: str) -> str:
    """SimpleUrl.resolve analogue (HyperLink.java:34-43) via RFC-3986 urljoin.

    Absolute hrefs and non-hierarchical schemes (tel:, mailto:) pass through;
    relative hrefs resolve against the page URL. Parity pinned by the
    JCrawlerTest.java:264-336 goldens (root-relative, comma-leading relative,
    protocol-relative)."""
    if base is None or base == "":
        return href
    try:
        return urljoin(base, href)
    except ValueError:
        return href


def has_unsupported_protocol(url: str) -> bool:
    """JCrawler.java:908-914: lowercased prefix test, checked first."""
    low = url.lower()
    return low.startswith(UNSUPPORTED_PROTOCOLS)


# ---------------------------------------------------------------------------
# Spark Column forms (JVM-side, codegen-friendly)
# ---------------------------------------------------------------------------


# How many strip-fragment+decode steps the Column form unrolls.  The pure
# form iterates to a true fixed point; expressions can't loop, so the JVM
# form applies the step a fixed 4 times — identical to the pure form for
# any URL with <= 4 nested encodings (real crawl data needs <= 2; the
# lockstep test pins pure == Column over the adversarial corpus).  Bound
# documented in DIVERGENCES.md.
_SANITIZE_UNROLL = 4


def sanitize_col(url: Column) -> Column:
    """Column form of sanitize(). try_url_decode matches URLDecoder semantics
    ('+' -> space) and returns NULL on malformed input, where we keep the
    original like the pure form.  Mirrors the pure fixed-point iteration by
    unrolling the strip-fragment+decode step (stays in whole-stage codegen —
    the shape the 10^10-row seen-key path needs)."""
    cur = url
    for _ in range(_SANITIZE_UNROLL):
        stripped = F.regexp_replace(cur, r"(?s)#.*$", "")
        cur = F.coalesce(F.try_url_decode(stripped), stripped)
    return F.lower(F.regexp_replace(cur, r"(?s)#.*$", ""))


def url_hash_col(url: Column) -> Column:
    return F.sha2(sanitize_col(url), 256)


def slug_path_col(url: Column, strip_query_params: bool = False) -> Column:
    result = sanitize_col(url)
    if strip_query_params:
        result = F.regexp_replace(result, r"(?s)\?.*$", "")
    else:
        result = F.regexp_replace(result, r"\?", "@")
    result = F.regexp_replace(result, r"^([^:]+://)", "")
    result = F.translate(
        result, ':*?"<>|', ""
    )
    return F.when(
        result.endswith("/"), F.concat(result, F.lit("/index.html"))
    ).otherwise(result)


def content_path_initial_col(url: Column) -> Column:
    return F.concat(slug_path_col(url, strip_query_params=True), F.lit(".tmp2"))


def host_col(url: Column) -> Column:
    # try_: tolerate malformed extracted URLs (Python's urlparse is lenient,
    # java.net.URI-based parse_url throws)
    return F.try_parse_url(url, F.lit("HOST"))


def is_resource_ext_col(url: Column) -> Column:
    return F.lower(url).rlike(r"\.(pdf|zip|mp3|avi|jpg|png|css|js)$")


def strip_query_col(url: Column) -> Column:
    return F.regexp_replace(url, r"(?s)\?.*$", "")


def strip_fragment_col(url: Column) -> Column:
    return F.regexp_replace(url, r"(?s)#.*$", "")


def unsupported_protocol_col(url: Column) -> Column:
    return F.lower(url).rlike(
        r"^(tel|mailto|javascript|data|blob|file|ftp|ssh|git):"
    )


# ---------------------------------------------------------------------------
# SURT canonical key (Common-Crawl cc-index / CDXJ interchange)
# ---------------------------------------------------------------------------
#
# Sort-friendly URI Reordering Transform: the key the Common-Crawl index
# (and every CDX-consuming tool: pywb, OpenWayback, cdxj-indexer) sorts and
# binary-searches archives by.  Rules implemented (and shared verbatim by
# the Column form, the pure-Python twin used inside the WARC sink, and the
# DuckDB oracle SQL, so all three stay provably in lockstep):
#   lowercase -> drop fragment -> drop userinfo -> drop a leading 'www.'
#   label -> reverse remaining host labels joined with ',' -> keep an
#   explicit ':port' -> ')' separator -> path ('/' when empty) -> query
#   with its '&'-separated params sorted bytewise.
# Divergence from the full urlcanon library (documented, DIVERGENCES.md):
# no IDN/percent-encoding normalization and no session-param stripping —
# those are policy layers; the transform here is the structural key.

_SURT_AUTH_RE = re.compile(r"^[a-z][a-z0-9+.-]*://([^/?#]*)")


def _surt_ws(key: str) -> str:
    """Percent-encode whitespace in the final key: CDXJ lines and ZipNum
    block entries are space/tab-delimited, so a raw-whitespace URL must
    not be able to corrupt the line framing. Structural (not reversible):
    a literal '%20' in the source URL collides by design."""
    # lowercase hex: the transform lowercases its input, so an escape must
    # be a fixed point under re-keying (surt(surt(u)) == surt(u))
    return (
        key.replace(" ", "%20").replace("\t", "%09")
        .replace("\r", "%0d").replace("\n", "%0a")
    )


def surt(url: str) -> str:
    """Pure twin of surt_col (used record-at-a-time inside the WARC sink,
    where rows are already in Python); pytest pins surt == surt_col."""
    u = url.strip(" ").lower()  # space-only trim: F.trim/DuckDB-trim parity
    u = u.split("#", 1)[0]
    m = _SURT_AUTH_RE.match(u)
    if not m:
        return _surt_ws(u)  # no authority (relative/opaque): the string
    auth = m.group(1).rsplit("@", 1)[-1]
    host, port = auth, ""
    pm = re.search(r":([0-9]+)$", auth)  # ASCII digits, like the Java regex
    if pm:
        host, port = auth[: pm.start()], auth[pm.start():]
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split("."))) if host else ""
    rest = u[m.end():]
    path = rest.split("?", 1)[0] or "/"
    query = rest.split("?", 1)[1] if "?" in rest else ""
    qpart = "?" + "&".join(sorted(query.split("&"))) if query else ""
    return _surt_ws(f"{rev}{port}){path}{qpart}")


def surt_col(url: Column) -> Column:
    """JVM Column form of surt(): regex/array built-ins only, stays inside
    whole-stage codegen — the shape a 10^10-row index build needs."""
    u = F.regexp_replace(F.lower(F.trim(url)), r"(?s)#.*$", "")
    auth = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    has_auth = u.rlike(r"^[a-z][a-z0-9+.-]*://")
    auth = F.regexp_replace(auth, r"^.*@", "")
    port = F.regexp_extract(auth, r"(:[0-9]+)$", 1)
    host = F.regexp_replace(auth, r":[0-9]+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.when(host == "", F.lit("")).otherwise(
        F.concat_ws(",", F.reverse(F.split(host, r"\.")))
    )
    rest = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_replace(rest, r"(?s)\?.*$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        rest.contains("?"), F.regexp_extract(rest, r"(?s)\?(.*)$", 1)
    ).otherwise(F.lit(""))
    qpart = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), F.concat_ws("&", F.array_sort(F.split(query, "&"))))
    )
    key = F.when(
        has_auth, F.concat(rev, port, F.lit(")"), path, qpart)
    ).otherwise(u)
    # whitespace → percent escapes, mirroring _surt_ws (line framing)
    for ch, esc in ((" ", "%20"), ("\t", "%09"), ("\r", "%0d"), ("\n", "%0a")):
        key = F.replace(key, F.lit(ch), F.lit(esc))
    return key


# ---------------------------------------------------------------------------
# Legacy migration Arrow surface
# ---------------------------------------------------------------------------
#
# content_path_initial_old needs an NFD fold (no Column form exists), so the
# bulk migration path is an Arrow pandas_udf over the shared pure scalar —
# the declared-UDF pattern (extract/htmlnorm/pagediff).  Migration is a
# one-shot cold path: an embarrassingly parallel map, no shuffle, correct
# for unicode hosts/paths, not a hot-loop surface.

import pandas as pd  # noqa: E402
from pyspark.sql import types as T  # noqa: E402


def _legacy_slug_udf():

    struct = T.StructType(
        [
            T.StructField("code", T.StringType()),
            T.StructField("slug", T.StringType()),
        ]
    )

    @F.pandas_udf(struct)
    def content_path_initial_old_udf(url: pd.Series) -> pd.DataFrame:
        rows = [
            (None, None) if u is None else content_path_initial_old(u)
            for u in url
        ]
        return pd.DataFrame(rows, columns=["code", "slug"])

    return content_path_initial_old_udf


content_path_initial_old_udf = _legacy_slug_udf()
