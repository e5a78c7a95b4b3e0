"""Scalar-function goldens transcribed from the reference tests
(FIXTURES.md §5): exact sha-256 values, slug paths, sanitize behavior."""

from jcrawler_spark.functions import urlops

EUROPA = "https://op.europa.eu/documents/d/who-is-who/pdf_archive_eu_whoiswho_202407-en"
WGET = "https://en.m.wikipedia.org/wiki/Wget?param=value"


def test_url_hash_europa():
    # JCrawlerTest.java:166
    assert (
        urlops.url_hash(EUROPA)
        == "9cf4918b061e887f92b45255c8fb5e976eb3a24de28686afe653557a900647ef"
    )


def test_url_hash_wget_lowercased():
    # JCrawlerTest.java:188-189: hash is over the sanitized (lowercased) URL
    assert (
        urlops.url_hash(WGET)
        == "be4b221727d1658df7ae717d21e6507827a5366ab293c234510ae898978795af"
    )


def test_sanitize_lowercases_and_keeps_query():
    # JCrawlerTest.java:188
    assert urlops.sanitize(WGET) == "https://en.m.wikipedia.org/wiki/wget?param=value"
    assert urlops.sanitize(EUROPA) == EUROPA


def test_sanitize_does_not_trim():
    # SlugTest.java:18-26
    assert urlops.sanitize(" http://example.com ") == " http://example.com "


def test_sanitize_fixed_point_goldens():
    """Round-4 VERDICT counterexample pinned: a malformed '%' inside the
    fragment blocked the first decode, so '+' only decoded on a second
    pass — sanitize now iterates strip-fragment+decode to a fixed point."""
    assert urlops.sanitize("http://0/+#%") == "http://0/ "
    # decode surfacing a new escape / fragment / '+'
    assert urlops.sanitize("http://x/%2523a") == "http://x/"
    assert urlops.sanitize("http://x/%252B") == "http://x/ "
    # refusal is stable: malformed '%' outside a fragment keeps the string
    assert urlops.sanitize("http://x/%") == "http://x/%"
    for u in ("http://0/+#%", "http://x/%2523a", "http://x/%252B",
              "http://x/%", "http://x/a+b%ZZ", "%%25"):
        s = urlops.sanitize(u)
        assert urlops.sanitize(s) == s


def test_sanitize_strips_fragment():
    assert (
        urlops.sanitize("https://ex.com/a#frag?x")
        == "https://ex.com/a"
    )


def test_path_query_to_at():
    # JCrawlerTest.java:190
    assert urlops.slug_path(WGET) == "en.m.wikipedia.org/wiki/wget@param=value"
    # JCrawlerTest.java:167
    assert (
        urlops.slug_path(EUROPA)
        == "op.europa.eu/documents/d/who-is-who/pdf_archive_eu_whoiswho_202407-en"
    )


def test_path_trailing_slash_index_html():
    # Slug.java:216-218
    assert urlops.slug_path("https://ex.com/dir/") == "ex.com/dir//index.html"


def test_path_data_uri_colon_replacement():
    # SlugTest.java:9-16: ':' -> U+F03A
    dat = "data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAAUoAAAAaCAYAAADR0BVG"
    path = urlops.slug_path(dat, strip_query=True)
    assert "" in path
    assert path.startswith("dataimage/png;base64,")


def test_content_path_initial_posf():
    # SlugEscapeTest.java:9-21 — goldens expect NO hash suffix
    url = (
        "https://posf.ro/comparator/api/index.php?request=comparator-electric"
        "&tip_oferta=2&data_start_aplicare=02-06-2024&tip_client=casnic"
        "&tip_pret=nediferentiat&consum_anual=1200&consum_lunar=100"
        "&valoare_factura_curenta=&nivel_tensiune=JT_&tip_produs=0"
        "&perioada_contract=&energie_regenerabila=&factura_electronica="
        "&frecventa_emitere_factura=&procent_zona_noapte=&procent_zona_zi="
        "&frecventa_citire_contor=&valoare_fixa=&denumire_furnizor=&id_zona=8"
    )
    assert urlops.content_path_initial(url) == "posf.ro/comparator/api/index.php.tmp2"


def test_content_path_initial_double_encoded():
    # SlugEscapeTest.java:24-33
    url = (
        "https://www.cultural-mobility.com/wp-json/oembed/1.0/embed"
        "?url=https%253A%252F%252Fwww.cultural-mobility.com%252F"
    )
    assert (
        urlops.content_path_initial(url)
        == "www.cultural-mobility.com/wp-json/oembed/1.0/embed.tmp2"
    )


def test_content_path_initial_percent20():
    # SlugEscapeTest.java:36-44 (testCollisions)
    assert (
        urlops.content_path_initial(
            "https://raisercostin.org/2017/02/08/define%20risk%20takers"
        )
        == "raisercostin.org/2017/02/08/define risk takers.tmp2"
    )
    assert (
        urlops.content_path_initial(
            "https://raisercostin.org/2017/02/08/define%20safety%20nets"
        )
        == "raisercostin.org/2017/02/08/define safety nets.tmp2"
    )


def test_content_path_final():
    # Slug.java:88-110: extension inferred from path, .E{status} when != 200
    assert urlops.content_path_final("https://ex.com/a/b.html", 200) == "ex.com/a/b.html"
    assert urlops.content_path_final("https://ex.com/a/b.html", 404) == "ex.com/a/b.E404.html"
    assert (
        urlops.content_path_final("https://ex.com/a/page", 200, "text/html")
        == "ex.com/a/page.html"
    )
    assert urlops.content_path_final("https://ex.com/a/page", 301) == "ex.com/a/page.E301"


def test_hostname_for_accept_wwww_quirk():
    # HyperLink.java:85-88 strips 'wwww.' (four w's) — quirk preserved
    assert urlops.hostname_for_accept("https://wwww.ex.com/a") == "ex.com"
    assert urlops.hostname_for_accept("https://www.ex.com/a") == "www.ex.com"


def test_is_resource_ext():
    # JCrawler.java:443-449
    for ext in ("pdf", "zip", "mp3", "avi", "jpg", "png", "css", "js"):
        assert urlops.is_resource_ext(f"https://e.com/f.{ext}")
        assert urlops.is_resource_ext(f"https://e.com/F.{ext.upper()}")
    assert not urlops.is_resource_ext("https://e.com/f.html")
    assert not urlops.is_resource_ext("https://e.com/f.jpg?x=1")


def test_unsupported_protocols():
    # JCrawler.java:964-965
    for p in ("tel:+1", "MAILTO:a@b.c", "javascript:void(0)", "data:x",
              "blob:x", "file:///x", "ftp://x", "ssh://x", "git://x"):
        assert urlops.has_unsupported_protocol(p)
    assert not urlops.has_unsupported_protocol("https://ex.com")


def test_url_decode_java_semantics():
    assert urlops.url_decode("a%20b") == "a b"
    assert urlops.url_decode("a+b") == "a b"  # URLDecoder treats + as space
    assert urlops.url_decode("a%2Gb") == "a%2Gb"  # malformed: keep original
    assert urlops.url_decode("%7Bi%7D") == "{i}"


def test_resolve_url():
    # parity cases pinned by JCrawlerTest.java:264-336 goldens
    base = "https://www.cultural-mobility.com/"
    assert (
        urlops.resolve_url(base, "/wp-content/a.jpg")
        == "https://www.cultural-mobility.com/wp-content/a.jpg"
    )
    assert (
        urlops.resolve_url(base, ",/x/a.jpg")
        == "https://www.cultural-mobility.com/,/x/a.jpg"
    )
    assert urlops.resolve_url(base, "tel:+1234") == "tel:+1234"
    assert urlops.resolve_url(base, "//cdn.ex.com/a.js") == "https://cdn.ex.com/a.js"
    assert urlops.resolve_url("", "x.html") == "x.html"
    assert urlops.resolve_url(None, "x.html") == "x.html"
    assert (
        urlops.resolve_url("https://e.com/a/b.html", "c.html")
        == "https://e.com/a/c.html"
    )


# ---------------------------------------------------------------------------
# property-based robustness (hypothesis): the scalar pipeline must never
# throw on adversarial inputs — a crawl meets arbitrary byte soup
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_urlish = st.one_of(
    st.text(max_size=200),
    st.from_regex(r"https?://[a-z0-9.\-]{1,30}(/[\x20-\x7e]{0,60})?", fullmatch=True),
    st.text(alphabet="htps:/?#%&=. \t\x00€ü", max_size=80),
)


@settings(max_examples=300, deadline=None)
@given(_urlish)
def test_sanitize_total_and_idempotent(u):
    s1 = urlops.sanitize(u)
    assert urlops.sanitize(s1) == s1  # idempotent
    urlops.url_hash(u)  # total: never throws, always 64 hex
    assert len(urlops.url_hash(u)) == 64


@settings(max_examples=300, deadline=None)
@given(st.one_of(st.none(), _urlish), _urlish)
def test_resolve_url_total(base, href):
    out = urlops.resolve_url(base, href)
    assert isinstance(out, str)  # never throws, never None


@settings(max_examples=200, deadline=None)
@given(_urlish)
def test_slug_and_paths_total(u):
    assert isinstance(urlops.slug_path(u), str)
    assert isinstance(urlops.content_path_final(u, 200, "text/html"), str)
    assert isinstance(urlops.content_path_final(u, None, None), str)


def test_content_path_initial_old_goldens():
    """Slug.contentPathInitialOld (Slug.java:120-172), hand-traced from the
    Java: host dots -> '--' (whole string when no path), NFD diacritic
    fold, punctuation class -> '-', slashes+dots -> '--', 70-char split
    with '-#<hash9>-' insert, '--and-more' abbreviation at width 45, full
    '--sha256-<hex>' suffix + '.tmp' (total may exceed 200 by the 4-char
    '.tmp' — faithful to the reference's budget math)."""
    code, slug = urlops.content_path_initial_old("https://example.com")
    assert code == urlops.url_hash("https://example.com")
    assert slug == f"https-----example--com-#{code[:9]}---sha256-{code}.tmp"

    code2, slug2 = urlops.content_path_initial_old(
        "https://Example.com/Path/to/File.html?q=1#frag"
    )
    # lowercased (repo-canonical sanitize), fragment gone, host dots '--',
    # path separators and the file dot '--', '?' -> '-', '=' kept
    assert slug2 == (
        "https-----example--com--path--to--file--html-q=1"
        f"-#{code2[:9]}---sha256-{code2}.tmp"
    )

    # NFD fold: ț (t + combining comma below, U+0326) -> t
    code3, slug3 = urlops.content_path_initial_old(
        "https://ro.example/legislație/articolul-5"
    )
    assert slug3.startswith("https-----ro--example--legislatie--articolul-5-#")

    # long URL: split at 70, abbreviate the tail at width 45 with
    # '--and-more', then the hash suffix — length is deterministic
    code4, slug4 = urlops.content_path_initial_old(
        "http://a.b.c/" + "x" * 150 + "/end(1).html"
    )
    assert slug4[70:82] == f"-#{code4[:9]}-"
    assert "--and-more--sha256-" in slug4
    assert len(slug4) == 70 + 12 + 45 + 73 + len(".tmp")

    # short tail is NOT abbreviated
    _, slug5 = urlops.content_path_initial_old("https://e.com/" + "y" * 60)
    assert "--and-more" not in slug5


def test_content_path_initial_old_udf_matches_scalar(spark):
    # Arrow migration surface == the golden-pinned pure scalar, incl. a
    # diacritics URL (NFD fold happens executor-side) and NULL passthrough.
    from pyspark.sql import functions as F

    urls = [
        "https://example.com",
        "https://legislatie.just.ro/Public/DetaliiDocument/123",
        "https://ex.com/café-menü?x=1#f",
        "https://e.com/" + "y" * 60,
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)] + [(99, None)], "i int, url string"
    )
    got = {
        r.i: (r.p.code, r.p.slug)
        for r in df.select(
            "i", urlops.content_path_initial_old_udf(F.col("url")).alias("p")
        ).collect()
    }
    for i, u in enumerate(urls):
        assert got[i] == urlops.content_path_initial_old(u)
    assert got[99] == (None, None)


# ---------------------------------------------------------------------------
# SURT canonical key (cc-index / CDXJ)
# ---------------------------------------------------------------------------

SURT_GOLDENS = [
    # (url, expected key) — one per structural rule
    ("https://www.Example.COM:8080/A/b?z=1&a=2#frag",
     "com,example:8080)/a/b?a=2&z=1"),          # www + port + sorted query
    ("http://user:pw@sub.host.org/p", "org,host,sub)/p"),  # userinfo drop
    ("https://host0.example/", "example,host0)/"),
    ("https://host0.example", "example,host0)/"),          # empty path -> /
    ("https://h.example/p?", "example,h)/p"),              # dangling '?'
    ("relative/path?x=1", "relative/path?x=1"),            # no authority
    ("HTTPS://WWW.X.Y/Q?b=2&a=1&a=0", "y,x)/q?a=0&a=1&b=2"),
    # raw whitespace must not survive into the key (CDXJ line framing)
    ("https://h.example/a b?c d=1", "example,h)/a%20b?c%20d=1"),
    ("rel ative\tpath", "rel%20ative%09path"),
]


def test_surt_goldens():
    for u, want in SURT_GOLDENS:
        assert urlops.surt(u) == want, u


@settings(max_examples=200, deadline=None)
@given(_urlish)
def test_surt_total_and_idempotent_on_keys(u):
    k = urlops.surt(u)
    assert isinstance(k, str)  # total: never throws
    # keys are fixed points: archive_gap and any consumer re-keying a
    # stored key must get the same key back
    assert urlops.surt(k) == k


def test_sanitize_col_matches_pure(spark):
    """The JVM Column form (seen-key hot path, engine.py:728) and the pure
    twin (BFS oracle / Arrow extractor) agree over the adversarial corpus,
    including the inputs that forced the fixed-point iteration.  The Column
    form unrolls the strip+decode step 4× (DIVERGENCES: exact for <= 4
    nested encodings; the pure form is a true fixed point)."""
    import pyspark.sql.functions as F

    urls = [
        EUROPA, WGET,
        "http://0/+#%", "http://x/%2523a", "http://x/%252B",
        "http://x/%", "http://x/a+b%ZZ", "%%25",
        "http://x/%23frag%25", "https://A.B/Path%20Name?Q=%2B#f",
        "https://ex.com/a#frag?x", " http://example.com ",
        "http://x/%25252B",  # 4 decode steps, at the unroll bound
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["s"]
        for r in df.select(urlops.sanitize_col(F.col("url")).alias("s")).collect()
    ]
    assert got == [urlops.sanitize(u) for u in urls]


def test_surt_col_matches_pure(spark):
    """The JVM Column form and the pure twin (used inside the WARC sink's
    CDX emission) produce identical keys — the three-way lockstep's
    Spark↔Python leg (Spark↔DuckDB is the surt_key contract oracle)."""
    import pyspark.sql.functions as F

    urls = [u for u, _ in SURT_GOLDENS] + [
        "https://a.example/x?single",
        "http://a.b.c.d:65535/deep/path/?q=%20&q=+",
        "https:///no-host/path",
        "ftp://files.example/pub",
        "https://example.com/#onlyfrag",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["s"]
        for r in df.select(urlops.surt_col(F.col("url")).alias("s"))
        .collect()
    ]
    assert got == [urlops.surt(u) for u in urls]
