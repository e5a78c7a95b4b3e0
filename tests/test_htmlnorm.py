"""Goldens for the JScraper normalize-HTML analogue (VERDICT r2 #5).

The reference pretty-prints crawled pages via Jsoup (JScraper.java:101-126,
2-space indent, xhtml escapes) so mirror diffs show real changes only.
These goldens pin the repo's canonical grammar (htmlnorm module docstring):
semantically identical markup must normalize to IDENTICAL bytes.
"""

from __future__ import annotations

from jcrawler_spark.functions.htmlnorm import normalize_html

# A legislatie.just.ro-style document page, as the crawler would fetch it
# (mixed-case tags, unquoted/single-quoted attrs, entity soup, sloppy
# whitespace) — the synthetic corpus models this page family
# (corpus.page_record).
LEGISLATIE_RAW = (
    "<!DOCTYPE HTML>\n"
    "<HTML><HEAD><TITLE>DetaliiDocument 123</TITLE>\n"
    "<META charset=utf-8></HEAD>\n"
    "<BODY class=public ID=Main>\n"
    "  <H1>  Lege   nr. 123 </H1>\n"
    "  <div CLASS='art'><P>Art. 1 &#8211; Text&nbsp;lege.</p>\n"
    "<p>Art. 2 &ndash; <B>Alt   text</B>.</P></div>\n"
    "  <a href='/Public/DetaliiDocument/124'>urm&#259;torul</a><BR>\n"
    "</BODY></HTML>"
)

LEGISLATIE_GOLDEN = (
    "<!doctype html>\n"
    "<html>\n"
    "  <head>\n"
    '    <title>DetaliiDocument 123</title>\n'
    '    <meta charset="utf-8" />\n'
    "  </head>\n"
    '  <body class="public" id="Main">\n'
    "    <h1>Lege nr. 123</h1>\n"
    '    <div class="art">\n'
    "      <p>Art. 1 – Text lege.</p>\n"
    "      <p>Art. 2 – <b>Alt text</b>.</p>\n"
    "    </div>\n"
    '    <a href="/Public/DetaliiDocument/124">următorul</a>\n'
    "    <br />\n"
    "  </body>\n"
    "</html>\n"
)

# The same document, as a different mirror might serve it (tags already
# lowercase, double quotes, literal UTF-8 instead of entities, different
# whitespace). MUST normalize byte-identically to LEGISLATIE_RAW.
LEGISLATIE_ALT = (
    "<!doctype html><html><head>\n"
    "<title>DetaliiDocument 123</title><meta charset=\"utf-8\"/></head>\n"
    "<body class=\"public\" id=\"Main\"><h1>Lege nr. 123</h1>\n"
    "<div class=\"art\">\n"
    "  <p>Art. 1 – Text lege.</p>\n"
    "  <p>Art. 2 – <b>Alt\n text</b>.</p>\n"
    "</div>\n"
    "<a href=\"/Public/DetaliiDocument/124\">următorul</a><br/>\n"
    "</body></html>"
)


def test_legislatie_golden():
    assert normalize_html(LEGISLATIE_RAW) == LEGISLATIE_GOLDEN


def test_mirror_variants_normalize_identically():
    assert normalize_html(LEGISLATIE_ALT) == LEGISLATIE_GOLDEN


def test_idempotent():
    once = normalize_html(LEGISLATIE_RAW)
    assert normalize_html(once) == once


def test_skeleton_implied():
    # Jsoup implies html>head+body even for fragments
    out = normalize_html("<p>hi</p>")
    assert out == (
        "<html>\n  <head></head>\n  <body>\n    <p>hi</p>\n  </body>\n</html>\n"
    )


def test_head_content_routed_to_head():
    out = normalize_html("<title>T</title><p>x</p>")
    assert "<head>\n    <title>T</title>\n  </head>" in out
    assert "<body>\n    <p>x</p>\n  </body>" in out


def test_headless_body_keeps_head_siblings():
    # body present, head absent: stray <title> must be rehomed into the
    # synthesized head, not dropped — two pages differing only in title
    # must NOT normalize to identical bytes.
    a = normalize_html("<html><title>T</title><body>x</body></html>")
    assert a == (
        "<html>\n  <head>\n    <title>T</title>\n  </head>\n"
        "  <body>x</body>\n</html>\n"
    )
    b = normalize_html("<html><title>U</title><body>x</body></html>")
    assert a != b


def test_bodyless_head_keeps_content_siblings():
    # head present, body absent: content siblings go to the synthesized
    # body; a stray head-only element joins the existing head.
    out = normalize_html(
        "<html><head><meta charset=\"utf-8\"></head><title>T</title><p>x</p></html>"
    )
    assert '<meta charset="utf-8" />' in out
    assert "<title>T</title>" in out
    assert "<body>\n    <p>x</p>\n  </body>" in out


def test_raw_text_preserved_verbatim():
    raw = "<body><script>if (a &&  b) { x<y; }</script><pre>  two\n spaces</pre></body>"
    out = normalize_html(raw)
    assert "if (a &&  b) { x<y; }" in out
    assert "  two\n spaces" in out


def test_attr_escaping_and_quoting():
    out = normalize_html('<body><a href=x title=\'a"b & c\'>t</a></body>')
    assert '<a href="x" title="a&quot;b &amp; c">t</a>' in out


def test_unclosed_tags_tolerated():
    # <li>s never closed; an unmatched </em> appears
    out = normalize_html("<body><ul><li>a<li>b</ul></em></body>")
    assert out.count("<li>") == 2
    assert "</em>" not in out
    assert normalize_html(out) == out


def test_entity_unification():
    a = normalize_html("<body><p>a&nbsp;b&#8211;c</p></body>")
    b = normalize_html("<body><p>a b–c</p></body>")
    assert a == b


def test_none_passthrough():
    assert normalize_html(None) is None


def test_udf_matches_pure_python(spark):
    """The Arrow UDF surface computes exactly the per-row function, over
    binary html columns as the pages table stores them."""
    from jcrawler_spark import corpus
    from jcrawler_spark.functions.htmlnorm import normalize_html_col

    pages = corpus.build_pages_df(spark, 40, n_hosts=4)
    got = {
        r["url"]: r["norm"]
        for r in pages.select(
            "url", normalize_html_col("html").alias("norm")
        ).collect()
    }
    rows = corpus.local_pages(40, n_hosts=4)
    for rec in rows:
        expect = normalize_html(rec["html"].decode("utf-8"))
        assert got[rec["url"]] == expect
    # and two fetches of the same page normalize identically (the
    # mirror-diff use case)
    assert len(got) == 40
