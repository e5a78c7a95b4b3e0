"""Link-extraction goldens transcribed from the reference's offline tests:
SrcsetExtractionTest.java:19-157, JCrawlerLinkExtractionTest.java:9-96,
JCrawlerTest.java:433-457 (protocols), :477-500 (template vars / long URLs).

The JCrawlerTest.testLinkExtractor/testLinkExtractor2 srcset goldens are
stale vs the reference's shipped splitter (they contradict each other on
identical input shapes) — see DIVERGENCES.md; the shipped-splitter behavior
below is the contract."""

from jcrawler_spark.operators.extract import (
    extract_links_py,
    is_extractable,
    parse_srcset_entries,
    redirect_link,
)

SRC = "https://example.com/page.html"


def urls(content, base=SRC):
    return [x["url"] for x in extract_links_py(content, base)]


# ---------------------------------------------------------------------------
# srcset parser goldens (SrcsetExtractionTest.java)
# ---------------------------------------------------------------------------


def test_srcset_with_commas_wix():
    # SrcsetExtractionTest.java:19-61
    srcset = (
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_315,h_305,q_90,enc_avif,quality_auto/image.jpeg 1x, "
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_630,h_610,q_90,enc_avif,quality_auto/image.jpeg 2x, "
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_945,h_915,q_90,enc_avif,quality_auto/image.jpeg 3x, "
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_1260,h_1220,q_90,enc_avif,quality_auto/image.jpeg 4x, "
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_1501,h_1453,q_90,enc_avif,quality_auto/image.jpeg 5x"
    )
    entries = parse_srcset_entries(srcset)
    assert len(entries) == 5
    assert entries[0] == (
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_315,h_305,q_90,enc_avif,quality_auto/image.jpeg",
        "1x",
    )
    assert entries[2][0].endswith("w_945,h_915,q_90,enc_avif,quality_auto/image.jpeg")
    assert [d for _, d in entries] == ["1x", "2x", "3x", "4x", "5x"]


def test_srcset_https_and_relative():
    # SrcsetExtractionTest.java:66-80
    entries = parse_srcset_entries(
        "/local/image.png 1x, https://external.com/image.png 2x, http://insecure.com/image.png 3x"
    )
    assert [u for u, _ in entries] == [
        "/local/image.png",
        "https://external.com/image.png",
        "http://insecure.com/image.png",
    ]


def test_srcset_jsoup_spaces_removed():
    # SrcsetExtractionTest.java:83-101
    entries = parse_srcset_entries(
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_315, h_305, q_90/image.jpeg 1x, "
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_630, h_610, q_90/image.jpeg 2x"
    )
    assert len(entries) == 2
    assert entries[0][0] == (
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_315,h_305,q_90/image.jpeg"
    )
    assert entries[1][0] == (
        "https://static.wixstatic.com/media/image.jpeg/v1/fit/w_630,h_610,q_90/image.jpeg"
    )


def test_srcset_regex_commas():
    # SrcsetExtractionTest.java:104-117
    entries = parse_srcset_entries(
        "https://example.com/img,w_100,h_100.jpg 1x, https://example.com/img,w_200,h_200.jpg 2x"
    )
    assert [u for u, _ in entries] == [
        "https://example.com/img,w_100,h_100.jpg",
        "https://example.com/img,w_200,h_200.jpg",
    ]


def test_srcset_decimal_descriptors():
    # SrcsetExtractionTest.java:120-131
    entries = parse_srcset_entries("image1.jpg 1x, image1.5.jpg 1.5x, image2.jpg 2x")
    assert len(entries) == 3
    assert entries[1] == ("image1.5.jpg", "1.5x")


def test_srcset_relative_urls_with_commas():
    # SrcsetExtractionTest.java:134-145
    entries = parse_srcset_entries(
        "img/w_100,h_100.jpg 100w, img/w_200,h_200.jpg 200w"
    )
    assert [u for u, _ in entries] == ["img/w_100,h_100.jpg", "img/w_200,h_200.jpg"]


def test_srcset_user_report_protocol_less():
    # SrcsetExtractionTest.java:148-170
    entries = parse_srcset_entries(
        "static.wixstatic.com/media/c3db1c_2b7c791008c64d2b8bf459601e3b4220~mv2.png/v1/crop/x_42,y_0,w_557,h_557/fill/w_52,h_53,al_c,q_85,usm_0.66_1.00_0.01,enc_avif,quality_auto/image.png 1x, "
        "https://static.wixstatic.com/media/c3db1c_2b7c791008c64d2b8bf459601e3b4220~mv2.png/v1/crop/x_42,y_0,w_557,h_557/fill/w_104,h_106,al_c,q_85,usm_0.66_1.00_0.01,enc_avif,quality_auto/image.png 2x"
    )
    assert len(entries) == 2
    assert entries[0][0].startswith("static.wixstatic.com/media/")
    assert entries[0][1] == "1x"
    assert entries[1][0].startswith("https://static.wixstatic.com/media/")
    assert entries[1][1] == "2x"


# ---------------------------------------------------------------------------
# data-URI / template / long-URL skip goldens (JCrawlerLinkExtractionTest)
# ---------------------------------------------------------------------------


def test_skips_data_uri_in_img_src():
    assert urls('<img src="data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAABQAAAAU">') == []


def test_skips_encoded_data_uri():
    assert urls('<img src="data%3Aimage/png;base64,iVBORw0KGgoAAAANSUhEUgAAABQAAAAU">') == []


def test_skips_template_variable():
    assert urls('<a href="https://example.com/blog/${i.uri}">Link</a>') == []


def test_skips_encoded_template_variable():
    assert urls('<a href="https://example.com/blog/$%7Bi.uri%7D">Link</a>') == []


def test_data_uri_in_srcset():
    html = (
        '<img srcset="data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAABQAAAAU'
        'CAYAAACNiR0NAAAAAXNSR0IArs4c6QAAAARnQU1BAACxjwv8YQUAAAAJcEhZcwAADsMAAA7DAcdvqGQAAADw 1x">'
    )
    assert urls(html) == []


def test_long_data_uri_in_srcset():
    html = '<img srcset="data:image/png;base64,' + "A" * 2000 + ' 1x">'
    assert urls(html) == []


def test_data_uri_in_css_url():
    html = (
        "<style>.x{background-image:url(data:image/png;base64,iVBORw0KGgo);"
        "background-repeat:no-repeat}</style>"
    )
    assert urls(html) == []


def test_data_uri_with_leading_space():
    assert urls('<img src=" data:image/png;base64,iVBORw0KGgoAAAANSUhEUgAAABQAAAAU">') == []


def test_extremely_long_url_skipped():
    # JCrawlerTest.java:487-500
    long_q = "?" + "&".join(f"a{i}=val{i}" for i in range(3000))
    assert urls(f'<img src="https://example.com/api{long_q}">') == []


# ---------------------------------------------------------------------------
# protocols extracted-but-kept (JCrawlerTest.java:433-457)
# ---------------------------------------------------------------------------


def test_unsupported_protocols_are_extracted():
    content = """
        <a href="tel:+1234567890">Call us</a>
        <a href="mailto:test@example.com">Email us</a>
        <a href="javascript:void(0)">Click me</a>
        <a href="https://www.example.com/page1">Valid link</a>
        <a href="/relative/path">Relative link</a>
        """
    got = urls(content, "https://www.example.com/")
    assert len(got) == 5
    assert sum(1 for u in got if u.startswith("tel:")) == 1
    assert sum(1 for u in got if u.startswith("mailto:")) == 1
    assert "https://www.example.com/page1" in got
    assert "https://www.example.com/relative/path" in got


# ---------------------------------------------------------------------------
# matcher coverage + emission ordering (grouped by matcher, then position)
# ---------------------------------------------------------------------------


def test_anchor_fragment_stripped_and_quotes():
    got = extract_links_py(
        "<a href='/a#frag'>one</a> <a href=\"/b\">two</a>", "https://e.com/"
    )
    assert [x["url"] for x in got] == ["https://e.com/a", "https://e.com/b"]
    assert not got[0]["is_resource"]


def test_resource_extension_upgrade_on_anchor():
    # JCrawler.java:443-449 via PageResourcesTest intent
    got = extract_links_py('<a href="/doc.pdf">pdf</a>', "https://e.com/")
    assert got[0]["is_resource"] is True


def test_mixed_page_matcher_order():
    content = """
        <a href="/page2">next</a>
        <img src="/img1.jpg">
        <img srcset="/s1.jpg 1x, /s2.jpg 2x">
        <style>.a{background:url('/bg.png')}</style>
        <link rel="icon" href="/fav.ico">
        Disallow: /admin/
        Sitemap: https://e.com/sitemap.xml
        <?xml-stylesheet type="text/xsl" href="/style.xsl" ?>
        <loc>https://e.com/from-sitemap</loc>
        <script src="/app.js"></script>
    """
    got = extract_links_py(content, "https://e.com/")
    assert [x["url"] for x in got] == [
        "https://e.com/page2",        # anchor
        "https://e.com/img1.jpg",     # img src
        "https://e.com/s1.jpg",       # srcset
        "https://e.com/s2.jpg",
        "https://e.com/bg.png",       # css url()
        "https://e.com/fav.ico",      # link tag
        "https://e.com/admin/",       # robots Disallow
        "https://e.com/sitemap.xml",  # robots Sitemap
        "https://e.com/style.xsl",    # xml-stylesheet
        "https://e.com/from-sitemap", # sitemap <loc>
        "https://e.com/app.js",       # script src
    ]
    by_url = {x["url"]: x for x in got}
    assert by_url["https://e.com/page2"]["is_resource"] is False
    assert by_url["https://e.com/img1.jpg"]["is_resource"] is True
    assert by_url["https://e.com/admin/"]["text"] == "Disallow"
    assert by_url["https://e.com/sitemap.xml"]["text"] == "Sitemap"
    assert by_url["https://e.com/s2.jpg"]["text"] == "2x"
    assert [x["order_in_page"] for x in got] == list(range(11))


def test_robots_directives_extracted_as_links():
    # JCrawlerTest.java:315-317: Disallow'd paths ARE emitted as crawlable
    # URLs (the reference does not enforce robots; README.md:208)
    got = urls("User-agent: *\nDisallow: /wp-admin/\nAllow: /wp-admin/admin-ajax.php",
               "https://www.cultural-mobility.com/")
    assert got == [
        "https://www.cultural-mobility.com/wp-admin/",
        "https://www.cultural-mobility.com/wp-admin/admin-ajax.php",
    ]


def test_decode_normalization_percent257B():
    # double-encoded %257B -> %7B (decode applied once; result contains ${)
    # -> skipped after decode (JCrawler.java:487-491)
    assert urls('<a href="https://e.com/%24%7Bi.uri%7D">x</a>') == []


# ---------------------------------------------------------------------------
# extraction gate + redirect pseudo-link (JCrawler.java:1417-1444)
# ---------------------------------------------------------------------------


def test_is_extractable():
    assert is_extractable(200, "text/html")
    assert is_extractable(200, "text/html; charset=utf-8")
    assert is_extractable(200, "text/plain")
    assert is_extractable(200, "application/xml")
    assert not is_extractable(200, "application/json")
    assert not is_extractable(404, "text/html")
    assert not is_extractable(301, "text/html")
    assert not is_extractable(200, None)


def test_redirect_link():
    r = redirect_link(301, "/new-location", "https://e.com/old")
    assert r["url"] == "https://e.com/new-location"
    assert r["text"] == "Moved - http status 301"
    assert r["is_redirect"] is True
    assert r["is_resource"] is False
    r2 = redirect_link(302, "https://e.com/img.png", "https://e.com/old")
    assert r2["is_resource"] is True
    assert redirect_link(200, "/x", "https://e.com/") is None
    assert redirect_link(301, None, "https://e.com/") is None


# ---------------------------------------------------------------------------
# property-based robustness: the extractor must never throw on byte soup
# and every emitted link obeys the skip-pipeline invariants
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_htmlish = st.one_of(
    st.text(max_size=400),
    st.text(
        alphabet="<>=\"' ahrefimgsrclnkct:/.?#%&\n\tx\x00é",
        max_size=400,
    ),
)


@settings(max_examples=200, deadline=None)
@given(_htmlish)
def test_extract_links_total_and_invariant(html):
    links = extract_links_py(html, "https://base.example/dir/page", 0)
    for l in links:
        assert l["url"]  # resolved, non-empty
        assert len(l["raw_href"] or "") <= 2000  # over-long skip (F11)
        low = l["url"].lower()
        assert not low.startswith("data:")  # data-URI skip (F9)
        assert "${" not in l["url"]  # template skip (F10)
