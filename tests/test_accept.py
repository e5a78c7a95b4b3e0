"""Accept-gate matrix tests mirroring the reference's
ExternalDomainTest.java:10-55 and PageResourcesTest.java:10-90, plus the
Column-form parity check."""

from __future__ import annotations

from jcrawler_spark.operators import accept


def _accept_set():
    return accept.build_accept_set(["https://mysite.com"])


def test_accept_set_template_expansion():
    s = _accept_set()
    assert s == [
        "http://mysite.com",
        "http://www.mysite.com",
        "https://mysite.com",
        "https://www.mysite.com",
    ]


def test_accept_set_extra_accept_forms():
    s = accept.build_accept_set(
        ["https://mysite.com"], extra_accept=["https://cdn.x.com", "other.org"]
    )
    assert "https://cdn.x.com" in s
    assert "https://other.org" in s and "http://www.other.org" in s


def test_external_domain_matrix():
    """ExternalDomainTest.java:30-55."""
    s = _accept_set()
    ok, ign = accept.accept_link("https://mysite.com/page1", 1, False, False, s)
    assert ok and ign is None
    ok, ign = accept.accept_link("https://wixstatic.com/image.png", 1, False, False, s)
    # .png would be classified isResource during extraction; this mirrors the
    # reference test passing isResource=false explicitly
    assert not ok and ign == "wixstatic.com"
    ok, ign = accept.accept_link("http://other-site.org/foo", 1, False, False, s)
    assert not ok and ign == "other-site.org"
    # mailto: rejected with NO side output (protocol gate first)
    ok, ign = accept.accept_link("mailto:user@mysite.com", 1, False, False, s)
    assert not ok and ign is None


def test_page_resources_matrix():
    """PageResourcesTest.java:63-90."""
    s = _accept_set()
    assert accept.accept_link("https://mysite.com/page1", 1, False, False, s)[0]
    ok, ign = accept.accept_link("https://other.com/page", 1, False, False, s)
    assert not ok and ign == "other.com"
    # external resources always accepted (F3)
    assert accept.accept_link("https://cdn.external.com/logo.png", 1, True, False, s)[0]
    assert accept.accept_link("https://apis.google.com/js/api.js", 1, True, False, s)[0]
    assert accept.accept_link("https://documents.com/guide.pdf", 1, True, False, s)[0]
    # external redirect target accepted (F4, implicit ownership)
    assert accept.accept_link("https://redirected-site.com/page", 1, False, True, s)[0]


def test_depth_limit_no_side_output():
    s = _accept_set()
    ok, ign = accept.accept_link("https://elsewhere.com/x", 101, False, False, s)
    assert not ok and ign is None  # depth>limit suppresses F6
    ok, _ = accept.accept_link("https://mysite.com/x", 101, True, False, s)
    assert not ok  # depth gate beats resource-accept (accept2 order)


def test_column_form_parity(spark):
    s = _accept_set()
    rows = [
        ("https://mysite.com/page1", 1, False, False),
        ("https://wixstatic.com/image.png", 1, False, False),
        ("http://other-site.org/foo", 1, False, False),
        ("mailto:user@mysite.com", 1, False, False),
        ("https://cdn.external.com/logo.png", 1, True, False),
        ("https://redirected-site.com/page", 1, False, True),
        ("https://elsewhere.com/x", 101, False, False),
        ("tel:+401234", 3, False, False),
    ]
    df = spark.createDataFrame(rows, ["url", "depth", "is_resource", "is_redirect"])
    got = accept.with_accept(df, s).collect()
    for r in got:
        exp_ok, exp_ign = accept.accept_link(
            r["url"], r["depth"], r["is_resource"], r["is_redirect"], s
        )
        assert r["accepted"] == exp_ok, r["url"]
        assert r["ignored_domain"] == exp_ign, r["url"]


def test_ignored_domains_aggregate(spark):
    s = _accept_set()
    rows = [
        ("https://zeta.com/a", 0, False, False),
        ("https://alpha.com/b", 0, False, False),
        ("https://zeta.com/c", 0, False, False),
        ("https://mysite.com/ok", 0, False, False),
    ]
    df = spark.createDataFrame(rows, ["url", "depth", "is_resource", "is_redirect"])
    out = accept.ignored_domains(accept.with_accept(df, s)).collect()
    assert [r["host"] for r in out] == ["alpha.com", "zeta.com"]
