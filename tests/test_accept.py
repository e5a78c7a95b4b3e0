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


def test_large_accept_set_joins(spark):
    """Scale regression: inlining the accept set as an Or expression dies
    twice over at size — left-deep chains stack-overflow Catalyst analysis
    near ~500 prefixes, and even balanced trees kill the JVM near ~8k terms
    (janino codegen + optimizer constraint propagation). Above
    ACCEPT_EXPR_MAX the match must route through the broadcast prefix-table
    join. 5000 hosts here — a modest multi-host crawl — must plan small,
    run, and evaluate correctly."""
    s = accept.build_accept_set(
        [f"https://h{i}.example" for i in range(5000)]
    )
    assert len(s) == 20000  # 4 template expansions per host
    rows = [
        ("https://h4321.example/deep/page", 1, False, False),  # in set
        ("http://www.h0.example/", 1, False, False),           # in set
        ("https://h5001.example/x", 1, False, False),          # not in set
        ("https://h0.example.evil.com/x", 1, False, False),    # string-prefix
    ]
    df = spark.createDataFrame(rows, ["url", "depth", "is_resource", "is_redirect"])
    out = accept.with_accept(df, s)
    # the join must not inline the set: plan string stays O(1) in |s|
    assert len(out._jdf.queryExecution().optimizedPlan().toString()) < 20_000
    got = {r["url"]: r["accepted"] for r in out.collect()}
    assert got["https://h4321.example/deep/page"] is True
    assert got["http://www.h0.example/"] is True
    assert got["https://h5001.example/x"] is False
    # pure string-prefix semantics, NOT host equality: "https://h0.example"
    # is a prefix of this URL even though the registrable host differs
    assert got["https://h0.example.evil.com/x"] is True


def test_join_path_equals_expression_oracle(spark):
    """The join form and the pure-Python reference form must agree row-for-
    row on a URL mix straddling every gate (protocol, depth, resource,
    redirect, prefix hit/miss, shorter-than-key URLs)."""
    prefixes = sorted(
        {f"https://site{i}.org" for i in range(200)} | {"https://deep.org/a/b"}
    )
    assert len(prefixes) > accept.ACCEPT_EXPR_MAX
    rows = []
    for i, u in enumerate(
        [
            "https://site7.org/page",
            "https://site199.org",
            "https://site200.org/x",
            "https://deep.org/a/b/c",
            "https://deep.org/a/",
            "mailto:x@site7.org",
            "javascript:void(0)",
            "https://s",  # shorter than the join key
            "",
        ]
    ):
        rows.append((u, i % 4, i % 3 == 0, i % 5 == 0))
    df = spark.createDataFrame(rows, ["url", "depth", "is_resource", "is_redirect"])
    got = {
        r["url"]: (r["accepted"], r["ignored_domain"])
        for r in accept.with_accept(df, prefixes, max_depth=2).collect()
    }
    for u, d, res, red in rows:
        want = accept.accept_link(u, d, res, red, prefixes, max_depth=2)
        assert got[u] == want, (u, got[u], want)


def test_prefix_classes_short_generic_prefix_no_collapse():
    """Round-5 review fix: a short generic prefix ('https://') must not
    drag the join key down to 8 chars for 10k host prefixes — that made
    ONE key whose candidate array was the entire set. Length classes key
    each group at its own minimum length."""
    s = ["https://"] + [f"https://host{i:05d}.example/" for i in range(10_000)]
    classes = accept._prefix_classes(s)
    # the generic prefix sits alone in its class, keyed at 8
    flat = {klen: by_key for klen, by_key in classes}
    assert 8 in flat and list(flat[8].values()) == [["https://"]]
    # every other class keys PAST 'https://' and discriminates by host:
    # no candidate bucket degenerates to a meaningful fraction of the set
    for klen, by_key in classes:
        if klen == 8:
            continue
        assert klen > len("https://")
        assert max(len(v) for v in by_key.values()) <= 16


def test_prefix_join_degenerate_sets_still_correct(spark):
    """Equivalence on the two degenerate shapes from the review: a short
    generic prefix mixed into a large host set, and a set sharing a long
    common leading string."""
    from jcrawler_spark.operators.accept import prefix_match_df

    shared = "https://www.example.com/very/long/shared/prefix/"
    cases = [
        ["http://"] + [f"https://h{i}.example" for i in range(300)],
        [f"{shared}{i:04d}" for i in range(300)],
        [f"{shared}{i:04d}" for i in range(300)] + [shared[:12]],
    ]
    urls = [
        "http://anything.at.all/x",
        "https://h42.example/page",
        "https://h301.example/page",
        f"{shared}0042/tail",
        f"{shared}9999",
        "https://www.example.com/other",
        "https://w",
        "",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    for aset in cases:
        got = {
            r["url"]: r["hit"]
            for r in prefix_match_df(df, aset, "url", "hit").collect()
        }
        want = {u: any(u.startswith(p) for p in aset) for u in urls}
        assert got == want, aset[:2]
        # row count preserved exactly (unique-keyed left joins)
        assert prefix_match_df(df, aset, "url", "hit").count() == len(urls)
