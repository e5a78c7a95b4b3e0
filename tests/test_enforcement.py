"""North-rule politeness enforcement (opt-in; reference-divergent by design,
DIVERGENCES.md #6): robots.txt Disallow gating and per-host crawl delay."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from jcrawler_spark import corpus
from jcrawler_spark.config import CrawlConfig
from jcrawler_spark.engine import CrawlEngine, SyntheticFetcher

N, H = 120, 8
ACCEPTS = [f"host{i}.example" for i in range(H)]


def _run(spark, tmp_path, name, **cfg_kwargs):
    pages = corpus.build_pages_df(spark, N, H, partitions=4)
    cfg = CrawlConfig(accept=ACCEPTS, max_docs=500, max_connections=None, **cfg_kwargs)
    root = str(tmp_path / name)
    shutil.rmtree(root, ignore_errors=True)
    eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages), root)
    stats = eng.run(seeds=[corpus.url_of(0, H)], max_supersteps=60)
    return eng, stats


def test_robots_disallow_enforced(spark, tmp_path):
    eng_off, _ = _run(spark, tmp_path, "off", enforce_robots=False)
    eng_on, _ = _run(spark, tmp_path, "on", enforce_robots=True)

    pages_off = eng_off.store.read("pages")
    pages_on = eng_on.store.read("pages")
    priv_off = pages_off.where(F.col("url").contains("/private")).collect()
    priv_on = pages_on.where(F.col("url").contains("/private")).collect()
    assert priv_off, "corpus should discover /private URLs via robots links"
    # without enforcement the disallowed URLs are fetched (404s, status set)
    assert all(not r["skipped"] and r["status"] is not None for r in priv_off)
    # with enforcement they are consumed without fetching
    assert priv_on, "disallowed URLs still get popped (and recorded)"
    assert all(r["skipped"] and r["status"] is None for r in priv_on)
    # enforcement changes nothing else: same visited URL set
    assert eng_on.visited_set() == eng_off.visited_set()


def test_crawl_delay_defers_not_drops(spark, tmp_path):
    eng_fast, stats_fast = _run(spark, tmp_path, "fast")
    eng_slow, stats_slow = _run(
        spark, tmp_path, "slow",
        enforce_crawl_delay=True, crawl_delay_seconds=2,
        seconds_per_superstep=1,
    )
    # the delay stretches the schedule but loses nothing
    assert eng_slow.visited_set() == eng_fast.visited_set()
    assert len(stats_slow) > len(stats_fast)
    # no host is fetched in two supersteps closer than the delay
    pages = eng_slow.store.read("pages").where(~F.col("skipped"))
    fetch_steps = (
        pages.groupBy("host", "superstep").count()
        .orderBy("host", "superstep")
        .collect()
    )
    by_host: dict[str, list[int]] = {}
    for r in fetch_steps:
        by_host.setdefault(r["host"], []).append(r["superstep"])
    for host, steps in by_host.items():
        for a, b in zip(steps, steps[1:]):
            assert b - a >= 2, f"{host} fetched at {a} and {b}"


def test_real_clock_paces_supersteps(spark, tmp_path):
    """--real-clock (VERDICT r2 #8): with an injected fake clock, superstep
    k may not start sooner than seconds_per_superstep after superstep k-1
    started — so crawl_delay on the logical clock is wall-clock politeness.
    Emission is unchanged (pacing never reorders or drops)."""

    class FakeClock:
        def __init__(self):
            self.t = 1000.0
            self.sleeps: list[float] = []

        def clock(self):
            # each read advances a little (work takes nonzero time)
            self.t += 0.05
            return self.t

        def sleep(self, dt):
            assert dt > 0
            self.sleeps.append(dt)
            self.t += dt

    pages = corpus.build_pages_df(spark, N, H, partitions=4)
    cfg = CrawlConfig(
        accept=ACCEPTS, max_docs=500, max_connections=None,
        real_clock=True, seconds_per_superstep=5,
    )
    fake = FakeClock()
    root = str(tmp_path / "paced")
    shutil.rmtree(root, ignore_errors=True)
    eng = CrawlEngine(
        spark, cfg, SyntheticFetcher(pages), root,
        clock=fake.clock, sleep=fake.sleep,
    )
    starts: list[float] = []
    orig_step = CrawlEngine.step

    def spy_step(self):
        st = orig_step(self)
        if st is not None:
            starts.append(self._last_step_start)
        return st

    CrawlEngine.step = spy_step
    try:
        stats = eng.run(seeds=[corpus.url_of(0, H)], max_supersteps=60)
    finally:
        CrawlEngine.step = orig_step
    assert len(stats) >= 3
    # every superstep start is >= one tick after the previous start
    for a, b in zip(starts, starts[1:]):
        assert b - a >= 5.0 - 1e-9, f"paced too fast: {b - a:.3f}s"
    # the fake work (0.05s/read) is far below the tick, so sleeps happened
    assert fake.sleeps and all(dt <= 5.0 for dt in fake.sleeps)

    # pacing changes nothing about the crawl itself
    eng_off, _ = _run(spark, tmp_path, "unpaced")
    assert eng.visited_set() == eng_off.visited_set()


def _page(url, body, links=()):
    html = body + "".join(f"<a href='{u}'>x</a>" for u in links)
    return (url, bytearray(html.encode()), 200, None, "text/html", "")


def _custom_run(spark, tmp_path, name, rows, seeds, accept, **cfg_kwargs):
    pages = spark.createDataFrame(
        rows,
        "url string, html binary, status int, location string, "
        "content_type string, text string",
    )
    cfg = CrawlConfig(accept=accept, max_docs=500, max_connections=None,
                      **cfg_kwargs)
    root = str(tmp_path / name)
    shutil.rmtree(root, ignore_errors=True)
    eng = CrawlEngine(spark, cfg, SyntheticFetcher(pages), root)
    stats = eng.run(seeds=seeds, max_supersteps=40)
    return eng, stats


def test_per_host_crawl_delay_from_robots(spark, tmp_path):
    """VERDICT r4 #4: 'Crawl-delay:' harvested from a host's robots body
    becomes host_state.crawl_delay_ms and defers THAT host's later waves,
    while other hosts run at the global (1s) cadence — two hosts, two
    different delays, wave membership checked per logical tick."""
    A, B = "https://slow.example", "https://fast.example"
    rows = [
        _page(f"{A}/", "<pre>Crawl-delay: 3\n</pre>",
              [f"{A}/p{i}" for i in (1, 2, 3)]),
        _page(f"{B}/", "no directives here",
              [f"{B}/p{i}" for i in (1, 2, 3)]),
    ] + [
        _page(f"{h}/p{i}", "leaf") for h in (A, B) for i in (1, 2, 3)
    ]
    eng, _ = _custom_run(
        spark, tmp_path, "perhost", rows, [f"{A}/", f"{B}/"],
        [A, B],
        enforce_crawl_delay=True, crawl_delay_seconds=1,
        seconds_per_superstep=1, per_host_budget=1,
    )
    hs = {r["host"]: r for r in eng.store.read("host_state").collect()}
    assert hs["slow.example"]["crawl_delay_ms"] == 3000
    assert hs["fast.example"]["crawl_delay_ms"] is None
    pages = eng.store.read("pages").where(~F.col("skipped"))
    steps = {
        h: sorted(
            r["superstep"]
            for r in pages.where(F.col("host") == h).collect()
        )
        for h in ("slow.example", "fast.example")
    }
    # everything is eventually fetched (defer, never drop)
    assert len(steps["slow.example"]) == 4 and len(steps["fast.example"]) == 4
    # fast host: global 1s delay on a 1s tick = consecutive supersteps
    for a, b in zip(steps["fast.example"], steps["fast.example"][1:]):
        assert b - a >= 1
    # slow host: >= 3 logical ticks between fetches AFTER the delay was
    # harvested (the root fetch at tick 1 discovers it)
    slow = steps["slow.example"]
    for a, b in zip(slow[1:], slow[2:]):
        assert b - a >= 3, f"slow.example fetched at {a} then {b}"
    # and strictly slower than the fast host overall
    assert slow[-1] - slow[1] >= 3 * (len(slow) - 2)


def test_robots_allow_overrides_disallow(spark, tmp_path):
    """VERDICT r4 #5, RFC 9309 §2.2.2: an Allow carve-out INSIDE a
    Disallowed prefix wins when it is at least as specific; a less
    specific Allow does not."""
    H0 = "https://site.example"
    # directives live on their own page (like a real robots.txt): the
    # per-page first-wins dedup (reference semantics) would otherwise
    # collapse an anchor and an Allow rule for the same URL into one row
    robots = (
        "<pre>Disallow: /private/\nAllow: /private/ok\n"
        "Disallow: /vault/deep/\nAllow: /vault\n</pre>"
    )
    rows = [
        _page(f"{H0}/", robots, [f"{H0}/hub"]),
        _page(f"{H0}/hub", "link hub",
              [f"{H0}/private/ok", f"{H0}/private/secret",
               f"{H0}/vault/deep/x", f"{H0}/open"]),
        _page(f"{H0}/private/ok", "carved out"),
        _page(f"{H0}/private/secret", "blocked"),
        _page(f"{H0}/vault/deep/x", "blocked too"),
        _page(f"{H0}/open", "plain"),
    ]
    eng, _ = _custom_run(
        spark, tmp_path, "allowprec", rows, [f"{H0}/"], [H0],
        enforce_robots=True,
    )
    got = {
        r["url"]: (r["skipped"], r["status"])
        for r in eng.store.read("pages").collect()
    }
    assert got[f"{H0}/open"] == (False, 200)
    # Allow: /private/ok is MORE specific than Disallow: /private/ → fetched
    assert got[f"{H0}/private/ok"] == (False, 200)
    # no carve-out matches /private/secret → consumed without fetching
    assert got[f"{H0}/private/secret"] == (True, None)
    # Allow: /vault is LESS specific than Disallow: /vault/deep/ → blocked
    assert got[f"{H0}/vault/deep/x"] == (True, None)


def test_robots_rules_require_same_host_provenance(spark, tmp_path):
    """Round-5 review fix: a Disallow/Allow rule only affects the host it
    names when it was discovered on a page OF that host. A third-party
    page quoting 'Allow: https://victim/...' must not weaken the
    victim's own Disallow, and a third-party 'Disallow:' must not censor
    the victim's URLs."""
    V, M = "https://victim.example", "https://mallory.example"
    rows = [
        # the victim's own (same-host) directives: block /private/
        _page(f"{V}/", "<pre>Disallow: /private/\n</pre>",
              [f"{V}/hub"]),
        _page(f"{V}/hub", "links",
              [f"{V}/private/x", f"{V}/open"]),
        _page(f"{V}/private/x", "blocked by victim's own rule"),
        _page(f"{V}/open", "plain"),
        # mallory tries to carve out the victim's private tree AND to
        # censor the victim's open page — both must be ignored
        _page(f"{M}/",
              f"<pre>Allow: {V}/private/x\nDisallow: {V}/open\n</pre>"),
    ]
    eng, _ = _custom_run(
        spark, tmp_path, "provenance", rows,
        [f"{V}/", f"{M}/"], [V, M],
        enforce_robots=True,
    )
    got = {
        r["url"]: (r["skipped"], r["status"])
        for r in eng.store.read("pages").collect()
    }
    # victim's own Disallow still enforced (mallory's Allow ignored)
    assert got[f"{V}/private/x"] == (True, None)
    # victim's open page still fetched (mallory's Disallow ignored)
    assert got[f"{V}/open"] == (False, 200)
    # mallory's rules never land in the victim's host_state
    hs = {r["host"]: r for r in eng.store.read("host_state").collect()}
    v_allow = hs["victim.example"]["robots_allow"] or []
    assert not any("private" in a for a in v_allow)


def test_crawl_delay_last_observation_wins(spark, tmp_path):
    """Round-5 review fix: host_state.crawl_delay_ms follows the LATEST
    robots observation instead of ratcheting with max() — a host that
    lowers its Crawl-delay gets the smaller value."""
    A = "https://relax.example"
    rows = [
        _page(f"{A}/", "<pre>Crawl-delay: 5\n</pre>", [f"{A}/mid"]),
        # a later (deeper) page republishes a smaller delay
        _page(f"{A}/mid", "<pre>Crawl-delay: 1\n</pre>", [f"{A}/leaf"]),
        _page(f"{A}/leaf", "done"),
    ]
    eng, _ = _custom_run(
        spark, tmp_path, "lastobs", rows, [f"{A}/"], [A],
        enforce_crawl_delay=True, crawl_delay_seconds=1,
        seconds_per_superstep=1, per_host_budget=1,
    )
    hs = {r["host"]: r for r in eng.store.read("host_state").collect()}
    # the final observation (1s) replaced the initial 5s ratchet
    assert hs["relax.example"]["crawl_delay_ms"] == 1000
