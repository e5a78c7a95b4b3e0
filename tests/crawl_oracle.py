"""Tiny pure-Python crawl oracle (FIXTURES.md §3) — the network-free stand-in
for the reference's golden crawl-order tests (JCrawlerTest.java:68-141).

Implements the reference's observable semantics sequentially: FIFO BFS queue
(wave-synchronous variant for budget/backoff parity with the engine's logical
clock), visited/horizon dedup gates (ParallelGraphTraverser.java:85,96-105),
the accept gate re-check at pop (JCrawler.java:995-1003), fetch against the
same synthetic corpus, the extract→self-filter→first-wins-dedup→accept link
pipeline (JCrawler.java:1233-1244), and maxDocs (take semantics,
JCrawler.java:901-905)."""

from __future__ import annotations

from dataclasses import dataclass, field

from jcrawler_spark.functions import urlops
from jcrawler_spark.operators import accept as accept_ops
from jcrawler_spark.operators import extract


@dataclass
class OracleResult:
    emitted: list[str] = field(default_factory=list)
    visited: set[str] = field(default_factory=set)
    ignored_domains: set[str] = field(default_factory=set)
    pages_fetched: int = 0
    errors: int = 0


def _links_of(page: dict, src_url: str, src_depth: int) -> list[dict]:
    """extract → redirect append → self-filter → per-page first-wins dedup."""
    links: list[dict] = []
    status = page["status"]
    if status == 200 and extract.is_extractable(status, page["content_type"]):
        links = extract.extract_links_py(
            page["html"].decode("utf-8"), src_url, src_depth + 1
        )
    r = extract.redirect_link(status, page.get("location"), src_url)
    if r is not None:
        links = links + [r]
    links = [l for l in links if l["url"] != src_url]
    seen_urls: set[str] = set()
    out = []
    for l in links:
        if l["url"] not in seen_urls:
            seen_urls.add(l["url"])
            out.append(l)
    return out


def crawl_oracle(
    pages_by_url: dict[str, dict],
    seeds: list[str],
    accept_set: list[str],
    max_docs: int = 10_000,
    max_depth: int = 100,
    per_host_budget: int | None = None,
    wave_budget: int | None = None,
    failing_hosts: set[str] | None = None,
    backoff_supersteps: int = 600,
) -> OracleResult:
    failing_hosts = failing_hosts or set()
    res = OracleResult()

    # pending entries: (url, depth, order, is_resource, is_redirect)
    pending: list[dict] = []
    horizon: set[str] = set()
    seen: set[str] = set()
    order = 0
    for u in seeds:
        h = urlops.url_hash(u)
        if h not in horizon:
            horizon.add(h)
            pending.append(
                {"url": u, "hash": h, "depth": 0, "order": order,
                 "is_resource": False, "is_redirect": False}
            )
            order += 1

    host_error_step: dict[str, int] = {}
    superstep = 0
    while pending and len(res.emitted) < max_docs:
        superstep += 1
        # wave selection mirrors engine._select_wave
        cand = sorted(pending, key=lambda e: (e["depth"], e["order"]))
        if per_host_budget is not None:
            taken: dict[str, int] = {}
            sel = []
            for e in cand:
                host = urlops.hostname(e["url"]) or ""
                if taken.get(host, 0) < per_host_budget:
                    taken[host] = taken.get(host, 0) + 1
                    sel.append(e)
            cand = sel
        limit = len(cand)
        if wave_budget is not None:
            limit = min(limit, wave_budget)
        limit = min(limit, max_docs - len(res.emitted))
        wave = cand[:limit]
        # emission within a wave is FIFO discovery order (order_key), even
        # though selection is by the (priority, order) queue — mirrors
        # engine.emitted() ordering by (superstep, order_key)
        wave.sort(key=lambda e: e["order"])
        wave_hashes = {e["hash"] for e in wave}
        pending = [e for e in pending if e["hash"] not in wave_hashes]

        candidates: list[dict] = []  # (src_order, order_in_page) tagged
        # gate on host state as of wave START (the engine reads host_state
        # committed by the previous superstep)
        prev_host_error = dict(host_error_step)
        for e in wave:
            res.emitted.append(e["url"])
            res.visited.add(e["url"])
            seen.add(e["hash"])
            ok, ign = accept_ops.accept_link(
                e["url"], e["depth"], e["is_resource"], e["is_redirect"],
                accept_set, max_depth,
            )
            if not ok:
                continue
            host = urlops.hostname(e["url"]) or ""
            last_err = prev_host_error.get(host)
            if last_err is not None and superstep - last_err <= backoff_supersteps:
                continue  # failing-host gate: consumed, not fetched
            page = pages_by_url.get(e["url"])
            if host in failing_hosts:
                res.errors += 1
                host_error_step[host] = superstep
                continue
            res.pages_fetched += 1
            if page is None:
                continue  # synthetic 404: no links
            for l in _links_of(page, e["url"], e["depth"]):
                ok2, ign2 = accept_ops.accept_link(
                    l["url"], e["depth"] + 1, l["is_resource"], l["is_redirect"],
                    accept_set, max_depth,
                )
                if ign2:
                    res.ignored_domains.add(ign2)
                if not ok2:
                    continue
                h2 = urlops.url_hash(l["url"])
                if h2 in seen or h2 in horizon:
                    continue
                candidates.append(
                    {"url": l["url"], "hash": h2, "depth": e["depth"] + 1,
                     "src_order": e["order"], "pos": l["order_in_page"],
                     "is_resource": l["is_resource"],
                     "is_redirect": l["is_redirect"]}
                )
        # wave-internal first-wins dedup + rank, by (parent order, in-page
        # position, url) — exactly engine._rank_new's sort
        candidates.sort(key=lambda c: (c["src_order"], c["pos"], c["url"]))
        disc_seen: set[str] = set()
        for c in candidates:
            if c["hash"] in disc_seen:
                continue
            disc_seen.add(c["hash"])
            horizon.add(c["hash"])
            pending.append(
                {"url": c["url"], "hash": c["hash"], "depth": c["depth"],
                 "order": order, "is_resource": c["is_resource"],
                 "is_redirect": c["is_redirect"]}
            )
            order += 1
    return res


def fifo_bfs_oracle(
    pages_by_url: dict[str, dict],
    seeds: list[str],
    accept_set: list[str],
    max_docs: int = 10_000,
    max_depth: int = 100,
) -> list[str]:
    """Strict sequential FIFO BFS (the reference's BREADTH_FIRST contract,
    JCrawler.java:568-574) — no waves, no budgets. Used to prove the
    wave-synchronous engine emits the identical order when unbudgeted."""
    from collections import deque

    emitted: list[str] = []
    q: deque[tuple[str, int, bool, bool]] = deque()
    horizon: set[str] = set()
    seen: set[str] = set()
    for u in seeds:
        h = urlops.url_hash(u)
        if h not in horizon:
            horizon.add(h)
            q.append((u, 0, False, False))
    while q and len(emitted) < max_docs:
        url, depth, is_res, is_red = q.popleft()
        emitted.append(url)
        seen.add(urlops.url_hash(url))
        ok, _ = accept_ops.accept_link(url, depth, is_res, is_red, accept_set, max_depth)
        if not ok:
            continue
        page = pages_by_url.get(url)
        if page is None:
            continue
        for l in _links_of(page, url, depth):
            ok2, _ = accept_ops.accept_link(
                l["url"], depth + 1, l["is_resource"], l["is_redirect"],
                accept_set, max_depth,
            )
            if not ok2:
                continue
            h2 = urlops.url_hash(l["url"])
            if h2 in seen or h2 in horizon:
                continue
            horizon.add(h2)
            q.append((l["url"], depth + 1, l["is_resource"], l["is_redirect"]))
    return emitted
