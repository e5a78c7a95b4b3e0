"""Accept-filter pipeline — F1-F8 of SURVEY.md §2.2.

Re-expresses the reference's `accept()` gate
(/root/reference/src/main/java/org/raisercostin/jcrawler/JCrawler.java:908-971)
and accept-set construction (JCrawler.java:876-889) in two forms:

* pure-Python (`accept_link`, for the BFS oracle and unit tests mirroring
  ExternalDomainTest.java / PageResourcesTest.java), and
* Spark Column expressions (`accept_col`, `with_accept`) that stay fully
  JVM-side in whole-stage codegen — the accept set is a small broadcastable
  list expanded driver-side through Generators, turned into an OR-chain of
  `startswith` predicates (F5), so Catalyst can pipeline it with the rest of
  the wave filter with zero shuffles.

Gate order (exact reference semantics):
  1. F1 unsupported protocol → reject, NO side output (JCrawler.java:910-914)
  2. F2 depth > limit        → reject (side output suppressed: depth>limit
     branch skips the ignored-domains add, JCrawler.java:917)
  3. F3 isResource           → accept (page-requisites, wget-style)
  4. F4 isRedirect           → accept (implicit ownership through 3xx)
  5. F5 ∃ prefix ∈ acceptSet: url.startswith(prefix) → accept
  6. reject + F6 side-output host into ignoredExternalDomains
     (JCrawler.java:916-931)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jcrawler_spark.functions import generators, urlops


def build_accept_set(
    seed_urls: list[str],
    extra_accept: list[str] | None = None,
    accept_hostname: str = "{http|https}://{www.|}%s",
) -> list[str]:
    """Accept-prefix set (JCrawler.java:876-889): each seed's
    hostnameForAccept through the template, plus explicit accepts (kept
    verbatim when they start with 'http' or contain '{', else templated),
    all expanded through Generators. Returns sorted distinct prefixes."""
    patterns: list[str] = []
    # dedup hosts before templating: seed lists can be millions of URLs on
    # a few thousand hosts
    hosts: set[str] = set()
    for u in seed_urls:
        host = urlops.hostname_for_accept(u)
        if host:
            hosts.add(host)
    for host in sorted(hosts):
        patterns.append(accept_hostname.replace("%s", host))
    for acc in extra_accept or []:
        if acc.startswith("http") or "{" in acc:
            patterns.append(acc)
        else:
            patterns.append(accept_hostname.replace("%s", acc))
    out: set[str] = set()
    for p in patterns:
        out.update(generators.generate(p))
    return sorted(out)


# ---------------------------------------------------------------------------
# pure-Python form (oracle / unit tests)
# ---------------------------------------------------------------------------


def accept_link(
    url: str,
    depth: int,
    is_resource: bool,
    is_redirect: bool,
    accept_set: list[str],
    max_depth: int = 100,
) -> tuple[bool, str | None]:
    """Returns (accepted, ignored_domain_or_None) — the second element is the
    F6 side-output host when the link is rejected with depth-ok + supported
    protocol (JCrawler.java:916-931)."""
    low = url.lower()
    if low.startswith(urlops.UNSUPPORTED_PROTOCOLS):
        return False, None
    accepted = (
        depth <= max_depth
        and (is_resource or is_redirect or any(url.startswith(p) for p in accept_set))
    )
    if accepted:
        return True, None
    ignored = None
    if depth <= max_depth:
        host = urlops.hostname(url)
        if host:
            ignored = host
    return False, ignored


# ---------------------------------------------------------------------------
# Spark Column form (JVM-side; no UDF)
# ---------------------------------------------------------------------------


# Expression-vs-join routing bound for the accept-prefix match. The
# expression form costs one Catalyst node per prefix: a left-deep Or chain
# stack-overflows analysis near ~500 terms, and even BALANCED it kills the
# JVM near ~8k terms (janino whole-stage-codegen failure + optimizer
# constraint propagation over the Or tree — measured on this JVM, round 5).
# Above this bound `prefix_match_df` switches to a broadcast prefix-table
# join: constant plan size, O(1) hash probe per row — the shape a
# 100k-host whitelist needs at 10^10 frontier rows anyway.
ACCEPT_EXPR_MAX = 64


def _prefix_match(url: Column, accept_set: list[str]) -> Column:
    """OR of per-prefix startswith, reduced as a BALANCED tree (a left-deep
    chain recurses Catalyst once per term). Expression-only form — keep the
    set small (≤ ACCEPT_EXPR_MAX); large sets must route through
    `prefix_match_df`, which joins instead of inlining the set into the
    plan."""
    if not accept_set:
        return F.lit(False)
    conds = [url.startswith(p) for p in accept_set]
    while len(conds) > 1:
        nxt = [
            conds[i] | conds[i + 1] if i + 1 < len(conds) else conds[i]
            for i in range(0, len(conds), 2)
        ]
        conds = nxt
    return conds[0]


def _prefix_classes(
    accept_set: list[str],
) -> list[tuple[int, dict[str, list[str]]]]:
    """Split the accept set into power-of-two LENGTH classes, each keyed at
    its own class-minimum prefix length. A single global klen = min(len)
    let one short generic prefix (e.g. 'https://', len 8) collapse 100k
    host prefixes into ONE key whose candidate array was the whole set —
    restoring the O(|accept_set|)-per-row scan the join exists to avoid
    (round-5 review fix). With classes, the len-8 prefix keys alone at 8
    while the host prefixes key at ≥16 chars, which includes the host and
    discriminates. Returns [(klen, {key: [prefixes...]}), ...] — at most
    ~7 classes for URL-shaped prefixes."""
    by_class: dict[int, list[str]] = {}
    for p in accept_set:
        c = 1
        while c * 2 <= len(p):
            c *= 2
        by_class.setdefault(c, []).append(p)
    out = []
    for c in sorted(by_class):
        plist = by_class[c]
        klen = min(len(p) for p in plist)
        by_key: dict[str, list[str]] = {}
        for p in plist:
            by_key.setdefault(p[:klen], []).append(p)
        out.append((klen, by_key))
    return out


def prefix_match_df(
    df: DataFrame, accept_set: list[str], url: str, out_col: str
) -> DataFrame:
    """Adds boolean `out_col` = ∃ prefix ∈ accept_set: url startswith prefix,
    via exact broadcast joins — the scale path for large accept sets.

    One join per power-of-two length class (see `_prefix_classes`); within
    a class the key is the first klen characters (klen = the class's
    shortest prefix): any (url, prefix) startswith pair necessarily agrees
    on that slice, so a hash-equality join on it loses no matches; the few
    same-key candidates are then verified with the full startswith. Each
    prefix table is keyed UNIQUELY (one row per key, candidates collected
    into an array), so every left join preserves the row count exactly.
    Per row: ≤7 O(1) hash probes + O(candidates-per-key) startswith —
    independent of |accept_set|, plan size constant, no shuffle
    (broadcast)."""
    if not accept_set:
        return df.withColumn(out_col, F.lit(False))
    if "" in accept_set:  # empty prefix matches every URL
        return df.withColumn(out_col, F.lit(True))
    joined = df
    hits = []
    for i, (klen, by_key) in enumerate(_prefix_classes(accept_set)):
        kcol, lcol = f"_pfx_k{i}", f"_pfx_list{i}"
        pref = df.sparkSession.createDataFrame(
            list(by_key.items()), f"{kcol} string, {lcol} array<string>"
        )
        joined = joined.join(
            F.broadcast(pref),
            F.substring(F.col(url), 1, klen) == F.col(kcol),
            "left",
        )
        hits.append(
            F.coalesce(
                F.exists(F.col(lcol), lambda p: F.col(url).startswith(p)),
                F.lit(False),
            )
        )
        joined = joined.drop(kcol)
    hit = hits[0]
    for h in hits[1:]:
        hit = hit | h
    return joined.withColumn(out_col, hit).drop(
        *[f"_pfx_list{i}" for i in range(len(hits))]
    )


def accept_col(
    url: Column,
    depth: Column,
    is_resource: Column,
    is_redirect: Column,
    accept_set: list[str],
    max_depth: int = 100,
) -> Column:
    """Boolean accept predicate, pure Column expression. Small accept sets
    only (see ACCEPT_EXPR_MAX) — DataFrame call sites should prefer
    `with_accept_predicate`, which routes large sets to the join form."""
    return (
        ~urlops.unsupported_protocol_col(url)
        & (depth <= F.lit(max_depth))
        & (is_resource | is_redirect | _prefix_match(url, accept_set))
    )


def with_accept_predicate(
    df: DataFrame,
    out_col: str,
    accept_set: list[str],
    max_depth: int = 100,
    url: str = "url",
    depth: str = "depth",
    is_resource: str = "is_resource",
    is_redirect: str = "is_redirect",
) -> DataFrame:
    """Adds boolean `out_col` = the full accept predicate (gate order in the
    module docstring). Routes the F5 prefix match by accept-set size:
    expression form ≤ ACCEPT_EXPR_MAX (bit-identical to the historical
    plan), broadcast prefix-table join above."""
    if len(accept_set) <= ACCEPT_EXPR_MAX:
        return df.withColumn(
            out_col,
            accept_col(
                F.col(url), F.col(depth), F.col(is_resource),
                F.col(is_redirect), accept_set, max_depth,
            ),
        )
    hit = "_pfx_hit"
    out = prefix_match_df(df, accept_set, url, hit)
    return out.withColumn(
        out_col,
        ~urlops.unsupported_protocol_col(F.col(url))
        & (F.col(depth) <= F.lit(max_depth))
        & (F.col(is_resource) | F.col(is_redirect) | F.col(hit)),
    ).drop(hit)


def _longest_rule_match(url: Column, rules: Column) -> Column:
    """Length of the most specific (longest) rule prefix in `rules`
    (array<string>, nullable) matching `url`; 0 when none match or the
    array is null/empty. Pure Column expression (JVM codegen)."""
    return F.coalesce(
        F.array_max(
            F.transform(
                F.coalesce(rules, F.array()),
                lambda r: F.when(url.startswith(r), F.length(r)).otherwise(
                    F.lit(0)
                ),
            )
        ),
        F.lit(0),
    )


def robots_allowed_col(
    url: Column, disallow: Column, allow: Column
) -> Column:
    """RFC 9309 §2.2.2 rule precedence as a pure Column expression: the
    most specific (longest) matching rule wins, and `Allow` wins length
    ties — a URL is gated only when some Disallow prefix matches AND no
    Allow match is at least as specific. Both rule columns are
    array<string> of URL prefixes (null/empty = no rules → allowed).

    North-rule enforcement delta: the reference EXTRACTS robots directives
    as links (JCrawler.java:362-365) but never enforces them (README.md:208);
    the engine's opt-in `enforce_robots` gate routes through this exact
    expression, and the `robots_precedence` contract query pins it against
    a DuckDB oracle."""
    return (_longest_rule_match(url, disallow) == F.lit(0)) | (
        _longest_rule_match(url, allow) >= _longest_rule_match(url, disallow)
    )


def ignored_domain_col(
    url: Column,
    depth: Column,
    accepted: Column,
    max_depth: int = 100,
) -> Column:
    """F6 side-output host column: non-null only on qualifying rejections."""
    return F.when(
        ~accepted
        & (depth <= F.lit(max_depth))
        & ~urlops.unsupported_protocol_col(url),
        urlops.host_col(url),
    )


def with_accept(
    links: DataFrame,
    accept_set: list[str],
    max_depth: int = 100,
    url: str = "url",
    depth: str = "depth",
    is_resource: str = "is_resource",
    is_redirect: str = "is_redirect",
) -> DataFrame:
    """Adds `accepted` + `ignored_domain` columns to a links DataFrame."""
    out = with_accept_predicate(
        links, "accepted", accept_set, max_depth,
        url=url, depth=depth, is_resource=is_resource, is_redirect=is_redirect,
    )
    return out.withColumn(
        "ignored_domain",
        ignored_domain_col(F.col(url), F.col(depth), F.col("accepted"), max_depth),
    )


def ignored_domains(links_with_accept: DataFrame) -> DataFrame:
    """A3: sorted distinct rejected external hosts (JCrawler.java:672-684) —
    one row per host, sorted, so the result is oracle-comparable."""
    return (
        links_with_accept.where(F.col("ignored_domain").isNotNull())
        .select(F.col("ignored_domain").alias("host"))
        .distinct()
        .orderBy("host")
    )
