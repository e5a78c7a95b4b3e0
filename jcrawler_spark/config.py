"""Crawl configuration.

Mirrors the observable defaults of the reference CLI bean
(/root/reference/src/main/java/org/raisercostin/jcrawler/JCrawler.java:594-649):
maxDocs=10_000, maxConnections=3, depth=100, cacheExpiryDuration=100 days,
acceptHostname template "{http|https}://{www.|}%s", traversal default
PARALLEL_BREADTH_FIRST (JCrawler.java:596).

Additions beyond the reference (north-rule requirements): per-host politeness
budget/delay enforcement and robots.txt enforcement — both default OFF so the
engine is reference-equivalent unless explicitly enabled
(reference parses robots directives as crawlable links but does not enforce
them, README.md:208; its politeness is only a global connection token pool,
JCrawler.java:868,892-897).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


class TraversalType(Enum):
    """JCrawler.java:560-588. PARALLEL_BREADTH_FIRST order is explicitly
    undefined in the reference (README.md:191); our engine makes it
    deterministic by sorting each wave — strictly stronger contract."""

    PARALLEL_BREADTH_FIRST = "parallel_breadth_first"
    BREADTH_FIRST = "breadth_first"
    DEPTH_FIRST_PREORDER = "depth_first_preorder"
    # expansion identical to preorder; emission after descendants
    # (postorder of the discovery tree — DIVERGENCES.md)
    DEPTH_FIRST_POSTORDER = "depth_first_postorder"


@dataclass
class CrawlConfig:
    # seed URL patterns; expanded through Generators (JCrawler.java:710)
    urls: list[str] = field(default_factory=list)
    # extra accept prefixes (JCrawler.java:634-636); bare hosts are expanded
    # through accept_hostname like the reference does (JCrawler.java:880-886)
    accept: list[str] = field(default_factory=list)
    accept_hostname: str = "{http|https}://{www.|}%s"

    max_docs: int = 10_000           # JCrawler.java:605-606
    # the reference's GLOBAL politeness primitive: at most this many
    # simultaneous connections (JCrawler.java:607-608). Its superstep
    # analogue is the per-wave global budget — when neither `wave_budget`
    # nor `per_host_budget` is set, waves are capped at max_connections
    # (see effective_wave_budget), so default-config politeness matches the
    # reference's 3-connection default. None = unlimited.
    max_connections: int | None = 3
    depth: int = 100                 # JCrawler.java:630-632
    cache_expiry_seconds: int = 100 * 24 * 3600  # JCrawler.java:611-613
    failing_host_backoff_seconds: int = 600      # JCrawler.java:870-872
    # logical clock: 1 superstep advances this many seconds — makes the
    # failing-host backoff and crawl-delay deterministic and testable
    # (the reference uses wall time; ours is reproducible by design)
    seconds_per_superstep: int = 1
    traversal: TraversalType = TraversalType.PARALLEL_BREADTH_FIRST
    recompute_links: bool = False    # JCrawler.java:598 (--recomputeLinks)

    # ---- scale / scheduler knobs (ours; north rule) ----
    # per-wave global fetch budget; None = unlimited wave (reference BFS has
    # no wave budget — its token pool only caps concurrency, not totals)
    wave_budget: int | None = None
    # per-host fetches allowed in one wave (politeness). None = unlimited.
    per_host_budget: int | None = None
    # enforce robots.txt Disallow rules discovered on each host. Default off
    # for reference-equivalence (reference does not enforce; README.md:208).
    enforce_robots: bool = False
    # enforce per-host crawl delay: a host fetched at logical time t is not
    # fetched again before t + crawl_delay_seconds (rows DEFER, staying
    # pending — unlike the failing-host gate, which consumes)
    enforce_crawl_delay: bool = False
    crawl_delay_seconds: int = 1
    # wall-clock politeness (--real-clock): pace supersteps so each takes at
    # least `seconds_per_superstep` REAL seconds — the logical clock then
    # tracks wall time, so crawl-delay/backoff become real-world politeness
    # (the reference's sleep-based token pool, JCrawler.java:868-897). Off =
    # logical clock only (deterministic tests, fastest crawl).
    real_clock: bool = False
    # mega-host skew defusal: the politeness window's phase-1 top-k runs per
    # (host, salt) so no task ever sees a mega-host's whole frontier;
    # salting is unconditional (a uniform host pays one extra tiny window)
    skew_salt_buckets: int = 16
    # F6 ignored-domains side aggregate (A3); off saves one job per wave
    track_ignored_domains: bool = True
    # fold the frontier add/consume delta log into one base every K
    # supersteps (bounds the pending view's plan depth); None = never
    frontier_compact_every: int | None = 8
    # keep the KEY state tables (seen_index, frontier_add) bucketed by
    # url_hash into this many buckets (Iceberg bucket-transform analogue):
    # the per-superstep seen/pending anti-joins then shuffle ONLY the wave
    # side — the accumulated crawl state is scanned but never re-shuffled.
    # The payload-bearing pages deltas stay plain appends (bucketing them
    # would shuffle+sort the links payload every superstep for joins that
    # only read keys). None = plain deltas everywhere (state shuffles per
    # superstep; comparison only). 32 matches local[32]; size to cluster
    # cores in prod.
    state_buckets: int | None = 32
    # parquet codec for state deltas (write phase is disk-bound; lz4 trades
    # a little size for cheaper encode than snappy — BENCH/BASELINE.md)
    state_compression: str = "snappy"
    # print per-phase superstep timings (diagnostics)
    debug_timing: bool = False
    # Bloom seen-prefilter (exact anti-join still applied afterwards).
    # Default OFF — measured, not assumed: with the bucketed seen_index,
    # one 800k wave vs 10^7 seen rows runs 80.6s bloom-off vs 107.1s
    # broadcast-bloom vs 118.4s shard-join (local[8], min/reps,
    # BENCH/BASELINE.md "Bloom prefilter policy" + bloom_compare_r4.jsonl):
    # the one-sided bucketed anti-join already absorbs duplicates more
    # cheaply than the probe UDF + driver merge + broadcast it would skip.
    # Enable (broadcast <64 MB, shard-join above) only when the anti-join
    # itself is the bottleneck: state so large its per-superstep bucketed
    # SCAN dominates — a 10^10-row seen_index whose compact bitmap fits
    # where the key table doesn't (DIVERGENCES.md #23).
    bloom_enabled: bool = False
    # Inline rank (round 5): for waves up to this many URLs the successor
    # rank's per-pid counts are folded into the lineage collect (monotone
    # precomputed pid over the known order_key domain — rank_ops.pid_expr),
    # cutting the sampling+counts jobs to ZERO extra actions per superstep.
    # Above the threshold the sampled range-partition rank runs instead:
    # its two small jobs amortize, and sampling balances the rank stage
    # against out-degree skew that the domain-uniform pid cannot see.
    # None = always use the sampled rank.
    rank_inline_max_wave: int | None = 1 << 18
    # True = launch the rank-independent state writes (pages + seen_index)
    # BEFORE the global-rank barrier instead of at commit time. MEASURED
    # default is OFF: on a single JVM the async staging jobs time-slice
    # against the rank/successor jobs instead of filling an idle barrier,
    # and the multiwave A/B (3 reps alternating, min/reps, local[8]) is
    # 51.6 s blocking vs 119.4 s overlapped — 2.3× WORSE (BENCH/
    # overlap_ab_r4.jsonl, BENCH/BASELINE.md "Write overlap"). The flag
    # remains for a real cluster whose executors genuinely idle through
    # the driver's rank sampling barrier; the path stays oracle-pinned by
    # tests either way (commit still gates on every staged write landing).
    overlap_writes: bool = False
    bloom_shards: int = 8
    bloom_bits_per_shard: int = 1 << 20
    bloom_hashes: int = 5
    # grow the Bloom (new generation, 4× bits) when the current generation's
    # fill ratio crosses this; None disables growth (warn-only)
    bloom_grow_at_fill: float | None = 0.5
    # which prefilter structure bloom_enabled turns on: "bloom" (append-only
    # bitmaps, O(m_bits) merge traffic) or "cuckoo" (fingerprint table,
    # O(wave) merge traffic, supports DELETION — requeue_expired forgets
    # requeued URLs so prefilter selectivity survives recrawl cycles).
    # North rule names both: "partitioned Bloom/cuckoo filter".
    seen_filter_kind: str = "bloom"
    # cuckoo table size per shard: buckets × 4 slots × 2 bytes; at the
    # default 2^16 buckets × 8 shards the filter holds ~2M URLs at the
    # 0.95 load cuckoo tables sustain (Fan et al. 2014, table 2)
    cuckoo_buckets_per_shard: int = 1 << 16

    def effective_wave_budget(self) -> int | None:
        """The global per-wave fetch cap. Explicit `wave_budget` wins; with
        no explicit politeness knobs at all, the reference's default
        maxConnections=3 token pool applies (JCrawler.java:607-608,868):
        a wave of 3 is exactly one token-pool refill per logical tick."""
        if self.wave_budget is not None:
            return self.wave_budget
        if self.per_host_budget is None:
            return self.max_connections
        return None

    def cache_expiry_supersteps(self) -> int:
        """`--expire` (JCrawler.java:611-613) on the logical clock."""
        return max(
            1, self.cache_expiry_seconds // max(1, self.seconds_per_superstep)
        )
