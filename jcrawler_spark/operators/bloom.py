"""Partitioned Bloom seen-filter — the engine's one custom physical structure
(SURVEY.md §4; north rule: "filters already-seen URLs with a partitioned
Bloom/cuckoo filter keyed on canonicalized URL hashes").

The reference's visited set is an in-heap ConcurrentHashMap
(/root/reference/src/main/java/org/raisercostin/jcrawler/ParallelGraphTraverser.java:22,33)
— impossible at 10^10 URLs. Here the exact seen set lives in the `seen`
table (anti-join on url_hash), and this Bloom is a *prefilter* that kills
the overwhelmingly-common "already seen" rows before they reach the
shuffle, shrinking the anti-join's probe side by orders of magnitude. False
positives are resolved by the exact anti-join that follows; false negatives
are impossible, so correctness never depends on the Bloom.

Sharding: shard = h1 % n_shards where h1 is the first 64 bits of the
sha-256 canonical url_hash the engine already computes everywhere
(FIXTURES.md names xxhash64 for this — we derive all hashes from the one
sha-256 instead so the pure-Python oracle, the JVM columns, and the Arrow
UDFs agree bit-for-bit without a Python xxhash dependency; same structure,
different hash family — documented in DIVERGENCES.md). Bits per element:
k positions via double hashing (h2 + (j+1)*h3) % m_bits.

Scale path: shard bitmaps are built WHERE THE DATA IS via
groupBy(shard).applyInPandas — only m_bits/8 bytes per shard cross to the
driver, then the OR-merged blob is broadcast back for the prefilter UDF.
At 10^10 with n_shards≈4096 and m=2^30 each, shards would live as Iceberg
blob sidecars per superstep (SnapshotStore.stage_blob) and the prefilter
would join by shard instead of broadcasting — the API is shaped for that.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _hashes(hex64: str) -> tuple[int, int, int]:
    """(shard-hash, base, step) from a sha-256 hex string."""
    h1 = int(hex64[0:16], 16)
    h2 = int(hex64[16:32], 16)
    h3 = int(hex64[32:48], 16) | 1  # odd step
    return h1, h2, h3


def positions(hex64: str, n_shards: int, m_bits: int, k: int) -> tuple[int, np.ndarray]:
    """(shard, k bit positions) for one canonical url_hash."""
    h1, h2, h3 = _hashes(hex64)
    shard = h1 % n_shards
    pos = (
        h2 + (np.arange(1, k + 1, dtype=np.uint64) * np.uint64(h3))
    ) % np.uint64(m_bits)
    return shard, pos.astype(np.int64)


class ShardedBloom:
    """n_shards × m_bits bit matrix with k double-hashed probes per key."""

    HEADER = np.dtype("<u4")

    def __init__(self, n_shards: int = 8, m_bits: int = 1 << 20, k: int = 5):
        assert m_bits % 8 == 0
        self.n_shards = n_shards
        self.m_bits = m_bits
        self.k = k
        self.arr = np.zeros((n_shards, m_bits // 8), dtype=np.uint8)

    # ---- serialization (blob sidecar in SnapshotStore) ----

    def to_bytes(self) -> bytes:
        head = np.array([self.n_shards, self.m_bits, self.k], dtype=self.HEADER)
        return head.tobytes() + self.arr.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ShardedBloom":
        head = np.frombuffer(blob[:12], dtype=cls.HEADER)
        b = cls(int(head[0]), int(head[1]), int(head[2]))
        b.arr = (
            np.frombuffer(blob[12:], dtype=np.uint8)
            .reshape(b.n_shards, b.m_bits // 8)
            .copy()
        )
        return b

    # ---- core bit ops ----

    def _positions(self, hex64: str) -> tuple[int, np.ndarray]:
        return positions(hex64, self.n_shards, self.m_bits, self.k)

    def add_hexes(self, hexes: Iterable[str]) -> None:
        for h in hexes:
            shard, pos = self._positions(h)
            np.bitwise_or.at(self.arr[shard], pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def contains_hexes(self, hexes: Iterable[str]) -> np.ndarray:
        out = []
        for h in hexes:
            shard, pos = self._positions(h)
            bits = (self.arr[shard, pos // 8] >> (pos % 8).astype(np.uint8)) & 1
            out.append(bool(bits.all()))
        return np.array(out, dtype=bool)

    def merge_shard(self, shard: int, bitmap: bytes) -> None:
        self.arr[shard] |= np.frombuffer(bitmap, dtype=np.uint8)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.arr).mean())


class GenerationalBloom:
    """Scalable Bloom filter (Almeida et al., 'Scalable Bloom Filters',
    IPL 2007 — public): a CHAIN of ShardedBloom generations. Inserts go to
    the newest generation; when its fill ratio crosses `grow_at_fill`, a
    fresh generation with 4× the bits is appended (old generations are
    frozen — a Bloom can't be resized in place without the original keys).
    Membership = maybe-in ANY generation; false negatives stay impossible.

    This removes the round-1 failure mode (silent saturation at ≥10^8 seen
    URLs: fill→1, prefilter selectivity→0): growth keeps the newest
    generation's false-positive rate bounded, and crossing the threshold is
    LOUD (a warnings.warn plus the `grew` flag for engine lineage).
    n_shards is fixed across generations so the shard route of a key never
    changes — only m_bits grows."""

    MAGIC = b"GBL1"

    def __init__(
        self,
        n_shards: int = 8,
        m_bits: int = 1 << 20,
        k: int = 5,
        grow_at_fill: float | None = 0.5,
    ):
        self.grow_at_fill = grow_at_fill
        self.generations: list[ShardedBloom] = [ShardedBloom(n_shards, m_bits, k)]

    # ---- current-generation facade (engine inserts go here) ----

    @property
    def current(self) -> ShardedBloom:
        return self.generations[-1]

    @property
    def n_shards(self) -> int:
        return self.current.n_shards

    @property
    def m_bits(self) -> int:
        return self.current.m_bits

    @property
    def k(self) -> int:
        return self.current.k

    def merge_shard(self, shard: int, bitmap: bytes) -> None:
        self.current.merge_shard(shard, bitmap)

    def add_hexes(self, hexes: Iterable[str]) -> None:
        self.current.add_hexes(hexes)

    def maybe_grow(self) -> bool:
        """Append a 4×-bits generation when the current one crosses the
        fill threshold. Returns True (and warns) when growth happened."""
        if self.grow_at_fill is None:
            return False
        fill = self.current.fill_ratio()
        if fill < self.grow_at_fill:
            return False
        import warnings

        cur = self.current
        self.generations.append(ShardedBloom(cur.n_shards, cur.m_bits * 4, cur.k))
        warnings.warn(
            f"Bloom generation {len(self.generations) - 1} saturated "
            f"(fill={fill:.2f} ≥ {self.grow_at_fill}); grew to "
            f"{cur.m_bits * 4} bits/shard × {cur.n_shards} shards",
            stacklevel=2,
        )
        return True

    def fill_ratio(self) -> float:
        return self.current.fill_ratio()

    def total_bytes(self) -> int:
        return sum(g.arr.nbytes for g in self.generations)

    def contains_hexes(self, hexes: Iterable[str]) -> np.ndarray:
        hexes = list(hexes)
        out = np.zeros(len(hexes), dtype=bool)
        for g in self.generations:
            out |= g.contains_hexes(hexes)
        return out

    # ---- serialization (blob sidecar) ----

    def to_bytes(self) -> bytes:
        parts = [self.MAGIC, np.uint32(len(self.generations)).tobytes()]
        grow = -1.0 if self.grow_at_fill is None else self.grow_at_fill
        parts.append(np.float64(grow).tobytes())
        for g in self.generations:
            blob = g.to_bytes()
            parts.append(np.uint64(len(blob)).tobytes())
            parts.append(blob)
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "GenerationalBloom":
        if not blob.startswith(cls.MAGIC):
            # legacy single-generation snapshot (round-1 state dirs)
            b = cls.__new__(cls)
            b.grow_at_fill = 0.5
            b.generations = [ShardedBloom.from_bytes(blob)]
            return b
        off = len(cls.MAGIC)
        n = int(np.frombuffer(blob[off : off + 4], dtype=np.uint32)[0])
        off += 4
        grow = float(np.frombuffer(blob[off : off + 8], dtype=np.float64)[0])
        off += 8
        b = cls.__new__(cls)
        b.grow_at_fill = None if grow < 0 else grow
        b.generations = []
        for _ in range(n):
            ln = int(np.frombuffer(blob[off : off + 8], dtype=np.uint64)[0])
            off += 8
            b.generations.append(ShardedBloom.from_bytes(blob[off : off + ln]))
            off += ln
        return b


def bloom_from_bytes(blob: bytes) -> "GenerationalBloom":
    """Deserialize any committed bloom sidecar (generational or legacy)."""
    return GenerationalBloom.from_bytes(blob)


def shard_col(url_hash: Column, n_shards: int) -> Column:
    """JVM-side shard id matching _hashes()[0] % n_shards: first 64 hash bits
    interpreted as unsigned — conv() yields the unsigned value as DECIMAL so
    the mod matches Python's int(hex,16) % n."""
    return F.pmod(
        F.conv(F.substring(url_hash, 1, 16), 16, 10).cast(T.DecimalType(20, 0)),
        F.lit(n_shards),
    ).cast("int")


def build_shard_increments(
    wave_hashes: DataFrame, n_shards: int, m_bits: int, k: int
) -> list[tuple[int, bytes]]:
    """Distributed bitmap build: group url_hash by shard, each group builds
    its own m_bits/8-byte bitmap in one Arrow batch; only bitmaps return to
    the driver."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        shard = int(pdf["shard"].iloc[0])
        for h in pdf["url_hash"]:
            _, pos = positions(h, n_shards, m_bits, k)
            np.bitwise_or.at(bitmap, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        return pd.DataFrame({"shard": [shard], "bitmap": [bitmap.tobytes()]})

    rows = (
        wave_hashes.select(
            "url_hash", shard_col(F.col("url_hash"), n_shards).alias("shard")
        )
        .groupBy("shard")
        .applyInPandas(build, schema="shard int, bitmap binary")
        .collect()
    )
    return [(r["shard"], bytes(r["bitmap"])) for r in rows]


def prefilter_unseen(
    spark: SparkSession, candidates: DataFrame, bloom, col: str = "url_hash"
) -> DataFrame:
    """Broadcast prefilter: adds a `maybe_seen` column; callers must ALSO
    keep the exact anti-join for maybe-seen survivors — this merely shrinks
    its probe side (false positives resolved there; false negatives
    impossible). Right while the whole filter fits an executor heap."""
    blob = spark.sparkContext.broadcast(bloom.to_bytes())

    @F.pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        b = GenerationalBloom.from_bytes(blob.value)
        return pd.Series(b.contains_hexes(h))

    return candidates.withColumn("maybe_seen", maybe_seen(F.col(col)))


# above this many filter bytes the engine switches to the shard-join form
BROADCAST_BLOOM_MAX_BYTES = 64 << 20


def prefilter_unseen_sharded(
    candidates: DataFrame, bloom: "GenerationalBloom", col: str = "url_hash"
) -> DataFrame:
    """Shard-JOIN prefilter — the 10^10-frontier form: no task ever holds
    more than ONE shard's bitmaps. Candidates are cogrouped with a
    (shard, generation, bitmap) table on the shard id; each Arrow task
    probes its own shard's bitmap chain. At n_shards≈4096 × m=2^30 the
    shard table is an Iceberg sidecar instead of a createDataFrame — the
    plan shape (shuffle by shard, local probe) is identical.

    Output contract matches prefilter_unseen: candidates + `maybe_seen`."""
    spark = candidates.sparkSession
    n_shards = bloom.n_shards
    rows = [
        (si, gi, g.m_bits, g.k, bytes(g.arr[si].tobytes()))
        for gi, g in enumerate(bloom.generations)
        for si in range(g.n_shards)
    ]
    shards_df = spark.createDataFrame(
        rows, "shard int, gen int, m_bits long, k int, bitmap binary"
    )
    cand = candidates.withColumn("__shard", shard_col(F.col(col), n_shards))
    out_schema = T.StructType(
        [f for f in cand.schema.fields if f.name != "__shard"]
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    keep_cols = [f.name for f in cand.schema.fields if f.name != "__shard"]

    def probe(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=keep_cols + ["maybe_seen"])
        seen = np.zeros(len(cand_pdf), dtype=bool)
        hexes = list(cand_pdf[col])
        for _, srow in shard_pdf.iterrows():
            m_bits, k = int(srow["m_bits"]), int(srow["k"])
            bitmap = np.frombuffer(bytes(srow["bitmap"]), dtype=np.uint8)
            for i, h in enumerate(hexes):
                if seen[i]:
                    continue
                _, pos = positions(h, n_shards, m_bits, k)
                bits = (bitmap[pos // 8] >> (pos % 8).astype(np.uint8)) & 1
                if bits.all():
                    seen[i] = True
        out = cand_pdf[keep_cols].copy()
        out["maybe_seen"] = seen
        return out

    return (
        cand.groupBy("__shard")
        .cogroup(shards_df.groupBy("shard"))
        .applyInPandas(probe, schema=out_schema)
    )


def prefilter_auto(
    spark: SparkSession, candidates: DataFrame, bloom, col: str = "url_hash"
) -> DataFrame:
    """Broadcast below BROADCAST_BLOOM_MAX_BYTES, shard-join above."""
    if (
        hasattr(bloom, "total_bytes")
        and bloom.total_bytes() > BROADCAST_BLOOM_MAX_BYTES
    ):
        return prefilter_unseen_sharded(candidates, bloom, col)
    return prefilter_unseen(spark, candidates, bloom, col)
