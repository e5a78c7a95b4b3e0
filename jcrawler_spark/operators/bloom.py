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
    spark: SparkSession, candidates: DataFrame, bloom: ShardedBloom, col: str = "url_hash"
) -> DataFrame:
    """Keep only rows the Bloom does NOT contain (definitely-unseen) plus
    rows it reports as maybe-seen are dropped — callers must ALSO keep the
    exact anti-join for the survivors' correctness; this merely shrinks its
    probe side. Returns candidates with maybe-seen rows removed *optimistically*:
    a `maybe_seen` column is added and callers filter/branch on it."""
    blob = spark.sparkContext.broadcast(bloom.to_bytes())

    @F.pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        b = ShardedBloom.from_bytes(blob.value)
        return pd.Series(b.contains_hexes(h))

    return candidates.withColumn("maybe_seen", maybe_seen(F.col(col)))
