"""Partitioned cuckoo seen-filter — the deletable alternative to the Bloom
(north rule: "filters already-seen URLs with a partitioned Bloom/cuckoo
filter keyed on canonicalized URL hashes").

Bucketized cuckoo hashing after Fan et al., "Cuckoo Filter: Practically
Better Than Bloom" (CoNEXT 2014 — public): per shard, ``n_buckets``
(power of two) buckets of ``SLOTS=4`` 16-bit fingerprint slots; a key can
live in bucket ``i1`` or its xor-partner ``i2 = i1 ^ H(fp)``, so lookups
touch exactly two cache lines and *deletion is supported* — the property
the Bloom lacks. In this engine deletion matters for one flow:
``requeue_expired`` (S10 cache-expiry re-fetch) moves URLs back to
pending, and a deletable seen-prefilter can forget them so the prefilter's
selectivity does not decay across recrawl cycles (a Bloom keeps answering
"maybe seen" for every URL ever fetched, forever).

Correctness contract (same as the Bloom, SURVEY.md §4): this is a
PREFILTER. ``maybe_seen=True`` rows still go through the exact bucketed
anti-join; ``maybe_seen=False`` rows skip it, so NO FALSE NEGATIVES is the
safety property. Cuckoo deletion preserves it because the engine deletes
only keys it previously inserted: duplicate (fp, bucket) copies are allowed
on insert, so two colliding keys hold two copies and deleting one leaves
the other key's membership intact. Saturation (a failed eviction chain)
parks the victim in a stash; membership checks consult it, so saturation
degrades insert speed, never correctness.

Sharding mirrors the Bloom: shard = first-64-hash-bits % n_shards (the
same sha-256 canonical url_hash every other operator keys on), tables are
built where the data is and only per-shard key material crosses to the
driver (6 bytes/key vs the Bloom's fixed bitmap — the honest difference:
cuckoo merge traffic is O(wave), Bloom's is O(m_bits); both are opt-in
prefilters, default off per BENCH/BASELINE.md "Bloom prefilter policy").
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jcrawler_spark.operators import bloom as bloom_ops

SLOTS = 4
MAX_KICKS = 500
_FP_MIX = 0x5BD1E995  # Murmur2 multiplier — spreads fp into the xor offset


def key_parts(hex64: str, n_shards: int, n_buckets: int) -> tuple[int, int, int]:
    """(shard, fingerprint, primary bucket) for one canonical url_hash.

    Independent hex ranges from the sha-256 so shard routing stays
    bit-identical to the Bloom's (bloom._hashes h1) while fp/bucket draw
    fresh bits."""
    h1 = int(hex64[0:16], 16)
    fp = (int(hex64[16:32], 16) % 0xFFFF) + 1  # 1..65535, 0 = empty slot
    i1 = int(hex64[48:64], 16) % n_buckets
    return h1 % n_shards, fp, i1


def alt_bucket(fp: int, i: int, n_buckets: int) -> int:
    return (i ^ ((fp * _FP_MIX) & 0xFFFFFFFF)) % n_buckets


class ShardedCuckoo:
    """n_shards × n_buckets × SLOTS uint16 fingerprint table + stash."""

    MAGIC = b"CKF1"
    HEADER = np.dtype("<u4")

    def __init__(self, n_shards: int = 8, n_buckets: int = 1 << 16):
        assert n_buckets & (n_buckets - 1) == 0, "n_buckets must be 2^k"
        self.n_shards = n_shards
        self.n_buckets = n_buckets
        self.arr = np.zeros((n_shards, n_buckets, SLOTS), dtype=np.uint16)
        # eviction-chain overflow parking: list of (shard, fp, bucket)
        self.stash: list[tuple[int, int, int]] = []

    # ---- core ops ----

    def _insert(self, shard: int, fp: int, i1: int) -> None:
        buckets = self.arr[shard]
        for i in (i1, alt_bucket(fp, i1, self.n_buckets)):
            row = buckets[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = fp
                return
        # evict: deterministic kick walk (reproducible crawls need no RNG)
        i, cur = i1, fp
        for kicks in range(MAX_KICKS):
            slot = (cur + kicks) % SLOTS
            cur, buckets[i][slot] = int(buckets[i][slot]), cur
            i = alt_bucket(cur, i, self.n_buckets)
            row = buckets[i]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                row[empty[0]] = cur
                return
        self.stash.append((shard, cur, i))
        # loud at 64 and at EVERY power-of-two crossing after (a single
        # warning would let a badly-undersized filter degrade silently
        # into O(stash) scans)
        n = len(self.stash)
        if n >= 64 and (n & (n - 1)) == 0:
            import warnings

            warnings.warn(
                f"cuckoo filter saturated (stash at {n}; "
                f"load={self.fill_ratio():.2f}) — resize n_buckets or "
                "switch the prefilter off (exact anti-join carries "
                "correctness either way)",
                stacklevel=3,
            )

    def add_hexes(self, hexes: Iterable[str]) -> None:
        for h in hexes:
            shard, fp, i1 = key_parts(h, self.n_shards, self.n_buckets)
            self._insert(shard, fp, i1)

    def insert_batch(self, shard: int, fps: np.ndarray, i1s: np.ndarray) -> None:
        """Merge one shard's wave increment (from build_shard_inserts)."""
        for fp, i1 in zip(fps.tolist(), i1s.tolist()):
            self._insert(shard, fp, i1)

    def contains_hexes(self, hexes: Iterable[str]) -> np.ndarray:
        hexes = list(hexes)
        n = len(hexes)
        out = np.zeros(n, dtype=bool)
        stash = self._stash_set() if self.stash else None
        for j, h in enumerate(hexes):
            shard, fp, i1 = key_parts(h, self.n_shards, self.n_buckets)
            i2 = alt_bucket(fp, i1, self.n_buckets)
            b = self.arr[shard]
            hit = bool((b[i1] == fp).any() or (b[i2] == fp).any())
            if not hit and stash is not None:
                hit = (shard, fp, min(i1, i2)) in stash
            out[j] = hit
        return out

    def _delete_one(self, shard: int, fp: int, i1: int) -> bool:
        i2 = alt_bucket(fp, i1, self.n_buckets)
        for i in (i1, i2):
            row = self.arr[shard][i]
            idx = np.flatnonzero(row == fp)
            if len(idx):
                row[idx[0]] = 0
                return True
        key = min(i1, i2)
        for si, (es, efp, ei) in enumerate(self.stash):
            if es == shard and efp == fp and (
                min(ei, alt_bucket(efp, ei, self.n_buckets)) == key
            ):
                self.stash.pop(si)
                return True
        return False

    def delete_hexes(self, hexes: Iterable[str]) -> int:
        """Remove ONE copy per hex (engine contract: delete only what was
        inserted — duplicate copies keep colliding keys' membership, so no
        false negatives are introduced). Returns the number removed."""
        removed = 0
        for h in hexes:
            shard, fp, i1 = key_parts(h, self.n_shards, self.n_buckets)
            removed += self._delete_one(shard, fp, i1)
        return removed

    def delete_batch(self, shard: int, fps: np.ndarray, i1s: np.ndarray) -> int:
        """Remove one copy per (fp, i1) key (material from
        build_shard_inserts — the engine's requeue_expired path)."""
        return sum(
            self._delete_one(shard, fp, i1)
            for fp, i1 in zip(fps.tolist(), i1s.tolist())
        )

    def _stash_set(self) -> set[tuple[int, int, int]]:
        return {
            (s, fp, min(i, alt_bucket(fp, i, self.n_buckets)))
            for s, fp, i in self.stash
        }

    # ---- stats / facade parity with GenerationalBloom ----

    def fill_ratio(self) -> float:
        return float((self.arr != 0).mean())

    def total_bytes(self) -> int:
        return self.arr.nbytes

    def maybe_grow(self) -> bool:
        """Cuckoo tables cannot grow in place (partial-key hashing loses
        the bits a rehash needs — Fan et al. §7); saturation routes to the
        stash instead. Facade no-op so the engine loop is kind-agnostic."""
        return False

    # ---- serialization (same SnapshotStore blob slot as the Bloom) ----

    def to_bytes(self) -> bytes:
        head = np.array(
            [self.n_shards, self.n_buckets, len(self.stash)], dtype=self.HEADER
        )
        stash = np.array(self.stash or [], dtype=np.int64).tobytes()
        return self.MAGIC + head.tobytes() + self.arr.tobytes() + stash

    @classmethod
    def from_bytes(cls, blob: bytes) -> "ShardedCuckoo":
        assert blob.startswith(cls.MAGIC)
        off = len(cls.MAGIC)
        n_shards, n_buckets, n_stash = (
            int(x) for x in np.frombuffer(blob[off : off + 12], dtype=cls.HEADER)
        )
        off += 12
        c = cls(n_shards, n_buckets)
        nbytes = c.arr.nbytes
        c.arr = (
            np.frombuffer(blob[off : off + nbytes], dtype=np.uint16)
            .reshape(n_shards, n_buckets, SLOTS)
            .copy()
        )
        off += nbytes
        if n_stash:
            flat = np.frombuffer(blob[off:], dtype=np.int64)[: n_stash * 3]
            c.stash = [
                (int(a), int(b), int(d)) for a, b, d in flat.reshape(n_stash, 3)
            ]
        return c


def seen_filter_from_bytes(blob: bytes):
    """Deserialize any committed seen-filter sidecar by magic: cuckoo,
    generational Bloom, or legacy single-generation Bloom."""
    if blob.startswith(ShardedCuckoo.MAGIC):
        return ShardedCuckoo.from_bytes(blob)
    return bloom_ops.bloom_from_bytes(blob)


def build_shard_inserts(
    wave_hashes: DataFrame, n_shards: int, n_buckets: int
) -> list[tuple[int, np.ndarray, np.ndarray]]:
    """Distributed key-material build (the cuckoo analogue of
    bloom.build_shard_increments): fingerprint + primary bucket are
    computed where the data is; only 6 bytes/key return per shard."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        fps = np.empty(len(pdf), dtype=np.uint16)
        i1s = np.empty(len(pdf), dtype=np.uint32)
        for j, h in enumerate(pdf["url_hash"]):
            _, fp, i1 = key_parts(h, n_shards, n_buckets)
            fps[j] = fp
            i1s[j] = i1
        return pd.DataFrame(
            {"shard": [shard], "fps": [fps.tobytes()], "i1s": [i1s.tobytes()]}
        )

    rows = (
        wave_hashes.select(
            "url_hash",
            bloom_ops.shard_col(F.col("url_hash"), n_shards).alias("shard"),
        )
        .groupBy("shard")
        .applyInPandas(build, schema="shard int, fps binary, i1s binary")
        .collect()
    )
    return [
        (
            r["shard"],
            np.frombuffer(bytes(r["fps"]), dtype=np.uint16),
            np.frombuffer(bytes(r["i1s"]), dtype=np.uint32),
        )
        for r in rows
    ]


def prefilter_unseen(
    spark: SparkSession, candidates: DataFrame, ckf, col: str = "url_hash"
) -> DataFrame:
    """Broadcast prefilter (output contract = bloom.prefilter_unseen):
    adds `maybe_seen`; exact anti-join still decides for True rows."""
    blob = spark.sparkContext.broadcast(ckf.to_bytes())

    @F.pandas_udf("boolean")
    def maybe_seen(h: pd.Series) -> pd.Series:
        c = ShardedCuckoo.from_bytes(blob.value)
        return pd.Series(c.contains_hexes(h))

    return candidates.withColumn("maybe_seen", maybe_seen(F.col(col)))


def prefilter_unseen_sharded(
    candidates: DataFrame, ckf: "ShardedCuckoo", col: str = "url_hash"
) -> DataFrame:
    """Shard-JOIN prefilter (10^10 regime): candidates cogroup with a
    (shard, table-slice, stash) table; each Arrow task probes only its own
    shard's slots — no task holds the whole filter."""
    spark = candidates.sparkSession
    n_shards, n_buckets = ckf.n_shards, ckf.n_buckets
    stash_by_shard: dict[int, list[tuple[int, int]]] = {}
    for s, fp, i in ckf.stash:
        stash_by_shard.setdefault(s, []).append((fp, i))
    rows = [
        (
            si,
            bytes(ckf.arr[si].tobytes()),
            np.array(stash_by_shard.get(si, []), dtype=np.int64).tobytes(),
        )
        for si in range(n_shards)
    ]
    shards_df = spark.createDataFrame(rows, "shard int, slots binary, stash binary")
    cand = candidates.withColumn(
        "__shard", bloom_ops.shard_col(F.col(col), n_shards)
    )
    out_schema = T.StructType(
        [f for f in cand.schema.fields if f.name != "__shard"]
        + [T.StructField("maybe_seen", T.BooleanType(), False)]
    )
    keep_cols = [f.name for f in cand.schema.fields if f.name != "__shard"]

    def probe(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(cand_pdf) == 0:
            return pd.DataFrame(columns=keep_cols + ["maybe_seen"])
        seen = np.zeros(len(cand_pdf), dtype=bool)
        if len(shard_pdf):
            srow = shard_pdf.iloc[0]
            slots = np.frombuffer(bytes(srow["slots"]), dtype=np.uint16).reshape(
                n_buckets, SLOTS
            )
            stash_flat = np.frombuffer(bytes(srow["stash"]), dtype=np.int64)
            stash = {
                (int(fp), min(int(i), alt_bucket(int(fp), int(i), n_buckets)))
                for fp, i in stash_flat.reshape(-1, 2)
            }
            for j, h in enumerate(cand_pdf[col]):
                _, fp, i1 = key_parts(h, n_shards, n_buckets)
                i2 = alt_bucket(fp, i1, n_buckets)
                hit = bool((slots[i1] == fp).any() or (slots[i2] == fp).any())
                if not hit and stash:
                    hit = (fp, min(i1, i2)) in stash
                seen[j] = hit
        out = cand_pdf[keep_cols].copy()
        out["maybe_seen"] = seen
        return out

    return (
        cand.groupBy("__shard")
        .cogroup(shards_df.groupBy("shard"))
        .applyInPandas(probe, schema=out_schema)
    )


def prefilter_auto(
    spark: SparkSession, candidates: DataFrame, ckf, col: str = "url_hash"
) -> DataFrame:
    """Broadcast below bloom.BROADCAST_BLOOM_MAX_BYTES, shard-join above
    (same crossover policy as the Bloom — one knob to reason about)."""
    if ckf.total_bytes() > bloom_ops.BROADCAST_BLOOM_MAX_BYTES:
        return prefilter_unseen_sharded(candidates, ckf, col)
    return prefilter_unseen(spark, candidates, ckf, col)
