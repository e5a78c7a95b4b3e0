"""Unit tests for the partitioned Bloom seen-prefilter (operators/bloom.py)."""

from __future__ import annotations

import hashlib

import numpy as np

from jcrawler_spark.operators import bloom


def _hx(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_no_false_negatives():
    b = bloom.ShardedBloom(n_shards=4, m_bits=1 << 14, k=5)
    keys = [_hx(f"u{i}") for i in range(2000)]
    b.add_hexes(keys)
    assert bool(b.contains_hexes(keys).all())


def test_false_positive_rate_reasonable():
    b = bloom.ShardedBloom(n_shards=4, m_bits=1 << 16, k=5)
    b.add_hexes(_hx(f"u{i}") for i in range(2000))
    probes = [_hx(f"other{i}") for i in range(5000)]
    fp = float(b.contains_hexes(probes).mean())
    assert fp < 0.05, fp


def test_serialization_roundtrip():
    b = bloom.ShardedBloom(n_shards=3, m_bits=1 << 12, k=4)
    b.add_hexes([_hx("a"), _hx("b")])
    b2 = bloom.ShardedBloom.from_bytes(b.to_bytes())
    assert b2.n_shards == 3 and b2.m_bits == 1 << 12 and b2.k == 4
    assert np.array_equal(b.arr, b2.arr)
    assert bool(b2.contains_hexes([_hx("a")]).all())
    assert not b2.contains_hexes([_hx("zzz")]).any()


def test_shard_merge_equals_direct_add():
    direct = bloom.ShardedBloom(n_shards=4, m_bits=1 << 12, k=3)
    keys = [_hx(f"k{i}") for i in range(500)]
    direct.add_hexes(keys)

    merged = bloom.ShardedBloom(n_shards=4, m_bits=1 << 12, k=3)
    per_shard: dict[int, list[str]] = {}
    for kx in keys:
        s, _ = bloom.positions(kx, 4, 1 << 12, 3)
        per_shard.setdefault(s, []).append(kx)
    for s, ks in per_shard.items():
        tmp = np.zeros((1 << 12) // 8, dtype=np.uint8)
        for kx in ks:
            _, pos = bloom.positions(kx, 4, 1 << 12, 3)
            np.bitwise_or.at(tmp, pos // 8, (1 << (pos % 8)).astype(np.uint8))
        merged.merge_shard(s, tmp.tobytes())
    assert np.array_equal(direct.arr, merged.arr)


def test_spark_build_and_prefilter(spark):
    from pyspark.sql import functions as F

    keys = [(_hx(f"u{i}"),) for i in range(300)]
    df = spark.createDataFrame(keys, ["url_hash"])
    b = bloom.ShardedBloom(n_shards=4, m_bits=1 << 14, k=5)
    for shard, bitmap in bloom.build_shard_increments(df, 4, 1 << 14, 5):
        b.merge_shard(shard, bitmap)
    # distributed build == local build
    local = bloom.ShardedBloom(4, 1 << 14, 5)
    local.add_hexes(k[0] for k in keys)
    assert np.array_equal(b.arr, local.arr)

    probes = spark.createDataFrame(
        keys[:10] + [(_hx(f"new{i}"),) for i in range(10)], ["url_hash"]
    )
    out = bloom.prefilter_unseen(spark, probes, b).collect()
    seen_flags = {r["url_hash"]: r["maybe_seen"] for r in out}
    for (k,) in keys[:10]:
        assert seen_flags[k] is True  # no false negatives
    fresh = [r for r in out if not r["maybe_seen"]]
    assert len(fresh) >= 8  # at most a couple of false positives


def test_jvm_shard_col_matches_python(spark):
    from pyspark.sql import functions as F

    keys = [(_hx(f"s{i}"),) for i in range(100)]
    df = spark.createDataFrame(keys, ["url_hash"])
    got = df.select(
        "url_hash", bloom.shard_col(F.col("url_hash"), 7).alias("shard")
    ).collect()
    for r in got:
        exp, _ = bloom.positions(r["url_hash"], 7, 1 << 10, 3)
        assert r["shard"] == exp


def test_generational_growth_and_membership(spark):
    from jcrawler_spark.operators.bloom import GenerationalBloom
    import warnings

    import hashlib

    b = GenerationalBloom(n_shards=2, m_bits=256, k=3, grow_at_fill=0.3)
    first = [hashlib.sha256(f"k{i}".encode()).hexdigest() for i in range(60)]
    b.add_hexes(first)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        grew = b.maybe_grow()
    assert grew and len(b.generations) == 2
    assert any("saturated" in str(x.message) for x in w)
    assert b.current.m_bits == 1024  # 4x growth
    second = [hashlib.sha256(f"k{i}".encode()).hexdigest() for i in range(60, 90)]
    b.add_hexes(second)  # go to the NEW generation
    # membership spans generations; no false negatives ever
    assert b.contains_hexes(first).all()
    assert b.contains_hexes(second).all()
    # roundtrip
    b2 = GenerationalBloom.from_bytes(b.to_bytes())
    assert len(b2.generations) == 2
    assert b2.contains_hexes(first).all() and b2.contains_hexes(second).all()


def test_legacy_blob_roundtrip():
    from jcrawler_spark.operators.bloom import GenerationalBloom, ShardedBloom

    old = ShardedBloom(2, 256, 3)
    old.add_hexes([f"{i:064x}" for i in range(10)])
    b = GenerationalBloom.from_bytes(old.to_bytes())
    assert len(b.generations) == 1
    assert b.contains_hexes([f"{i:064x}" for i in range(10)]).all()


def test_sharded_prefilter_matches_broadcast(spark):
    from jcrawler_spark.operators import bloom as bloom_ops
    from jcrawler_spark.operators.bloom import GenerationalBloom
    import hashlib

    b = GenerationalBloom(n_shards=4, m_bits=2048, k=3, grow_at_fill=0.9)
    seen_hashes = [hashlib.sha256(f"u{i}".encode()).hexdigest() for i in range(200)]
    b.add_hexes(seen_hashes)
    b.maybe_grow()
    probe = seen_hashes[:50] + [
        hashlib.sha256(f"new{i}".encode()).hexdigest() for i in range(50)
    ]
    df = spark.createDataFrame([(h,) for h in probe], ["url_hash"])
    via_bcast = {
        r["url_hash"]: r["maybe_seen"]
        for r in bloom_ops.prefilter_unseen(spark, df, b).collect()
    }
    via_shard = {
        r["url_hash"]: r["maybe_seen"]
        for r in bloom_ops.prefilter_unseen_sharded(df, b).collect()
    }
    assert via_bcast == via_shard
    # all genuinely-seen rows flagged (no false negatives)
    for h in seen_hashes[:50]:
        assert via_bcast[h] is True
