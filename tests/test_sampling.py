"""Deterministic stratified sampling (operators/sampling.py): exact
portability is covered by the `stratified_sample` oracle; these pin the
operator-level contract — determinism, cap-derived rates, the map-only
plan, and salt decorrelation."""

from __future__ import annotations

from pyspark.sql import functions as F

from jcrawler_spark.operators import sampling


def _docs(spark, n=400, strata=4):
    return spark.createDataFrame(
        [(f"https://h{i % strata}.example/{i}", f"s{i % strata}") for i in range(n)],
        "url string, stratum string",
    )


def test_sample_deterministic_and_rate_accurate(spark):
    df = _docs(spark)
    rates = {"s0": 0.0, "s1": 0.25, "s2": 1.0}
    a = sampling.stratified_sample(df, rates, "stratum", default_rate=0.5)
    b = sampling.stratified_sample(df, rates, "stratum", default_rate=0.5)
    ka = sorted(r["url"] for r in a.collect())
    assert ka == sorted(r["url"] for r in b.collect())  # rerun-identical
    counts = {
        r["stratum"]: r["count"]
        for r in a.groupBy("stratum").count().collect()
    }
    assert counts.get("s0", 0) == 0            # rate 0 drops all
    assert counts["s2"] == 100                  # rate 1 keeps all
    assert 10 <= counts.get("s1", 0) <= 40      # ~25 of 100
    assert 30 <= counts.get("s3", 0) <= 70      # default 0.5 → ~50


def test_rates_for_cap(spark):
    df = _docs(spark, n=300, strata=3)  # 100 per stratum
    rates = sampling.rates_for_cap(df, "stratum", cap=25)
    assert rates == {"s0": 0.25, "s1": 0.25, "s2": 0.25}
    rates = sampling.rates_for_cap(df, "stratum", cap=1000)
    assert all(v == 1.0 for v in rates.values())
    kept = sampling.stratified_sample(
        df, sampling.rates_for_cap(df, "stratum", cap=25), "stratum"
    )
    n = kept.count()
    assert 40 <= n <= 115  # E[n]=75 across three 100-doc strata


def test_sample_plan_is_map_only(spark):
    """The 100 TB contract: no Exchange anywhere — broadcast rate table
    plus a Column predicate."""
    df = _docs(spark)
    out = sampling.stratified_sample(
        df, {"s0": 0.5, "s1": 0.2}, "stratum", default_rate=1.0
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rate table's BroadcastExchange is the point; what must NOT
    # appear is a shuffle of the corpus side
    assert "Exchange" not in plan.replace("BroadcastExchange", ""), plan
    assert "BroadcastHashJoin" in plan, plan


def test_salt_decorrelates(spark):
    df = _docs(spark)
    a = {r["url"] for r in sampling.stratified_sample(
        df, {}, "stratum", default_rate=0.5, salt="a").collect()}
    b = {r["url"] for r in sampling.stratified_sample(
        df, {}, "stratum", default_rate=0.5, salt="b").collect()}
    assert a != b                       # different salts → different samples
    inter = len(a & b)
    assert 0 < inter < min(len(a), len(b))  # overlapping but independent


def test_empty_rates_fast_paths(spark):
    df = _docs(spark, n=50)
    assert sampling.stratified_sample(df, {}, "stratum").count() == 50
    assert (
        sampling.stratified_sample(df, {}, "stratum", default_rate=0.0).count()
        == 0
    )
