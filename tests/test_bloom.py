"""Bloom-filter operator tests (operators/bloom.py): no false negatives,
bounded false-positive rate at the documented sizing, prefilter+exact-join
equivalence to a plain semi join, and a broadcast-only probe-side plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
)
from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table
from tests.test_plans import plan_of


def test_bloom_has_no_false_negatives(spark):
    keys = spark.range(0, 2000).select((F.col("id") * 7 + 13).alias("k"))
    bloom = bloom_build(keys, "k")
    kept = bloom_prefilter(keys, "k", bloom)
    # every inserted key must pass the probe
    assert kept.count() == 2000


def test_bloom_false_positive_rate_bounded(spark):
    build = spark.range(0, 2000).select(F.col("id").alias("k"))
    bloom = bloom_build(build, "k")
    # 20k keys guaranteed absent from the build set
    probe = spark.range(100000, 120000).select(F.col("id").alias("k"))
    fp = bloom_prefilter(probe, "k", bloom).count()
    # m=65536 bits, k=3 hashes, n=2000 -> theoretical FPR ~0.07%; assert an
    # order-of-magnitude slack so the test pins the mechanism, not the RNG
    assert fp / 20000 < 0.01


def test_bloom_prefilter_plus_exact_join_equals_semi_join(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 200000)
        .select("o_orderkey")
    )
    expected = (
        l.join(big, l["l_orderkey"] == big["o_orderkey"], "left_semi")
        .count()
    )
    candidates = bloom_prefilter(l, "l_orderkey", bloom_build(big, "o_orderkey"))
    got = candidates.join(
        F.broadcast(big), candidates["l_orderkey"] == big["o_orderkey"], "left_semi"
    ).count()
    assert got == expected


def test_bloom_probe_side_has_no_shuffle(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    big = load_table(spark, sf_dir, "orders").select("o_orderkey").limit(100)
    plan = plan_of(bloom_prefilter(l, "l_orderkey", bloom_build(big, "o_orderkey")))
    # the probe side sees only a BroadcastNestedLoopJoin against the one-row
    # packed filter (the bit-test condition folds into the join) — any
    # Exchange on l_orderkey would mean the fact table is being shuffled
    # just to be prefiltered
    assert "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan
