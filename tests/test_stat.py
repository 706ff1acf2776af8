"""df.stat surface: approxQuantile honors its error bound against the exact
percentile, freqItems finds an injected heavy hitter, sampleBy respects
per-stratum fractions.  These are the approximate counterparts of the exact
stats operators (operators/stats.py) for the 100 TB posture, where exact
percentiles/distinct counts are a full sort/shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table


def test_approx_quantile_within_declared_error(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    rel_err = 0.01
    approx = o.stat.approxQuantile("o_totalprice", [0.5], rel_err)[0]
    n = o.count()
    # the guarantee is on rank error: the returned value's rank must lie
    # within (0.5 +/- rel_err) * n
    rank = o.filter(F.col("o_totalprice") <= approx).count()
    assert abs(rank - 0.5 * n) <= rel_err * n + 1


def test_freq_items_finds_injected_heavy_hitter(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_custkey")
    hot = spark.range(0, o.count()).select(F.lit(-7).alias("o_custkey"))
    skewed = o.unionByName(hot)  # -7 now holds >= 50% of all rows
    items = skewed.stat.freqItems(["o_custkey"], support=0.3).collect()[0][0]
    assert -7 in items


def test_sample_by_respects_stratum_fractions(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    fractions = {"F": 0.5, "O": 0.1, "P": 1.0}
    sampled = o.stat.sampleBy("o_orderstatus", fractions, seed=42)
    got = {r["o_orderstatus"]: r["n"] for r in
           sampled.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["o_orderstatus"]: r["n"] for r in
            o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n")).collect()}
    for status, frac in fractions.items():
        if full.get(status, 0) < 50:
            continue  # too small to assert a ratio
        ratio = got.get(status, 0) / full[status]
        assert abs(ratio - frac) < 0.15, (status, ratio, frac)


def test_observed_stats_match_dedicated_pass(spark, sf_dir, tmp_path):
    from ominimo_dynamic_data_pipeline_spark.operators.stats import (
        compute_field_stats,
        observe_field_stats,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("o_orderdate"),
        "o_orderstatus",
    )
    observed, finish = observe_field_stats(o)
    # the metrics ride along with the sink action — no dedicated stats job
    observed.write.mode("overwrite").format("noop").save()
    doc = finish()
    expected = compute_field_stats(o, approx=True)
    assert doc == expected
    assert doc["total_records"] > 0
    assert doc["fields"]["o_totalprice"]["null_count"] == 0
    assert "min_date" in doc["fields"]["o_orderdate"]


def test_cusum_changepoint_registry_step(spark):
    """cusum_changepoint registers as a transformation type, matches its
    direct-call twin, and fails fast on missing params."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from ominimo_dynamic_data_pipeline_spark.operators.features import (
        cusum_changepoint,
    )
    from ominimo_dynamic_data_pipeline_spark.operators.registry import (
        CompileContext,
        apply_transformations,
    )

    rows = [("a", t, x) for t, x in enumerate([5, 5, 5, 20, 20, 20])]
    df = spark.createDataFrame(rows, schema="g string, t bigint, x bigint")
    out = apply_transformations(
        CompileContext(spark, frames={"s": df}),
        {"transformations": [
            {"name": "cp", "type": "cusum_changepoint",
             "params": {"input": "s", "group_col": "g",
                        "time_col": "t", "value_col": "x"}},
        ]},
    )
    got = out["cp"].collect()
    want = cusum_changepoint(df, "g", "t", "x").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    # the level shifts UP after t=2 -> changepoint there, direction -1
    assert got[0]["changepoint"] == 2 and got[0]["direction"] == -1
    with pytest.raises(ValueError, match="value_col"):
        apply_transformations(
            CompileContext(spark, frames={"s": df}),
            {"transformations": [
                {"name": "cp", "type": "cusum_changepoint",
                 "params": {"input": "s", "group_col": "g",
                            "time_col": "t"}},
            ]},
        )


def test_cusum_changepoint_rejects_bad_values(spark):
    """Non-integral value columns fail eagerly (silent truncation would
    shift the argmax); NULL values raise at execution, loudly."""
    import pytest

    from ominimo_dynamic_data_pipeline_spark.operators.features import (
        cusum_changepoint,
    )

    dbl = spark.createDataFrame(
        [("a", 0, 1.5)], schema="g string, t bigint, x double"
    )
    with pytest.raises(ValueError, match="must be integral"):
        cusum_changepoint(dbl, "g", "t", "x")
    withnull = spark.createDataFrame(
        [("a", 0, 1), ("a", 1, None)], schema="g string, t bigint, x bigint"
    )
    with pytest.raises(Exception, match="NULL in value_col"):
        cusum_changepoint(withnull, "g", "t", "x").collect()
