"""asof_join unit tests: directions, strictness, tolerance, tie-breaks,
left semantics — verified against a brute-force per-row pick."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.operators.joins import asof_join


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, _ts(20), "L2"), (2, _ts(15), "L3"),
         (3, _ts(5), "L4")],
        schema="k bigint, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100, "a"), (1, _ts(10), 101, "b"), (1, _ts(18), 102, "c"),
         (2, _ts(40), 103, "d"), (9, _ts(1), 104, "e")],
        schema="k bigint, ts timestamp, rid bigint, val string",
    )
    return left, right


def brute(left_rows, right_rows, direction, strict, tol_min=None):
    out = {}
    for k, lts, lbl in left_rows:
        cands = []
        for rk, rts, rid, val in right_rows:
            if rk != k:
                continue
            if direction == "backward":
                ok = rts < lts if strict else rts <= lts
                if ok and (tol_min is None or (lts - rts).total_seconds() <= 60 * tol_min):
                    cands.append((rts, rid, val))
            else:
                ok = rts > lts if strict else rts >= lts
                if ok and (tol_min is None or (rts - lts).total_seconds() <= 60 * tol_min):
                    cands.append((rts, rid, val))
        if direction == "backward":
            pick = max(cands) if cands else None  # latest ts, then max rid
        else:
            pick = min(cands) if cands else None  # earliest ts, then min rid
        out[lbl] = pick and pick[1]
    return out


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("strict", [False, True])
def test_asof_matches_bruteforce(spark, frames, direction, strict):
    left, right = frames
    lrows = [(r["k"], r["ts"], r["lbl"]) for r in left.collect()]
    rrows = [(r["k"], r["ts"], r["rid"], r["val"]) for r in right.collect()]
    got = {
        r["lbl"]: r["rid"]
        for r in asof_join(
            left, right, on="ts", by=["k"], direction=direction,
            strict=strict, tiebreak="rid",
        ).collect()
    }
    assert got == brute(lrows, rrows, direction, strict)
    # LEFT semantics: every left row present exactly once
    assert len(got) == len(lrows)


def test_asof_tolerance_nullifies_distant_matches(spark, frames):
    left, right = frames
    out = {
        r["lbl"]: r["rid"]
        for r in asof_join(
            left, right, on="ts", by=["k"], tolerance="5 minutes",
            tiebreak="rid",
        ).collect()
    }
    lrows = [(r["k"], r["ts"], r["lbl"]) for r in left.collect()]
    rrows = [(r["k"], r["ts"], r["rid"], r["val"]) for r in right.collect()]
    assert out == brute(lrows, rrows, "backward", False, tol_min=5)
    # L2 (10:20) is 10 min past rid 102 (10:18)? no — 2 min: kept; L1 at
    # 10:10 matches the equal-time pair (max rid 101)
    assert out["L1"] == 101 and out["L2"] == 102


def test_asof_null_timestamps_never_match(spark):
    """A right row with NULL ts must not become a phantom match (NULLS
    FIRST would put its payload at the frame start), and a left row with
    NULL ts keeps its row with a NULL match in BOTH directions."""
    left = spark.createDataFrame(
        [(1, _ts(10), "L1"), (1, None, "Lnull")],
        schema="k bigint, ts timestamp, lbl string",
    )
    right = spark.createDataFrame(
        [(1, None, 900, "phantom"), (1, _ts(5), 901, "real")],
        schema="k bigint, ts timestamp, rid bigint, val string",
    )
    for direction, want_l1 in (("backward", 901), ("forward", None)):
        got = {
            r["lbl"]: r["rid"]
            for r in asof_join(
                left, right, on="ts", by=["k"], direction=direction,
                tiebreak="rid",
            ).collect()
        }
        assert got == {"L1": want_l1, "Lnull": None}, (direction, got)
    # only-NULL right rows: no match at all, never the phantom
    got = asof_join(
        left, right.filter(F.col("rid") == 900), on="ts", by=["k"],
    ).collect()
    assert all(r["rid"] is None for r in got) and len(got) == 2


def test_asof_empty_by_warns_about_global_window(spark, frames):
    import warnings

    left, right = frames
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        asof_join(left, right, on="ts", tiebreak="rid")
    assert any("single-partition" in str(x.message) for x in w)


def test_asof_attaches_suffixed_columns_and_guards(spark, frames):
    left, right = frames
    out = asof_join(left, right, on="ts", by=["k"], tiebreak="rid")
    assert set(out.columns) == {"k", "ts", "lbl", "ts_right", "rid", "val"}
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="ts", direction="nearest")
    with pytest.raises(ValueError, match="reserves"):
        asof_join(left.withColumn("_asof_kind", F.lit(1)), right, on="ts")


def test_asof_join_registry_step(spark, frames):
    from ominimo_dynamic_data_pipeline_spark.operators.registry import (
        CompileContext,
        apply_transformations,
    )

    left, right = frames
    ctx = CompileContext(spark, frames={"trades": left, "quotes": right})
    out = apply_transformations(ctx, {"transformations": [
        {"name": "priced", "type": "asof_join",
         "params": {"input": "trades", "right": "quotes", "on": "ts",
                    "by": ["k"], "tiebreak": "rid"}},
    ]})["priced"]
    direct = asof_join(left, right, on="ts", by=["k"], tiebreak="rid")
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, direct.collect())
    )
    with pytest.raises(ValueError, match="params.right"):
        apply_transformations(
            CompileContext(spark, frames={"trades": left}),
            {"transformations": [
                {"name": "x", "type": "asof_join",
                 "params": {"input": "trades"}},
            ]},
        )


def test_asof_single_exchange_plan(spark, frames):
    # the whole join must cost ONE hash exchange (the by-key window) —
    # no join node, no per-side shuffles
    left, right = frames
    out = asof_join(left, right, on="ts", by=["k"], tiebreak="rid")
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "Join" not in p
    assert p.count("Exchange hashpartitioning") == 1


from ominimo_dynamic_data_pipeline_spark.operators.joins import (  # noqa: E402
    interval_overlap_join,
    point_in_interval_join,
)


@pytest.fixture(scope="module")
def iv_frames(spark):
    pts = spark.createDataFrame(
        [(1, 5, "P1"), (1, 17, "P2"), (2, 10, "P3"), (1, None, "P4")],
        schema="k bigint, v bigint, lbl string",
    )
    ivs = spark.createDataFrame(
        [(1, 0, 10, "A"), (1, 5, 5, "B"), (1, 16, 40, "C"),
         (2, 30, 20, "D"), (2, None, 50, "E"), (3, 0, 99, "F")],
        schema="k bigint, lo bigint, hi bigint, tag string",
    )
    return pts, ivs


@pytest.mark.parametrize("bin_size", [1, 3, 7, 1000])
def test_interval_join_matches_bruteforce_any_bin(spark, iv_frames, bin_size):
    """Pairs are bin-size INDEPENDENT (binning is an execution detail),
    each emitted exactly once; NULL and inverted intervals drop."""
    pts, ivs = iv_frames
    got = sorted(
        (r["lbl"], r["tag"])
        for r in point_in_interval_join(
            pts, ivs, "v", "lo", "hi", by=["k"], bin_size=bin_size
        ).collect()
    )
    want = sorted(
        (p["lbl"], i["tag"])
        for p in pts.collect()
        for i in ivs.collect()
        if p["k"] == i["k"]
        and None not in (p["v"], i["lo"], i["hi"])
        and i["lo"] <= i["hi"]
        and i["lo"] <= p["v"] <= i["hi"]
    )
    assert got == want == [("P1", "A"), ("P1", "B"), ("P2", "C")]


def test_interval_join_dates_and_guards(spark):
    import datetime as dt

    pts = spark.createDataFrame(
        [(1, dt.date(2024, 1, 15))], schema="k bigint, d date"
    )
    ivs = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), dt.date(2024, 1, 31), "jan"),
         (1, dt.date(2024, 2, 1), dt.date(2024, 2, 28), "feb")],
        schema="k bigint, lo date, hi date, tag string",
    )
    got = point_in_interval_join(
        pts, ivs, "d", "lo", "hi", by=["k"], bin_size=10
    ).collect()
    assert [r["tag"] for r in got] == ["jan"]
    with pytest.raises(ValueError, match="positive"):
        point_in_interval_join(pts, ivs, "d", "lo", "hi", bin_size=0)
    with pytest.raises(ValueError, match="unsupported"):
        point_in_interval_join(
            pts.withColumn("d", F.lit("x")), ivs, "d", "lo", "hi"
        )


def test_interval_join_bin_budget_raises_loudly(spark, iv_frames):
    """A pathological interval (sentinel end value vs a tiny bin) must
    fail with the named knob, not OOM a task on a billion-row explode."""
    pts, _ = iv_frames
    ivs = spark.createDataFrame(
        [(1, 0, 10_000_000, "sentinel")],
        schema="k bigint, lo bigint, hi bigint, tag string",
    )
    out = point_in_interval_join(
        pts, ivs, "v", "lo", "hi", by=["k"], bin_size=1,
        max_bins_per_interval=1000,
    )
    with pytest.raises(Exception, match="max_bins_per_interval"):
        out.collect()
    # same data under a sane bin size passes
    ok = point_in_interval_join(
        pts, ivs, "v", "lo", "hi", by=["k"], bin_size=100_000,
        max_bins_per_interval=1000,
    )
    assert sorted(r["lbl"] for r in ok.collect()) == ["P1", "P2"]  # P3 is k=2


def test_interval_join_registry_step(spark, iv_frames):
    from ominimo_dynamic_data_pipeline_spark.operators.registry import (
        CompileContext,
        apply_transformations,
    )

    pts, ivs = iv_frames
    ctx = CompileContext(spark, frames={"pts": pts, "ivs": ivs})
    out = apply_transformations(ctx, {"transformations": [
        {"name": "hits", "type": "interval_join",
         "params": {"input": "pts", "intervals": "ivs", "point_col": "v",
                    "start_col": "lo", "end_col": "hi", "by": ["k"],
                    "bin_size": 5}},
    ]})["hits"]
    assert sorted((r["lbl"], r["tag"]) for r in out.collect()) == [
        ("P1", "A"), ("P1", "B"), ("P2", "C")
    ]
    with pytest.raises(ValueError, match="requires params"):
        apply_transformations(
            CompileContext(spark, frames={"pts": pts}),
            {"transformations": [
                {"name": "x", "type": "interval_join",
                 "params": {"input": "pts", "point_col": "v"}},
            ]},
        )


def test_normalize_unicode_registry_step(spark):
    from ominimo_dynamic_data_pipeline_spark.operators.registry import (
        CompileContext,
        apply_transformations,
    )

    df = spark.createDataFrame([("café",)], schema="t string")
    ctx = CompileContext(spark, frames={"docs": df})
    out = apply_transformations(ctx, {"transformations": [
        {"name": "clean", "type": "normalize_unicode",
         "params": {"input": "docs", "columns": ["t"]}},
    ]})["clean"]
    assert out.collect()[0]["t"] == "café"
    with pytest.raises(ValueError, match="unknown columns"):
        apply_transformations(
            CompileContext(spark, frames={"docs": df}),
            {"transformations": [
                {"name": "x", "type": "normalize_unicode",
                 "params": {"input": "docs", "columns": ["nope"]}},
            ]},
        )


def test_pit_feature_example_dataflow(spark):
    """The shipped pit-feature-retrieval dataflow compiles and its
    strict as-of bound never attaches a same-day (leaky) feature row."""
    import json
    from pathlib import Path

    from ominimo_dynamic_data_pipeline_spark.config import select_dataflow
    from ominimo_dynamic_data_pipeline_spark.pipeline import (
        compile_dataflow,
        run_dataflow,
    )

    meta = json.loads(
        (Path(__file__).parent.parent / "examples" / "feature_retrieval.json")
        .read_text()
    )
    flow = select_dataflow(meta, "pit-feature-retrieval")
    compiled = compile_dataflow(spark, flow)
    run_dataflow(compiled, write=False)
    rows = compiled.frames["training_rows"]
    assert rows.count() > 0
    leaks = rows.filter(F.col("day_feat") >= F.col("day")).count()
    assert leaks == 0


def test_interval_join_plan_is_equi_not_nested_loop(spark, iv_frames):
    pts, ivs = iv_frames
    out = point_in_interval_join(pts, ivs, "v", "lo", "hi", by=["k"])
    p = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "simple"
    )
    assert "NestedLoop" not in p and "Cartesian" not in p


def test_interval_joins_reject_unresolvable_suffix_collisions(spark):
    """A suffixed right-column rename that still collides with a left
    column must fail fast with the suffix knob named, not emit ambiguous
    duplicate output columns."""
    left = spark.createDataFrame(
        [(1, 5, "L")], schema="k bigint, v bigint, lbl string"
    )
    ivs = spark.createDataFrame(
        [(1, 0, 10, 7)], schema="k bigint, lo bigint, hi bigint, v bigint"
    )  # interval side's 'v' collides with the point column -> v_iv
    ok = point_in_interval_join(left, ivs, "v", "lo", "hi", by=["k"], bin_size=5)
    assert "v_iv" in ok.columns  # plain rename works
    with pytest.raises(ValueError, match="pick another suffix"):
        point_in_interval_join(
            left.withColumn("v_iv", F.lit(1)),  # the rename target is taken
            ivs, "v", "lo", "hi", by=["k"], bin_size=5,
        )


def test_asof_suffix_collision_fails_fast_with_clear_error(spark):
    """Right side carrying BOTH `v` and `v_right` against a left `v`:
    the rename of right `v` -> `v_right` collides with the sibling right
    column, which previously surfaced as an opaque Catalyst
    AMBIGUOUS_REFERENCE AnalysisException; now the shared _suffixed_names
    helper raises the same clear ValueError the interval joins use."""
    left = spark.createDataFrame(
        [(1, _ts(10), 5)], schema="k bigint, ts timestamp, v bigint"
    )
    right = spark.createDataFrame(
        [(1, _ts(5), 7, 8)],
        schema="k bigint, ts timestamp, v bigint, v_right bigint",
    )
    with pytest.raises(ValueError, match="pick another suffix"):
        asof_join(left, right, on="ts", by=["k"])
    ok = asof_join(left, right, on="ts", by=["k"], suffix="_q")
    assert {"v_q", "v_right", "ts_q"} <= set(ok.columns)


def test_interval_joins_reject_mixed_type_families(spark):
    """Numeric points against timestamp interval bounds (and numeric
    left intervals against date right intervals) must raise the
    operator's own ValueError naming both columns, not a raw Catalyst
    DATATYPE_MISMATCH at analysis."""
    pts = spark.createDataFrame([(1, 5)], schema="k bigint, v bigint")
    ivs_ts = spark.createDataFrame(
        [(1, _ts(0), _ts(10))], schema="k bigint, lo timestamp, hi timestamp"
    )
    with pytest.raises(ValueError, match="point_in_interval_join.*'lo'"):
        point_in_interval_join(pts, ivs_ts, "v", "lo", "hi", by=["k"])

    num_iv = spark.createDataFrame(
        [(1, 0, 10)], schema="k bigint, s bigint, e bigint"
    )
    date_iv = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), dt.date(2024, 1, 9))],
        schema="k bigint, s2 date, e2 date",
    )
    with pytest.raises(ValueError, match="interval_overlap_join.*'s2'"):
        interval_overlap_join(num_iv, date_iv, "s", "e", "s2", "e2", by=["k"])
    # mixed WITHIN a side fails too (numeric start, date end)
    bad_end = num_iv.withColumn("e", F.lit(dt.date(2024, 1, 9)))
    with pytest.raises(ValueError, match="point_in_interval_join.*'e'"):
        point_in_interval_join(pts, bad_end, "v", "s", "e", by=["k"])


def test_concurrent_orders_example_dataflow(spark):
    """The shipped concurrent-order-spans dataflow (round-5 verdict item
    7: interval_overlap_join reachable from an example) compiles, runs,
    and every emitted pair genuinely overlaps with a < b dedup order."""
    import json
    from pathlib import Path

    from ominimo_dynamic_data_pipeline_spark.config import select_dataflow
    from ominimo_dynamic_data_pipeline_spark.pipeline import (
        compile_dataflow,
        run_dataflow,
    )

    meta = json.loads(
        (Path(__file__).parent.parent / "examples" / "concurrent_orders.json")
        .read_text()
    )
    flow = select_dataflow(meta, "concurrent-order-spans")
    compiled = compile_dataflow(spark, flow)
    run_dataflow(compiled, write=False)
    pairs = compiled.frames["concurrent_pairs"]
    sample = pairs.limit(200).collect()
    assert len(sample) > 0
    for r in sample:
        assert r["orderkey"] < r["orderkey_b"]
        assert r["start_d"] <= r["end_d_b"] and r["start_d_b"] <= r["end_d"]
