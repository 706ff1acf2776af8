"""Tests for normalize_fields: coalesce priority, plan-time source pruning,
auto-flatten discovery, naming conventions (SURVEY.md §2.2 T1)."""

from __future__ import annotations

import pytest

from ominimo_dynamic_data_pipeline_spark.operators.normalize import (
    flatten_name,
    normalize_fields,
    path_exists,
    resolve_field_mappings,
    struct_leaf_paths,
)


def test_flatten_name_conventions():
    assert flatten_name("a.b.c", "snake_case") == "a_b_c"
    assert flatten_name("a.b.c", "keep_dot") == "a.b.c"
    assert flatten_name("driver.age", "camelCase") == "driverAge"
    assert flatten_name("a.b.c", "camelCase") == "aBC"
    with pytest.raises(ValueError, match="naming convention"):
        flatten_name("a.b", "SCREAMING")


def test_coalesce_priority_and_pruning(spark):
    df = spark.createDataFrame(
        [("flat", "alt")], schema="plate_number string, vehicle_plate string"
    )
    out = normalize_fields(
        df,
        [
            {
                "name": "plate",
                "sources": ["missing_col", "plate_number", "vehicle_plate"],
            }
        ],
    )
    assert out.collect()[0]["plate"] == "flat"  # first EXISTING source wins


def test_chained_mapping_is_rejected_loudly(spark):
    # a later mapping sourcing an earlier TARGET would silently read the
    # pre-normalization value (single-projection semantics) — refuse it.
    import pytest

    df = spark.createDataFrame([("x", "y")], schema="a string, b string")
    with pytest.raises(ValueError, match="does not chain"):
        normalize_fields(
            df,
            [
                {"name": "first", "sources": ["a"]},
                {"name": "second", "sources": ["first", "b"]},
            ],
        )


def test_fully_missing_target_skipped(spark):
    df = spark.createDataFrame([("x",)], schema="a string")
    out = normalize_fields(df, [{"name": "t", "sources": ["nope", "also.nope"]}])
    assert out.columns == ["a"]


def test_nested_auto_append_to_declared(spark):
    df = spark.read.json(
        spark.sparkContext.parallelize(
            [
                '{"plate_number": "TOP-111"}',
                '{"vehicle": {"plate": "NEST-222"}}',
            ]
        )
    )
    out = normalize_fields(
        df, [{"name": "vehicle_plate", "sources": []}]  # matches flattened leaf
    )
    vals = {r["vehicle_plate"] for r in out.collect()}
    assert "NEST-222" in vals  # discovered vehicle.plate appended as a source


def test_auto_generated_mapping_for_undeclared_leaf(spark):
    df = spark.read.json(
        spark.sparkContext.parallelize(
            ['{"driver": {"age": 45}}', '{"driver_age": 30}']
        )
    )
    out = normalize_fields(df, [])
    got = {r["driver_age"] for r in out.collect()}
    assert got == {45, 30}  # coalesce(driver.age, driver_age)


def test_deep_nesting_discovery():
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(
                "a",
                StructType(
                    [
                        StructField("b", StructType([StructField("c", LongType())])),
                        StructField("d", LongType()),
                    ]
                ),
            ),
            StructField("top", LongType()),
        ]
    )
    assert struct_leaf_paths(schema) == ["a.b.c", "a.d"]
    assert path_exists(schema, "a.b.c")
    assert path_exists(schema, "top")
    assert not path_exists(schema, "a.b.x")
    assert not path_exists(schema, "top.sub")
    mappings = dict(resolve_field_mappings(schema, []))
    assert mappings == {"a_b_c": ["a.b.c", "a_b_c"], "a_d": ["a.d", "a_d"]}


def test_mixed_type_coalesce_string_collapse(spark):
    """JSON inference collapses mixed long/string to string; coalesce over
    (string, bigint) coerces — matches reference behavior on driver_age."""
    df = spark.read.json(
        spark.sparkContext.parallelize(
            ['{"driver_age": "29"}', '{"driver": {"age": 45}}']
        )
    )
    out = normalize_fields(df, [{"name": "driver_age", "sources": ["driver_age"]}])
    got = {r["driver_age"] for r in out.collect()}
    assert got == {"29", "45"}
