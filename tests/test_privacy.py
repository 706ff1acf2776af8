"""k-anonymity / suppression privacy operators (q156): audit matches
Python truth, suppression NULLs exactly the small-class rows, and the
dataflow step dispatches both actions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.operators.privacy import (
    k_anonymity,
    suppress_small_classes,
)

ROWS = [
    # (id, zip, age_band, diagnosis) — class (10001, 1) has 3 members
    # sharing ONE diagnosis (k-anonymous at k=3 but l-diversity 1);
    # class (10002, 2) has 1 member (below any k).
    (1, 10001, 1, "flu"),
    (2, 10001, 1, "flu"),
    (3, 10001, 1, "flu"),
    (4, 10002, 2, "ok"),
    (5, 10003, 1, "flu"),
    (6, 10003, 1, "ok"),
]
SCHEMA = "id bigint, zip int, age_band int, diagnosis string"


def test_k_anonymity_audit_matches_python_truth(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    got = {
        (r["zip"], r["age_band"]): r
        for r in k_anonymity(
            df, ["zip", "age_band"], k=3, sensitive_col="diagnosis"
        ).collect()
    }
    classes = {}
    for _, z, a, d in ROWS:
        classes.setdefault((z, a), []).append(d)
    assert set(got) == set(classes)
    for key, members in classes.items():
        r = got[key]
        assert r["class_size"] == len(members)
        assert r["l_diversity"] == len(set(members))
        assert r["at_risk"] == (1 if len(members) < 3 else 0)


def test_suppress_small_classes_nulls_only_small(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    out = {r["id"]: r for r in
           suppress_small_classes(df, ["zip", "age_band"], k=3).collect()}
    assert len(out) == len(ROWS)
    for i in (1, 2, 3):  # class of 3 -> kept
        assert out[i]["suppressed"] == 0 and out[i]["zip"] == 10001
    for i in (4, 5, 6):  # classes of 1 and 2 -> suppressed
        assert out[i]["suppressed"] == 1
        assert out[i]["zip"] is None and out[i]["age_band"] is None
        assert out[i]["diagnosis"] is not None  # non-quasi cols untouched


def test_privacy_validation_errors(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    with pytest.raises(ValueError, match="lacks columns"):
        k_anonymity(df, ["zip", "nope"])
    with pytest.raises(ValueError, match="non-empty"):
        k_anonymity(df, [])
    with pytest.raises(ValueError, match="k must be positive"):
        k_anonymity(df, ["zip"], k=0)
    with pytest.raises(ValueError, match="sensitive_col"):
        k_anonymity(df, ["zip"], sensitive_col="nope")
    with pytest.raises(ValueError, match="k must be positive"):
        suppress_small_classes(df, ["zip"], k=-1)


def test_k_anonymity_registry_step(spark):
    from ominimo_dynamic_data_pipeline_spark.operators.registry import (
        CompileContext,
        apply_transformations,
    )

    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    out = apply_transformations(
        CompileContext(spark, frames={"t": df}),
        {"transformations": [
            {"name": "audit", "type": "k_anonymity",
             "params": {"input": "t", "quasi_cols": ["zip", "age_band"],
                        "k": 3, "sensitive_col": "diagnosis"}},
            {"name": "safe", "type": "k_anonymity",
             "params": {"input": "t", "quasi_cols": ["zip", "age_band"],
                        "k": 3, "action": "suppress"}},
        ]},
    )
    assert sorted(map(tuple, out["audit"].collect())) == sorted(
        map(tuple, k_anonymity(df, ["zip", "age_band"], k=3,
                               sensitive_col="diagnosis").collect()))
    assert out["safe"].filter(F.col("suppressed") == 1).count() == 3
    with pytest.raises(ValueError, match="quasi_cols"):
        apply_transformations(
            CompileContext(spark, frames={"t": df}),
            {"transformations": [
                {"name": "x", "type": "k_anonymity", "params": {"input": "t"}},
            ]},
        )
    with pytest.raises(ValueError, match="unknown action"):
        apply_transformations(
            CompileContext(spark, frames={"t": df}),
            {"transformations": [
                {"name": "x", "type": "k_anonymity",
                 "params": {"input": "t", "quasi_cols": ["zip"],
                            "action": "bogus"}},
            ]},
        )


def test_suppress_rejects_existing_suppressed_column(spark):
    df = spark.createDataFrame(ROWS, schema=SCHEMA).withColumn(
        "suppressed", F.lit(0)
    )
    with pytest.raises(ValueError, match="already has a 'suppressed'"):
        suppress_small_classes(df, ["zip"], k=3)


def test_registry_suppress_rejects_sensitive_col(spark):
    from ominimo_dynamic_data_pipeline_spark.operators.registry import (
        CompileContext,
        apply_transformations,
    )

    df = spark.createDataFrame(ROWS, schema=SCHEMA)
    with pytest.raises(ValueError, match="sensitive_col only applies"):
        apply_transformations(
            CompileContext(spark, frames={"t": df}),
            {"transformations": [
                {"name": "x", "type": "k_anonymity",
                 "params": {"input": "t", "quasi_cols": ["zip"],
                            "action": "suppress",
                            "sensitive_col": "diagnosis"}},
            ]},
        )
