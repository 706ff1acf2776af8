"""Simple relational operators of the metadata pipeline.

Parity ops (``/root/reference/src/transformations.py:225-291``) plus the
generalized enrichment function registry.  All are narrow, shuffle-free
projections — safe at any scale.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame

from ominimo_dynamic_data_pipeline_spark.functions import build_function_column


def drop_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Drop listed columns; silently ignores columns that don't exist
    (dynamic schema tolerance, ``transformations.py:225-244``)."""
    existing = set(df.columns)
    live = [c for c in columns if c in existing]
    return df.drop(*live) if live else df


def select_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """Keep only listed columns, skipping non-existent ones; no-op when none
    exist (``transformations.py:247-267``).  This is the explicit canonical-
    schema contract; Catalyst's ColumnPruning handles the physical side."""
    existing = set(df.columns)
    live = [c for c in columns if c in existing]
    return df.select(*live) if live else df


def add_fields(
    df: DataFrame,
    fields: Sequence[Mapping[str, Any]],
    clock: Column | None = None,
) -> DataFrame:
    """Add computed metadata columns via the function registry
    (``transformations.py:270-291``, generalized).  ``clock`` overrides
    ``current_timestamp`` for deterministic tests."""
    out = df
    for cfg in fields:
        out = out.withColumn(cfg["name"], build_function_column(cfg, clock))
    return out
