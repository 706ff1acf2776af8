"""Privacy audits over tabular training data.

Training corpora built from user-adjacent tables must not leak
identities through quasi-identifier combinations (the Sweeney
re-identification attack: ZIP + birthdate + sex singles out most of a
population).  Two primitives, both pure Catalyst:

  * ``k_anonymity`` — one row per quasi-identifier equivalence class
    with its size (k-anonymity), the distinct count of a sensitive
    attribute within the class (l-diversity — a k-anonymous class where
    everyone shares one diagnosis still leaks it), and an at-risk flag
    for classes smaller than ``k``.
  * ``suppress_small_classes`` — the minimal-intervention fix: rows in
    classes below ``k`` get their quasi-identifier columns NULLed
    (suppression), everything else passes through unchanged.  NULLed
    rows collapse into one all-NULL class, which is the standard
    suppression semantics.

Scale shape: the audit is ONE hash aggregate on the quasi columns
(map-side combine applies; class count is bounded by the quasi-value
cross product, not the row count).  Suppression is one window COUNT
over the same key — no join back, a single exchange.  Neither path
touches a UDF or collects.

No counterpart in the reference repo (reference/src has no privacy
surface); this extends SURVEY.md §2.4's curation family the way a
training-data pipeline needs before shipping user-derived tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _check_cols(op: str, df: DataFrame, cols: Sequence[str]) -> None:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"{op}: input lacks columns {missing}")
    if not cols:
        raise ValueError(f"{op}: quasi_cols must be non-empty")


def k_anonymity(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per-equivalence-class k-anonymity (and optional l-diversity)
    audit: one output row per distinct quasi-identifier combination with
    ``class_size``, ``at_risk`` (1 when class_size < k), and — when
    ``sensitive_col`` is given — ``l_diversity`` (distinct sensitive
    values in the class).  NULL quasi values group together, matching
    SQL GROUP BY semantics in both engines."""
    _check_cols("k_anonymity", df, list(quasi_cols))
    if k <= 0:
        raise ValueError("k_anonymity: k must be positive")
    if sensitive_col is not None and sensitive_col not in df.columns:
        raise ValueError(
            f"k_anonymity: sensitive_col {sensitive_col!r} not in input"
        )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(sensitive_col).cast("bigint").alias("l_diversity")
        )
    out = df.groupBy(*quasi_cols).agg(*aggs)
    return out.withColumn(
        "at_risk",
        F.when(F.col("class_size") < k, F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint"),
    )


def suppress_small_classes(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """NULL the quasi-identifier columns of every row whose equivalence
    class has fewer than ``k`` members; add ``suppressed`` (1/0).  The
    class census is a window COUNT over the quasi key — one exchange,
    no join back."""
    _check_cols("suppress_small_classes", df, list(quasi_cols))
    if k <= 0:
        raise ValueError("suppress_small_classes: k must be positive")
    if "suppressed" in df.columns:
        raise ValueError(
            "suppress_small_classes: input already has a 'suppressed' "
            "column (re-running suppression? rename it first)"
        )
    w = Window.partitionBy(*[F.col(c) for c in quasi_cols])
    small = F.count(F.lit(1)).over(w) < k
    cols = []
    for c in df.columns:
        if c in quasi_cols:
            cols.append(
                F.when(small, F.lit(None)).otherwise(F.col(c)).alias(c)
            )
        else:
            cols.append(F.col(c))
    return df.select(
        *cols,
        F.when(small, F.lit(1)).otherwise(F.lit(0)).cast("bigint").alias(
            "suppressed"
        ),
    )
