"""Time-ordered join operators.

``asof_join`` is the point-in-time join every market-data / telemetry /
feature-store pipeline needs (pandas ``merge_asof``, DuckDB/kdb
``ASOF JOIN``): for each left row, attach the single right row whose
timestamp is the latest at-or-before (backward) or earliest at-or-after
(forward) the left row's, per matching key.

Spark has no native as-of join, and the naive shapes fail at scale: a
range-predicate join explodes to O(|left| x |right|) pairs per key before
the per-row max, and a windowed subquery per left row re-sorts the right
side repeatedly.  The shape here is the q15 catalog pattern generalized
(queries/relational.py q15): UNION both sides, ONE window over
(key, time) taking ``last(right_payload, ignorenulls)`` over the
preceding frame — one exchange + one sort total, O((|L|+|R|) log) per
key, no pair materialization.  A hot key with 10^5 right rows and 10^4
left rows costs a sort, not 10^9 pairs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_HELPERS = ("_asof_kind", "_asof_tb", "_asof_match")
_PII_HELPERS = ("_pii_bin",)


def _suffixed_names(
    op_name: str,
    attach_cols: Sequence[str],
    other_cols: Sequence[str],
    suffix: str,
) -> dict[str, str]:
    """Output-name map for columns attached from a joined side:
    ``suffix``-renamed on collision with ``other_cols``, failing fast
    when a renamed name STILL collides (with the other side or with a
    sibling) instead of emitting ambiguous duplicate columns."""
    out = {
        c: c if c not in other_cols else f"{c}{suffix}" for c in attach_cols
    }
    vals = list(out.values())
    bad = sorted(
        {v for c, v in out.items() if v != c and v in other_cols}
        | {v for v in vals if vals.count(v) > 1}
    )
    if bad:
        raise ValueError(
            f"{op_name}: output column(s) {bad} collide; pick another suffix"
        )
    return out


def _require_same_ordinal_family(
    op_name: str, anchor_col: str, anchor_dtype, others: Sequence[tuple]
) -> None:
    """Fail fast when the bound/point columns of an interval join mix
    epoch_ordinal dispatch families (numeric vs date vs timestamp).

    epoch_ordinal dispatches on ONE side's dtype and the same dispatch is
    applied to the other frame's columns; a numeric left against timestamp
    right bounds would otherwise surface as a raw Catalyst
    DATATYPE_MISMATCH at analysis instead of the operator's own error."""
    from pyspark.sql.types import (
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    def family(dtype) -> str | None:
        if isinstance(dtype, NumericType):
            return "numeric"
        if isinstance(dtype, DateType):
            return "date"
        if isinstance(dtype, (TimestampType, TimestampNTZType)):
            return "timestamp"
        return None

    want = family(anchor_dtype)
    for name, dtype in others:
        got = family(dtype)
        if got != want:
            raise ValueError(
                f"{op_name}: column {name!r} is {dtype.simpleString()} "
                f"({got or 'unsupported'}) but {anchor_col!r} is "
                f"{anchor_dtype.simpleString()} ({want}); all point/bound "
                "columns must share one type family "
                "(numeric | date | timestamp)"
            )


def _bounded_bin_explode(
    op_name: str, ordinal, start_col: str, end_col: str,
    bin_size: int, max_bins: int,
):
    """(first_bin, exploded-bin column) for an interval frame, with the
    per-interval explode budget enforced AT EXECUTION: the raise_error
    sits inside the sequence bound so it cannot be pruned away and fires
    before the explode allocates anything (shared by the containment and
    overlap joins)."""
    first = F.floor(ordinal(F.col(start_col)) / bin_size)
    last_raw = F.floor(ordinal(F.col(end_col)) / bin_size)
    last = F.when(
        last_raw - first >= F.lit(int(max_bins)),
        F.raise_error(
            F.concat(
                F.lit(
                    f"{op_name}: interval spans >= {int(max_bins)} bins "
                    f"(bin_size={bin_size}); raise bin_size or "
                    "max_bins_per_interval — offending start="
                ),
                F.col(start_col).cast("string"),
                F.lit(" end="),
                F.col(end_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(last_raw)
    return first, F.explode(F.sequence(first, last)).alias("_pii_bin")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Sequence[str] = (),
    direction: str = "backward",
    strict: bool = False,
    tolerance: str | None = None,
    tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """LEFT as-of join: every left row, plus the matched right row's
    columns (NULL when no right row qualifies — ``merge_asof``
    semantics).

    * ``on`` — the ordering column, present in BOTH frames (timestamp
      or any orderable type; intervals/``tolerance`` require a
      timestamp).
    * ``by`` — equi-join keys (the window partition).  At 100 TB this
      is the only shuffle: one exchange on ``by`` for both sides
      together.
    * ``direction`` — ``backward`` (latest right at-or-before) or
      ``forward`` (earliest right at-or-after).
    * ``strict`` — exclude right rows at exactly the left timestamp
      (``<`` / ``>`` instead of ``<=`` / ``>=``).
    * ``tolerance`` — e.g. ``"30 minutes"``: a match farther than this
      from the left timestamp is discarded (row kept, NULL columns).
    * ``tiebreak`` — right column ordering equal-``on`` right rows;
      the LARGEST tiebreak wins for backward, the SMALLEST for forward
      (DuckDB ASOF's latest-then-max-id pick).  Without it, equal-time
      right rows tie-break arbitrarily.

    Right columns other than ``on``/``by`` are attached under their own
    names, ``suffix``-renamed on collision with a left column; the
    matched right timestamp itself is attached as ``{on}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    by = list(by)
    if not by:
        import warnings

        # Window.partitionBy() with no keys funnels the whole unioned
        # frame through ONE partition — fine for dimension-sized frames,
        # an OOM cliff at scale.  Loud, not fatal: keyless as-of joins
        # are legitimate on small reference tables.
        warnings.warn(
            "asof_join with empty `by` runs a single-partition global "
            "window; pass partition keys for large frames",
            stacklevel=2,
        )
    clash = set(_HELPERS) & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(f"asof_join reserves columns {sorted(clash)}")
    payload_cols = [c for c in right.columns if c != on and c not in by]
    out_names = _suffixed_names("asof_join", payload_cols, left.columns, suffix)
    matched_on = f"{on}{suffix}"
    if matched_on in left.columns or matched_on in out_names.values():
        raise ValueError(
            f"asof_join output column {matched_on!r} collides; pick another suffix"
        )

    # Non-strict: right rows at equal time must be VISIBLE to the left
    # row's preceding frame, so right sorts first (kind 0).  Strict: left
    # first, so the frame ending at -1 never sees a same-time right row.
    kind_right = 1 if strict else 0
    payload = F.struct(
        F.col(on).alias("_ts"),
        *[F.col(c).alias(out_names[c]) for c in payload_cols],
    )
    # A right row with NULL `on` can never satisfy an at-or-before /
    # at-or-after bound, but NULLS-FIRST asc ordering would otherwise
    # place its (non-null) payload struct at the frame start where
    # last(ignorenulls) picks it as a phantom match.
    r_tagged = right.filter(F.col(on).isNotNull()).select(
        *by,
        F.col(on).alias(on),
        F.lit(kind_right).alias("_asof_kind"),
        (F.col(tiebreak) if tiebreak else F.lit(None)).alias("_asof_tb"),
        payload.alias("_asof_match"),
    )
    l_tagged = left.select(
        *left.columns,
        F.lit(1 - kind_right).alias("_asof_kind"),
        F.lit(None).cast(r_tagged.schema["_asof_tb"].dataType).alias("_asof_tb"),
        F.lit(None).cast(r_tagged.schema["_asof_match"].dataType).alias(
            "_asof_match"
        ),
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    if direction == "backward":
        # among equal-time right rows the LAST frame row wins -> sort the
        # tiebreak ascending so the largest is last
        order = [F.col(on).asc(), F.col("_asof_kind").asc(), F.col("_asof_tb").asc()]
    else:
        # time descending: "preceding" = later times; smallest tiebreak last
        order = [F.col(on).desc(), F.col("_asof_kind").asc(), F.col("_asof_tb").desc()]
    w = (
        Window.partitionBy(*by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    matched = unioned.withColumn(
        "_m", F.last("_asof_match", ignorenulls=True).over(w)
    ).filter(F.col("_asof_kind") == (1 - kind_right))
    # A left row with NULL `on` has no defined ordering position (under
    # forward's desc sort it would see EVERY right row as preceding):
    # keep the row, NULL the match — merge_asof semantics.
    matched = matched.withColumn(
        "_m", F.when(F.col(on).isNotNull(), F.col("_m"))
    )
    if tolerance is not None:
        bound = (
            F.col("_m._ts") >= F.col(on) - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("_m._ts") <= F.col(on) + F.expr(f"INTERVAL {tolerance}")
        )
        matched = matched.withColumn("_m", F.when(bound, F.col("_m")))
    return matched.select(
        *left.columns,
        F.col("_m._ts").alias(matched_on),
        *[F.col(f"_m.{out_names[c]}").alias(out_names[c]) for c in payload_cols],
    )


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bin_size: int = 30,
    suffix: str = "_iv",
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """INNER interval-containment join: every (point row, interval row)
    pair with ``start <= point <= end`` (closed bounds), per ``by`` key.

    Spark compiles a naive non-equi range join to a nested-loop /
    per-key cross product — O(|P| x |I|) comparisons, the classic
    open-source-Spark scale gap (Databricks papers over it with a
    range-join hint).  This operator makes it an EQUI join by binning
    the domain: each interval explodes to the ``bin_size``-wide bins it
    covers, each point lands in exactly ONE bin, and the join runs on
    (by, bin) followed by the exact containment filter.  Cost is
    O(|P| + |I| x (span/bin_size) + |pairs|): pick ``bin_size`` near
    the TYPICAL interval span so most intervals explode to ~2 bins —
    too small explodes the interval side, too large degrades toward a
    per-key cross product.  Because a point has exactly one bin, no
    pair is emitted twice (no distinct needed).

    ``bin_size`` is measured in DAYS for date columns, SECONDS for
    timestamps, and plain units for numerics.  Rows with NULL point or
    bounds, and intervals with ``end < start``, drop (containment is
    unsatisfiable).  Interval columns are attached under their own
    names, ``suffix``-renamed on collision with a point column.

    ``max_bins_per_interval`` is the backpressure guard: a single
    pathological interval (a sentinel end date like 9999-12-31 against
    a 1-second bin) would otherwise explode to billions of rows inside
    one task and OOM it.  Exceeding the budget raises AT EXECUTION with
    a message naming the knob — loud failure over a silent drop or a
    silent cross-product cliff.
    """
    from ominimo_dynamic_data_pipeline_spark.operators.scale import (
        epoch_ordinal,
    )

    by = list(by)
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    clash = set(_PII_HELPERS) & (set(points.columns) | set(intervals.columns))
    if clash:
        raise ValueError(f"point_in_interval_join reserves columns {sorted(clash)}")

    dtype = points.schema[point_col].dataType
    try:
        def ordinal(c):
            return epoch_ordinal(c, dtype)

        ordinal(F.col(point_col))  # validate the type eagerly
    except ValueError as exc:
        raise ValueError(f"point_in_interval_join: {exc}") from None
    _require_same_ordinal_family(
        "point_in_interval_join",
        point_col,
        dtype,
        [
            (start_col, intervals.schema[start_col].dataType),
            (end_col, intervals.schema[end_col].dataType),
        ],
    )

    p_bin = F.floor(ordinal(F.col(point_col)) / bin_size)
    iv_cols = [c for c in intervals.columns if c not in by]
    out_names = _suffixed_names(
        "point_in_interval_join", iv_cols, points.columns, suffix
    )
    _, bin_col = _bounded_bin_explode(
        "point_in_interval_join", ordinal, start_col, end_col,
        bin_size, max_bins_per_interval,
    )
    iv = (
        intervals.filter(
            F.col(start_col).isNotNull()
            & F.col(end_col).isNotNull()
            & (F.col(end_col) >= F.col(start_col))
        )
        .select(
            *by,
            *[F.col(c).alias(out_names[c]) for c in iv_cols],
            bin_col,
        )
    )
    pts = points.filter(F.col(point_col).isNotNull()).withColumn(
        "_pii_bin", p_bin
    )
    contained = (F.col(point_col) >= F.col(out_names[start_col])) & (
        F.col(point_col) <= F.col(out_names[end_col])
    )
    return (
        pts.join(iv, [*by, "_pii_bin"])
        .filter(contained)
        .drop("_pii_bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: Sequence[str] = (),
    bin_size: int = 30,
    suffix: str = "_right",
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """INNER interval-OVERLAP join: every (left, right) row pair whose
    closed intervals intersect (``l.start <= r.end AND r.start <=
    l.end``), per ``by`` key — the interval x interval sibling of
    :func:`point_in_interval_join`, same binning strategy.

    Dedup-free multiplicity trick: two overlapping intervals share every
    bin their intersection covers, so a naive bin join emits the pair
    once PER shared bin.  Instead each pair is kept only in the
    intersection's FIRST bin — ``bin == max(first_bin(l),
    first_bin(r))`` — which both sides are guaranteed to cover exactly
    when they overlap (the lowest-surviving-band idea from the simhash
    dedup, as a pure predicate: no distinct, no output-sized shuffle).

    ``bin_size`` units and the per-interval explode budget behave as in
    point_in_interval_join.  Right columns attach under their own names,
    ``suffix``-renamed on collision.
    """
    from ominimo_dynamic_data_pipeline_spark.operators.scale import (
        epoch_ordinal,
    )

    by = list(by)
    if bin_size <= 0:
        raise ValueError("bin_size must be positive")
    clash = {*_PII_HELPERS, "_pii_first", "_pii_lfirst"} & (
        set(left.columns) | set(right.columns)
    )
    if clash:
        raise ValueError(f"interval_overlap_join reserves columns {sorted(clash)}")
    dtype = left.schema[left_start].dataType
    try:
        def ordinal(c):
            return epoch_ordinal(c, dtype)

        ordinal(F.col(left_start))
    except ValueError as exc:
        raise ValueError(f"interval_overlap_join: {exc}") from None
    _require_same_ordinal_family(
        "interval_overlap_join",
        left_start,
        dtype,
        [
            (left_end, left.schema[left_end].dataType),
            (right_start, right.schema[right_start].dataType),
            (right_end, right.schema[right_end].dataType),
        ],
    )

    def binned(df, start, end, names=None):
        first, bin_col = _bounded_bin_explode(
            "interval_overlap_join", ordinal, start, end,
            bin_size, max_bins_per_interval,
        )
        cols = (
            [F.col(c).alias(names[c]) for c in names]
            if names is not None
            else [F.col(c) for c in df.columns if c not in by]
        )
        return df.filter(
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (F.col(end) >= F.col(start))
        ).select(
            *by,
            *cols,
            first.alias("_pii_first"),
            bin_col,
        )

    r_cols = [c for c in right.columns if c not in by]
    out_names = _suffixed_names(
        "interval_overlap_join", r_cols, left.columns, suffix
    )
    l_binned = binned(left, left_start, left_end).withColumnRenamed(
        "_pii_first", "_pii_lfirst"
    )
    r_binned = binned(right, right_start, right_end, names=out_names)
    rs, re_ = out_names[right_start], out_names[right_end]
    overlap = (F.col(left_start) <= F.col(re_)) & (
        F.col(rs) <= F.col(left_end)
    )
    first_shared = F.col("_pii_bin") == F.greatest(
        F.col("_pii_lfirst"), F.col("_pii_first")
    )
    return (
        l_binned.join(r_binned, [*by, "_pii_bin"])
        .filter(overlap & first_shared)
        .drop("_pii_bin", "_pii_lfirst", "_pii_first")
    )
