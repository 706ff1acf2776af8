"""Scale-tuning operators: skew-salted joins and bucketed co-located joins.

These are the two knobs SURVEY.md §4.2 reserves for 100 TB shapes that AQE
alone cannot fix:

  * **Salting** — when one join key dominates (a "hot" customer, a null
    bucket), hash partitioning sends the whole key to one task.  Salting
    splits the hot side's rows across ``salt_factor`` sub-keys and
    replicates the other side once per sub-key, so the hot key fans out to
    ``salt_factor`` tasks.  Results are identical to the unsalted join.
    (AQE's skew-join handles sort-merge spills per-partition; salting is
    the declarative fallback that also works for hash joins and stateful
    streaming joins.)

  * **Bucketing** — pre-shuffling both tables into the same bucket layout
    at WRITE time (``bucketBy`` + ``saveAsTable``) lets every later equi
    join/aggregation on the bucket key run shuffle-free: the exchange
    happens once when data lands, not once per query.  The classic trade
    for dimension/fact tables that are joined daily.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side treated as skewed on ``on``.

    left rows get a DETERMINISTIC salt in [0, salt_factor): pmod of the
    hash of the row's full content.  Deriving the salt from row content
    (never ``monotonically_increasing_id``/``rand`` without a seed) is a
    correctness requirement, not a style choice: a task retry or lineage
    recomputation re-evaluates the expression, and a nondeterministic salt
    would re-deal rows to different shuffle partitions mid-failure — the
    SPARK-23207 class of silent duplication/loss.  Identical rows share a
    salt, which is harmless for correctness and still spreads a hot KEY
    whenever its rows differ anywhere else.

    Right rows are replicated once per salt value.  The join key becomes
    (key, salt), spreading each hot key over ``salt_factor`` partitions.
    Equivalent to ``left.join(right, on, how)`` for inner/left joins; the
    replicated side must be the non-preserved side for outer joins.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(
        F.hash(*[F.col(c) for c in left.columns]), F.lit(salt_factor)
    ).alias("_salt")
    salted_left = left.withColumn("_salt", salt)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_factor - 1))
    ).alias("_salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, on=[on, "_salt"], how=how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Joins/aggregations on ``bucket_col`` between tables sharing this layout
    need no exchange (verify: the plan has no Exchange on the bucketed
    side)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two pre-bucketed tables on their bucket key (shuffle-free when
    bucket layouts match)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def epoch_ordinal(col, dtype):
    """Integer-comparable ordinal of an orderable column, for binning and
    range scaling: DAYS since epoch for dates (exact integers, immune to
    the session timezone), unix SECONDS for timestamps, identity for
    numerics; anything else raises.  Shared by the zorder sink scaling
    (io/writer.py) and the binned interval join (operators/joins.py) so
    the per-type dispatch evolves in one place."""
    from pyspark.sql.types import (
        DateType,
        NumericType,
        TimestampNTZType,
        TimestampType,
    )

    if isinstance(dtype, NumericType):
        return col
    if isinstance(dtype, DateType):
        return F.datediff(col, F.lit("1970-01-01"))
    if isinstance(dtype, (TimestampType, TimestampNTZType)):
        return F.unix_timestamp(col)
    raise ValueError(
        f"epoch_ordinal: unsupported type {dtype}; "
        "must be numeric, date, or timestamp"
    )


def morton_key(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative dimension values:
    bit i of ``a`` lands at position 2i+1 and bit i of ``b`` at 2i, so
    sorting by the result clusters rows that are close in BOTH
    dimensions.

    This is the data-LAYOUT lever for multi-dimensional scan pruning at
    100 TB: ``df.repartitionByRange(n, zval).sortWithinPartitions(zval)``
    before a parquet write makes every file's min/max footer stats tight
    in *both* dimensions simultaneously, so predicates on either column
    skip most files — a linear sort can only be tight in one.  (Same
    mechanism as Delta/Iceberg OPTIMIZE ZORDER, expressed with stock
    Spark.)

    Pure Catalyst bit arithmetic (shiftright/and/or) — whole-stage
    codegen'd, no UDF.  Inputs are masked to ``bits`` low bits; callers
    should pre-scale values into that range (rank, bucket id, or
    ``pmod``).  2*bits must fit a signed 64-bit long, so bits <= 31.
    """
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    a = a.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    b = b.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def morton_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The DuckDB-SQL twin of :func:`morton_key` (same bit layout), for
    oracle queries: renders the interleave as an OR-fold over literal
    shifts."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    mask = (1 << bits) - 1
    am = f"(CAST({a} AS BIGINT) & {mask})"
    bm = f"(CAST({b} AS BIGINT) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({am} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({bm} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(terms) + ")"
