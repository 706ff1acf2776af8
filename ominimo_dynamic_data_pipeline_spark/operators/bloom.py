"""Distributed Bloom-filter build/probe as a composition of built-in ops.

Spark's runtime bloom-filter join injection (``spark.sql.optimizer.runtime.
bloomFilter.*``) is planner-internal and its ``bloom_filter_agg`` aggregate
is not SQL-registered in every build, so this module provides an explicit,
engine-portable Bloom filter made entirely of Catalyst expressions — no
UDFs, no driver-side set materialization:

  build:  key -> k bit positions (``xxhash64(key, seed)`` mod m) -> per-row
          (word-slot, bit-mask) pairs -> ``bit_or`` aggregate per slot
          (map-side partial agg; the shuffle carries at most ``num_words``
          rows per task) -> dense ``array<long>`` of ``num_words`` words.
  probe:  broadcast the packed array (8 * num_words bytes), test all k bits
          with ``element_at`` + bitwise AND — a codegen'd filter, no shuffle
          on the probe side.

The classic use is a *semi-join prefilter*: build over the (small) key side,
probe the (huge) fact side before the exact join.  False positives are then
removed by the exact join; false negatives cannot occur, so the composition
is exactly equal to the plain semi join while shrinking the shuffled probe
volume by ~(1 - selectivity).  At 100 TB this is the difference between
shuffling the full fact table and shuffling only candidate rows.

Default sizing: ``num_words=1024`` (65,536 bits, 8 KiB broadcast) and
``num_hashes=3`` give FPR ~= (1 - e^{-kn/m})^k < 2%% for n <= 5,000 keys;
size m ~ 10-15 bits per expected distinct key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOOM_COL = "bloom_words"


def _bit_coords(key: Column, seed: int, num_words: int) -> tuple[Column, Column]:
    """(word-slot, bit-mask) of hash #``seed`` for ``key``."""
    pos = F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_words * 64))
    slot = F.floor(pos / F.lit(64)).cast("int")
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), F.pmod(pos, F.lit(64)).cast("int")
    )
    return slot, mask


def bloom_build(
    df: DataFrame, key_col: str, num_words: int = 1024, num_hashes: int = 3
) -> DataFrame:
    """One-row frame holding the packed filter as ``bloom_words: array<long>``.

    ``bit_or`` is an algebraic aggregate: partial aggregation runs map-side,
    so the build shuffle moves at most ``num_words`` words per input task
    regardless of build-side row count.
    """
    key = F.col(key_col)
    pairs = F.array(
        *[
            F.struct(slot.alias("slot"), mask.alias("mask"))
            for slot, mask in (
                _bit_coords(key, i, num_words) for i in range(num_hashes)
            )
        ]
    )
    words = (
        df.select(F.explode(pairs).alias("pm"))
        .select("pm.slot", "pm.mask")
        .groupBy("slot")
        .agg(F.bit_or("mask").alias("word"))
    )
    # Pack the (<= num_words)-row frame into one dense array; absent slots
    # are zero words.  collect_list here aggregates word rows, not data rows.
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "word"))).alias("wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(num_words - 1)),
            lambda i: F.coalesce(F.element_at("wm", i), F.lit(0).cast("long")),
        ).alias(BLOOM_COL)
    )


def bloom_might_contain(
    key: Column, bloom_array: Column, num_words: int = 1024, num_hashes: int = 3
) -> Column:
    """True iff every one of the k bits for ``key`` is set (no false
    negatives; false-positive rate set by sizing)."""
    cond = F.lit(True)
    for i in range(num_hashes):
        slot, mask = _bit_coords(key, i, num_words)
        word = F.element_at(bloom_array, slot + F.lit(1))
        cond = cond & (word.bitwiseAND(mask) != 0)
    return cond


def bloom_prefilter(
    probe_df: DataFrame,
    key_col: str,
    bloom_df: DataFrame,
    num_words: int = 1024,
    num_hashes: int = 3,
) -> DataFrame:
    """Keep probe rows whose key might be in the filter.

    The one-row ``bloom_df`` is broadcast (8 * num_words bytes); the filter
    itself is a codegen'd projection — zero shuffle on the probe side.
    """
    tagged = probe_df.crossJoin(F.broadcast(bloom_df))
    kept = tagged.filter(
        bloom_might_contain(F.col(key_col), F.col(BLOOM_COL), num_words, num_hashes)
    )
    return kept.drop(BLOOM_COL)
