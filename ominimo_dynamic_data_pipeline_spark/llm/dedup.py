"""Deduplication operators for LLM training corpora.

Five strategies, all shuffle-disciplined for 100 TB corpora:

  * exact            — hash-groupBy on a content fingerprint (1 shuffle)
  * minhash LSH      — shingle -> k min-hashes -> band buckets -> bucket
                       join for candidates -> exact-Jaccard verify.
                       Candidate generation never compares all pairs: the
                       join key is (band_id, band_hash), so cost is
                       sum over buckets of |bucket|^2, not N^2.
  * simhash          — 64-bit sign-aggregated token hashes; near-dups share
                       bucket on bit-bands (here: exact-signature match +
                       hamming verify on candidates)
  * n-gram Jaccard   — exact Jaccard on shingle sets for candidate pairs
  * embedding cosine — near-dup pairs above a cosine threshold (see
                       similarity.py for the k-NN variant)

Hash portability: every hash is derived from md5 (bit-identical across
engines), so the DuckDB oracle can verify full pipelines — Spark's native
xxhash64 would be faster but engine-private; swap via ``hash_fn`` if oracle
parity is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.llm.text import normalize_text, tokens


def md5_long(col: Column, seed: int | None = None) -> Column:
    """Portable 60-bit hash: first 15 hex digits of md5 as a bigint.
    DuckDB twin: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)."""
    src = col if seed is None else F.concat(F.lit(f"{seed}:"), col)
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("bigint")


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    toks = tokens(col)
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(-1)))
    grams = F.when(
        k >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def exact_dedup(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the lowest-id representative per distinct normalized text.
    One hash-partition shuffle on the fingerprint; survivors = group mins."""
    fp = F.md5(normalize_text(F.col(text_col)))
    return (
        df.withColumn("fp", fp)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc minhash signature: for each of ``num_hashes`` seeded hash
    functions, the min hash over the doc's shingles.  Computed with
    higher-order array functions — per-row, shuffle-free."""
    sh = shingles(F.col(text_col), shingle_n)
    sig_cols = {
        f"mh_{i}": F.array_min(F.transform(sh, lambda s, i=i: md5_long(s, seed=i)))
        for i in range(num_hashes)
    }
    out = df.select(id_col, text_col).withColumns(sig_cols)
    return out.filter(F.col("mh_0").isNotNull())  # docs with >=1 shingle


def minhash_band_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of any band become candidate
    pairs.  Unpivot signature -> band hash, self-join per (band, hash)
    bucket; id_a < id_b dedups the pair space."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("-", *[p.cast("string") for p in parts])).alias(
                    "bucket"
                ),
            )
        )
    buckets = sigs.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    left = buckets.alias("a")
    right = buckets.alias("b")
    return (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact Jaccard similarity on shingle sets for given candidate pairs."""
    sh = df.select(
        F.col(id_col), shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.alias("sa")
    b = sh.alias("sb")
    return (
        pairs.join(a, pairs.id_a == F.col(f"sa.{id_col}"))
        .join(b, pairs.id_b == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sa.sh", "sb.sh"))
                / F.size(F.array_union("sa.sh", "sb.sh"))
            ).alias("jaccard"),
        )
    )


def minhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    shingle_n: int = 3,
) -> DataFrame:
    """Full near-dup pipeline: signatures -> band candidates -> exact
    Jaccard filter at ``threshold``."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    cands = minhash_band_candidates(sigs, id_col, num_hashes, bands)
    return jaccard_pairs(df, cands, id_col, text_col, shingle_n).filter(
        F.col("jaccard") >= threshold
    )


def simhash(col: Column, bits: int = 64) -> Column:
    """SimHash over whitespace tokens: per bit, sign of the sum of
    (+1 / -1) contributions from each distinct token's hash bit.

    Built from two portable 60-bit md5 hashes (bits 0-59 from seed 101,
    60+ from seed 202) so the oracle can replicate.  Per-row, shuffle-free;
    at 100 TB this is a narrow projection.
    """
    toks = F.array_distinct(tokens(col))

    def bit_sum(i: int) -> Column:
        seed, off = (101, i) if i < 60 else (202, i - 60)
        return F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(md5_long(t, seed=seed), off).bitwiseAND(1) == 1, 1).otherwise(-1),
        )

    out = F.lit(0).cast("bigint")
    for i in range(bits):
        out = out + F.when(
            bit_sum(i) > 0, F.shiftleft(F.lit(1).cast("bigint"), i)
        ).otherwise(F.lit(0).cast("bigint"))
    return out.cast("bigint")


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 3,
) -> DataFrame:
    """SimHash near-dup pairs: bucket by signature high half for candidate
    generation, verify by Hamming distance.  ``bits`` kept small by default
    because the bit_sum expansion is O(bits) expressions."""
    sigs = df.select(
        F.col(id_col), simhash(F.col(text_col), bits=bits).alias("sig")
    )
    half = bits // 2
    bucketed = sigs.withColumn("bucket", F.shiftright("sig", half))
    a, b = bucketed.alias("a"), bucketed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, computed in
    double via higher-order functions (JVM-side, no UDF)."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(
        F.aggregate(F.transform(da, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(db, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v)
    )
    return dot / (na * nb)


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_col: str | None = None,
) -> DataFrame:
    """Embedding near-dup pairs above a cosine threshold.

    Brute-force O(N^2/2) pairs — correct baseline for verification scale.
    At 100 TB pass ``bucket_col`` (e.g. an LSH bucket or cluster label) to
    restrict comparisons within buckets, turning the blow-up into
    sum(|bucket|^2); see similarity.lsh_buckets.
    """
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
        *( [F.col(bucket_col).alias("bucket_a")] if bucket_col else [] ),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
        *( [F.col(bucket_col).alias("bucket_b")] if bucket_col else [] ),
    )
    cond = F.col("id_a") < F.col("id_b")
    if bucket_col:
        cond = cond & (F.col("bucket_a") == F.col("bucket_b"))
    return (
        a.join(b, cond)
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos"))
        .filter(F.col("cos") >= threshold)
    )
