"""Text analysis over document tables: tokenization, quality scoring,
language ID, fingerprinting, term statistics, tf-idf.

Everything here is pure Catalyst (split/explode/groupBy/higher-order
functions) — no UDFs, so the hot path stays JVM-side and whole-stage
codegen'd.  The one exception is ``compression_ratio``: zlib has no
Catalyst surface, so it uses the scalar Arrow pandas_udf escape hatch
(batched, not per-row).  Token counting and profiling are narrow per-row projections;
term/tf-idf statistics are classic explode->aggregate shapes whose shuffles
carry (token, count) pairs, not documents.

Portability note: fingerprints use md5 (identical across engines) rather
than xxhash64 (Spark-specific), so the DuckDB oracle can verify them.
"""

from __future__ import annotations

import zlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny function-word marker sets for the language-ID heuristic.  A real
# deployment would plug a fastText-style model in via pandas UDF; the
# heuristic keeps the operator deterministic and dependency-free.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "y", "es"),
    "fr": ("le", "la", "de", "et", "est"),
    "de": ("der", "die", "das", "und", "ist"),
    "zh": ("的", "是", "了", "和", "在"),
}

# A BPE-ish word/number/punctuation splitter: runs of letters, runs of
# digits, or single non-space symbols — a cheap proxy for subword counts.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def normalize_text(col: Column) -> Column:
    """Lowercase, trim, collapse internal whitespace — the canonical form
    used by fingerprints and exact-dedup."""
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text (empty strings filtered)."""
    return F.filter(F.split(normalize_text(col), r"\s+"), lambda t: t != "")


def whitespace_token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Count of BPE-ish tokens (letters runs / digit runs / symbols)."""
    return F.size(
        F.filter(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0), lambda t: t != "")
    )


def fingerprint(col: Column) -> Column:
    """Deterministic 128-bit content fingerprint of the normalized text."""
    return F.md5(normalize_text(col))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals used to filter LLM training corpora:
    length, token stats, punctuation/digit/whitespace ratios, stopword hit
    ratio.  All single-pass projections."""
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?'\"()\[\]{}-]", ""))
    digits = F.length(F.regexp_replace(c, r"[^0-9]", ""))
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*LANG_MARKERS["en"]))
    )
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "avg_token_len": F.when(n_tokens > 0, (n_chars - n_tokens + 1) / n_tokens),
            "punct_ratio": F.when(n_chars > 0, punct / n_chars).otherwise(0.0),
            "digit_ratio": F.when(n_chars > 0, digits / n_chars).otherwise(0.0),
            "stopword_ratio": F.when(n_tokens > 0, stop_hits / n_tokens).otherwise(
                0.0
            ),
        }
    )


def language_scores(col: Column) -> dict[str, Column]:
    """Marker-hit counts per language for the given text column."""
    toks = tokens(col)
    return {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: the language with the most distinct marker
    hits; deterministic tie-break by fixed language order; 'und' when no
    marker hits at all."""
    scores = language_scores(F.col(text_col))
    langs = list(scores)
    best = F.lit("und")
    best_score = F.lit(0)
    # Build a strict-improvement chain in fixed order => deterministic and
    # replicable as a CASE chain in the SQL oracle.
    for lang in langs:
        improved = scores[lang] > best_score
        best = F.when(improved, F.lit(lang)).otherwise(best)
        best_score = F.when(improved, scores[lang]).otherwise(best_score)
    return df.withColumn("lang_pred", best)


def term_frequencies(
    df: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus-wide term frequencies: explode normalized tokens, count.
    Shuffle carries (token, partial count) pairs thanks to partial
    aggregation — safe at any corpus size."""
    out = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if min_count > 1:
        out = out.filter(F.col("tf") >= min_count)
    return out


def ngrams_from_tokens(toks: Column, n: int = 2) -> Column:
    """Word n-grams from a materialized token-array column (no UDF).

    Pass an attribute reference, not an inline expression: element_at runs
    inside a lambda where Spark re-evaluates argument expressions per
    element (no subexpression elimination) — see dedup.shingles_from_tokens.
    """
    k = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(k - n, F.lit(-1)))
    return F.when(
        k >= n,
        F.transform(
            idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngrams(col: Column, n: int = 2) -> Column:
    """Word n-grams of a raw text column.  Convenience wrapper for small
    frames/tests; hot paths should stage ``tokens`` as a projection and use
    ``ngrams_from_tokens`` (per-element re-evaluation cost otherwise)."""
    return ngrams_from_tokens(tokens(col), n)


def tf_idf(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k_per_doc: int = 5,
) -> DataFrame:
    """tf-idf as pure DataFrame aggregations (no MLlib):

      tf(d, t)  = count of t in d
      idf(t)    = ln(N / df(t))          (no smoothing; N, df exact ints)
      tfidf     = tf * idf, top-k per doc by (tfidf desc, token asc)

    Two shuffles (doc-term counts, term document-frequencies) + a broadcast
    of the term->idf map back onto doc-term pairs.  idf is computed from
    exact integers, so the doubles are engine-portable.
    """
    doc_tokens = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token")
    )
    doc_term = doc_tokens.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf")
    )
    n_docs = df.count()  # tiny scalar; at scale pass it in precomputed
    term_df = doc_term.groupBy("token").agg(
        F.countDistinct(id_col).alias("df")
    )
    scored = (
        doc_term.join(F.broadcast(term_df), "token")
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
        .withColumn("tfidf", F.col("tf") * F.col("idf"))
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k_per_doc)
        .select(id_col, "token", "tf", "df", "tfidf", "rn")
    )


def compression_ratio(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id, n_bytes, compressed_bytes, compression_ratio) via a SCALAR
    Arrow pandas_udf — the entropy-proxy quality signal LLM corpus filters
    use (highly repetitive/boilerplate text compresses far below ~0.4;
    random noise stays near 1.0).

    zlib is genuinely inexpressible in Catalyst, so this is the correct
    use of the scalar-UDF escape hatch: Arrow-batched columnar transfer,
    one Python call per batch (not per row), deterministic output
    (zlib level pinned).  Values are unit-pinned in tests; no SQL oracle
    exists because DuckDB has no zlib surface (rows-only catalog entry).
    """
    from pyspark.sql.functions import pandas_udf

    # functional form: `from __future__ import annotations` stringifies
    # the pd.Series hints, which the decorator cannot resolve here
    compressed_len = pandas_udf(
        lambda texts: texts.fillna("").map(
            lambda t: len(zlib.compress(t.encode("utf-8"), 6))
        ),
        "int",
    )

    n_bytes = F.octet_length(F.col(text_col))
    return df.select(
        F.col(id_col),
        n_bytes.cast("bigint").alias("n_bytes"),
        compressed_len(F.col(text_col)).cast("bigint").alias(
            "compressed_bytes"
        ),
    ).withColumn(
        "compression_ratio",
        F.round(
            F.col("compressed_bytes") / F.nullif(F.col("n_bytes"), F.lit(0)), 6
        ),
    )
