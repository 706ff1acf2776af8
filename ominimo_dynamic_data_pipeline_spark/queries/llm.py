"""LLM-data query catalog: text analysis, dedup, similarity search,
multimodal plumbing (SURVEY.md §2.4 extension surface).

Oracle strategy: every hash in the Spark operators is md5-derived
(llm.dedup.md5_long), so even the MinHash-LSH pipeline is replicated in
DuckDB SQL and hash-compared — the oracle checks algorithm parity, not just
row counts.  Genuinely engine-private paths (pandas-UDF feature extraction,
LSH hyperplane top-k) are registered rows-only (no oracle entry).
"""

from __future__ import annotations

import math
import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.llm import dedup as D
from ominimo_dynamic_data_pipeline_spark.llm import multimodal as M
from ominimo_dynamic_data_pipeline_spark.llm import similarity as S
from ominimo_dynamic_data_pipeline_spark.llm import text as T
from ominimo_dynamic_data_pipeline_spark.llm.similarity import duck_round_expr
from ominimo_dynamic_data_pipeline_spark.queries.tables import (
    exact_str_double,
    load_table,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- shared DuckDB SQL fragments mirroring llm.text normalization ----------
SQL_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
SQL_TOKS = f"list_filter(string_split({SQL_NORM}, ' '), t -> t <> '')"
SQL_SHINGLES = (
    "list_distinct([concat_ws(' ', tk[i], tk[i+1], tk[i+2]) "
    "for i in range(1, len(tk) - 1)])"
)


def _sql_md5_long(expr: str, seed: int) -> str:
    return f"CAST(('0x' || substr(md5('{seed}:' || {expr}), 1, 15)) AS BIGINT)"


# --- oracle comparison scale ----------------------------------------------
# Oracles whose SQL embeds DATA-DERIVED literals (the IVF/SemDeDup centroid
# matrices) are rendered for the scale the correctness comparison runs at:
# the driver's gate and tests/test_oracle_parity.py both compare at sf0.01
# (env-overridable to match the parity test).  The literals are re-derived
# from that directory's parquet at import, so the oracle stays valid for
# whatever data actually sits there; if the directory is missing the
# affected entries degrade to rows-only instead of shipping a stale twin.
_ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)

# --- catalog-wide LSH skew caps --------------------------------------------
# A bucket larger than the cap is degenerate (boilerplate / empty docs
# sharing one signature) and is shed before pair expansion instead of
# quadratically dominating the stage; its members' true near-dups are still
# reachable through their other, discriminating bands/tables.  Values sit
# well above every observed bucket at the test scales (sf0.1 maxima:
# minhash 10, simhash 1256, embedding 187) so they are pure insurance
# today and a hard bound at 100 TB.  Each oracle twin applies the same cap
# (COUNT() OVER the bucket key) so parity holds at any scale.
MINHASH_MAX_BUCKET = 1000
SIMHASH_MAX_BUCKET = 2000
EMBEDDING_MAX_BUCKET = 1000


# --------------------------------------------------------------------------
# q21 — per-document quality features (LLM corpus filtering signals).
# --------------------------------------------------------------------------
@query(
    "q21_doc_quality",
    f"""
    WITH base AS (
        SELECT doc_id, lang, {SQL_NORM} AS norm, {SQL_TOKS} AS tk FROM documents
    )
    SELECT doc_id, lang,
           LENGTH(norm) AS n_chars,
           LEN(tk) AS n_tokens,
           ROUND(CASE WHEN LEN(tk) > 0
                 THEN (LENGTH(norm) - LEN(tk) + 1.0) / LEN(tk) END, 6) AS avg_token_len,
           ROUND(LENGTH(regexp_replace(norm, '[^.,;:!?]', '', 'g')) * 1.0
                 / NULLIF(LENGTH(norm), 0), 6) AS punct_ratio,
           ROUND(LENGTH(regexp_replace(norm, '[^0-9]', '', 'g')) * 1.0
                 / NULLIF(LENGTH(norm), 0), 6) AS digit_ratio,
           ROUND(LEN(list_filter(tk, t -> list_contains(['the','a','of','and','is'], t)))
                 * 1.0 / NULLIF(LEN(tk), 0), 6) AS stopword_ratio
    FROM base
    """,
)
def q21_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = T.normalize_text(F.col("text"))
    toks = T.tokens(F.col("text"))
    # stage the regex/array counters once per row, round column refs
    # (duck_round_expr references its argument ~10x — unstaged, each
    # ratio would run its regexp_replace pass ten times per row)
    staged = d.select(
        "doc_id",
        "lang",
        F.length(norm).alias("_nc"),
        F.size(toks).alias("_nt"),
        F.length(F.regexp_replace(norm, r"[^.,;:!?]", "")).alias("_punct"),
        F.length(F.regexp_replace(norm, r"[^0-9]", "")).alias("_digits"),
        F.size(
            F.filter(toks, lambda t: t.isin(*T.LANG_MARKERS["en"]))
        ).alias("_stop"),
    )
    n_chars, n_tokens = F.col("_nc"), F.col("_nt")
    return staged.select(
        "doc_id",
        "lang",
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        duck_round_expr(
            F.when(n_tokens > 0, (n_chars - n_tokens + 1.0) / n_tokens), 6
        ).alias("avg_token_len"),
        duck_round_expr(F.col("_punct") / F.nullif(n_chars, F.lit(0)), 6).alias("punct_ratio"),
        duck_round_expr(F.col("_digits") / F.nullif(n_chars, F.lit(0)), 6).alias("digit_ratio"),
        duck_round_expr(F.col("_stop") / F.nullif(n_tokens, F.lit(0)), 6).alias("stopword_ratio"),
    )


# --------------------------------------------------------------------------
# q22 — heuristic language ID (argmax of marker hits, deterministic ties).
# --------------------------------------------------------------------------
def _lang_sql() -> str:
    score_cols = []
    for lang, markers in T.LANG_MARKERS.items():
        lit_list = ", ".join(f"'{m}'" for m in markers)
        score_cols.append(
            f"LEN(list_intersect(tk, [{lit_list}])) AS s_{lang}"
        )
    langs = list(T.LANG_MARKERS)
    mx = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = "CASE WHEN " + mx + " <= 0 THEN 'und' "
    for l in langs:
        case += f"WHEN s_{l} = {mx} THEN '{l}' "
    case += "END"
    return f"""
    WITH toks AS (SELECT doc_id, lang, {SQL_TOKS} AS tk FROM documents),
    scored AS (SELECT doc_id, lang, {', '.join(score_cols)} FROM toks)
    SELECT doc_id, lang, {case} AS lang_pred FROM scored
    """


@query("q22_language_id", _lang_sql())
def q22_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.language_id(d.select("doc_id", "lang", "text")).drop("text")


# --------------------------------------------------------------------------
# q23 — corpus term frequencies, top 50.
# --------------------------------------------------------------------------
@query(
    "q23_term_frequencies",
    f"""
    WITH toks AS (SELECT unnest({SQL_TOKS}) AS token FROM documents)
    SELECT token, COUNT(*) AS tf
    FROM toks GROUP BY token
    ORDER BY tf DESC, token LIMIT 50
    """,
)
def q23_term_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        T.term_frequencies(d)
        .orderBy(F.desc("tf"), "token")
        .limit(50)
    )


# --------------------------------------------------------------------------
# q24 — tf-idf, top-3 terms per document (docs 0-49).
# --------------------------------------------------------------------------
@query(
    "q24_tfidf_top_terms",
    f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE doc_id < 50),
    n AS (SELECT COUNT(*) AS n_docs FROM docs),
    doc_term AS (
        SELECT doc_id, token, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest({SQL_TOKS}) AS token FROM docs
        ) GROUP BY doc_id, token
    ),
    term_df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM doc_term GROUP BY token),
    scored AS (
        SELECT dt.doc_id, dt.token, dt.tf, td.df,
               ROUND(dt.tf * LN(CAST(n.n_docs AS DOUBLE) / td.df), 6) AS tfidf
        FROM doc_term dt JOIN term_df td USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf, rn FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn
        FROM scored
    ) WHERE rn <= 3
    """,
)
def q24_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    out = T.tf_idf(d, top_k_per_doc=3)
    return out.withColumn("tfidf", duck_round_expr("tfidf", 6)).withColumn(
        "rn", F.col("rn").cast("bigint")
    )


# --------------------------------------------------------------------------
# q25 — exact dedup by normalized-text fingerprint.
# --------------------------------------------------------------------------
@query(
    "q25_exact_dedup",
    f"""
    SELECT md5({SQL_NORM}) AS fp,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY fp
    """,
)
def q25_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# q26 — MinHash-LSH near-dup pipeline, oracle-verified end to end:
# shingle -> one 60-bit md5 base per shingle -> 16 double-hashed min-hashes
# (Kirsch-Mitzenmacher: (hi30 + (i+1)*lo30) mod P, llm.dedup) -> 4 band
# buckets -> candidate pairs -> exact Jaccard >= 0.5.  The DuckDB twin
# replicates the exact hash math.
# --------------------------------------------------------------------------
def _minhash_sql(
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int = MINHASH_MAX_BUCKET,
) -> str:
    base = "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)"
    mh_exprs = ", ".join(
        f"list_min([((h >> 30) + {i + 1} * (h & 1073741823)) % 1073741789"
        f" for h in hs]) AS mh_{i}"
        for i in range(num_hashes)
    )
    rows = num_hashes // bands
    band_rows = []
    for b in range(bands):
        parts = ", ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('-', {parts})) AS bucket FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_rows)
    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    sh AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks WHERE len(tk) >= 3),
    hsrc AS (SELECT doc_id, [{base} for s in sh] AS hs FROM sh),
    sig AS (SELECT doc_id, {mh_exprs} FROM hsrc WHERE len(hs) > 0),
    bands0 AS ({bands_sql}),
    bands AS (
        SELECT doc_id, band, bucket FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn
            FROM bands0
        ) WHERE bn <= {max_bucket_size}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(LEN(list_intersect(sa.sh, sb.sh)) * 1.0
                 / LEN(list_distinct(list_concat(sa.sh, sb.sh))), 6) AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE LEN(list_intersect(sa.sh, sb.sh)) * 1.0
          / LEN(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
    """


@query("q26_minhash_near_dups", _minhash_sql())
def q26_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # cache_shingles: the persisted shingle frame is keyed by logical plan,
    # so q49's identical pipeline reuses it within the same session.
    out = D.minhash_near_dups(
        d, threshold=0.5, cache_shingles=True,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    return out.withColumn("jaccard", duck_round_expr("jaccard", 6))


# --------------------------------------------------------------------------
# q27 — 16-bit SimHash signatures (oracle replicates the bit math).
# --------------------------------------------------------------------------
def _simhash_sql(bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        h = _sql_md5_long("t", 101)
        terms.append(
            f"CASE WHEN list_sum([CASE WHEN (({h}) >> {i}) & 1 = 1 "
            f"THEN 1 ELSE -1 END for t in tk]) > 0 THEN {1 << i} ELSE 0 END"
        )
    sig = " + ".join(terms)
    return f"""
    WITH toks AS (
        SELECT doc_id, list_distinct({SQL_TOKS}) AS tk FROM documents
    )
    SELECT doc_id, CAST({sig} AS BIGINT) AS sig FROM toks WHERE LEN(tk) > 0
    """


@query("q27_simhash_signatures", _simhash_sql())
def q27_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.simhash_frame(d, bits=16)


# --------------------------------------------------------------------------
# q28 — embedding near-dup pairs above a cosine threshold, multi-table LSH
# bucketed (the 100 TB shape: sum(|bucket|^2) comparisons per table, one
# shuffle, Arrow kernel per bucket, no driver collect).  The oracle
# replicates the hyperplane signatures exactly: plane components are ±1
# literals and both engines sum the dot product left-associatively, so the
# sign bits — and therefore the buckets — agree bit-for-bit.  Cosine is
# rounded to 4 in both engines to absorb last-ulp summation differences.
# --------------------------------------------------------------------------
_LSH_DIM, _LSH_PLANES, _LSH_TABLES = 64, 4, 3


def _lsh_sig_cols(dim: int, num_planes: int, num_tables: int) -> list[str]:
    """Per-table LSH signature columns (sig_0..sig_{T-1}) as explicit
    left-associative ±embedding[i] sum chains — the exact fold order the
    engine's _table_buckets kernel accumulates in, so the
    sign bits (and buckets) agree bit-for-bit across engines."""
    sig_cols = []
    for t in range(num_tables):
        bit_terms = []
        for p in range(num_planes):
            comps = S.hyperplane(dim, t * num_planes + p)
            dot = "0.0" + "".join(
                f" {'+' if c > 0 else '-'} CAST(embedding[{i + 1}] AS DOUBLE)"
                for i, c in enumerate(comps)
            )
            bit_terms.append(f"CASE WHEN ({dot}) >= 0 THEN {1 << p} ELSE 0 END")
        sig_cols.append(
            "CAST(" + " + ".join(bit_terms) + f" AS BIGINT) AS sig_{t}"
        )
    return sig_cols


def _lsh_pairs_sql(
    dim: int = _LSH_DIM,
    num_planes: int = _LSH_PLANES,
    num_tables: int = _LSH_TABLES,
    threshold: float = 0.45,
    max_bucket_size: int = EMBEDDING_MAX_BUCKET,
) -> str:
    sig_cols = _lsh_sig_cols(dim, num_planes, num_tables)
    buckets = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, sig_{t} AS bucket FROM sigs"
        for t in range(num_tables)
    )
    cos = (
        "list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])"
        " / (SQRT(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))"
        " * SQRT(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[])))"
    )
    return f"""
    WITH sigs AS (SELECT vec_id, embedding, {', '.join(sig_cols)} FROM embeddings),
    buckets0 AS ({buckets}),
    buckets AS (
        SELECT vec_id, tbl, bucket FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY tbl, bucket) AS bn
            FROM buckets0
        ) WHERE bn <= {max_bucket_size}
    ),
    cand AS (
        SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        FROM buckets a JOIN buckets b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, ROUND({cos}, 4) AS cos
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.id_a
    JOIN embeddings eb ON eb.vec_id = c.id_b
    WHERE ROUND({cos}, 4) >= {threshold}
    """


@query("q28_embedding_similar_pairs", _lsh_pairs_sql())
def q28_embedding_similar_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    # Kernel threshold 0.449 sits safely below every value that could round
    # to >= 0.45; the exact filter runs on the rounded column, mirroring
    # the oracle.
    out = S.embedding_near_dups_lsh(
        e,
        dim=_LSH_DIM,
        threshold=0.449,
        num_planes=_LSH_PLANES,
        num_tables=_LSH_TABLES,
        max_bucket_size=EMBEDDING_MAX_BUCKET,
    )
    return out.withColumn("cos", duck_round_expr("cos", 4)).filter(F.col("cos") >= 0.45)


# --------------------------------------------------------------------------
# q29 — brute-force cosine top-5 neighbors for query vectors 0-4.
# --------------------------------------------------------------------------
@query(
    "q29_knn_bruteforce",
    """
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv::DOUBLE[], c.embedding::DOUBLE[])
                     / (SQRT(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))
                        * SQRT(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                     4) AS cos
        FROM embeddings c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def q29_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return S.brute_force_topk(e, queries, k=5, round_to=4)


# --------------------------------------------------------------------------
# q198 — FILTERED vector search: exact cosine top-5 restricted to a
# metadata predicate (English docs with n_chars >= 200) — the
# filter-THEN-search shape every production vector store needs
# (post-filtering an unfiltered top-k silently loses recall when the
# predicate is selective).  The corpus semi-joins the predicate BEFORE
# any pairwise work, so the scan is |filtered| x |queries| and the
# documents table contributes a 2-column pushed-down projection; the
# rank path is q29's shared brute_force_topk (rounded-cos tie-break
# contract).  The oracle applies the identical predicate in SQL.
# --------------------------------------------------------------------------
@query(
    "q198_filtered_knn",
    """
    WITH eligible AS (
        SELECT doc_id FROM documents
        WHERE lang = 'en' AND n_chars >= 200
    ),
    corpus AS (
        SELECT e.vec_id, e.embedding FROM embeddings e
        JOIN eligible g ON g.doc_id = e.vec_id
    ),
    q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv::DOUBLE[], c.embedding::DOUBLE[])
                     / (SQRT(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))
                        * SQRT(list_dot_product(c.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]))),
                     4) AS cos
        FROM corpus c CROSS JOIN q
        WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= 5
    """,
)
def q198_filtered_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    eligible = d.where(
        (F.col("lang") == "en") & (F.col("n_chars") >= 200)
    ).select("doc_id")
    corpus = e.join(
        eligible, e.vec_id == eligible.doc_id, "left_semi"
    )
    queries = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return S.brute_force_topk(corpus, queries, k=5, round_to=4)


# --------------------------------------------------------------------------
# q30 — LSH-bucketed approximate top-k (the 100 TB path).  The oracle
# replicates the hyperplane signatures exactly (the q28 technique applied
# to top-k): ±1 plane components rendered as left-associative sum chains
# make the buckets agree bit-for-bit, the corpus-side census cap is the
# same COUNT() OVER, and cos is rounded to 4 in BOTH engines before the
# rank window so ranking ties resolve identically (cos DESC, neighbor
# ASC).  recall@5 >= 0.8 vs q29 brute force stays pinned in
# tests/test_llm.py (this corpus is near-random 64-dim, the hardest case
# for LSH — real embedding corpora cluster far tighter).
# --------------------------------------------------------------------------
_Q30_PLANES, _Q30_TABLES = 3, 8


def _lsh_topk_sql(
    dim: int = 64,
    num_planes: int = _Q30_PLANES,
    num_tables: int = _Q30_TABLES,
    k: int = 5,
    max_bucket_size: int = EMBEDDING_MAX_BUCKET,
) -> str:
    sig_cols = _lsh_sig_cols(dim, num_planes, num_tables)
    buckets = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, sig_{t} AS bucket FROM sigs"
        for t in range(num_tables)
    )
    cos = (
        "list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])"
        " / (SQRT(list_dot_product(ea.embedding::DOUBLE[], ea.embedding::DOUBLE[]))"
        " * SQRT(list_dot_product(eb.embedding::DOUBLE[], eb.embedding::DOUBLE[])))"
    )
    return f"""
    WITH sigs AS (SELECT vec_id, embedding, {', '.join(sig_cols)} FROM embeddings),
    buckets0 AS ({buckets}),
    corpus AS (
        SELECT vec_id, tbl, bucket FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY tbl, bucket) AS bn
            FROM buckets0
        ) WHERE bn <= {max_bucket_size}
    ),
    cand AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM corpus c JOIN buckets0 q
          ON c.tbl = q.tbl AND c.bucket = q.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    ),
    scored AS (
        SELECT c.query_id, c.neighbor_id, ROUND({cos}, 4) AS cos
        FROM cand c
        JOIN embeddings ea ON ea.vec_id = c.query_id
        JOIN embeddings eb ON eb.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@query("q30_knn_lsh", _lsh_topk_sql())
def q30_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return S.lsh_topk(
        e, queries, dim=64, k=5,
        num_planes=_Q30_PLANES, num_tables=_Q30_TABLES,
        max_bucket_size=EMBEDDING_MAX_BUCKET,
        round_to=4,
    )


# --------------------------------------------------------------------------
# q31 — multimodal payload stats (binary column, no decode).
# --------------------------------------------------------------------------
@query(
    "q31_payload_stats",
    """
    SELECT COUNT(*) AS n_payloads,
           CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(MIN(octet_length(encode(text))) AS BIGINT) AS min_bytes,
           CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes,
           SUM(octet_length(encode(text))) * 1.0 / COUNT(*) AS avg_bytes
    FROM documents
    """,
)
def q31_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_payload(load_table(spark, sf_dir, "documents"))
    return M.payload_stats(d)


# --------------------------------------------------------------------------
# q32 — Arrow-batched feature extraction over binary payloads (pandas UDF
# escape hatch; deterministic fake decode).  The md5-derived fake decode is
# replicated in DuckDB (md5(VARCHAR) hashes the utf-8 bytes == the payload),
# so the whole mapInPandas path is hash-verified; the array<float> features
# are projected to scalar f0..f7 columns so the output is canonicalizable.
# --------------------------------------------------------------------------
def _multimodal_sql(dim: int = M.FEATURE_DIM) -> str:
    feats = ", ".join(
        f"ROUND(CAST(('0x' || substr(md5(text), {5 + 2 * i}, 2)) AS INT)"
        f" / 255.0, 6) AS f{i}"
        for i in range(dim)
    )
    return f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           1 + CAST(('0x' || substr(md5(text), 1, 2)) AS INT) AS width,
           1 + CAST(('0x' || substr(md5(text), 3, 2)) AS INT) AS height,
           {feats}
    FROM documents
    """


@query("q32_multimodal_features", _multimodal_sql())
def q32_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_payload(load_table(spark, sf_dir, "documents"))
    out = M.extract_features(d, fake=True)
    return out.select(
        "doc_id",
        "n_bytes",
        "width",
        "height",
        *[
            duck_round_expr(F.col("features")[i].cast("double"), 6).alias(f"f{i}")
            for i in range(M.FEATURE_DIM)
        ],
    )


# --------------------------------------------------------------------------
# q35 — n-gram (bigram) Jaccard near-dup pairs on a bounded id range.
# Brute-force pair space is the oracle-checkable baseline; at corpus scale
# the same jaccard_pairs verify runs on MinHash-LSH candidates (q26), which
# bounds comparisons by band-bucket sizes instead of N^2.
# --------------------------------------------------------------------------
SQL_BIGRAMS = (
    "list_distinct([concat_ws(' ', tk[i], tk[i+1]) "
    "for i in range(1, len(tk))])"
)


@query(
    "q35_ngram_jaccard_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS tk FROM documents WHERE doc_id < 200
    ),
    sh AS (SELECT doc_id, {SQL_BIGRAMS} AS sh FROM toks WHERE len(tk) >= 2)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(LEN(list_intersect(a.sh, b.sh)) * 1.0
                 / LEN(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE LEN(list_intersect(a.sh, b.sh)) * 1.0
          / LEN(list_distinct(list_concat(a.sh, b.sh))) >= 0.2
    """,
)
def q35_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    sh = D.shingle_frame(d, n=2)
    a, b = sh.alias("a"), sh.alias("b")
    # Stage the intersect size as an attribute, then derive the union
    # size from |A∪B| = |A| + |B| - |A∩B| (distinct shingle sets): one
    # hash-set pass per pair instead of two (round-12; same identity as
    # jaccard_pairs).  evaluate_once pins the staged intersect against
    # the >= 0.2 filter's pushdown — without the barrier the pushed join
    # condition re-inlined array_intersect twice (the round-12 plan
    # shows both copies; staging alone does not survive pushdown).
    staged = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            D.evaluate_once(
                F.size(F.array_intersect("a.sh", "b.sh"))
            ).alias("_inter"),
            (F.size("a.sh") + F.size("b.sh")).alias("_nab"),
        )
    )
    return (
        staged.select(
            "id_a",
            "id_b",
            (F.col("_inter") / (F.col("_nab") - F.col("_inter"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= 0.2)
        .withColumn("jaccard", duck_round_expr("jaccard", 6))
    )


# --------------------------------------------------------------------------
# q36 — SimHash near-dup pairs: multi-band bit-bucket candidates (union of
# band tables), verify by Hamming distance <= 3 on the full signature.
# Oracle replicates the banded bucket join and bit math (xor + bit_count).
# --------------------------------------------------------------------------
def _simhash_pairs_sql(
    bits: int = 16,
    max_hamming: int = 3,
    bands: int = 2,
    max_bucket_size: int = SIMHASH_MAX_BUCKET,
) -> str:
    sig_inner = _simhash_sql(bits).strip()
    width = bits // bands
    mask = (1 << width) - 1
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, sig, {b} AS band, (sig >> {b * width}) & {mask} AS bits"
        " FROM sigs"
        for b in range(bands)
    )
    return f"""
    WITH sigs AS ({sig_inner}),
    banded0 AS ({band_rows}),
    banded AS (
        SELECT doc_id, sig, band, bits FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY band, bits) AS bn
            FROM banded0
        ) WHERE bn <= {max_bucket_size}
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sig, b.sig)) AS BIGINT) AS hamming
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bits = b.bits AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
    """


@query("q36_simhash_near_dups", _simhash_pairs_sql())
def q36_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = D.simhash_near_dups(
        d, bits=16, max_hamming=3, bands=2,
        max_bucket_size=SIMHASH_MAX_BUCKET,
    )
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


# --------------------------------------------------------------------------
# q37 — token counting: whitespace tokens and a BPE-ish subword proxy
# (letter runs / digit runs / single symbols), both narrow projections.
# --------------------------------------------------------------------------
@query(
    "q37_token_stats",
    f"""
    SELECT doc_id,
           LEN({SQL_TOKS}) AS ws_tokens,
           LEN(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
               AS bpe_ish_tokens
    FROM documents
    """,
)
def q37_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.whitespace_token_count(F.col("text")).cast("bigint").alias("ws_tokens"),
        T.bpe_ish_token_count(F.col("text")).cast("bigint").alias("bpe_ish_tokens"),
    )


# --------------------------------------------------------------------------
# q38 — rolling polynomial fingerprint over the token stream:
# fp = fold(tokens, 0, (acc, t) -> (acc*131 + h(t) mod P) mod P).
# Order-sensitive (unlike the q25 md5 of the whole text) and incremental —
# the shape a streaming fingerprinter uses.  Safe as an inline HOF because
# the lambda body only touches (acc, t), never an outer expression.
# --------------------------------------------------------------------------
@query(
    "q38_doc_fingerprints",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents)
    SELECT doc_id,
           list_reduce(
               [CAST(0 AS BIGINT)] ||
               [{_sql_md5_long('t', 7)} % 1073741789 for t in tk],
               (a, b) -> (a * 131 + b) % 1073741789) AS fp
    FROM toks
    """,
)
def q38_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    p = F.lit(D.MINHASH_PRIME)
    fp = F.aggregate(
        T.tokens(F.col("text")),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 131 + D.md5_long(t, seed=7) % p) % p,
    )
    return d.select("doc_id", fp.alias("fp"))


# --------------------------------------------------------------------------
# q44 — IVF approximate top-k: sample-trained coarse quantizer (driver-side
# numpy k-means on lowest-id rows), distributed assign + nprobe search.
#
# Oracle: the centroids are DETERMINISTIC given the pinned lowest-id
# 2048-row sample, so the oracle builder re-trains them with the exact
# same numpy Lloyd core on a pyarrow read of the comparison-scale parquet
# (similarity.train_centroids_from_parquet) and renders them as DOUBLE
# literals — bit-identical to what the engine ships to executors.  Every
# downstream fold (centroid scores, norms, cosines) is written as the
# same sequential left fold (list_reduce with a prepended 0.0), so the
# argmax assignment and probe ordering agree bit-for-bit and the final
# cos is rounded to 4 in BOTH engines before the rank window.  When the
# comparison-scale parquet is absent the entry degrades to rows-only.
# --------------------------------------------------------------------------
_IVF_LISTS, _IVF_NPROBE, _IVF_ITERS = 16, 4, 5


def _cents_literal(cents: list[list[float]]) -> str:
    """DOUBLE[][] SQL literal; repr() round-trips each double exactly and
    the ::DOUBLE[] cast defeats DuckDB's default DECIMAL literal typing."""
    rows = ", ".join(
        "[" + ", ".join(repr(v) for v in c) + "]::DOUBLE[]" for c in cents
    )
    return f"[{rows}]"


_FOLD = "(acc, val) -> acc + val"


def _ivf_ctes(cents: list[list[float]], dim: int = 64) -> str:
    """Shared CTE block: corpus doubles, sequential-fold norms + centroid
    scores, argmax list assignment, and the per-query nprobe probe set
    (score DESC, idx DESC — the order Spark's reverse(array_sort(structs))
    produces)."""
    k_lists = len(cents)
    return f"""
    cents AS (SELECT {_cents_literal(cents)} AS cm),
    corpus AS (
        SELECT vec_id, [CAST(x AS DOUBLE) for x in embedding] AS v
        FROM embeddings
    ),
    staged AS (
        SELECT vec_id, v,
               SQRT(list_reduce([CAST(0.0 AS DOUBLE)] || [x * x for x in v],
                                {_FOLD})) AS nrm,
               [list_reduce([CAST(0.0 AS DOUBLE)] ||
                            [v[i] * c[i] for i in range(1, {dim} + 1)],
                            {_FOLD}) for c in cm] AS scores
        FROM corpus, cents
    ),
    assigned AS (
        SELECT vec_id, v, nrm,
               CAST(list_position(scores, list_max(scores)) - 1 AS INT)
                   AS c_list
        FROM staged
    ),
    probes AS (
        SELECT query_id, qv, q_nrm, q_list FROM (
            SELECT query_id, qv, q_nrm, u.i AS q_list,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                                      ORDER BY u.s DESC, u.i DESC) AS pr
            FROM (
                SELECT vec_id AS query_id, v AS qv, nrm AS q_nrm,
                       [{{'s': scores[j + 1], 'i': j}}
                        for j in range({k_lists})] AS st
                FROM staged WHERE vec_id < 5
            ), UNNEST(st) AS t(u)
        ) WHERE pr <= {_IVF_NPROBE}
    )"""


def _ivf_topk_sql(k: int = 5, dim: int = 64) -> str | None:
    cents = S.train_centroids_from_parquet(
        f"{_ORACLE_SF_DIR}/embeddings.parquet",
        k_lists=_IVF_LISTS, iters=_IVF_ITERS,
    )
    if cents is None:
        return None
    return f"""
    WITH {_ivf_ctes(cents, dim)},
    scored AS (
        SELECT p.query_id, ca.vec_id AS neighbor_id,
               ROUND(list_reduce([CAST(0.0 AS DOUBLE)] ||
                                 [p.qv[i] * ca.v[i]
                                  for i in range(1, {dim} + 1)],
                                 {_FOLD}) / (p.q_nrm * ca.nrm), 4) AS cos
        FROM assigned ca JOIN probes p
          ON ca.c_list = p.q_list AND ca.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored
    ) WHERE rank <= {k}
    """


@query("q44_knn_ivf", _ivf_topk_sql())
def q44_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return S.ivf_topk(
        e, queries, k=5, k_lists=_IVF_LISTS, nprobe=_IVF_NPROBE,
        iters=_IVF_ITERS, round_to=4, cache_key=sf_dir,
    )


# --------------------------------------------------------------------------
# q49 — the dedup END PRODUCT: surviving corpus after MinHash-LSH near-dup
# removal (greedy keep-lowest-id).  Oracle embeds the full q26 pipeline and
# anti-selects its victims — verifying the materialization step, not just
# the pair list.
# --------------------------------------------------------------------------
def _dedup_corpus_sql() -> str:
    pairs = _minhash_sql().strip()
    return f"""
    WITH pairs AS ({pairs})
    SELECT doc_id, lang FROM documents
    WHERE doc_id NOT IN (SELECT id_b FROM pairs)
    """


@query("q49_dedup_corpus_minhash", _dedup_corpus_sql())
def q49_dedup_corpus_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(
        d, threshold=0.5, cache_shingles=True,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    return D.dedup_corpus(d, pairs).select("doc_id", "lang")


# --------------------------------------------------------------------------
# q57 — near-dup cluster analytics: connected components over the q26 pair
# graph (iterative min-label propagation on Spark; the oracle computes the
# same components with a recursive CTE — min reachable id per node).
# --------------------------------------------------------------------------
def _clusters_cte() -> str:
    """Shared recursive-CTE text computing (doc_id, cluster_id) — used by
    the q57 oracle and composed further by q191."""
    pairs = _minhash_sql().strip()
    return f"""WITH RECURSIVE pairs AS ({pairs}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst
    ),
    clusters AS (
        SELECT id AS doc_id, MIN(label) AS cluster_id
        FROM reach GROUP BY id
    )"""


def _dedup_clusters_sql() -> str:
    return f"""
    {_clusters_cte()}
    SELECT doc_id, cluster_id FROM clusters
    """


@query("q57_dedup_clusters", _dedup_clusters_sql())
def q57_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(
        d, threshold=0.5, cache_shingles=True,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    return D.dedup_clusters(pairs)


# --------------------------------------------------------------------------
# q191 — CANONICAL DOC PER NEAR-DUP CLUSTER: the "keep best of cluster"
# curation step that follows q57's clustering — instead of
# dedup_corpus's keep-lowest-id greedy, each cluster keeps its
# highest-n_chars member (ties -> lowest doc_id) and accounts for the
# characters dropped.  The Spark side composes the q57 machinery with
# llm/dedup.py cluster_representatives (pair-budget-bounded cluster
# frame -> score join touches only clustered ids, one window argmax +
# one keyed aggregate); the oracle extends the same recursive-CTE
# clusters with an independent ROW_NUMBER pick and HUGEINT-safe sums.
# --------------------------------------------------------------------------
def _q191_sql() -> str:
    return f"""
    {_clusters_cte()},
    j AS (
        SELECT c.cluster_id, c.doc_id, d.n_chars
        FROM clusters c JOIN documents d USING (doc_id)
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                   PARTITION BY cluster_id
                   ORDER BY n_chars DESC, doc_id) AS rn
        FROM j
    ),
    agg AS (
        SELECT cluster_id,
               CAST(COUNT(*) AS BIGINT) AS n_members,
               CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM j GROUP BY cluster_id
    )
    SELECT r.cluster_id,
           r.doc_id AS rep_doc_id,
           a.n_members,
           CAST(r.n_chars AS BIGINT) AS score_kept,
           CAST(a.total_chars - r.n_chars AS BIGINT) AS score_dropped
    FROM ranked r JOIN agg a USING (cluster_id)
    WHERE r.rn = 1
    """


@query("q191_cluster_canonical_docs", _q191_sql())
def q191_cluster_canonical_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(
        d, threshold=0.5, cache_shingles=True,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    clusters = D.dedup_clusters(pairs)
    return D.cluster_representatives(
        clusters, d, id_col="doc_id", score_col="n_chars"
    )


# --------------------------------------------------------------------------
# q195 — NEAR-DUP RATE BY SOURCE PAIR: the curation report that tells
# you WHICH sources copy from which — q26's near-dup pairs joined to
# each side's source label and rolled up to an (source_a, source_b)
# matrix with within-source pairs on the diagonal.  The pair frame is
# budget-bounded (band join + bucket caps), so the two source lookups
# are joins against a 2-column projection of documents and the rollup
# key is tiny; source labels order canonically (least/greatest) so
# (web, wiki) and (wiki, web) are one cell.  The oracle composes the
# same minhash SQL with the identical canonical-pair rollup.
# --------------------------------------------------------------------------
def _q195_sql() -> str:
    pairs = _minhash_sql().strip()
    return f"""
    WITH pairs AS ({pairs}),
    lab AS (
        SELECT p.id_a, p.id_b, da.source AS src_a, db.source AS src_b
        FROM pairs p
        JOIN documents da ON da.doc_id = p.id_a
        JOIN documents db ON db.doc_id = p.id_b
    )
    SELECT LEAST(src_a, src_b) AS source_a,
           GREATEST(src_a, src_b) AS source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM lab GROUP BY 1, 2
    """


@query("q195_near_dup_source_matrix", _q195_sql())
def q195_near_dup_source_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(
        d, threshold=0.5, cache_shingles=True,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    src = d.select("doc_id", "source")
    lab = (
        pairs.join(
            src.select(
                F.col("doc_id").alias("id_a"),
                F.col("source").alias("src_a"),
            ),
            "id_a",
        )
        .join(
            src.select(
                F.col("doc_id").alias("id_b"),
                F.col("source").alias("src_b"),
            ),
            "id_b",
        )
    )
    return (
        lab.select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )


# --------------------------------------------------------------------------
# q197 — PRINCIPAL-SUBSPACE audit of the embedding corpus: top/second
# eigenvalue shares of the covariance + the top component's dominant
# dimensions — detects subspace collapse (embeddings on a line/plane)
# that q182's per-dimension stats cannot see.  Engine path: coordinates
# quantize to integer micro-units and the d(d+1)/2 pairwise products
# partial-aggregate to EXACT DECIMAL moments (the exchange carries
# ~d^2 rows per partition at any corpus size); the driver collects the
# dimension-bounded moment cells and runs one 64x64 numpy eigensolve
# on an exactly-reproducible matrix.  Oracle: the moments are
# recomputed INDEPENDENTLY in DuckDB SQL (lateral range unnest +
# HUGEINT product sums) at import and fed to the SAME shared spectral
# helper (llm/similarity.py principal_share_from_moments — the q44
# shared-numpy precedent), rendered as a literal row.  If the builder
# fails the entry degrades to rows-only.
# --------------------------------------------------------------------------
_Q197_SCALE = 1_000_000


def _q197_sql() -> str | None:
    try:
        import duckdb

        from ominimo_dynamic_data_pipeline_spark.llm.similarity import (
            principal_share_from_moments,
        )

        con = duckdb.connect()
        src = f"{_ORACLE_SF_DIR}/embeddings.parquet"
        # scalar range() + unnest — DuckDB's range TABLE function cannot
        # take lateral column arguments
        m2_rows = con.execute(
            f"""
            WITH q AS (
                SELECT [CAST(ROUND(CAST(x AS DOUBLE) * {_Q197_SCALE})
                             AS BIGINT) for x in embedding] AS qv
                FROM '{src}'
            ),
            f AS (SELECT qv, unnest(range(1, 65)) AS i FROM q),
            g AS (SELECT qv, i, qv[i] AS vi FROM f),
            p AS (SELECT i, unnest(range(i, 65)) AS j, vi, qv FROM g),
            pp AS (SELECT i, j, vi * qv[j] AS prod FROM p)
            SELECT i, j, SUM(prod) AS s2 FROM pp GROUP BY i, j
            """
        ).fetchall()
        s1_rows = con.execute(
            f"""
            WITH q AS (
                SELECT [CAST(ROUND(CAST(x AS DOUBLE) * {_Q197_SCALE})
                             AS BIGINT) for x in embedding] AS qv
                FROM '{src}'
            ),
            f AS (SELECT qv, unnest(range(1, 65)) AS i FROM q)
            SELECT i, SUM(qv[i]) AS s1 FROM f GROUP BY 1
            """
        ).fetchall()
        n = con.execute(f"SELECT COUNT(*) FROM '{src}'").fetchone()[0]
        m2 = {(i - 1, j - 1): int(v) for i, j, v in m2_rows}
        s1 = {i - 1: int(v) for i, v in s1_rows}
        out = principal_share_from_moments(m2, s1, int(n), 64, _Q197_SCALE)
        return f"""
        SELECT CAST({out["n_vectors"]} AS BIGINT) AS n_vectors,
               CAST({out["dim"]} AS BIGINT) AS dim,
               CAST({out["total_variance"]!r} AS DOUBLE) AS total_variance,
               CAST({out["top_share"]!r} AS DOUBLE) AS top_share,
               CAST({out["second_share"]!r} AS DOUBLE) AS second_share,
               CAST({out["top_dim_1"]} AS BIGINT) AS top_dim_1,
               CAST({out["top_dim_2"]} AS BIGINT) AS top_dim_2,
               CAST({out["top_dim_3"]} AS BIGINT) AS top_dim_3
        """
    except Exception:  # degrade to rows-only, the q44 contract
        return None


@query("q197_embedding_principal_share", _q197_sql())
def q197_embedding_principal_share(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.similarity import (
        embedding_principal_share,
    )

    e = load_table(spark, sf_dir, "embeddings")
    out = embedding_principal_share(
        e, vec_col="embedding", dim=64, scale=_Q197_SCALE
    )
    return spark.createDataFrame(
        [out],
        schema=(
            "n_vectors bigint, dim bigint, total_variance double, "
            "top_share double, second_share double, top_dim_1 bigint, "
            "top_dim_2 bigint, top_dim_3 bigint"
        ),
    )


# --------------------------------------------------------------------------
# q61 — multi-touch interval attribution, batch twin of the stream-stream
# interval join (streaming/ops.interval_click_attribution): ALL same-user
# clicks within 1 hour strictly before each purchase.  The streaming run
# is batch-equivalence-tested; this registers the shared logic under the
# correctness gate.
# --------------------------------------------------------------------------
@query(
    "q61_interval_attribution",
    """
    SELECT p.event_id AS purchase_id,
           c.event_id AS click_id,
           p.user_id,
           (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS lag_seconds
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts < p.ts
     AND c.ts >= p.ts - INTERVAL 1 HOUR
    """,
)
def q61_interval_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.streaming.ops import (
        interval_click_attribution,
    )

    e = load_table(spark, sf_dir, "events")
    out = interval_click_attribution(e, lookback="1 hour")
    # lag in whole seconds from the micros difference (floor), identical
    # on both engines; both truncate the parquet nanos to micros.
    lag = F.floor(
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")) / F.lit(1000000)
    )
    return out.select(
        "purchase_id", "click_id", "user_id", lag.alias("lag_seconds")
    )


# --------------------------------------------------------------------------
# q62 — end-to-end corpus curation pipeline (the LLM-data END PRODUCT as
# one composed query): language filter -> quality gates (token count,
# stopword ratio) -> exact dedup keep-lowest-id -> surviving doc ids.
# Each stage is a narrow projection/filter; the only shuffle is the dedup
# groupBy.  The oracle composes the same stages in SQL.
# --------------------------------------------------------------------------
@query(
    "q62_corpus_curation",
    f"""
    WITH feats AS (
        SELECT doc_id, lang, {SQL_NORM} AS norm, {SQL_TOKS} AS tk
        FROM documents
    ),
    gated AS (
        SELECT doc_id, norm, LEN(tk) AS n_tokens
        FROM feats
        WHERE lang = 'en'
          AND LEN(tk) BETWEEN 20 AND 1000
          AND LEN(list_filter(tk, t -> list_contains(['the','a','of','and','is'], t)))
              * 1.0 / LEN(tk) >= 0.05
    )
    SELECT md5(norm) AS fp,
           MIN(doc_id) AS doc_id,
           COUNT(*) AS n_copies,
           MIN(n_tokens) AS n_tokens
    FROM gated GROUP BY fp
    """,
)
def q62_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    staged = d.select(
        "doc_id",
        "lang",
        T.normalize_text(F.col("text")).alias("norm"),
        T.tokens(F.col("text")).alias("tk"),
    )
    n_tokens = F.size(F.col("tk"))
    stop_ratio = F.size(
        F.filter(F.col("tk"), lambda t: t.isin(*T.LANG_MARKERS["en"]))
    ) / n_tokens
    gated = staged.filter(
        (F.col("lang") == "en")
        & n_tokens.between(20, 1000)
        & (stop_ratio >= 0.05)
    ).select("doc_id", "norm", n_tokens.alias("n_tokens"))
    return gated.groupBy(F.md5("norm").alias("fp")).agg(
        F.min("doc_id").alias("doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_tokens").cast("bigint").alias("n_tokens"),
    )


# --------------------------------------------------------------------------
# q63 — boilerplate detector: n-grams shared by many documents (the
# headers/footers/license-text a pre-training cleanup strips).  One
# groupBy on the exploded distinct-gram frame; document frequency counts
# each doc once.
# --------------------------------------------------------------------------
_Q63_N, _Q63_MIN_DF, _Q63_TOP = 5, 3, 50


def _boilerplate_sql(n: int = _Q63_N) -> str:
    gram = "concat_ws(' ', " + ", ".join(f"tk[i+{j}]" for j in range(n)) + ")"
    shingles = f"list_distinct([{gram} for i in range(1, len(tk) - {n - 2})])"
    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    sh AS (
        SELECT doc_id, unnest({shingles}) AS gram
        FROM toks WHERE len(tk) >= {n}
    )
    SELECT gram, COUNT(*) AS doc_freq
    FROM sh GROUP BY gram
    HAVING COUNT(*) >= {_Q63_MIN_DF}
    ORDER BY doc_freq DESC, gram LIMIT {_Q63_TOP}
    """


@query("q63_boilerplate_ngrams", _boilerplate_sql())
def q63_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    grams = D.gram_frame(d, n=_Q63_N)  # distinct per doc -> count == doc freq
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= _Q63_MIN_DF)
        .orderBy(F.desc("doc_freq"), "gram")
        .limit(_Q63_TOP)
    )


# --------------------------------------------------------------------------
# q64 — compression-ratio quality signal (entropy proxy) via the scalar
# Arrow pandas_udf escape hatch.  zlib has no DuckDB surface, so the
# oracle follows the q44-centroid precedent: a literal
# (doc_id, compressed_bytes) table is rendered AT IMPORT from the
# comparison directory's documents.parquet by the same
# zlib.compress(text.encode('utf-8'), 6) call the Spark UDF makes —
# the literal pins the zlib result, DuckDB independently recomputes
# n_bytes (strlen) and the rounded ratio.  Degrades to rows-only if the
# directory is missing (values stay unit-pinned in tests/test_llm.py).
# --------------------------------------------------------------------------
def _q64_sql() -> str | None:
    import zlib

    path = f"{_ORACLE_SF_DIR}/documents.parquet"
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    tbl = pq.read_table(path, columns=["doc_id", "text"])
    vals = ",".join(
        f"({i},{len(zlib.compress((t or '').encode('utf-8'), 6))})"
        for i, t in zip(
            tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
        )
    )
    if not vals:
        # zero-row documents table would render the malformed
        # `AS (VALUES )` — degrade to the rows-only check instead
        return None
    return f"""
    WITH comp(doc_id, compressed_bytes) AS (VALUES {vals})
    SELECT d.doc_id,
           CAST(strlen(d.text) AS BIGINT) AS n_bytes,
           CAST(c.compressed_bytes AS BIGINT) AS compressed_bytes,
           ROUND(c.compressed_bytes
                 / CAST(NULLIF(strlen(d.text), 0) AS DOUBLE), 6)
               AS compression_ratio
    FROM documents d JOIN comp c USING (doc_id)
    """


@query("q64_compression_ratio", _q64_sql())
def q64_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.compression_ratio(d)


# --------------------------------------------------------------------------
# q58 — int8 embedding quantization (vector-store compression).  The
# oracle replicates scale/codes/error exactly: max and abs are exact,
# round() is half-away-from-zero in both engines, and the error fold runs
# in the same sequential order (squares via explicit multiplication, not
# pow, to dodge libm differences).
# --------------------------------------------------------------------------
@query(
    "q58_embedding_quantization",
    """
    WITH staged AS (
        SELECT vec_id,
               [CAST(x AS DOUBLE) for x in embedding] AS vec_d,
               list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) / 127.0
                   AS scale
        FROM embeddings
    ),
    coded AS (
        SELECT vec_id, vec_d, scale,
               CASE WHEN scale > 0
                    THEN [CAST(round(x / scale) AS INT) for x in vec_d]
                    ELSE [CAST(0 AS INT) for x in vec_d] END AS codes
        FROM staged
    )
    SELECT vec_id, scale,
           codes[1] AS c0, codes[2] AS c1, codes[3] AS c2, codes[4] AS c3,
           ROUND(SQRT(list_reduce(
               [0.0] || [(vec_d[i] - CAST(codes[i] AS DOUBLE) * scale)
                         * (vec_d[i] - CAST(codes[i] AS DOUBLE) * scale)
                         for i in range(1, len(vec_d) + 1)],
               (a, b) -> a + b)), 6) AS l2_err
    FROM coded
    """,
)
def q58_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    out = S.quantize_int8(e)
    return out.select(
        "vec_id",
        "scale",
        *[F.col("codes")[i].alias(f"c{i}") for i in range(4)],
        duck_round_expr("l2_err", 6).alias("l2_err"),
    )


# --------------------------------------------------------------------------
# q51 — multimodal resize plumbing (second mapInPandas op), hash-verified:
# the fake resize is (md5 digest repeated)[:w*h], so the first 16 output
# bytes ARE the digest — DuckDB recomputes them as upper(md5(text)).
# --------------------------------------------------------------------------
_Q51_W, _Q51_H = 16, 8


@query(
    "q51_resized_payloads",
    f"""
    SELECT doc_id,
           {_Q51_W} AS width,
           {_Q51_H} AS height,
           CAST({_Q51_W * _Q51_H} AS BIGINT) AS resized_bytes,
           upper(md5(text)) AS head_hex
    FROM documents
    """,
)
def q51_resized_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_payload(load_table(spark, sf_dir, "documents"))
    out = M.resize_payloads(d, width=_Q51_W, height=_Q51_H, fake=True)
    return out.select(
        "doc_id",
        "width",
        "height",
        F.octet_length("payload").cast("bigint").alias("resized_bytes"),
        F.hex(F.expr("substring(payload, 1, 16)")).alias("head_hex"),
    )


# --------------------------------------------------------------------------
# q52 — video-style frame sampling (one row per sampled frame), hash-
# verified: frames are md5 digests of payload chunks; the corpus is ASCII
# (asserted by the n_bytes==n_chars oracle column), so DuckDB's character
# substring equals the kernel's byte slicing and md5(chunk) matches.
# --------------------------------------------------------------------------
_Q52_FRAMES = 3


@query(
    "q52_frame_samples",
    f"""
    WITH base AS (
        SELECT doc_id, text,
               GREATEST(1, octet_length(encode(text)) // {_Q52_FRAMES}) AS step
        FROM documents
    )
    SELECT doc_id, i AS frame_idx,
           md5(substring(text, i * step + 1, step)) AS frame_md5
    FROM base, UNNEST(range({_Q52_FRAMES})) AS t(i)
    """,
)
def q52_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = M.attach_payload(load_table(spark, sf_dir, "documents"))
    out = M.sample_frames(d, n_frames=_Q52_FRAMES, fake=True)
    return out.select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        F.lower(F.hex("frame_payload")).alias("frame_md5"),
    )


# --------------------------------------------------------------------------
# q203 — REAL PNG decode in the correctness gate: each doc gets a genuine
# 8x8 grayscale PNG (pixels = 4 chained md5 digests of its doc_id, filter
# type doc_id % 5, so all five RFC 2083 scanline filters are exercised),
# encoded executor-side in a pandas UDF and decoded back through the
# pure-stdlib codec (llm/png.py) inside the Arrow-batched extract_features
# path with fake=False.  The DuckDB oracle never sees a PNG: it recomputes
# each band's PIXEL SUM directly from the same md5 hex — so a hash match
# proves the full encode -> filter -> zlib -> decode -> unfilter -> band
# feature chain reproduced the exact pixels.  Band sums are reconstructed
# from the rounded float features as ROUND(f * 2040) (= 255 * 8 bytes per
# band); the reconstruction is exact for every possible sum 0..2040
# (pinned exhaustively in tests/test_png.py).
# --------------------------------------------------------------------------
_Q203_SIDE = 8  # 8x8 image -> FEATURE_DIM bands of exactly one row


def _q203_payload_udf():
    import hashlib as _hl

    import pandas as _pd
    from pyspark.sql.functions import PandasUDFType
    from pyspark.sql.functions import pandas_udf as _pandas_udf

    side = _Q203_SIDE

    def make_png(ids):
        from ominimo_dynamic_data_pipeline_spark.llm.png import encode_png

        out = []
        for doc_id in ids:
            pixels = b"".join(
                _hl.md5(f"{doc_id}-p{k}".encode()).digest()
                for k in range(side * side // 16)
            )
            out.append(
                encode_png(side, side, pixels, 0, int(doc_id) % 5)
            )
        return _pd.Series(out)

    return _pandas_udf(make_png, "binary", PandasUDFType.SCALAR)


def _q203_sql(side: int = _Q203_SIDE) -> str:
    hashes = ", ".join(
        f"md5(CAST(doc_id AS VARCHAR) || '-p{k}') AS h{k}"
        for k in range(side * side // 16)
    )
    band_sums = []
    for b in range(M.FEATURE_DIM):
        k, off = b // 2, 8 * (b % 2)
        terms = " + ".join(
            f"CAST(('0x' || substr(h{k}, {2 * (off + j) + 1}, 2)) AS INT)"
            for j in range(side)
        )
        band_sums.append(f"CAST({terms} AS BIGINT) AS s{b}")
    return f"""
    WITH hashed AS (SELECT doc_id, {hashes} FROM documents)
    SELECT doc_id, {side} AS width, {side} AS height,
           {", ".join(band_sums)}
    FROM hashed
    """


@query("q203_png_decode_features", _q203_sql())
def q203_png_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    with_png = d.withColumn("payload", _q203_payload_udf()(F.col("doc_id")))
    out = M.extract_features(with_png, fake=False)
    return out.select(
        "doc_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        *[
            F.round(
                F.col("features")[i].cast("double") * (255 * _Q203_SIDE)
            )
            .cast("bigint")
            .alias(f"s{i}")
            for i in range(M.FEATURE_DIM)
        ],
    )


# --------------------------------------------------------------------------
# q53 — deterministic train/val split: md5-hash each doc id into [0, 100),
# < 90 -> train.  Content-hash splitting is the reproducible way to split
# a growing corpus (no RNG state, stable under re-runs and engine moves);
# the oracle replicates the split exactly.
# --------------------------------------------------------------------------
@query(
    "q53_train_val_split",
    f"""
    WITH tagged AS (
        SELECT lang,
               CASE WHEN {_sql_md5_long("CAST(doc_id AS VARCHAR)", 1337)} % 100 < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs
    FROM tagged GROUP BY lang, split
    """,
)
def q53_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = D.md5_long(F.col("doc_id").cast("string"), seed=1337) % 100
    split = F.when(bucket < 90, "train").otherwise("val")
    return (
        d.select("lang", split.alias("split"))
        .groupBy("lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --------------------------------------------------------------------------
# q54 — PII scrubbing: redact phone-shaped tokens from a composed customer
# record (the shape of a pre-training scrub pass: one narrow codegen'd
# regexp projection, no shuffle).  Oracle replicates the regex.
# --------------------------------------------------------------------------
_PHONE_RE = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "q54_pii_scrub",
    f"""
    WITH rec AS (
        SELECT c_custkey,
               c_name || ' contact ' ||
               CASE WHEN c_custkey % 2 = 0
                    THEN printf('%02d-%03d-%03d-%04d',
                                c_custkey % 100, c_custkey % 1000,
                                (c_custkey * 7) % 1000,
                                (c_custkey * 13) % 10000)
                    ELSE 'n/a' END ||
               ' segment ' || c_mktsegment AS raw
        FROM customer
    )
    SELECT c_custkey,
           regexp_replace(raw, '{_PHONE_RE}', '[PHONE]', 'g') AS scrubbed,
           LEN(regexp_extract_all(raw, '{_PHONE_RE}')) AS n_redactions
    FROM rec
    """,
)
def q54_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata has no phone column, so half the records get a
    # deterministic phone-shaped token (same formula in the oracle) —
    # the scrub then has real positives AND negatives to prove both.
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    phone = F.format_string(
        "%02d-%03d-%03d-%04d", k % 100, k % 1000, (k * 7) % 1000, (k * 13) % 10000
    )
    raw = F.concat(
        F.col("c_name"),
        F.lit(" contact "),
        F.when(k % 2 == 0, phone).otherwise(F.lit("n/a")),
        F.lit(" segment "),
        F.col("c_mktsegment"),
    )
    rec = c.select("c_custkey", raw.alias("raw"))
    return rec.select(
        "c_custkey",
        F.regexp_replace("raw", _PHONE_RE, "[PHONE]").alias("scrubbed"),
        F.size(F.expr(f"regexp_extract_all(raw, '{_PHONE_RE}', 0)"))
        .cast("bigint")
        .alias("n_redactions"),
    )


# --------------------------------------------------------------------------
# q55 — sequence packing: assign docs to fixed token-budget training bins,
# contiguous by doc id within each language (deterministic greedy pack — a
# window cumsum, ONE exchange on lang; the oracle replicates the window).
# --------------------------------------------------------------------------
_Q55_BUDGET = 2048


@query(
    "q55_sequence_packing",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, LEN({SQL_TOKS}) AS n_tokens FROM documents
    )
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) // {_Q55_BUDGET} AS BIGINT) AS bin
    FROM toks
    """,
)
def q55_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "lang",
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = W.partitionBy("lang").orderBy("doc_id")
    cum = F.sum("n_tokens").over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
        F.lit(0),
    )
    return toks.select(
        "doc_id",
        "lang",
        "n_tokens",
        cum.alias("cum_tokens"),
        F.floor(before / _Q55_BUDGET).alias("bin"),
    )


# --------------------------------------------------------------------------
# q56 — benchmark decontamination: train docs (doc_id >= 10) sharing any
# 8-token shingle with the eval set (doc_id < 10) are flagged with their
# overlap count.  The eval shingle set is tiny -> broadcast; train-side
# work is one explode + join, cost |train shingles|, never pairwise.
# --------------------------------------------------------------------------
_Q56_N = 8


def _decontamination_sql(n: int = _Q56_N) -> str:
    gram = "concat_ws(' ', " + ", ".join(f"tk[i+{j}]" for j in range(n)) + ")"
    shingles = f"list_distinct([{gram} for i in range(1, len(tk) - {n - 2})])"
    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    sh AS (
        SELECT doc_id, unnest({shingles}) AS gram
        FROM toks WHERE len(tk) >= {n}
    ),
    eval_grams AS (SELECT DISTINCT gram FROM sh WHERE doc_id < 10)
    SELECT s.doc_id, COUNT(*) AS n_contaminated_grams
    FROM sh s JOIN eval_grams e ON s.gram = e.gram
    WHERE s.doc_id >= 10
    GROUP BY s.doc_id
    """


@query("q56_decontamination", _decontamination_sql())
def q56_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.sampling import (
        ngram_decontaminate,
    )

    d = load_table(spark, sf_dir, "documents")
    return ngram_decontaminate(
        d.filter(F.col("doc_id") >= 10),
        d.filter(F.col("doc_id") < 10),
        n=_Q56_N,
    )


# --------------------------------------------------------------------------
# q129 — SEMANTIC benchmark decontamination: the dense complement of
# q56's 8-gram overlap check.  Eval set = the 20 lowest-id embeddings
# (benchmark-sized, collected and rendered as literal vectors — the IVF
# centroid precedent), corpus = the rest; every corpus vector gets its
# max cosine against the eval set as a PURE PROJECTION (no join, no
# shuffle — the check streams with the scan at any corpus size).  The
# oracle replicates the exact sequential-fold dot products and norms
# (the q44 machinery, proven bit-exact), so max/round/compare agree
# byte-for-byte.  Threshold 0.35 flags the synthetic corpus's top tail;
# production eval sets use 0.9+.
# --------------------------------------------------------------------------
_Q129_EVAL, _Q129_THRESHOLD = 20, 0.35


def _semantic_decon_sql(dim: int = 64) -> str:
    return f"""
    WITH allv AS (
        SELECT vec_id, label, [CAST(x AS DOUBLE) for x in embedding] AS v
        FROM embeddings
    ),
    staged AS (
        SELECT vec_id, label, v,
               SQRT(list_reduce([CAST(0.0 AS DOUBLE)] || [x * x for x in v],
                                {_FOLD})) AS nrm
        FROM allv
    ),
    ev AS (SELECT vec_id, v, nrm FROM staged
           WHERE vec_id < {_Q129_EVAL} AND nrm > 0),
    corpus AS (SELECT vec_id, label, v, nrm FROM staged
               WHERE vec_id >= {_Q129_EVAL}),
    scored AS (
        SELECT c.vec_id, c.label, c.nrm,
               MAX(list_reduce([CAST(0.0 AS DOUBLE)] ||
                               [c.v[i] * e.v[i]
                                for i in range(1, {dim} + 1)],
                               {_FOLD}) / (c.nrm * e.nrm)) AS mc
        FROM corpus c CROSS JOIN ev e
        GROUP BY c.vec_id, c.label, c.nrm
    )
    SELECT vec_id, label,
           CASE WHEN nrm > 0 THEN ROUND(mc, 6) END AS max_eval_cos,
           COALESCE(CASE WHEN nrm > 0 THEN mc >= {_Q129_THRESHOLD} END,
                    FALSE) AS contaminated
    FROM scored
    """


@query("q129_semantic_decontamination", _semantic_decon_sql())
def q129_semantic_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ev = e.filter(F.col("vec_id") < _Q129_EVAL)
    corpus = e.filter(F.col("vec_id") >= _Q129_EVAL)
    return S.semantic_decontaminate(
        corpus, ev, threshold=_Q129_THRESHOLD, keep_cols=("label",)
    )


# --------------------------------------------------------------------------
# q65 — sliding-window token chunking (documents -> fixed-budget training
# sequences).  No shuffle: token staging + sequence + posexplode is a
# per-row pipeline; the md5 chunk fingerprint makes chunk-level exact
# dedup a groupBy away.  Oracle rebuilds every chunk with DuckDB list
# slicing (end-inclusive, clipped — same as Spark's slice(arr, pos, len)).
# --------------------------------------------------------------------------
_Q65_SIZE, _Q65_STRIDE = 64, 48


@query(
    "q65_doc_chunks",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    st AS (
        SELECT doc_id, tk, unnest(range(0, len(tk), {_Q65_STRIDE})) AS tok_start
        FROM toks WHERE len(tk) > 0
    )
    SELECT doc_id,
           tok_start // {_Q65_STRIDE} AS chunk_idx,
           tok_start,
           least({_Q65_SIZE}, len(tk) - tok_start) AS n_tokens,
           md5(array_to_string(tk[tok_start + 1 : tok_start + {_Q65_SIZE}], ' '))
               AS chunk_md5
    FROM st
    """,
)
def q65_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.chunk_tokens(d, size=_Q65_SIZE, stride=_Q65_STRIDE)


# --------------------------------------------------------------------------
# q66 — stratified quota sampling: EXACT ceil(20%) of each language,
# selected by a seeded md5 ordering so the sample is reproducible across
# reruns/retries and recomputable by the oracle.  One window exchange.
# --------------------------------------------------------------------------
_Q66_FRAC, _Q66_SEED = 0.2, 66


@query(
    "q66_stratified_sample",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (
                   PARTITION BY lang
                   ORDER BY md5('{_Q66_SEED}:' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS strat_rank,
               COUNT(*) OVER (PARTITION BY lang) AS stratum_docs
        FROM documents
    )
    SELECT doc_id, lang, strat_rank, stratum_docs
    FROM ranked
    WHERE strat_rank <= CEIL(stratum_docs * {_Q66_FRAC})
    """,
)
def q66_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm import sampling

    d = load_table(spark, sf_dir, "documents")
    return sampling.stratified_quota_sample(
        d, strata_col="lang", fraction=_Q66_FRAC, seed=_Q66_SEED
    )


# --------------------------------------------------------------------------
# q67 — within-document repetition signals (Gopher-style quality filters):
# duplicate token / 2-gram / 3-gram fractions + most-frequent-token share.
# Everything keyed on doc_id (one window + two keyed aggs), so partition
# sizes are bounded by document length at any corpus scale.
# --------------------------------------------------------------------------
@query(
    "q67_repetition_signals",
    f"""
    WITH t0 AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    toks AS (SELECT doc_id, tk FROM t0 WHERE len(tk) > 0),
    grams AS (
        SELECT doc_id,
               len(tk) AS n_tokens,
               len(list_distinct(tk)) AS nd_tok,
               [concat_ws(' ', tk[i], tk[i+1]) for i in range(1, len(tk))]
                   AS g2,
               [concat_ws(' ', tk[i], tk[i+1], tk[i+2])
                for i in range(1, len(tk) - 1)] AS g3
        FROM toks
    ),
    top AS (
        SELECT doc_id, MAX(c) AS top_token_count FROM (
            SELECT doc_id, u, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(tk) AS u FROM toks)
            GROUP BY doc_id, u
        ) GROUP BY doc_id
    )
    SELECT g.doc_id,
           g.n_tokens,
           ROUND(1.0 - nd_tok * 1.0 / n_tokens, 6) AS dup_token_frac,
           CASE WHEN len(g2) > 0
                THEN ROUND(1.0 - len(list_distinct(g2)) * 1.0 / len(g2), 6)
                END AS dup_2gram_frac,
           CASE WHEN len(g3) > 0
                THEN ROUND(1.0 - len(list_distinct(g3)) * 1.0 / len(g3), 6)
                END AS dup_3gram_frac,
           ROUND(top_token_count * 1.0 / n_tokens, 6) AS top_token_frac
    FROM grams g JOIN top USING (doc_id)
    """,
)
def q67_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.repetition_signals(d)


# --------------------------------------------------------------------------
# q90 — exact substring-level dedup (suffix-array family, Lee et al.):
# maximal repeated >= 16-token spans across the corpus via positional gram
# fingerprints + gaps-and-islands merge.  The oracle replicates the whole
# pipeline: same md5 gram fingerprints, same >= 2 occurrence census, same
# island merge — hash-compared end to end.  Complements q85, which only
# measures chunk-duplicate FRACTIONS; this locates the spans themselves
# (the step before span removal in a training-data pipeline).
# --------------------------------------------------------------------------
_SPAN_N, _SPAN_MIN_COUNT = 16, 2


def _span_ctes(n: int, min_count: int) -> str:
    """Shared CTE chain (toks..islands) for the q90/q93 span pipeline."""
    return f"""toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    grams AS (
        SELECT doc_id, u.pos, u.fp
        FROM toks, UNNEST([{{'pos': i - 1,
                             'fp': md5(array_to_string(tk[i : i + {n - 1}], ' '))}}
                           for i in range(1, len(tk) - {n} + 2)]) AS t(u)
    ),
    hot AS (SELECT fp FROM grams GROUP BY fp HAVING COUNT(*) >= {min_count}),
    flagged AS (SELECT g.doc_id, g.pos FROM grams g JOIN hot USING (fp)),
    marked AS (
        SELECT doc_id, pos,
               CASE WHEN pos > COALESCE(MAX(pos + {n}) OVER (
                        PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    -1)
                    THEN 1 ELSE 0 END AS brk
        FROM flagged
    ),
    islands AS (
        SELECT doc_id, pos,
               SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
        FROM marked
    )"""


def _repeated_spans_sql(n: int = _SPAN_N, min_count: int = _SPAN_MIN_COUNT) -> str:
    return f"""
    WITH {_span_ctes(n, min_count)}
    SELECT doc_id,
           MIN(pos) AS span_start,
           MAX(pos) + {n} AS span_end,
           MAX(pos) + {n} - MIN(pos) AS span_n_tokens
    FROM islands GROUP BY doc_id, island
    """


@query("q90_repeated_spans", _repeated_spans_sql())
def q90_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.repeated_spans(
        d, span_tokens=_SPAN_N, min_count=_SPAN_MIN_COUNT
    )


# --------------------------------------------------------------------------
# q91 — IVF-PQ-style search: q44's coarse quantizer routing + q58's int8
# codes scored asymmetrically (float query x reconstructed corpus), float
# rerank of the 3k shortlist.  recall@5 >= 0.8 vs q29 brute force stays
# pinned in tests/test_llm.py.
#
# Oracle: q44's centroid-literal CTEs + q58's bit-exact int8 scale/code
# math.  The asymmetric shortlist ranks on RAW adc doubles in both
# engines — every input is bit-identical (integer codes, exact
# max/abs/127 scale, sequential folds), so the shortlist agrees without
# rounding; the final reranked cos rounds to 4 before the rank window.
# --------------------------------------------------------------------------
_PQ_RERANK = 3


def _ivfpq_topk_sql(k: int = 5, dim: int = 64) -> str | None:
    cents = S.train_centroids_from_parquet(
        f"{_ORACLE_SF_DIR}/embeddings.parquet",
        k_lists=_IVF_LISTS, iters=_IVF_ITERS,
    )
    if cents is None:
        return None
    z = "CAST(0.0 AS DOUBLE)"
    return f"""
    WITH {_ivf_ctes(cents, dim)},
    coded AS (
        SELECT neighbor_id, c_list, c_scale,
               CASE WHEN c_scale > 0
                    THEN [CAST(round(x / c_scale) AS INT) for x in v]
                    ELSE [CAST(0 AS INT) for x in v] END AS codes
        FROM (
            SELECT vec_id AS neighbor_id, c_list, v,
                   list_max([abs(x) for x in v]) / 127.0 AS c_scale
            FROM assigned
        )
    ),
    cq AS (
        SELECT *,
               c_scale * SQRT(list_reduce([{z}] ||
                   [CAST(c AS DOUBLE) * CAST(c AS DOUBLE) for c in codes],
                   {_FOLD})) AS c_nrm_approx
        FROM coded
    ),
    shortlist0 AS (
        SELECT p.query_id, cq.neighbor_id, p.qv, p.q_nrm,
               cq.c_scale * list_reduce([{z}] ||
                   [p.qv[i] * CAST(cq.codes[i] AS DOUBLE)
                    for i in range(1, {dim} + 1)], {_FOLD})
               / (p.q_nrm * cq.c_nrm_approx) AS adc
        FROM cq JOIN probes p
          ON cq.c_list = p.q_list AND cq.neighbor_id <> p.query_id
        WHERE cq.c_nrm_approx > 0 AND p.q_nrm > 0
    ),
    short AS (
        SELECT query_id, neighbor_id, qv, q_nrm FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY adc DESC, neighbor_id) AS arnk
            FROM shortlist0
        ) WHERE arnk <= {k * _PQ_RERANK}
    ),
    reranked AS (
        SELECT s.query_id, s.neighbor_id,
               ROUND(list_reduce([{z}] ||
                     [s.qv[i] * ca.v[i] for i in range(1, {dim} + 1)],
                     {_FOLD}) / (s.q_nrm * ca.nrm), 4) AS cos
        FROM short s JOIN assigned ca ON ca.vec_id = s.neighbor_id
    )
    SELECT query_id, neighbor_id, cos, rank FROM (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM reranked
    ) WHERE rank <= {k}
    """


@query("q91_knn_ivfpq", _ivfpq_topk_sql())
def q91_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    return S.ivfpq_topk(
        e, queries, k=5, k_lists=_IVF_LISTS, nprobe=_IVF_NPROBE,
        iters=_IVF_ITERS, rerank_factor=_PQ_RERANK, round_to=4,
        cache_key=sf_dir,
    )


# --------------------------------------------------------------------------
# q92 — model-based quality scoring: fastText-style linear classifier via
# the hashing trick (64 buckets, pinned deterministic weights), scored as
# a pure-Catalyst fold — mean hashed-bucket weight + bias -> sigmoid.
# The oracle replicates the hash, the weight table, and the exact
# left-fold accumulation order (list_reduce), so scores hash-match to 6
# decimals.
# --------------------------------------------------------------------------
_QS_DIM, _QS_SEED, _QS_BIAS = 64, 31, -0.05
# pinned pseudo-random weights in [-0.5, 0.5]: deterministic closed form,
# identical literals rendered into both engines
_QS_WEIGHTS = [round(math.sin(i * 0.7) / 2.0, 6) for i in range(_QS_DIM)]


def _model_quality_sql() -> str:
    warr = "[" + ", ".join(repr(w) for w in _QS_WEIGHTS) + "]"
    h = _sql_md5_long("t", _QS_SEED)
    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    scored AS (
        SELECT doc_id, LEN(tk) AS n_tokens,
               list_reduce(
                   [CAST(0.0 AS DOUBLE)] ||
                   [{warr}[CAST(({h}) % {_QS_DIM} AS INT) + 1] for t in tk],
                   (a, b) -> a + b) AS wsum
        FROM toks
    )
    SELECT doc_id, n_tokens,
           ROUND(CASE WHEN n_tokens > 0
                 THEN 1.0 / (1.0 + EXP(-(wsum / n_tokens + {_QS_BIAS})))
                 END, 6) AS quality_score
    FROM scored
    """


@query("q92_model_quality_score", _model_quality_sql())
def q92_model_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.model_quality_score(
        d, weights=_QS_WEIGHTS, bias=_QS_BIAS, hash_seed=_QS_SEED
    )


# --------------------------------------------------------------------------
# q93 — the substring-dedup END PRODUCT: the corpus with every repeated
# >=16-token span REMOVED (order-preserving token stream).  Oracle rebuilds
# the q90 span pipeline, anti-joins flagged positions, and re-assembles the
# text with string_agg ORDER BY pos — the cleaned text hash-compares
# byte-for-byte.
# --------------------------------------------------------------------------
def _stripped_corpus_sql(n: int = _SPAN_N, min_count: int = _SPAN_MIN_COUNT) -> str:
    return f"""
    WITH {_span_ctes(n, min_count)},
    spans AS (
        SELECT doc_id,
               MIN(pos) AS span_start,
               MAX(pos) + {n} AS span_end
        FROM islands GROUP BY doc_id, island
    ),
    postoks AS (
        SELECT doc_id, u.tok, u.pos
        FROM toks, UNNEST([{{'tok': tk[i], 'pos': i - 1}}
                           for i in range(1, len(tk) + 1)]) AS t(u)
    ),
    bad AS (
        SELECT doc_id, UNNEST(range(span_start, span_end)) AS pos FROM spans
    ),
    kept AS (
        SELECT p.doc_id, p.tok, p.pos
        FROM postoks p ANTI JOIN bad b USING (doc_id, pos)
    )
    SELECT d.doc_id,
           COALESCE(k.text, '') AS text
    FROM documents d
    LEFT JOIN (
        SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS text
        FROM kept GROUP BY doc_id
    ) k USING (doc_id)
    """


@query("q93_stripped_corpus", _stripped_corpus_sql())
def q93_stripped_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spans = D.repeated_spans(
        d, span_tokens=_SPAN_N, min_count=_SPAN_MIN_COUNT
    )
    return D.strip_repeated_spans(d, spans)


# --------------------------------------------------------------------------
# q105 — deterministic negative sampling for contrastive training pairs.
# Contrastive objectives (CLIP, sentence embedders, rerankers) need K
# random-looking negatives per anchor, reproducibly: same corpus -> same
# pairs, no RNG state, stable under retries and engine moves (the same
# argument as q53's hash split).  Shape chosen for 100 TB: a bounded
# NEGATIVE POOL (one representative doc per hash bucket — one shuffle of
# B<<N groups) broadcast against anchors, so no global index, no window
# over the corpus, no N x N candidate stage; anchor j's negative is the
# representative of a pseudo-random bucket keyed by md5(anchor, j).
# Accidental self-pairs (anchor happens to represent its drawn bucket)
# are filtered in both engines.
# --------------------------------------------------------------------------
_Q105_BUCKETS = 64
_Q105_K = 4
_Q105_SEED_POOL = 211
_Q105_SEED_DRAW = 223


@query(
    "q105_negative_samples",
    f"""
    WITH pool AS (
        SELECT {_sql_md5_long("CAST(doc_id AS VARCHAR)", _Q105_SEED_POOL)}
                   % {_Q105_BUCKETS} AS bucket,
               MIN(doc_id) AS neg_doc_id
        FROM documents
        GROUP BY bucket
    ),
    anchors AS (
        SELECT doc_id, lang
        FROM documents
        WHERE {_sql_md5_long("CAST(doc_id AS VARCHAR)", 1337)} % 10 = 0
    ),
    draws AS (
        SELECT a.doc_id, a.lang, j,
               {_sql_md5_long("CAST(a.doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)", _Q105_SEED_DRAW)}
                   % {_Q105_BUCKETS} AS bucket
        FROM anchors a, UNNEST(range({_Q105_K})) AS t(j)
    )
    SELECT d.doc_id, d.lang, d.j, p.neg_doc_id
    FROM draws d JOIN pool p USING (bucket)
    WHERE p.neg_doc_id <> d.doc_id
    """,
)
def q105_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    bucket_of = lambda col, seed: (  # noqa: E731
        D.md5_long(col, seed=seed) % _Q105_BUCKETS
    )
    pool = (
        d.groupBy(
            bucket_of(F.col("doc_id").cast("string"), _Q105_SEED_POOL).alias(
                "bucket"
            )
        )
        .agg(F.min("doc_id").alias("neg_doc_id"))
    )
    anchors = d.filter(
        D.md5_long(F.col("doc_id").cast("string"), seed=1337) % 10 == 0
    )
    draws = anchors.select(
        "doc_id",
        "lang",
        F.explode(F.sequence(F.lit(0), F.lit(_Q105_K - 1))).alias("j"),
    ).withColumn(
        "bucket",
        bucket_of(
            F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.col("j").cast("string")
            ),
            _Q105_SEED_DRAW,
        ),
    )
    return (
        draws.join(F.broadcast(pool), "bucket")
        .filter(F.col("neg_doc_id") != F.col("doc_id"))
        .select("doc_id", "lang", F.col("j").cast("bigint").alias("j"), "neg_doc_id")
    )


# --------------------------------------------------------------------------
# q106 — incremental exact dedup: the continuous-ingest shape.  doc_id%10
# splits documents into an already-curated reference corpus (<8) and an
# incoming batch (>=8); the batch is deduped against the reference's
# FINGERPRINT INDEX (anti-join on md5 — hashes shuffle, text never does)
# and then within itself (keep-lowest-id per fp).  See
# llm/dedup.py:incremental_exact_dedup for the 100 TB layout notes.
# --------------------------------------------------------------------------
@query(
    "q106_incremental_dedup",
    f"""
    WITH fps AS (
        SELECT doc_id, md5({SQL_NORM}) AS fp FROM documents
    ),
    ref AS (SELECT DISTINCT fp FROM fps WHERE doc_id % 10 < 8),
    inc AS (SELECT * FROM fps WHERE doc_id % 10 >= 8)
    SELECT fp, MIN(doc_id) AS doc_id, COUNT(*) AS n_batch_copies
    FROM inc
    WHERE fp NOT IN (SELECT fp FROM ref)
    GROUP BY fp
    """,
)
def q106_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    reference = d.filter(F.col("doc_id") % 10 < 8)
    incoming = d.filter(F.col("doc_id") % 10 >= 8)
    ref_fps = reference.select(
        F.md5(D.normalize_text(F.col("text"))).alias("fp")
    )
    return D.incremental_exact_dedup(incoming, ref_fps)


# --------------------------------------------------------------------------
# q127 — incremental NEAR-dup dedup: the MinHash-LSH twin of q106's exact
# continuous-ingest shape.  Same doc_id%10 split (reference < 8, incoming
# batch >= 8); the batch's band rows join the reference's band INDEX on
# (band, bucket) for cross-corpus candidates (reference text never
# shuffles — see llm/dedup.py:incremental_near_dedup), exact shingle
# Jaccard >= 0.5 confirms, and surviving batch docs also shed their
# within-batch near-dups (q49's keep-lowest-id policy).  The oracle
# replicates the full hash pipeline (q26's machinery) with per-side
# bucket caps.
# --------------------------------------------------------------------------
def _incremental_near_dedup_sql(
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
    max_bucket_size: int = MINHASH_MAX_BUCKET,
) -> str:
    base = "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)"
    mh_exprs = ", ".join(
        f"list_min([((h >> 30) + {i + 1} * (h & 1073741823)) % 1073741789"
        f" for h in hs]) AS mh_{i}"
        for i in range(num_hashes)
    )
    rows = num_hashes // bands
    band_rows = []
    for b in range(bands):
        parts = ", ".join(
            f"CAST(mh_{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_rows.append(
            f"SELECT doc_id, {b} AS band, md5(concat_ws('-', {parts})) AS bucket FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_rows)
    jac = (
        "LEN(list_intersect(sa.sh, sb.sh)) * 1.0"
        " / LEN(list_distinct(list_concat(sa.sh, sb.sh)))"
    )
    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    sh AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks WHERE len(tk) >= 3),
    hsrc AS (SELECT doc_id, [{base} for s in sh] AS hs FROM sh),
    sig AS (SELECT doc_id, {mh_exprs} FROM hsrc WHERE len(hs) > 0),
    bands0 AS ({bands_sql}),
    bi AS (SELECT doc_id, band, bucket FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn
        FROM bands0 WHERE doc_id % 10 >= 8) WHERE bn <= {max_bucket_size}),
    br AS (SELECT doc_id, band, bucket FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn
        FROM bands0 WHERE doc_id % 10 < 8) WHERE bn <= {max_bucket_size}),
    cross_cand AS (
        SELECT DISTINCT i.doc_id AS id_a, r.doc_id AS id_b
        FROM bi i JOIN br r ON i.band = r.band AND i.bucket = r.bucket),
    cross_hits AS (
        SELECT c.id_a FROM cross_cand c
        JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
        WHERE {jac} >= {threshold}),
    within_cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bi a JOIN bi b
          ON a.band = b.band AND a.bucket = b.bucket
         AND a.doc_id < b.doc_id),
    within_hits AS (
        SELECT c.id_b FROM within_cand c
        JOIN sh sa ON sa.doc_id = c.id_a JOIN sh sb ON sb.doc_id = c.id_b
        WHERE {jac} >= {threshold}),
    victims AS (SELECT id_a AS doc_id FROM cross_hits
                UNION SELECT id_b FROM within_hits)
    SELECT doc_id, lang FROM documents
    WHERE doc_id % 10 >= 8
      AND doc_id NOT IN (SELECT doc_id FROM victims)
    """


@query("q127_incremental_near_dedup", _incremental_near_dedup_sql())
def q127_incremental_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    reference = d.filter(F.col("doc_id") % 10 < 8)
    incoming = d.filter(F.col("doc_id") % 10 >= 8)
    out = D.incremental_near_dedup(
        incoming, reference, threshold=0.5,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    return out.select("doc_id", "lang")


# --------------------------------------------------------------------------
# q109 — BPE merge-candidate mining: the first iteration of tokenizer
# training at corpus scale.  BPE training repeatedly merges the most
# frequent adjacent symbol pair; iteration one's statistics are exactly
# "count every adjacent character pair inside every word" — one
# generate-explode over the token stream and ONE shuffle on the pair key
# (at 100 TB this is the canonical map-side-combine aggregation; the
# full training loop just repeats it from the driver over a shrinking
# pair table, the same fixed-iteration driver-loop shape as q108).
# Pairs come from substring(word, i, 2) so both engines derive them
# byte-for-byte identically; top 20 with a deterministic tie-break.
# --------------------------------------------------------------------------
_Q109_TOP = 20


@query(
    "q109_bpe_merge_candidates",
    f"""
    WITH toks AS (
        SELECT unnest({SQL_TOKS}) AS w FROM documents
    ),
    bp AS (
        SELECT substr(w, i + 1, 2) AS pair
        FROM toks, UNNEST(range(length(w) - 1)) AS t(i)
        WHERE length(w) >= 2
    ),
    counted AS (
        SELECT pair, COUNT(*) AS n_occurrences FROM bp GROUP BY pair
    )
    SELECT pair, n_occurrences,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, pair)
                AS BIGINT) AS rank
    FROM counted
    ORDER BY rank LIMIT {_Q109_TOP}
    """,
)
def q109_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    words = d.select(F.explode(T.tokens(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    # the pair table is alphabet-bounded (char bigrams), but limit-first
    # is free: TakeOrderedAndProject keeps K-row heaps per partition and
    # the rank window then sorts exactly K rows
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return (
        counted.orderBy(F.desc("n_occurrences"), F.asc("pair"))
        .limit(_Q109_TOP)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# q128 — BPE vocabulary encoding: applying a trained merge table (the
# step AFTER q109's pair mining; together they bracket tokenizer
# training at corpus scale).  Each distinct word becomes its symbol
# sequence under a pinned priority-ordered merge list: the word renders
# as a bracket-wrapped symbol stream ([t][h][e]), then every merge
# (a, b) -> ab is ONE literal left-to-right global replace of '[a][b]'
# with '[ab]' — identical greedy non-overlapping semantics in Spark's
# replace() and DuckDB's replace(), so the oracle is byte-for-byte.
# Brackets (not spaces) because adjacent symbols must not SHARE a
# separator: with ' a b ' patterns, ' t h t h ' merges only once (the
# middle space is consumed by the first match; caught by unit test);
# '[t][h][t][h]' merges both.  The demo vocabulary is alnum words so
# the bracket sentinels can never collide with symbol bytes (byte-level
# BPE in production would escape instead).  Scale shape: encoding runs on the DISTINCT vocabulary
# (one map-side-combined count shuffle), never per token occurrence; a
# full-corpus token stream is then encoded by broadcast-joining this
# (word -> symbols) table onto it.  The merge list ships as expression
# literals — the nested-replace chain is a pure codegen projection.
# --------------------------------------------------------------------------
_Q128_MERGES = [
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("th", "e"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("in", "g"), ("an", "d"),
]
_Q128_TOP = 30


def _bpe_enc_sql_expr() -> str:
    """DuckDB expression encoding ``word`` under _Q128_MERGES — the
    byte-for-byte twin of text.bpe_encode_col, shared by the q128 and
    q165 oracles so the two can never drift apart."""
    enc = ("array_to_string([ '[' || c || ']' for c in"
           " string_split(word, '')], '')")
    for a, b in _Q128_MERGES:
        enc = f"replace({enc}, '[{a}][{b}]', '[{a}{b}]')"
    return f"trim(replace({enc}, '][', ' '), '[]')"


def _bpe_encode_sql() -> str:
    enc = _bpe_enc_sql_expr()
    return f"""
    WITH words0 AS (
        SELECT unnest({SQL_TOKS}) AS word FROM documents
    ),
    words AS (
        SELECT word FROM words0 WHERE regexp_matches(word, '^[a-z0-9]+$')
    ),
    vocab AS (
        SELECT word, COUNT(*) AS n_occurrences
        FROM words GROUP BY word
    ),
    top AS (
        SELECT word, n_occurrences,
               CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, word)
                    AS BIGINT) AS rank
        FROM vocab
    )
    SELECT word, n_occurrences, rank,
           {enc} AS symbols,
           CAST(len(string_split({enc}, ' ')) AS BIGINT) AS n_symbols
    FROM top WHERE rank <= {_Q128_TOP}
    """


@query("q128_bpe_encode", _bpe_encode_sql())
def q128_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("word"))
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    # limit-first: the vocabulary grows with the corpus (Heaps' law), so
    # the top-V cut runs as TakeOrderedAndProject and only the V
    # survivors pass through the rank window
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("word"))
    top = (
        vocab.orderBy(F.desc("n_occurrences"), F.asc("word"))
        .limit(_Q128_TOP)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
    )
    enc = T.bpe_encode_col(F.col("word"), _Q128_MERGES)
    return top.select(
        "word",
        "n_occurrences",
        "rank",
        enc.alias("symbols"),
        F.size(F.split(enc, " ")).cast("bigint").alias("n_symbols"),
    )


# --------------------------------------------------------------------------
# q110 — BM25 retrieval over an inverted index: the classic sparse
# counterpart to q29/q30's dense ANN, and the retrieval shape RAG-style
# corpus tooling actually runs.  The index is the postings table
# (term, doc, tf) — ONE shuffle of the exploded token stream with
# map-side combine; document lengths and document frequencies both
# REDUCE from the already-aggregated postings (no second corpus scan).
# Queries are the distinct terms of the lowest-id docs ("more like
# this"); the tiny query-term list broadcasts, so scoring touches only
# the matching postings rows — at 100 TB you additionally stoplist
# df-heavy terms before the join (this corpus's 31-word vocabulary
# makes every term df-heavy, so the cap would empty the query; the
# selectivity win is real on a Zipfian vocabulary).  Lucene-style
# idf = ln(1 + (N-df+0.5)/(df+0.5)) keeps scores non-negative at any
# df.  The per-pair score sums doubles in engine order -> rounded to 4
# in BOTH engines BEFORE the rank window (the q30 technique); ties
# break on neighbor id.
# --------------------------------------------------------------------------
_Q110_K1, _Q110_B = 1.2, 0.75
_Q110_NQ, _Q110_TOP = 3, 10


@query(
    "q110_bm25_retrieval",
    f"""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (
        SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    qterms AS (
        SELECT doc_id AS query_id, term FROM tf WHERE doc_id < {_Q110_NQ}
    ),
    scored AS (
        SELECT q.query_id, p.doc_id AS neighbor_id,
               ROUND(SUM(
                   ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * p.tf * ({_Q110_K1} + 1)
                   / (p.tf + {_Q110_K1} * (1 - {_Q110_B}
                      + {_Q110_B} * l.dl / (s.sum_dl * 1.0 / s.n_docs)))
               ), 4) AS bm25
        FROM qterms q
        JOIN tf p ON p.term = q.term AND p.doc_id <> q.query_id
        JOIN df f ON f.term = q.term
        JOIN dl l ON l.doc_id = p.doc_id
        CROSS JOIN stats s
        GROUP BY q.query_id, p.doc_id
    )
    SELECT query_id, neighbor_id, bm25, rank FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY bm25 DESC, neighbor_id
        ) AS BIGINT) AS rank
        FROM scored
    ) WHERE rank <= {_Q110_TOP}
    """,
)
def q110_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return S.bm25_topk(
        d, n_queries=_Q110_NQ, k1=_Q110_K1, b=_Q110_B, top_k=_Q110_TOP
    )


# --------------------------------------------------------------------------
# q111 — distributed k-means in EXACT bigint arithmetic (Lloyd, fixed
# iterations): the corpus-clustering primitive under SemDeDup/IVF, run
# as a first-class catalog operator with a full hash oracle — possible
# only because every quantity is an integer (q108's exact-arithmetic
# idea applied to clustering; double k-means can never hash-match, its
# mean sums depend on reduction order).  Vectors quantize to
# round(x*1000)+1000 (non-negative, so s div n is floor division in
# both engines); centroids are floored integer means; assignment ties
# break on the lowest cluster id.  Per iteration: assignment is a pure
# projection against driver-rendered centroid literals (k x dim,
# bounded — the IVF-sample precedent), the update one map-side-combined
# shuffle of (cluster, dim) pairs.  The DuckDB twin unrolls both
# iterations as CTEs over the same integer math.
# --------------------------------------------------------------------------
_Q111_K, _Q111_ITERS = 8, 2


def _q111_oracle() -> str:
    dist = (
        "list_reduce([CAST(0 AS BIGINT)] || "
        "[(z.qv[i] - c.m[i]) * (z.qv[i] - c.m[i]) "
        "for i in range(1, len(z.qv) + 1)], (a, b) -> a + b)"
    )
    parts = [
        f"""
    qz AS (
        SELECT vec_id,
               [CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT) + 1000
                for x in embedding] AS qv
        FROM embeddings
    ),
    c0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               qv AS m
        FROM (SELECT vec_id, qv FROM qz ORDER BY vec_id LIMIT {_Q111_K})
    )"""
    ]
    for it in range(1, _Q111_ITERS + 1):
        parts.append(
            f"""
    a{it} AS (
        SELECT vec_id, qv, cid FROM (
            SELECT z.vec_id, z.qv, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY z.vec_id
                                      ORDER BY {dist}, c.cid) AS rn
            FROM qz z CROSS JOIN c{it - 1} c
        ) WHERE rn = 1
    )"""
        )
        if it < _Q111_ITERS:
            parts.append(
                f"""
    u{it} AS (
        SELECT cid, i, SUM(qv[i]) AS s, COUNT(*) AS n
        FROM a{it}, UNNEST(range(1, len(qv) + 1)) AS t(i)
        GROUP BY cid, i
    ),
    c{it} AS (
        SELECT c.cid,
               CASE WHEN COUNT(u.i) = 0 THEN c.m
                    ELSE list(CAST(u.s AS BIGINT) // u.n ORDER BY u.i)
               END AS m
        FROM c{it - 1} c LEFT JOIN u{it} u ON u.cid = c.cid
        GROUP BY c.cid, c.m
    )"""
            )
    return (
        "WITH "
        + ",".join(parts)
        + f"""
    SELECT cid AS cluster_id,
           COUNT(*) AS n_members,
           CAST(SUM(qv[1]) AS BIGINT) AS sum_d0,
           CAST(SUM(qv[2]) AS BIGINT) AS sum_d1
    FROM a{_Q111_ITERS} GROUP BY cid"""
    )


@query("q111_kmeans_exact", _q111_oracle())
def q111_kmeans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    assigned = S.kmeans_exact_assignments(
        e, k=_Q111_K, iters=_Q111_ITERS, scale=1000, shift=1000
    )
    return assigned.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.col("qv")[0]).cast("bigint").alias("sum_d0"),
        F.sum(F.col("qv")[1]).cast("bigint").alias("sum_d1"),
    )


# --------------------------------------------------------------------------
# q138 — Unicode NFC normalization (llm/text.py unicode_normalize): the
# multilingual cleanup step run before hashing/dedup/tokenization.  The
# corpus text is pure ASCII (NFC-invariant), so BOTH engines append the
# same HOSTILE decomposed suffix to force real composition work across
# every edge family (round-5 verdict item 5): combining acute, stacked
# combining marks (ogonek+acute), an fi ligature (NFC-invariant — must
# NOT fold under NFC), decomposed Hangul jamo (compose to one
# syllable), an astral-plane math letter (4-byte UTF-8, NFC-invariant),
# a fullwidth A (NFC-invariant), and A + combining ring (composes to
# Angstrom's letter) — the oracle check then verifies the Arrow
# pandas_udf batch path end to end (nfc_normalize is the DuckDB twin),
# not an identity pass; code-point length parity across Spark / DuckDB
# / Python was verified empirically (all three count code points, not
# UTF-16 units).  Catalyst has no normalization builtin; this is
# the sanctioned vectorized-UDF escape hatch, a pure per-row projection
# riding the scan (no shuffle).
# --------------------------------------------------------------------------
# the decomposed suffix, written as explicit escapes in BOTH engines (an
# editor could silently re-compose a pasted literal): U+0301 combining
# acute, U+0328 ogonek, U+FB01 fi-ligature, U+1100/U+1161/U+11A8 Hangul
# jamo, U+1D49C math script A, U+FF21 fullwidth A, U+030A combining ring
_Q138_SUFFIX = (
    " cafe\u0301 a\u0328\u0301 \ufb01le"
    " \u1100\u1161\u11a8 \U0001d49c \uff21 A\u030a"
)
_Q138_SUFFIX_SQL = (
    "' cafe' || chr(769) || ' a' || chr(808) || chr(769) || ' ' || "
    "chr(64257) || 'le ' || chr(4352) || chr(4449) || chr(4520) || ' ' || "
    "chr(119964) || ' ' || chr(65313) || ' A' || chr(778)"
)


@query(
    "q138_unicode_nfc_normalize",
    f"""
    WITH staged AS (
        SELECT doc_id, text || {_Q138_SUFFIX_SQL} AS raw FROM documents
    )
    SELECT doc_id,
           LENGTH(raw) AS n_before,
           LENGTH(nfc_normalize(raw)) AS n_after,
           raw <> nfc_normalize(raw) AS changed,
           substr(nfc_normalize(raw), LENGTH(nfc_normalize(raw)) - 3, 4)
               AS tail
    FROM staged
    """,
)
def q138_unicode_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.text import unicode_normalize

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(_Q138_SUFFIX)).alias("raw"),
    )
    norm = unicode_normalize(F.col("raw"))
    return d.select(
        "doc_id",
        F.length("raw").alias("n_before"),
        F.length(norm).alias("n_after"),
        (F.col("raw") != norm).alias("changed"),
        F.substring(norm, -4, 4).alias("tail"),
    )


# --------------------------------------------------------------------------
# q143 — ABSOLUTE per-source quota cap (llm/sampling.py group_quota_cap):
# the C4/RefinedWeb-style per-domain cap — no crawl source may contribute
# more than N documents to the mix, chosen by a seeded md5 order so the
# cap is reproducible across reruns and recomputable by the oracle.  The
# fraction-quota sibling is q66; this is the absolute-cap twin the
# crawl-curation recipes actually use.  ONE window exchange on source.
# --------------------------------------------------------------------------
_Q143_CAP, _Q143_SEED = 40, 143


@query(
    "q143_per_source_quota_cap",
    f"""
    WITH ranked AS (
        SELECT doc_id, lang, source, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_Q143_SEED}:' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS group_rank,
               COUNT(*) OVER (PARTITION BY source) AS group_docs
        FROM documents
    )
    SELECT doc_id, lang, source, n_chars, group_rank, group_docs
    FROM ranked WHERE group_rank <= {_Q143_CAP}
    """,
)
def q143_per_source_quota_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.sampling import group_quota_cap

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    return group_quota_cap(
        d, group_col="source", cap=_Q143_CAP, seed=_Q143_SEED
    )


# --------------------------------------------------------------------------
# q144 — cluster-safe train/val/test split (llm/sampling.py
# cluster_safe_split): every near-dup CLUSTER (q26's pair graph, q57's
# components) lands wholly in one split, so a lightly-edited twin of a
# val/test document can never leak into train — the guarantee raw
# id-hash splitting does not give.  Split = exact-integer md5 bucket of
# the cluster's min id (singletons: own id), thresholds computed as
# integers so both engines compare exactly.  Oracle: the q57 recursive-
# CTE components left-joined to all docs + the same bucket arithmetic.
# --------------------------------------------------------------------------
_Q144_SEED, _Q144_MOD = 144, 1_048_576
_Q144_T_TEST = int(_Q144_MOD * 0.1)
_Q144_T_VAL = int(_Q144_MOD * 0.2)


def _q144_sql() -> str:
    pairs = _minhash_sql().strip()
    bucket = (
        f"CAST(('0x' || substr(md5('{_Q144_SEED}:' || "
        f"CAST(grp AS VARCHAR)), 1, 15)) AS BIGINT) % {_Q144_MOD}"
    )
    return f"""
    WITH RECURSIVE pairs AS ({pairs}),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    reach(id, label) AS (
        SELECT id, id FROM nodes
        UNION
        SELECT e.src, r.label FROM edges e JOIN reach r ON r.id = e.dst
    ),
    comp AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
    grouped AS (
        SELECT d.doc_id, d.lang,
               COALESCE(c.cluster_id, d.doc_id) AS grp
        FROM documents d LEFT JOIN comp c ON c.id = d.doc_id
    )
    SELECT doc_id, lang, grp AS cluster_id,
           CASE WHEN {bucket} < {_Q144_T_TEST} THEN 'test'
                WHEN {bucket} < {_Q144_T_VAL} THEN 'val'
                ELSE 'train' END AS split
    FROM grouped
    """


@query("q144_cluster_safe_split", _q144_sql())
def q144_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.sampling import (
        cluster_safe_split,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    pairs = D.minhash_near_dups(
        d, threshold=0.5, cache_shingles=True,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    return cluster_safe_split(
        d, pairs, val_frac=0.1, test_frac=0.1,
        seed=_Q144_SEED, mod=_Q144_MOD,
    ).select("doc_id", "lang", "cluster_id", "split")


# --------------------------------------------------------------------------
# q145 — per-document n-gram NOVELTY (llm/dedup.py novelty_scores): the
# fraction of a doc's distinct shingles appearing in NO other document —
# the per-doc complement of q63's corpus-level boilerplate ranking, used
# as a curation signal (low-novelty docs are assembled from phrases the
# corpus already has).  Scale shape: gram posting list is the only wide
# data; document frequency is ONE window count over gram and the per-doc
# rollup one more keyed exchange — text never shuffles.
# --------------------------------------------------------------------------
@query(
    "q145_ngram_novelty",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    sh AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks WHERE len(tk) >= 3),
    posts AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
    tagged AS (
        SELECT doc_id, COUNT(*) OVER (PARTITION BY gram) AS df FROM posts
    )
    SELECT doc_id,
           COUNT(*) AS n_shingles,
           CAST(count_if(df = 1) AS BIGINT) AS n_novel,
           ROUND(count_if(df = 1) * 1.0 / COUNT(*), 6) AS novelty_frac
    FROM tagged GROUP BY doc_id
    """,
)
def q145_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return D.novelty_scores(d)


# --------------------------------------------------------------------------
# q146 — asymmetric CONTAINMENT near-dups (llm/dedup.py
# shingle_join_candidates + containment_scores): |A∩B|/|A| vs |B| for
# pairs sharing a RARE shingle (document frequency <= 10) — the
# quote-inclusion / partial-copy detector Jaccard hides (a short doc
# fully quoted inside a long one has containment ~1, jaccard ~0).
# MinHash bands estimate Jaccard and would MISS these candidates; the
# inverted-index scheme keys on shared content directly, cost bounded by
# max_df * |postings|.  Oracle: the same posting-df window + self-join.
# --------------------------------------------------------------------------
_Q146_MAX_DF, _Q146_THRESHOLD = 10, 0.5
_Q146_MAX_PAIRS = 2_000_000  # mirrors shingle_join_candidates' default


@query(
    "q146_containment_near_dups",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    sh AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks WHERE len(tk) >= 3),
    posts AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
    tagged AS (
        SELECT doc_id, gram, COUNT(*) OVER (PARTITION BY gram) AS df
        FROM posts
    ),
    rare0 AS (
        SELECT doc_id, gram, df FROM tagged WHERE df <= {_Q146_MAX_DF}
    ),
    -- mirror of pair_budget_cutoff (llm/dedup.py): smallest dfs keep
    -- first; the first df whose cumulative pair mass overflows the
    -- max_pairs budget sheds itself and every larger df.  The sf1
    -- sweep caught the unmirrored shed (spark 2520 vs oracle 2560 —
    -- the sf0.01 gate never trips the budget, sf1 does)
    histo AS (
        SELECT df AS n, COUNT(DISTINCT gram) AS grams
        FROM rare0 GROUP BY df
    ),
    cum AS (
        SELECT n,
               SUM(n * (n - 1) // 2 * grams) OVER (
                   ORDER BY n
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum_pairs
        FROM histo
    ),
    cut AS (SELECT MIN(n) AS c FROM cum WHERE cum_pairs > {_Q146_MAX_PAIRS}),
    rare AS (
        SELECT doc_id, gram FROM rare0
        WHERE df < COALESCE((SELECT c FROM cut), df + 1)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM rare a JOIN rare b
          ON a.gram = b.gram AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           ROUND(LEN(list_intersect(sa.sh, sb.sh)) * 1.0 / LEN(sa.sh), 6)
               AS containment_a,
           ROUND(LEN(list_intersect(sa.sh, sb.sh)) * 1.0 / LEN(sb.sh), 6)
               AS containment_b,
           ROUND(LEN(list_intersect(sa.sh, sb.sh)) * 1.0
                 / LEN(list_distinct(list_concat(sa.sh, sb.sh))), 6)
               AS jaccard
    FROM cand c
    JOIN sh sa ON sa.doc_id = c.id_a
    JOIN sh sb ON sb.doc_id = c.id_b
    WHERE GREATEST(
        LEN(list_intersect(sa.sh, sb.sh)) * 1.0 / LEN(sa.sh),
        LEN(list_intersect(sa.sh, sb.sh)) * 1.0 / LEN(sb.sh)
    ) >= {_Q146_THRESHOLD}
    """,
)
def q146_containment_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # single-call pipeline; cache_shingles stays OFF — the shared-persist
    # variant measures SLOWER same-session (sf1: 10.7 -> 12.3 s; see
    # containment_near_dups's docstring for why recompute wins here)
    return D.containment_near_dups(
        d, max_df=_Q146_MAX_DF, threshold=_Q146_THRESHOLD,
        max_pairs=_Q146_MAX_PAIRS,
    )


# --------------------------------------------------------------------------
# q147 — winnowing fingerprint profile (llm/text.py winnow_fingerprints,
# the MOSS local-similarity primitive): positional k-gram hashes, window
# minima, distinct per doc — any shared >= (k + window - 1)-token
# substring surfaces as a shared fingerprint.  Per-doc rollup: how many
# fingerprints, how many shared with another doc.  The POSITION-aware
# complement of q145's bag-of-grams novelty.  Scale: one (doc, pos)
# exchange end-to-end for the fingerprints, one fp-keyed window for
# document frequency, one doc rollup.
# --------------------------------------------------------------------------
_Q147_K, _Q147_W = 3, 4


@query(
    "q147_winnow_profile",
    f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    grams AS (
        SELECT doc_id,
               [concat_ws(' ', tk[i], tk[i+1], tk[i+2])
                for i in range(1, len(tk) - 1)] AS gs
        FROM toks WHERE len(tk) >= {_Q147_K}
    ),
    hashed AS (
        SELECT doc_id,
               [CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
                for g in gs] AS hs
        FROM grams
    ),
    mins AS (
        SELECT doc_id,
               list_distinct([list_min(hs[i:i+{_Q147_W - 1}])
                for i in range(1, len(hs) - {_Q147_W - 2})]) AS fps
        FROM hashed WHERE len(hs) >= {_Q147_W}
    ),
    posts AS (SELECT doc_id, unnest(fps) AS fp FROM mins),
    tagged AS (
        SELECT doc_id, COUNT(*) OVER (PARTITION BY fp) AS df FROM posts
    )
    SELECT doc_id,
           COUNT(*) AS n_fps,
           CAST(count_if(df > 1) AS BIGINT) AS n_shared,
           ROUND(count_if(df > 1) * 1.0 / COUNT(*), 6) AS shared_frac
    FROM tagged GROUP BY doc_id
    """,
)
def q147_winnow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ominimo_dynamic_data_pipeline_spark.llm.text import (
        winnow_fingerprints,
    )

    d = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, k=_Q147_K, window=_Q147_W)
    w = Window.partitionBy("fp")
    tagged = fps.withColumn("_df", F.count(F.lit(1)).over(w))
    return (
        tagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fps"),
            F.count_if(F.col("_df") > 1).alias("n_shared"),
        )
        .withColumn(
            "shared_frac", duck_round_expr(F.col("n_shared") / F.col("n_fps"), 6)
        )
    )


# --------------------------------------------------------------------------
# q148 — T5-style span corruption (llm/text.py span_corrupt): masked
# span (inputs, targets) pairs for denoising pretraining, phase-shifted
# per doc by a seeded md5 so spans never align corpus-wide, sentinels
# numbered by raw run index, doc-initial truncated runs still open a
# sentinel.  Pure staged projections riding the scan — no shuffle, no
# UDF; deterministic, so retries and the oracle reproduce bit-exactly.
# --------------------------------------------------------------------------
_Q148_SPAN, _Q148_STRIDE, _Q148_SEED = 3, 10, 148


def _q148_sql() -> str:
    sp, st, seed = _Q148_SPAN, _Q148_STRIDE, _Q148_SEED
    off = (
        f"CAST(('0x' || substr(md5('{seed}:' || CAST(doc_id AS VARCHAR)), "
        f"1, 15)) AS BIGINT) % {st}"
    )
    return f"""
    WITH toks AS (
        SELECT doc_id, {SQL_TOKS} AS tk, {off} AS off FROM documents
    ),
    base AS (SELECT doc_id, tk, off FROM toks WHERE len(tk) >= 1)
    SELECT doc_id,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           array_to_string(list_filter(
               [CASE WHEN ((i-1+off) % {st}) >= {sp} THEN tk[i]
                     WHEN ((i-1+off) % {st}) = 0 OR i = 1
                     THEN '<extra_id_' || CAST((i-1+off) // {st} AS VARCHAR) || '>'
                     ELSE NULL END
                for i in range(1, len(tk)+1)],
               x -> x IS NOT NULL), ' ') AS corrupted,
           array_to_string(flatten(
               [CASE WHEN ((i-1+off) % {st}) < {sp}
                          AND (((i-1+off) % {st}) = 0 OR i = 1)
                     THEN ['<extra_id_' || CAST((i-1+off) // {st} AS VARCHAR) || '>', tk[i]]
                     WHEN ((i-1+off) % {st}) < {sp} THEN [tk[i]]
                     ELSE [] END
                for i in range(1, len(tk)+1)]), ' ') AS target,
           CAST(len(list_filter(range(1, len(tk)+1),
                i -> ((i-1+off) % {st}) < {sp})) AS BIGINT) AS n_masked
    FROM base
    """


@query("q148_span_corruption", _q148_sql())
def q148_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.text import span_corrupt

    d = load_table(spark, sf_dir, "documents")
    return span_corrupt(
        d, span_len=_Q148_SPAN, stride=_Q148_STRIDE, seed=_Q148_SEED
    )


# --------------------------------------------------------------------------
# q150 — deterministic shard/shuffle manifest (llm/sampling.py
# shard_manifest): the dataloader-facing end of the curation story —
# every doc gets a stable pseudo-random (shard, position) so training
# epochs read well-mixed, reproducible shards; hash-sharding balances
# sizes and destroys source/time order.  ONE window exchange on shard;
# at 100 TB the result writes partitionBy(shard).
# --------------------------------------------------------------------------
_Q150_SHARDS, _Q150_SEED = 8, 150


@query(
    "q150_shard_manifest",
    f"""
    WITH keyed AS (
        SELECT doc_id, lang, source,
               CAST(('0x' || substr(md5('{_Q150_SEED}:' || CAST(doc_id AS VARCHAR)),
                     1, 15)) AS BIGINT) AS k
        FROM documents
    )
    SELECT doc_id, lang, source,
           CAST(k % {_Q150_SHARDS} AS INTEGER) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY k % {_Q150_SHARDS} ORDER BY k, doc_id
           ) AS BIGINT) AS pos_in_shard
    FROM keyed
    """,
)
def q150_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.sampling import shard_manifest

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return shard_manifest(d, n_shards=_Q150_SHARDS, seed=_Q150_SEED)


# --------------------------------------------------------------------------
# q152 — SUBSTRING-level decontamination via winnowing (llm/sampling.py
# winnow_decontaminate): train docs sharing any winnow fingerprint with
# the eval set (doc_id < 10, the q56 convention), counted — the
# winnowing guarantee (q147) makes any shared >= k+window-1-token run
# detectable, the substring-granular complement of q56's 8-gram and
# q129's embedding checks.  Eval fingerprints broadcast; train cost is
# one (doc, pos) pass + a broadcast join.
# --------------------------------------------------------------------------
def _q152_sql() -> str:
    k, w = _Q147_K, _Q147_W
    return f"""
    WITH toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM documents),
    grams AS (
        SELECT doc_id,
               [concat_ws(' ', tk[i], tk[i+1], tk[i+2])
                for i in range(1, len(tk) - 1)] AS gs
        FROM toks WHERE len(tk) >= {k}
    ),
    hashed AS (
        SELECT doc_id,
               [CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
                for g in gs] AS hs
        FROM grams
    ),
    fps AS (
        SELECT doc_id, unnest(list_distinct(
               [list_min(hs[i:i+{w - 1}])
                for i in range(1, len(hs) - {w - 2})])) AS fp
        FROM hashed WHERE len(hs) >= {w}
    ),
    eval_fps AS (SELECT DISTINCT fp FROM fps WHERE doc_id < 10)
    SELECT f.doc_id, COUNT(*) AS n_contaminated_fps
    FROM fps f JOIN eval_fps e ON f.fp = e.fp
    WHERE f.doc_id >= 10
    GROUP BY f.doc_id
    """


@query("q152_winnow_decontamination", _q152_sql())
def q152_winnow_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.sampling import (
        winnow_decontaminate,
    )

    d = load_table(spark, sf_dir, "documents")
    return winnow_decontaminate(
        d.filter(F.col("doc_id") >= 10),
        d.filter(F.col("doc_id") < 10),
        k=_Q147_K,
        window=_Q147_W,
    )


# --------------------------------------------------------------------------
# q153 — cross-source PROVENANCE OVERLAP matrix: for every pair of
# sources, how many winnow fingerprints they share — the "who copies
# from whom" curation analytic (mirror-site detection, syndication
# mapping) built on q147's fingerprints.  Shape: fingerprints reduce to
# their DISTINCT (fp, source) pairs first (bounded by |fps| x |sources|),
# then per-fp source lists expand to ordered pairs — sources are FEW, so
# the expansion is |fps| x |sources|^2 worst case, never doc-pairwise.
# --------------------------------------------------------------------------
@query(
    "q153_source_overlap_matrix",
    f"""
    WITH toks AS (SELECT doc_id, source, {SQL_TOKS} AS tk FROM documents),
    grams AS (
        SELECT doc_id, source,
               [concat_ws(' ', tk[i], tk[i+1], tk[i+2])
                for i in range(1, len(tk) - 1)] AS gs
        FROM toks WHERE len(tk) >= {_Q147_K}
    ),
    hashed AS (
        SELECT doc_id, source,
               [CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT)
                for g in gs] AS hs
        FROM grams
    ),
    fps AS (
        SELECT DISTINCT source, unnest(list_distinct(
               [list_min(hs[i:i+{_Q147_W - 1}])
                for i in range(1, len(hs) - {_Q147_W - 2})])) AS fp
        FROM hashed WHERE len(hs) >= {_Q147_W}
    )
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS shared_fps
    FROM fps a JOIN fps b
      ON a.fp = b.fp AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q153_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.text import (
        winnow_fingerprints,
    )

    d = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, k=_Q147_K, window=_Q147_W)
    src_fps = (
        fps.join(d.select("doc_id", "source"), on="doc_id")
        .select("source", "fp")
        .distinct()
    )
    a, b = src_fps.alias("a"), src_fps.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("shared_fps"))
    )


# --------------------------------------------------------------------------
# q154 — DSIR importance weights (llm/sampling.py dsir_importance): score
# every doc by the log-likelihood ratio of its tokens under the TARGET
# distribution (here the 'en' slice — in production a trusted corpus like
# Wikipedia) vs the RAW corpus, with the paper's hashed-feature trick
# (md5 buckets) bounding the feature table at 512 rows BY CONSTRUCTION —
# the bucket->ratio table broadcasts at any corpus size, unlike a raw
# web-text vocabulary.  Data selection by importance: the top-100 docs
# (by rounded llr, doc_id tiebreak) are what resampling would keep.
# Scale shape: one token shuffle for per-doc tf, one bounded feature
# reduce, one broadcast join back — text never shuffles twice; the
# global selection window carries only (doc, llr).  Float discipline:
# per-feature log-ratio quantized to an INTEGER micro-unit before the
# per-doc sum (exact bigint arithmetic in both engines — sum-order
# drift measurably straddles round-4 otherwise); llr = sum/1e6 with NO
# final rounding (same integer / same literal = bit-identical doubles;
# a round-4 re-introduces half-point divergence, measured on doc 478).
# --------------------------------------------------------------------------
_Q154_ALPHA, _Q154_BUCKETS, _Q154_SEED, _Q154_TOP = 0.5, 512, 154, 100


@query(
    "q154_dsir_importance",
    f"""
    WITH toks AS (
        SELECT doc_id, lang, unnest({SQL_TOKS}) AS term FROM documents),
    keyed AS (
        SELECT doc_id, lang,
               COALESCE(lang = 'en', FALSE) AS is_t,
               {_sql_md5_long('term', _Q154_SEED)} % {_Q154_BUCKETS} AS k
        FROM toks),
    tf AS (
        SELECT doc_id, lang, is_t, k, COUNT(*) AS tf
        FROM keyed GROUP BY ALL),
    vocab AS (
        SELECT k, SUM(tf) AS c_raw,
               SUM(CASE WHEN is_t THEN tf ELSE 0 END) AS c_tgt
        FROM tf GROUP BY k),
    tot AS (
        SELECT SUM(c_raw) AS n_raw, SUM(c_tgt) AS n_tgt, COUNT(*) AS v
        FROM vocab),
    lr AS (
        SELECT k, CAST(ROUND(
                   (ln((c_tgt + {_Q154_ALPHA}) / (n_tgt + {_Q154_ALPHA} * v))
                  - ln((c_raw + {_Q154_ALPHA}) / (n_raw + {_Q154_ALPHA} * v)))
                   * 1e6) AS BIGINT) AS lr_micro
        FROM vocab CROSS JOIN tot),
    doc AS (
        SELECT tf.doc_id, tf.lang,
               CAST(SUM(tf) AS BIGINT) AS n_tokens,
               SUM(tf * lr_micro) / 1e6 AS llr
        FROM tf JOIN lr USING (k)
        GROUP BY tf.doc_id, tf.lang)
    SELECT doc_id, lang, n_tokens, llr, sel_rank,
           CAST(CASE WHEN sel_rank <= {_Q154_TOP} THEN 1 ELSE 0 END AS BIGINT)
               AS selected
    FROM (
        SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY llr DESC, doc_id)
                       AS BIGINT) AS sel_rank
        FROM doc)
    """,
)
def q154_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.sampling import dsir_importance
    from ominimo_dynamic_data_pipeline_spark.operators.scale import (
        distributed_row_number,
    )

    d = load_table(spark, sf_dir, "documents")
    weights = dsir_importance(
        d,
        target=F.col("lang") == "en",
        alpha=_Q154_ALPHA,
        num_buckets=_Q154_BUCKETS,
        seed=_Q154_SEED,
    )
    # sel_rank via the two-phase distributed rank — the round-7 verdict's
    # q154 finding: the old corpus-wide Window.orderBy row_number funnels
    # EVERY per-doc weight through one task (1B docs = one executor
    # sorting 1B rows); distributed_row_number range-partitions the sort
    # and stitches exact global ranks from a per-partition census.
    ranked, _ = distributed_row_number(
        weights.join(d.select("doc_id", "lang"), on="doc_id"),
        [F.desc("llr"), F.asc("doc_id")],
        rn_col="sel_rank",
    )
    return (
        ranked
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "llr",
            "sel_rank",
            F.when(F.col("sel_rank") <= _Q154_TOP, F.lit(1))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("selected"),
        )
    )


# --------------------------------------------------------------------------
# q155 — hybrid retrieval via reciprocal-rank fusion (llm/similarity.py
# rrf_fuse): fuse the sparse BM25 run (the q110 machinery — same
# constants, same inverted index) with a dense cosine run (the q29
# brute-force shape) for the same 3 query docs, score = sum over runs of
# 1/(60 + rank).  RRF needs no score calibration — ranks are comparable
# across runs even though bm25 and cosine scores are not — which is why
# it is the standard production fusion for RAG-style retrieval.  The
# testdata aligns doc_id and vec_id 1:1, mirroring a corpus with one
# embedding per document.  Scale shape: fusion consumes two already-
# top-k frames (|Q| x k x 2 rows) — one keyed reduce + one per-query
# window; the expensive stages are the retrievals themselves, which
# keep their own 100 TB shapes (bucketed LSH/IVF swaps in for brute
# force transparently: any (query, neighbor, rank) frame fuses).  Float
# discipline: contributions quantized to integer nano-units before the
# sum (exact in both engines), rrf_score = nano sum / 1e9, never
# re-rounded; per-run ranks use the round-4-then-rank q29/q110
# technique; ties on the fused score break on neighbor_id.
# --------------------------------------------------------------------------
_Q155_K0, _Q155_TOP = 60, 10
# The Spark side consumes q110's ALREADY-CUT sparse run while the oracle
# cuts both runs at _Q155_TOP — the two constants must agree or the
# engines fuse different candidate sets.
assert _Q155_TOP == _Q110_TOP, "q155 fuses q110's top-k; keep the cuts equal"


@query(
    "q155_hybrid_rrf_retrieval",
    f"""
    WITH tf AS (
        SELECT doc_id, term, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest({SQL_TOKS}) AS term FROM documents)
        GROUP BY doc_id, term
    ),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    qterms AS (
        SELECT doc_id AS query_id, term FROM tf WHERE doc_id < {_Q110_NQ}
    ),
    sparse_scored AS (
        SELECT q.query_id, p.doc_id AS neighbor_id,
               ROUND(SUM(
                   ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                   * p.tf * ({_Q110_K1} + 1)
                   / (p.tf + {_Q110_K1} * (1 - {_Q110_B}
                      + {_Q110_B} * l.dl / (s.sum_dl * 1.0 / s.n_docs)))
               ), 4) AS bm25
        FROM qterms q
        JOIN tf p ON p.term = q.term AND p.doc_id <> q.query_id
        JOIN df f ON f.term = q.term
        JOIN dl l ON l.doc_id = p.doc_id
        CROSS JOIN stats s
        GROUP BY q.query_id, p.doc_id
    ),
    sparse_rank AS (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY bm25 DESC, neighbor_id) AS rank
        FROM sparse_scored
    ),
    dense_scored AS (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROUND(list_dot_product(q.qv::DOUBLE[], c.embedding::DOUBLE[])
                     / (SQRT(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))
                        * SQRT(list_dot_product(c.embedding::DOUBLE[],
                                                c.embedding::DOUBLE[]))),
                     4) AS cos
        FROM embeddings c CROSS JOIN (
            SELECT vec_id AS query_id, embedding AS qv
            FROM embeddings WHERE vec_id < {_Q110_NQ}) q
        WHERE c.vec_id <> q.query_id
    ),
    dense_rank AS (
        SELECT query_id, neighbor_id, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
        FROM dense_scored
    ),
    unioned AS (
        SELECT query_id, neighbor_id,
               CAST(ROUND(1e9 / ({_Q155_K0} + rank)) AS BIGINT) AS nano
        FROM sparse_rank WHERE rank <= {_Q155_TOP}
        UNION ALL
        SELECT query_id, neighbor_id,
               CAST(ROUND(1e9 / ({_Q155_K0} + rank)) AS BIGINT) AS nano
        FROM dense_rank WHERE rank <= {_Q155_TOP}
    ),
    fused AS (
        SELECT query_id, neighbor_id, SUM(nano) AS nano_sum,
               CAST(COUNT(*) AS BIGINT) AS n_runs
        FROM unioned GROUP BY query_id, neighbor_id
    )
    SELECT query_id, neighbor_id, nano_sum / 1e9 AS rrf_score, n_runs,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY query_id ORDER BY nano_sum DESC, neighbor_id)
               AS BIGINT) AS fused_rank
    FROM fused
    """,
)
def q155_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.similarity import rrf_fuse

    sparse = q110_bm25_retrieval(spark, sf_dir).select(
        "query_id", "neighbor_id", "rank"
    )
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _Q110_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    dense = S.brute_force_topk(e, q, k=_Q155_TOP, round_to=4).select(
        "query_id", "neighbor_id", "rank"
    )
    return rrf_fuse([sparse, dense], k0=_Q155_K0)


# --------------------------------------------------------------------------
# q158 — per-doc token Shannon entropy (llm/text.py token_entropy): the
# gibberish / degenerate-text magnitude signal q67's duplicate fractions
# only bound — one-phrase spam scores near 0, all-distinct text at
# ln(n); norm_entropy = H/ln(n) gives the [0,1] curation threshold.
# Exactness: H = ln(n) - (1/n) sum c*ln(c) with every ln quantized to an
# integer nano-unit, so scaled = n*L(n) - sum c*L(c) is exact bigint
# arithmetic in both engines and both outputs are single divisions of
# identical integers (bit-identical doubles, nothing to straddle).
# Scale shape: the standard two-exchange tf profile — token stream with
# map-side combine, keyed reduce to the doc; no UDF.
# --------------------------------------------------------------------------
@query(
    "q158_token_entropy",
    f"""
    WITH toks AS (SELECT doc_id, unnest({SQL_TOKS}) AS u FROM documents),
    tf AS (SELECT doc_id, u, COUNT(*) AS c FROM toks GROUP BY doc_id, u),
    agg AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               SUM(c * CAST(ROUND(ln(c) * 1e9) AS BIGINT)) AS sum_c_ln
        FROM tf GROUP BY doc_id)
    SELECT doc_id, n_tokens, n_types,
           (n_tokens * CAST(ROUND(ln(n_tokens) * 1e9) AS BIGINT) - sum_c_ln)
               / (n_tokens * 1e9) AS entropy,
           CASE WHEN n_tokens > 1 THEN
               (n_tokens * CAST(ROUND(ln(n_tokens) * 1e9) AS BIGINT)
                - sum_c_ln)
               / (n_tokens * CAST(ROUND(ln(n_tokens) * 1e9) AS BIGINT))
           END AS norm_entropy
    FROM agg
    """,
)
def q158_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.token_entropy(d)


# --------------------------------------------------------------------------
# q159 — deterministic source-interleaved curriculum order
# (llm/sampling.py interleave_order): position (rank-1)*n_groups + gidx
# round-robins the reader across sources, so a corpus written
# source-by-source never feeds a training run long same-source runs —
# the order complement of q150's shard manifest (which balances SIZE,
# not adjacency).  In-group order is the seeded md5 key (retry-stable);
# once a source exhausts its slots become gaps — positions stay unique
# and ordered, all a sort key needs.  Scale shape: ONE window exchange
# on source; the group-index table is the bounded distinct-source list
# broadcast back.  Exact integer arithmetic throughout — nothing to
# round, nothing to straddle.
# --------------------------------------------------------------------------
_Q159_SEED = 159


@query(
    "q159_interleaved_curriculum",
    f"""
    WITH src AS (
        SELECT source,
               CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT)
                   AS gidx
        FROM (SELECT DISTINCT source FROM documents)),
    ng AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups FROM src),
    ranked AS (
        SELECT doc_id, source,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_Q159_SEED}:' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS BIGINT) AS rank_in_group
        FROM documents)
    SELECT r.doc_id, r.source, r.rank_in_group,
           CAST((r.rank_in_group - 1) * ng.n_groups + s.gidx AS BIGINT)
               AS interleave_pos
    FROM ranked r JOIN src s USING (source) CROSS JOIN ng
    """,
)
def q159_interleaved_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.sampling import (
        interleave_order,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return interleave_order(d, group_col="source", seed=_Q159_SEED).select(
        "doc_id", "source", "rank_in_group", "interleave_pos"
    )


# --------------------------------------------------------------------------
# q160 — MMR-diversified retrieval (llm/similarity.py mmr_rerank): the
# q29 brute-force top-20 per query greedily re-ranked to 5 results
# maximizing lambda*relevance - (1-lambda)*max-sim-to-picked — the
# diversification pass that collapses near-identical top hits.  The
# greedy loop is inherently sequential per query, so this is the
# catalog's batch applyInPandas demonstration (the streaming twin is
# q116's applyInPandasWithState): one Arrow batch per query pool,
# O(N^2 + N*k) inside, pool bounded by the retrieval cut (20) — the
# stage scales with query count, never corpus size.  Oracle (round-7,
# closing the round-6 "shrink the rows-only set" item): with
# sim_round_to=4 the kernel's penalty cosines are sequential-sum
# doubles quantized to 1e-4, so the greedy trace is engine-independent
# and a DuckDB recursive CTE replays it exactly — per step, score every
# remaining candidate (0.7*rel - 0.3*max-rounded-sim-to-picked, the
# float literals rendered via repr so 1-0.7 is the same double both
# sides), argmax via QUALIFY with the smaller-id tie-break, selected
# set carried as a LIST column.  The pure-Python MMR reference pin in
# tests/test_llm.py still covers the unquantized default path.
# --------------------------------------------------------------------------
_Q160_POOL, _Q160_K, _Q160_LAMBDA = 20, 5, 0.7


def _q160_oracle_sql() -> str:
    lam = repr(float(_Q160_LAMBDA))
    omlam = repr(1.0 - float(_Q160_LAMBDA))
    # COALESCE(NULLIF(norm, 0), 1.0) mirrors the kernel's zero-norm guard
    # ("or 1.0" in mmr_rerank's sequential path): a zero embedding must
    # score 0.0 in BOTH engines, not NULL/div-by-zero in one
    cos = (
        "list_dot_product(ea.embedding::DOUBLE[], eb.embedding::DOUBLE[])"
        " / (COALESCE(NULLIF(SQRT(list_dot_product(ea.embedding::DOUBLE[],"
        " ea.embedding::DOUBLE[])), 0), 1.0)"
        " * COALESCE(NULLIF(SQRT(list_dot_product(eb.embedding::DOUBLE[],"
        " eb.embedding::DOUBLE[])), 0), 1.0))"
    )
    return f"""
    WITH RECURSIVE q AS (
        SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 3
    ),
    pool AS (
        SELECT query_id, neighbor_id, cos AS rel FROM (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   ROUND(list_dot_product(q.qv::DOUBLE[], c.embedding::DOUBLE[])
                         / (SQRT(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))
                            * SQRT(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))),
                         4) AS cos
            FROM embeddings c CROSS JOIN q
            WHERE c.vec_id <> q.query_id
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY q.query_id ORDER BY cos DESC, c.vec_id
            ) <= {_Q160_POOL}
        )
    ),
    sims AS (
        SELECT a.query_id, a.neighbor_id AS ia, b.neighbor_id AS ib,
               ROUND({cos}, 4) AS s
        FROM pool a
        JOIN pool b ON a.query_id = b.query_id AND a.neighbor_id <> b.neighbor_id
        JOIN embeddings ea ON ea.vec_id = a.neighbor_id
        JOIN embeddings eb ON eb.vec_id = b.neighbor_id
    ),
    mmr AS (
        SELECT query_id, 1 AS mmr_rank, neighbor_id AS pick,
               '{lam}'::DOUBLE * rel - '{omlam}'::DOUBLE * 0.0::DOUBLE AS score,
               [neighbor_id] AS sel
        FROM pool
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id
            ORDER BY '{lam}'::DOUBLE * rel - '{omlam}'::DOUBLE * 0.0::DOUBLE DESC,
                     neighbor_id
        ) = 1
        UNION ALL
        SELECT query_id, mmr_rank, neighbor_id, key, list_append(sel, neighbor_id)
        FROM (
            SELECT m.query_id, m.mmr_rank + 1 AS mmr_rank, m.sel, c.neighbor_id,
                   '{lam}'::DOUBLE * c.rel - '{omlam}'::DOUBLE * MAX(p.s) AS key
            FROM mmr m
            JOIN pool c ON c.query_id = m.query_id
                       AND NOT list_contains(m.sel, c.neighbor_id)
            JOIN sims p ON p.query_id = m.query_id AND p.ia = c.neighbor_id
                       AND list_contains(m.sel, p.ib)
            WHERE m.mmr_rank < {_Q160_K}
            GROUP BY m.query_id, m.mmr_rank, m.sel, c.neighbor_id, c.rel
        )
        QUALIFY ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY key DESC, neighbor_id
        ) = 1
    )
    SELECT query_id, pick AS neighbor_id, ROUND(score, 4) AS mmr_score,
           CAST(mmr_rank AS BIGINT) AS mmr_rank
    FROM mmr
    """


@query("q160_mmr_rerank", _q160_oracle_sql())
def q160_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.similarity import mmr_rerank

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    pool = S.brute_force_topk(e, q, k=_Q160_POOL, round_to=4).select(
        "query_id", "neighbor_id", F.col("cos").alias("rel")
    )
    # score_round_to replaces the old duck_round_expr(mmr_score, 4): Spark's
    # F.round (BigDecimal shortest-string HALF_UP) and DuckDB's ROUND
    # (multiply-then-half-away) diverge on boundary doubles — the sf1
    # sweep caught one (0.4146 vs 0.4147); the kernel now applies
    # DuckDB-exact rounding itself (similarity.duck_round)
    return mmr_rerank(
        pool, e, k=_Q160_K, lambda_=_Q160_LAMBDA,
        sim_round_to=4, score_round_to=4,
    )


# --------------------------------------------------------------------------
# q163 — retrieval evaluation: recall@10 / MRR / nDCG@10 of the LSH run
# (q30 machinery, k=10) against brute-force truth (q29 machinery, k=10)
# — the ANN quality contract as a first-class catalog query instead of
# only a pytest floor: the "measure, don't guess" number a 100 TB
# deployment tracks when tuning (num_planes, num_tables).  Exactness:
# DCG gains depend only on the rank (1..10), so both engines use the
# SAME precomputed integer nano-unit literals (no cross-engine log2
# anywhere); DCG sums are exact bigints, nDCG/recall/MRR are single
# divisions of identical integers.  Scale shape: both runs keep their
# own shapes; the eval is a top-k-sized left join + one keyed reduce.
# --------------------------------------------------------------------------
_Q163_K = 10
_Q163_GAIN = {r: round(1e9 / math.log2(r + 1)) for r in range(1, _Q163_K + 1)}
_Q163_IDCG = sum(_Q163_GAIN.values())  # truth always has k hits here


def _q163_gain_sql(col: str) -> str:
    cases = " ".join(
        f"WHEN {r} THEN {g}" for r, g in _Q163_GAIN.items()
    )
    return f"CASE {col} {cases} END"


@query(
    "q163_retrieval_eval",
    f"""
    WITH run AS (
        SELECT query_id, neighbor_id, rank
        FROM ({_lsh_topk_sql(k=_Q163_K)})
    ),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(
                           list_dot_product(q.embedding::DOUBLE[],
                                            c.embedding::DOUBLE[])
                           / (SQRT(list_dot_product(q.embedding::DOUBLE[],
                                                    q.embedding::DOUBLE[]))
                              * SQRT(list_dot_product(c.embedding::DOUBLE[],
                                                      c.embedding::DOUBLE[]))),
                           4) DESC, c.vec_id) AS trank
            FROM embeddings c
            CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
            WHERE c.vec_id <> q.vec_id
        ) WHERE trank <= {_Q163_K}
    ),
    hits AS (
        SELECT r.query_id, r.rank,
               t.neighbor_id IS NOT NULL AS hit
        FROM run r LEFT JOIN truth t
          ON r.query_id = t.query_id AND r.neighbor_id = t.neighbor_id
    ),
    per_q AS (
        SELECT query_id,
               CAST(count_if(hit) AS BIGINT) AS n_hits,
               MIN(CASE WHEN hit THEN rank END) AS first_hit,
               SUM(CASE WHEN hit THEN {_q163_gain_sql('rank')}
                        ELSE 0 END) AS dcg_nano
        FROM hits GROUP BY query_id
    )
    SELECT query_id,
           CAST({_Q163_K} AS BIGINT) AS n_truth,
           n_hits,
           CAST(n_hits AS DOUBLE) / {_Q163_K} AS recall,
           CASE WHEN first_hit IS NOT NULL THEN 1.0 / first_hit
                ELSE 0.0 END AS mrr,
           CAST(dcg_nano AS DOUBLE) / {_Q163_IDCG} AS ndcg
    FROM per_q
    """,
)
def q163_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    run = S.lsh_topk(
        e, queries, dim=64, k=_Q163_K,
        num_planes=_Q30_PLANES, num_tables=_Q30_TABLES,
        max_bucket_size=EMBEDDING_MAX_BUCKET,
        round_to=4,
    ).select("query_id", "neighbor_id", "rank")
    truth = S.brute_force_topk(
        e, queries, k=_Q163_K, round_to=4
    ).select("query_id", "neighbor_id", F.lit(1).alias("hit"))
    gain = F.create_map(
        *[F.lit(v) for kv in _Q163_GAIN.items() for v in kv]
    )[F.col("rank")]
    hits = run.join(truth, ["query_id", "neighbor_id"], "left")
    per_q = hits.groupBy("query_id").agg(
        F.sum(F.when(F.col("hit") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hits"),
        F.min(F.when(F.col("hit") == 1, F.col("rank"))).alias("first_hit"),
        F.sum(F.when(F.col("hit") == 1, gain).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("dcg_nano"),
    )
    return per_q.select(
        "query_id",
        F.lit(_Q163_K).cast("bigint").alias("n_truth"),
        "n_hits",
        (F.col("n_hits").cast("double") / _Q163_K).alias("recall"),
        F.when(
            F.col("first_hit").isNotNull(), F.lit(1.0) / F.col("first_hit")
        )
        .otherwise(F.lit(0.0))
        .alias("mrr"),
        (F.col("dcg_nano").cast("double") / F.lit(float(_Q163_IDCG))).alias(
            "ndcg"
        ),
    )


# --------------------------------------------------------------------------
# q164 — dataset card (one-row corpus summary): the artifact a curation
# pipeline publishes next to a training shard — doc / source / language
# counts, token volume, English share, and the exact-duplicate fraction
# (distinct normalized-text fingerprints vs rows).  ONE aggregate pass:
# token counts ride the scan as a size(tokens) projection (no explode),
# the fingerprint is the q25 md5 discipline, and every ratio is a
# single division of exact integers (bit-identical doubles).  At 100 TB
# the COUNT(DISTINCT fp) is the only wide aggregate — swap for
# approx_count_distinct when a +-2% card is acceptable (q40's contract).
# --------------------------------------------------------------------------
@query(
    "q164_dataset_card",
    f"""
    WITH base AS (
        SELECT lang, source,
               len({SQL_TOKS}) AS n_toks,
               md5({SQL_NORM}) AS fp
        FROM documents)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS mean_tokens,
           CAST(count_if(lang = 'en') AS BIGINT) AS n_en,
           CAST(count_if(lang = 'en') AS DOUBLE) / COUNT(*) AS en_frac,
           CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_unique_texts,
           1.0 - CAST(COUNT(DISTINCT fp) AS DOUBLE) / COUNT(*) AS dup_frac
    FROM base
    """,
)
def q164_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        "source",
        F.size(T.tokens(F.col("text"))).alias("n_toks"),
        F.md5(T.normalize_text(F.col("text")).cast("binary")).alias("fp"),
    )
    n = F.count(F.lit(1))
    en = F.sum(F.when(F.col("lang") == "en", 1).otherwise(0))
    uniq = F.countDistinct("fp")
    return base.agg(
        n.cast("bigint").alias("n_docs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum("n_toks").cast("bigint").alias("total_tokens"),
        (F.sum("n_toks").cast("double") / n).alias("mean_tokens"),
        en.cast("bigint").alias("n_en"),
        (en.cast("double") / n).alias("en_frac"),
        uniq.cast("bigint").alias("n_unique_texts"),
        (F.lit(1.0) - uniq.cast("double") / n).alias("dup_frac"),
    )


# --------------------------------------------------------------------------
# q165 — tokenizer fertility per language (symbols per word under the
# q128 merge table): THE tokenizer-evaluation metric multilingual
# pipelines track — a vocabulary trained on English over-fragments
# other languages, and fertility quantifies it per lang before any
# training run pays for it.  Demonstrates the production encode shape
# q128's docstring names: the merge chain runs once per DISTINCT word
# (bounded vocab), and the (word -> n_symbols) table BROADCAST-joins
# onto the per-(lang, word) occurrence counts — the corpus token stream
# itself is never re-encoded.  Exactness: counts and symbol counts are
# exact ints; fertility is one division of identical integers.
# --------------------------------------------------------------------------
def _q165_sql() -> str:
    enc = _bpe_enc_sql_expr()
    return f"""
    WITH words0 AS (
        SELECT lang, unnest({SQL_TOKS}) AS word FROM documents
    ),
    words AS (
        SELECT lang, word FROM words0
        WHERE regexp_matches(word, '^[a-z0-9]+$')
    ),
    lw AS (
        SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS occ
        FROM words GROUP BY lang, word
    ),
    enc AS (
        SELECT word,
               CAST(len(string_split({enc}, ' ')) AS BIGINT) AS n_sym
        FROM (SELECT DISTINCT word FROM words)
    )
    SELECT lang,
           CAST(SUM(occ) AS BIGINT) AS n_words,
           CAST(SUM(occ * n_sym) AS BIGINT) AS n_symbols,
           CAST(SUM(occ * n_sym) AS DOUBLE) / SUM(occ) AS fertility
    FROM lw JOIN enc USING (word)
    GROUP BY lang
    """


@query("q165_tokenizer_fertility", _q165_sql())
def q165_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "lang", F.explode(T.tokens(F.col("text"))).alias("word")
    ).filter(F.col("word").rlike("^[a-z0-9]+$"))
    lw = words.groupBy("lang", "word").agg(
        F.count(F.lit(1)).cast("bigint").alias("occ")
    )
    enc_col = T.bpe_encode_col(F.col("word"), _Q128_MERGES)
    enc = (
        words.select("word")
        .distinct()
        .select(
            "word",
            F.size(F.split(enc_col, " ")).cast("bigint").alias("n_sym"),
        )
    )
    return (
        lw.join(F.broadcast(enc), "word")
        .groupBy("lang")
        .agg(
            F.sum("occ").cast("bigint").alias("n_words"),
            F.sum(F.col("occ") * F.col("n_sym"))
            .cast("bigint")
            .alias("n_symbols"),
            (
                F.sum(F.col("occ") * F.col("n_sym")).cast("double")
                / F.sum("occ")
            ).alias("fertility"),
        )
    )


# --------------------------------------------------------------------------
# q167 — MinHash band recall CALIBRATION (the dedup twin of q163's ANN
# eval): on a deterministic bounded slice, compute ALL true near-dup
# pairs (exact shingle Jaccard >= 0.5) and measure what fraction the
# q26 band scheme catches, split by similarity bucket — the calibration
# curve that tells a 100 TB deployment whether (num_hashes, bands)
# clears its recall target BEFORE a full run pays for it.  The slice
# (doc_id % 2 = 0 AND doc_id < 1000, identical in both engines) is the
# point: exact truth is quadratic, so you calibrate on a FIXED-SIZE
# slice and extrapolate (the q35 bounded-slice precedent).  The truth
# itself uses the set-similarity join's SCALABLE shape — an
# inverted-index equi-join counting shared shingles per pair, then
# J = i/(na+nb-i) — never a pairwise array join (measured on the same
# slice: truth stage alone 9.1 s BNLJ-with-arrays -> 0.6 s, full query
# steady state 1.7 s; pairs sharing zero shingles
# cannot reach J >= 0.5, so the equi-join is lossless).  Exactness:
# intersection counts and set sizes are exact ints, J and recall are
# single divisions of identical integers.
# --------------------------------------------------------------------------
_Q167_MOD, _Q167_CAP = 2, 1000


def _q167_sql() -> str:
    base = "CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)"
    mh_exprs = ", ".join(
        f"list_min([((h >> 30) + {i + 1} * (h & 1073741823)) % 1073741789"
        f" for h in hs]) AS mh_{i}"
        for i in range(16)
    )
    band_rows = []
    for b in range(4):
        parts = ", ".join(f"CAST(mh_{b * 4 + r} AS VARCHAR)" for r in range(4))
        band_rows.append(
            f"SELECT doc_id, {b} AS band,"
            f" md5(concat_ws('-', {parts})) AS bucket FROM sig"
        )
    bands_sql = " UNION ALL ".join(band_rows)
    return f"""
    WITH sampled AS (
        SELECT doc_id, text FROM documents
        WHERE doc_id % {_Q167_MOD} = 0 AND doc_id < {_Q167_CAP}),
    toks AS (SELECT doc_id, {SQL_TOKS} AS tk FROM sampled),
    sh AS (SELECT doc_id, {SQL_SHINGLES} AS sh FROM toks WHERE len(tk) >= 3),
    hsrc AS (SELECT doc_id, [{base} for s in sh] AS hs FROM sh),
    sig AS (SELECT doc_id, {mh_exprs} FROM hsrc WHERE len(hs) > 0),
    bands0 AS ({bands_sql}),
    bands AS (
        SELECT doc_id, band, bucket FROM (
            SELECT *, COUNT(*) OVER (PARTITION BY band, bucket) AS bn
            FROM bands0
        ) WHERE bn <= {MINHASH_MAX_BUCKET}
    ),
    caught AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
    ),
    posts AS (SELECT doc_id, unnest(sh) AS gram FROM sh),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS i
        FROM posts a JOIN posts b
          ON a.gram = b.gram AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    sizes AS (SELECT doc_id, LEN(sh) AS n FROM sh),
    truth AS (
        SELECT id_a, id_b, i * 1.0 / (sa.n + sb.n - i) AS j
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE i * 1.0 / (sa.n + sb.n - i) >= 0.5
    ),
    marked AS (
        SELECT CASE WHEN t.j >= 0.9 THEN '0.9-1.0'
                    WHEN t.j >= 0.7 THEN '0.7-0.9'
                    ELSE '0.5-0.7' END AS bucket,
               c.id_a IS NOT NULL AS hit
        FROM truth t LEFT JOIN caught c
          ON t.id_a = c.id_a AND t.id_b = c.id_b
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(count_if(hit) AS BIGINT) AS n_caught,
           CAST(count_if(hit) AS DOUBLE) / COUNT(*) AS recall
    FROM marked GROUP BY bucket
    """


@query("q167_minhash_recall_calibration", _q167_sql())
def q167_minhash_recall_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sample = d.filter(
        (F.col("doc_id") % _Q167_MOD == 0) & (F.col("doc_id") < _Q167_CAP)
    )
    # One persisted tokenize pass shared by truth and signatures; the
    # truth uses the inverted-index shape (see the block comment).  The
    # cache is slice-sized (<= 500 docs) and one-generation-tracked; a
    # session wanting it gone immediately calls
    # D.release_persisted("q167_calibration") after materializing.
    sh = D.persist_tracked(
        "q167_calibration", D.shingle_frame(sample)
    )
    sigs = D.minhash_signatures(sample, shingles=sh)
    caught = D.minhash_band_candidates(
        sigs, max_bucket_size=MINHASH_MAX_BUCKET
    ).select("id_a", "id_b", F.lit(1).alias("hit"))
    posts = sh.select("doc_id", F.explode("sh").alias("gram"))
    a = posts.alias("a")
    b = posts.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    sizes = sh.select("doc_id", F.size("sh").alias("n"))
    truth = (
        inter.join(
            sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed(
                "n", "na"
            ),
            "id_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "n", "nb"
            ),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            (
                F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.5)
    )
    marked = truth.join(caught, ["id_a", "id_b"], "left").select(
        F.when(F.col("j") >= 0.9, "0.9-1.0")
        .when(F.col("j") >= 0.7, "0.7-0.9")
        .otherwise("0.5-0.7")
        .alias("bucket"),
        F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
    )
    return marked.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum("hit").cast("bigint").alias("n_caught"),
        (F.sum("hit").cast("double") / F.count(F.lit(1))).alias("recall"),
    )


# --------------------------------------------------------------------------
# q170 — Flesch readability scoring per doc: the classic text-difficulty
# signal (reading-ease + Flesch-Kincaid grade) that curation recipes use
# alongside q21's surface ratios to bucket corpora by audience level.
# Syllables use the standard vowel-group-run approximation, counted on
# the RAW text with an explicit [aeiouyAEIOUY] class — no lower() in the
# hot path, so JVM-vs-utf8proc Unicode case-mapping differences can
# never merge or split a run; sentences are [.!?]+ runs floored at 1.
# All three counts are exact ints in both engines (regexp_count vs
# len(regexp_extract_all) over the same RE2/Java-identical character
# classes); the scores are the identical literal-coefficient expression
# tree over two int/int divisions, so the doubles match bit-for-bit.
# At 100 TB: a single narrow codegen'd projection riding the scan —
# no shuffle, no UDF.
# --------------------------------------------------------------------------
def _q170_sql() -> str:
    w = "CAST(n_words AS DOUBLE)"
    s = "CAST(n_sentences AS DOUBLE)"
    y = "CAST(n_syllables AS DOUBLE)"
    return f"""
    WITH counts AS (
        SELECT doc_id,
               CAST(len({SQL_TOKS}) AS BIGINT) AS n_words,
               CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                    AS BIGINT) AS n_sentences,
               CAST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+'))
                    AS BIGINT) AS n_syllables
        FROM documents
    )
    SELECT doc_id, n_words, n_sentences, n_syllables,
           CAST(206.835 AS DOUBLE)
               - CAST(1.015 AS DOUBLE) * ({w} / {s})
               - CAST(84.6 AS DOUBLE) * ({y} / {w}) AS flesch,
           CAST(0.39 AS DOUBLE) * ({w} / {s})
               + CAST(11.8 AS DOUBLE) * ({y} / {w})
               - CAST(15.59 AS DOUBLE) AS fk_grade
    FROM counts
    WHERE n_words > 0
    """


@query("q170_readability_scores", _q170_sql())
def q170_readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.readability_scores(d, text_col="text", keep_cols=("doc_id",))


# --------------------------------------------------------------------------
# q172 — top collocations by LIFT (PMI without the log): for every
# adjacent token pair seen >= 5 times, lift = P(ab) / (P(a)P(b)) =
# (n_ab * N * N) / (M * n_a * n_b) — the collocation-mining signal
# phrase/tokenizer pipelines use to promote multi-word units.  Dropping
# the log makes the score cross-engine EXACT where PMI cannot be: every
# count is an exact integer < 2^53, and both engines evaluate the same
# left-associated double product/division chain with one IEEE-correct
# rounding per op — no libm, no quantum-boundary hazard (the q163/q169
# literal-table lesson applied by eliminating the transcendental
# entirely; rank order is log-invariant anyway).  Top-50 with
# deterministic (lift DESC, a, b) tie-break.  At 100 TB: two
# map-side-combined count aggregations (bigrams, unigrams), two
# equi-joins AQE can broadcast when the frequent-pair set is small, and
# 1-row totals broadcast-crossjoined; the >=5 support filter prunes the
# heavy tail before any join.
# --------------------------------------------------------------------------
_Q172_MIN_SUPPORT, _Q172_TOPK = 5, 50


def _q172_sql() -> str:
    return f"""
    WITH toks AS (
        SELECT {SQL_TOKS} AS tk FROM documents
    ),
    uni AS (
        SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(tk) AS t FROM toks) GROUP BY t
    ),
    bi AS (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n_ab
        FROM (
            SELECT unnest([struct_pack(a := tk[i], b := tk[i+1])
                           for i in range(1, len(tk))], recursive := true)
            FROM toks
        ) GROUP BY a, b
        HAVING COUNT(*) >= {_Q172_MIN_SUPPORT}
    ),
    tot AS (
        SELECT CAST(SUM(n) AS BIGINT) AS big_n FROM uni
    ),
    mtot AS (
        SELECT CAST(SUM(len(tk) - 1) AS BIGINT) AS big_m FROM toks
        WHERE len(tk) > 0
    ),
    scored AS (
        SELECT bi.a, bi.b, bi.n_ab, ua.n AS n_a, ub.n AS n_b,
               (CAST(bi.n_ab AS DOUBLE) * CAST(tot.big_n AS DOUBLE)
                * CAST(tot.big_n AS DOUBLE))
               / (CAST(mtot.big_m AS DOUBLE) * CAST(ua.n AS DOUBLE)
                  * CAST(ub.n AS DOUBLE)) AS lift
        FROM bi
        JOIN uni ua ON ua.term = bi.a
        JOIN uni ub ON ub.term = bi.b
        CROSS JOIN tot CROSS JOIN mtot
    )
    SELECT a, b, n_ab, n_a, n_b, lift FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY lift DESC, a, b) AS rk
        FROM scored
    ) WHERE rk <= {_Q172_TOPK}
    """


@query("q172_term_lift_pairs", _q172_sql())
def q172_term_lift_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(T.tokens(F.col("text")).alias("tk"))
    uni = toks.select(F.explode("tk").alias("term")).groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    nt = F.size("tk")
    pairs = toks.select(
        F.explode(
            F.zip_with(
                F.slice("tk", 1, F.greatest(nt - 1, F.lit(0))),
                F.slice("tk", 2, F.greatest(nt - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    bi = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= _Q172_MIN_SUPPORT)
    )
    tot = uni.agg(F.sum("n").cast("bigint").alias("big_n"))
    mtot = toks.filter(nt > 0).agg(
        F.sum(nt - 1).cast("bigint").alias("big_m")
    )
    ua = uni.select(F.col("term").alias("a"), F.col("n").alias("n_a"))
    ub = uni.select(F.col("term").alias("b"), F.col("n").alias("n_b"))
    lift = (
        F.col("n_ab").cast("double")
        * F.col("big_n").cast("double")
        * F.col("big_n").cast("double")
    ) / (
        F.col("big_m").cast("double")
        * F.col("n_a").cast("double")
        * F.col("n_b").cast("double")
    )
    scored = (
        bi.join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(mtot))
        .withColumn("lift", lift)
    )
    # orderBy+limit compiles to TakeOrderedAndProject — a distributed
    # per-partition top-k + driver merge, unlike a global row_number
    # window which would single-partition every surviving pair.
    return (
        scored.orderBy(F.col("lift").desc(), "a", "b")
        .limit(_Q172_TOPK)
        .select("a", "b", "n_ab", "n_a", "n_b", "lift")
    )


# --------------------------------------------------------------------------
# q173 — lang-ID EVALUATION against the labeled corpus: per-class
# n_true / n_pred / n_correct with recall and precision — the
# confusion-derived quality contract for q22's marker heuristic, in the
# q163/q167 "evaluate the operator as a first-class query" line (a
# 100 TB deployment tracks this before trusting lang routing for
# mixture decisions).  Classes are the union of true and predicted
# labels (full outer join), so systematic over-prediction (e.g. 'und')
# shows up as n_true=0 rows; zero denominators go NULL via nullif in
# BOTH engines rather than riding engine-specific 0/0 semantics.
# Counts are exact ints; recall/precision are single divisions.  At
# 100 TB: the prediction is a scan-riding projection (q22's shape), the
# two aggregations are map-side-combined on ~|langs| keys.
# --------------------------------------------------------------------------
def _q173_sql() -> str:
    return f"""
    WITH pred AS ({_lang_sql()}),
    rowt AS (
        SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS n_true,
               CAST(SUM(CASE WHEN lang_pred = lang THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct
        FROM pred GROUP BY lang
    ),
    colt AS (
        SELECT lang_pred AS cls, CAST(COUNT(*) AS BIGINT) AS n_pred
        FROM pred GROUP BY lang_pred
    )
    SELECT COALESCE(rowt.cls, colt.cls) AS cls,
           COALESCE(n_true, 0) AS n_true,
           COALESCE(n_pred, 0) AS n_pred,
           COALESCE(n_correct, 0) AS n_correct,
           CAST(COALESCE(n_correct, 0) AS DOUBLE)
               / NULLIF(CAST(COALESCE(n_true, 0) AS DOUBLE), 0) AS recall,
           CAST(COALESCE(n_correct, 0) AS DOUBLE)
               / NULLIF(CAST(COALESCE(n_pred, 0) AS DOUBLE), 0) AS precision
    FROM rowt FULL OUTER JOIN colt ON rowt.cls = colt.cls
    """


@query("q173_langid_confusion", _q173_sql())
def q173_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pred = T.language_id(d.select("doc_id", "lang", "text")).select(
        "lang", "lang_pred"
    )
    rowt = pred.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum(
            F.when(F.col("lang_pred") == F.col("lang"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
    )
    colt = pred.groupBy(F.col("lang_pred").alias("cls")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pred")
    )
    j = rowt.join(colt, "cls", "full_outer")
    n_true = F.coalesce("n_true", F.lit(0))
    n_pred = F.coalesce("n_pred", F.lit(0))
    n_corr = F.coalesce("n_correct", F.lit(0))
    return j.select(
        "cls",
        n_true.alias("n_true"),
        n_pred.alias("n_pred"),
        n_corr.alias("n_correct"),
        (
            n_corr.cast("double")
            / F.nullif(n_true.cast("double"), F.lit(0.0))
        ).alias("recall"),
        (
            n_corr.cast("double")
            / F.nullif(n_pred.cast("double"), F.lit(0.0))
        ).alias("precision"),
    )


# --------------------------------------------------------------------------
# q175 — embedding HYGIENE audit per label: vector count, exact mean L2
# norm, min/max norm, median norm, and the near-zero fraction — the
# pre-flight check an ANN/semantic pipeline runs before trusting cosine
# distances (zero or wildly-scaled vectors silently poison q29/q30/q44
# and every IVF assignment).  Norm doubles are bit-identical across
# engines (the q29 evidence: sequential fold == list_dot_product, one
# IEEE sqrt; squares by multiplication, never pow).  The MEAN is where
# naive float aggregation breaks — summation order varies per partition
# — so norms quantize to exact integer MICRO-units first (a .5 tie
# cannot arise from irrational sqrt outputs, and both engines round
# positives half-away), sum exactly, divide once.  The median sits in
# the q47 small-magnitude regime where a 6-decimal round absorbs
# last-ulp interpolation.  At 100 TB: one narrow scan-riding projection
# plus a map-side-combined aggregate on |labels| keys.
# --------------------------------------------------------------------------
@query(
    "q175_embedding_norm_audit",
    """
    WITH n AS (
        SELECT label,
               SQRT(list_dot_product(embedding::DOUBLE[],
                                     embedding::DOUBLE[])) AS nrm
        FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(CAST(SUM(CAST(ROUND(nrm * 1000000, 0) AS BIGINT))
                     AS BIGINT) AS DOUBLE)
               / CAST(COUNT(*) AS DOUBLE)
               / CAST(1000000 AS DOUBLE) AS mean_norm,
           MIN(nrm) AS min_norm,
           MAX(nrm) AS max_norm,
           ROUND(quantile_cont(nrm, 0.50), 6) AS p50_norm,
           CAST(SUM(CASE WHEN nrm < 0.000001 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_near_zero
    FROM n
    GROUP BY label
    """,
)
def q175_embedding_norm_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    nrm = F.sqrt(
        F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.col("embedding"),
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    n = e.select("label", nrm.alias("nrm"))
    nq = duck_round_expr(F.col("nrm") * 1000000, 0).cast("bigint")
    return n.groupBy("label").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        (
            F.sum(nq).cast("bigint").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000000).cast("double")
        ).alias("mean_norm"),
        F.min("nrm").alias("min_norm"),
        F.max("nrm").alias("max_norm"),
        duck_round_expr(F.percentile("nrm", F.lit(0.50)), 6).alias("p50_norm"),
        F.sum(F.when(F.col("nrm") < 0.000001, 1).otherwise(0))
        .cast("bigint")
        .alias("n_near_zero"),
    )


# --------------------------------------------------------------------------
# q176 — duplicate-cluster SIZE DISTRIBUTION: how many near-dup
# clusters of each size the corpus holds, plus the singleton row — the
# one-table answer to "how duplicated is this corpus?" that a dedup
# rollout reports before choosing keep-one-per-cluster (q49) vs
# threshold tuning (q167).  Reuses the q57 machinery (q26 LSH pairs ->
# iterative min-label components), then reduces clusters to a
# |distinct sizes|-row histogram; the singleton count is total docs
# minus clustered docs via two 1-row broadcast aggregates — no
# re-scan of text, no driver collect.  All counts exact bigints.
# --------------------------------------------------------------------------
def _q176_sql() -> str:
    cl = _dedup_clusters_sql().strip()
    return f"""
    WITH cl AS ({cl}),
    sizes AS (
        SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
        FROM cl GROUP BY cluster_id
    ),
    hist AS (
        SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_clusters
        FROM sizes GROUP BY sz
    ),
    singles AS (
        SELECT CAST(1 AS BIGINT) AS sz,
               CAST((SELECT COUNT(*) FROM documents)
                    - (SELECT COUNT(*) FROM cl) AS BIGINT) AS n_clusters
    )
    SELECT sz, n_clusters, CAST(sz * n_clusters AS BIGINT) AS n_docs
    FROM (SELECT * FROM hist UNION ALL SELECT * FROM singles)
    """


@query("q176_dup_cluster_sizes", _q176_sql())
def q176_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_near_dups(
        d, threshold=0.5, cache_shingles=True,
        max_bucket_size=MINHASH_MAX_BUCKET,
    )
    cl = D.dedup_clusters(pairs)
    sizes = cl.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("sz")
    )
    hist = sizes.groupBy("sz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )
    tot = d.agg(F.count(F.lit(1)).alias("n_total"))
    ncl = cl.agg(F.count(F.lit(1)).alias("n_clustered"))
    singles = (
        tot.crossJoin(F.broadcast(ncl))
        .select(
            F.lit(1).cast("bigint").alias("sz"),
            (F.col("n_total") - F.col("n_clustered"))
            .cast("bigint")
            .alias("n_clusters"),
        )
    )
    return (
        hist.unionByName(singles)
        .select(
            "sz",
            "n_clusters",
            (F.col("sz") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        )
    )


# --------------------------------------------------------------------------
# q178 — VOCABULARY COVERAGE curve: what fraction of the corpus token
# stream the top-100/1k/10k terms cover — the tokenizer-budget planning
# number (how big a vocab before OOV mass is negligible) that pairs
# with q165's fertility and q109's merge mining.  Scalable shape: the
# vocab never sorts globally — the top-10k slice comes from a
# distributed TakeOrdered (tf DESC, term), the row_number window runs
# on that 10k-row frame only, and the k-thresholds explode from a
# 3-literal array; the grand total is a 1-row broadcast.  Counts exact
# bigints, coverage one double division.
# --------------------------------------------------------------------------
_Q178_KS = (100, 1000, 10000)


def _q178_sql() -> str:
    ks = ", ".join(str(k) for k in _Q178_KS)
    return f"""
    WITH uni AS (
        SELECT t AS term, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT unnest({SQL_TOKS}) AS t FROM documents) GROUP BY t
    ),
    topk AS (
        SELECT term, tf, ROW_NUMBER() OVER (ORDER BY tf DESC, term) AS rn
        FROM (SELECT * FROM uni ORDER BY tf DESC, term LIMIT {max(_Q178_KS)})
    ),
    tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total_tokens,
                   CAST(COUNT(*) AS BIGINT) AS vocab_size FROM uni)
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           CAST(SUM(tf) AS BIGINT) AS tokens_covered,
           CAST(CAST(SUM(tf) AS BIGINT) AS DOUBLE)
               / CAST(tot.total_tokens AS DOUBLE) AS coverage_frac,
           tot.vocab_size
    FROM topk CROSS JOIN tot CROSS JOIN (SELECT unnest([{ks}]) AS k)
    WHERE rn <= k
    GROUP BY k, tot.total_tokens, tot.vocab_size
    """


@query("q178_vocab_coverage", _q178_sql())
def q178_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return T.vocab_coverage(d, text_col="text", ks=_Q178_KS)


# --------------------------------------------------------------------------
# q182 — per-DIMENSION embedding statistics: mean, std, min/max and
# zero counts for each of the 64 dims — q175's norm audit drilled into
# coordinates (dead dims, collapsed variance, scaling bugs all show
# here first, and IVF/PQ quality depends on them).  Coordinates
# quantize to exact integer MICRO-units before any sum (float32→double
# is exact, the scaled round is deterministic and both engines round
# halves away from zero), so the moments are exact bigints; mean and
# variance assemble via the VARCHAR→strtod route and one IEEE sqrt.
# Spark's posexplode and DuckDB's parallel unnest(range)/unnest(list)
# give identical 0-based dims.  At 100 TB: the explode is a narrow
# 64x projection feeding a map-side-combined 64-key aggregate — the
# shuffle carries 64 rows per task.
# --------------------------------------------------------------------------
def _q182_sql() -> str:
    return """
    WITH c AS (
        SELECT unnest(range(len(embedding))) AS dim,
               unnest(embedding::DOUBLE[]) AS val
        FROM embeddings
    ),
    q AS (
        SELECT dim, val,
               CAST(ROUND(val * 1000000, 0) AS BIGINT) AS vq
        FROM c
    ),
    m AS (
        SELECT dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(vq) AS BIGINT) AS s1,
               CAST(SUM(vq * vq) AS BIGINT) AS s2,
               MIN(val) AS min_val,
               MAX(val) AS max_val,
               CAST(SUM(CASE WHEN val = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_zero
        FROM q GROUP BY dim
    )
    SELECT CAST(dim AS BIGINT) AS dim, n,
           CAST(CAST(s1 AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
               / CAST(1000000 AS DOUBLE) AS mean_val,
           SQRT(CAST(CAST(CAST(n AS DECIMAL(19,0)) * CAST(s2 AS DECIMAL(19,0))
                          - CAST(s1 AS DECIMAL(19,0))
                            * CAST(s1 AS DECIMAL(19,0)) AS VARCHAR)
                     AS DOUBLE))
               / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE) AS std_val,
           min_val, max_val, n_zero
    FROM m
    """


@query("q182_embedding_dim_stats", _q182_sql())
def q182_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    c = e.select(
        F.posexplode(F.col("embedding")).alias("dim", "valf")
    ).select("dim", F.col("valf").cast("double").alias("val"))
    vq = duck_round_expr(F.col("val") * 1000000, 0).cast("bigint")
    m = c.withColumn("vq", vq).groupBy("dim").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("vq").cast("bigint").alias("s1"),
        F.sum(F.col("vq") * F.col("vq")).cast("bigint").alias("s2"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
        F.sum(F.when(F.col("val") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero"),
    )
    as_d = exact_str_double
    # n*s2 wraps a bigint from sf0.1 up (5e3 vecs x 5e15), so the moment
    # combination runs in DECIMAL(19,0)x(19,0) -> (38,0) — the widest
    # product both engines accept (DuckDB rejects 38x38).
    dec = "decimal(19,0)"
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    nd, s1d, s2d = n.cast(dec), s1.cast(dec), s2.cast(dec)
    mil = F.lit(1000000).cast("double")
    return m.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n",
        (as_d(s1) / n.cast("double") / mil).alias("mean_val"),
        (
            F.sqrt(as_d(nd * s2d - s1d * s1d)) / n.cast("double") / mil
        ).alias("std_val"),
        "min_val",
        "max_val",
        "n_zero",
    )


# --------------------------------------------------------------------------
# q184 — embedding OUTLIER scores: per-vector sum of per-dimension
# standardized deviations (Σ|v_d − μ_d|/σ_d, a Mahalanobis-lite that
# ignores covariance), top-20 — the vector-level drill-down q175/q182
# motivate: exactly the rows a curation pass quarantines before ANN
# indexing.  μ/σ come from the q182 CTE, so they are bit-identical
# doubles in both engines; each per-dim term is then quantized to
# exact integer NANO-units before the per-vector sum (64 doubles would
# otherwise sum in engine-dependent order), summed exactly, divided
# once.  At 100 TB: the 64-row stats frame broadcasts onto the
# exploded coordinates, the per-vector reduce is map-side-combined,
# and the top-20 is a distributed TakeOrdered.
# --------------------------------------------------------------------------
_Q184_TOPK = 20


def _q184_sql() -> str:
    stats = _q182_sql().strip()
    return f"""
    WITH stats AS ({stats}),
    c AS (
        SELECT vec_id, label,
               unnest(range(len(embedding))) AS dim,
               unnest(embedding::DOUBLE[]) AS val
        FROM embeddings
    ),
    t AS (
        SELECT c.vec_id, c.label,
               CAST(ROUND(ABS(c.val - stats.mean_val) / stats.std_val
                          * 1000000000, 0) AS BIGINT) AS term_nq
        FROM c JOIN stats ON stats.dim = c.dim
        WHERE stats.std_val > 0
    ),
    s AS (
        SELECT vec_id, label,
               CAST(SUM(term_nq) AS BIGINT) AS score_nq
        FROM t GROUP BY vec_id, label
    )
    SELECT vec_id, label,
           CAST(CAST(score_nq AS VARCHAR) AS DOUBLE)
               / CAST(1000000000 AS DOUBLE) AS outlier_score
    FROM s
    ORDER BY score_nq DESC, vec_id LIMIT {_Q184_TOPK}
    """


@query("q184_embedding_outliers", _q184_sql())
def q184_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    stats = q182_embedding_dim_stats(spark, sf_dir).select(
        "dim", "mean_val", "std_val"
    )
    c = e.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding")).alias("dim", "valf"),
    ).select(
        "vec_id",
        "label",
        F.col("dim").cast("bigint").alias("dim"),
        F.col("valf").cast("double").alias("val"),
    )
    term_nq = duck_round_expr(
        F.abs(F.col("val") - F.col("mean_val"))
        / F.col("std_val")
        * 1000000000,
        0,
    ).cast("bigint")
    t = (
        c.join(F.broadcast(stats), "dim")
        .filter(F.col("std_val") > 0)
        .select("vec_id", "label", term_nq.alias("term_nq"))
    )
    s = t.groupBy("vec_id", "label").agg(
        F.sum("term_nq").cast("bigint").alias("score_nq")
    )
    return (
        s.orderBy(F.col("score_nq").desc(), "vec_id")
        .limit(_Q184_TOPK)
        .select(
            "vec_id",
            "label",
            (
                exact_str_double(F.col("score_nq"))
                / F.lit(1000000000).cast("double")
            ).alias("outlier_score"),
        )
    )
