"""Deterministic sf0.1 -> sf1 upscaler (10x) for the scale benchmark.

The DuckDB tpch extension cannot download in this sandbox, so sf1 is
derived from the driver's sf0.1 tables by replicating each fact/dim 10
times with disjoint key spaces — the realistic "10x more data, same
density" scaling:

- fact/dim keys get a per-copy offset so joins keep their per-key fanout
  (no artificial hot keys);
- region/nation stay single-copy (true small dims);
- document text is token-suffixed per copy ("tok" -> "tok_3"), so copies
  share NO n-grams: near-dup pair counts and LSH bucket sizes scale
  linearly (verbatim copies would make every bucket 10x and the pair
  stage 100x — a degenerate corpus, not a scale test);
- embeddings get a deterministic per-copy sinusoidal perturbation so
  cosine structure is preserved but copies are not exact duplicates.

Output: /root/repo/testdata_sf1/*.parquet.  Deterministic — safe to
rerun (overwrites).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = "/root/testdata/sf0.1"
DST = Path(__file__).resolve().parent.parent / "testdata_sf1"
COPIES = 10

K_ORDER = 10_000_000
K_CUST = 1_000_000
K_PART = 1_000_000
K_SUPP = 100_000
K_EVENT = 10_000_000
K_DOC = 100_000
K_VEC = 100_000

# token-suffix rewrite: suffix before every whitespace run + at the end
TEXT_I = r"regexp_replace(text, '(\s+)', '_' || i || '\1', 'g') || '_' || i"

TABLES: dict[str, str] = {
    "region": "SELECT * FROM src",
    "nation": "SELECT * FROM src",
    "customer": f"""
        SELECT c_custkey + i * {K_CUST} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM src, range({COPIES}) t(i)
    """,
    "supplier": f"""
        SELECT s_suppkey + i * {K_SUPP} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM src, range({COPIES}) t(i)
    """,
    "part": f"""
        SELECT p_partkey + i * {K_PART} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM src, range({COPIES}) t(i)
    """,
    "orders": f"""
        SELECT o_orderkey + i * {K_ORDER} AS o_orderkey,
               o_custkey + i * {K_CUST} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM src, range({COPIES}) t(i)
    """,
    "lineitem": f"""
        SELECT l_orderkey + i * {K_ORDER} AS l_orderkey,
               l_partkey + i * {K_PART} AS l_partkey,
               l_suppkey + i * {K_SUPP} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM src, range({COPIES}) t(i)
    """,
    "events": f"""
        SELECT event_id + i * {K_EVENT} AS event_id, ts,
               user_id + i * {K_CUST} AS user_id,
               event_type, value, props
        FROM src, range({COPIES}) t(i)
    """,
    "documents": f"""
        SELECT doc_id + i * {K_DOC} AS doc_id,
               CASE WHEN i = 0 THEN text ELSE {TEXT_I} END AS text,
               lang, source,
               length(CASE WHEN i = 0 THEN text ELSE {TEXT_I} END)
                   AS n_chars
        FROM src, range({COPIES}) t(i)
    """,
    "embeddings": f"""
        SELECT vec_id + i * {K_VEC} AS vec_id,
               CASE WHEN i = 0 THEN embedding ELSE
                   CAST([embedding[k] + 0.05 * sin(vec_id * 31 + i * 7 + k)
                         for k in range(1, len(embedding) + 1)] AS FLOAT[])
               END AS embedding,
               label
        FROM src, range({COPIES}) t(i)
    """,
}


def main() -> int:
    DST.mkdir(exist_ok=True)
    con = duckdb.connect()
    for table, sql in TABLES.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS "
            f"SELECT * FROM '{SRC}/{table}.parquet'"
        )
        out = DST / f"{table}.parquet"
        # Small row groups (20k rows vs DuckDB's 122,880 default) keep the
        # files SPLITTABLE: Spark parallelizes a parquet scan by byte
        # ranges aligned to row-group boundaries, and a miniature table
        # written as one jumbo row group caps every downstream stage at
        # one task regardless of cluster size — the opposite of the
        # many-file layout a real 100 TB dataset has.
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
