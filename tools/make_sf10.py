"""Deterministic sf1 -> sf10 upscaler: the SECOND measured scale decade.

Applies tools/make_sf1.py's transform again, this time to the sf1 tables
(10 disjoint-key copies; documents re-suffixed per copy so no n-grams
cross copies; embeddings re-perturbed), with key offsets widened 10x so
the sf1 key ranges [0, 10*K) map into disjoint [i*10*K, (i+1)*10*K)
blocks.  Two decades of measured growth (sf0.1 -> sf1 -> sf10) is the
empirical backing for the 100 TB extrapolation claim: a genuinely
super-linear stage shows up as compounding growth by the second decade
even when one decade hides it in fixed overhead.

Output: /root/repo/testdata_sf10/*.parquet (~1.8 GB).  Deterministic —
safe to rerun (overwrites).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = str(Path(__file__).resolve().parent.parent / "testdata_sf1")
DST = Path(__file__).resolve().parent.parent / "testdata_sf10"
COPIES = 10

# sf1 keys already occupy [0, 10 * K_sf01); widen the block stride 10x.
K_ORDER = 100_000_000
K_CUST = 10_000_000
K_PART = 10_000_000
K_SUPP = 1_000_000
K_EVENT = 100_000_000
K_DOC = 1_000_000
K_VEC = 1_000_000

TEXT_I = r"regexp_replace(text, '(\s+)', '~' || i || '\1', 'g') || '~' || i"

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
                   CAST([embedding[k] + 0.05 * sin(vec_id * 17 + i * 13 + k)
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
        con.execute(
            f"COPY ({sql}) TO '{out}' (FORMAT PARQUET, ROW_GROUP_SIZE 20000)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
