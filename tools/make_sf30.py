"""Deterministic sf10 -> sf30 upscaler for the HEAVY-TAIL soak.

Round-6 verdict item #6: every scale claim extrapolates from sf10
(~7.3 GB); one more 3x step on the heaviest queries either confirms the
shapes or finds the wall before a cluster does.  This generates the
tables the heavy-tail queries read — lineitem + orders (q139 interval
overlap, q199 Hamilton allocation, q108 PageRank / q112 triangles / q97
co-purchase via the pair expansion), events (q141 / q151 streaming
state-store paths), and documents + embeddings (q146 containment, q191
cluster canonicals, q37 token stats, q197 principal share) — as 3
disjoint-key copies of sf10 with the block stride widened 10x again
(sf10 keys occupy [0, 10 * K_sf1); copies land in disjoint
[i * 10 * K_sf1, ...) blocks).  ~180M lineitem rows, ~6 GB total.

Output: /root/repo/testdata_sf30/*.parquet.  Deterministic — safe to
rerun (overwrites).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = str(Path(__file__).resolve().parent.parent / "testdata_sf10")
DST = Path(__file__).resolve().parent.parent / "testdata_sf30"
COPIES = 3

# sf10 keys already occupy [0, 10 * K_sf1); widen the stride 10x again.
K_ORDER = 1_000_000_000
K_CUST = 100_000_000
K_PART = 100_000_000
K_SUPP = 10_000_000
K_EVENT = 1_000_000_000
K_DOC = 10_000_000
K_VEC = 10_000_000

# sf10's per-copy re-suffix used '~' || i — reuse a distinct marker per
# sf30 copy so no n-grams cross copies at this decade either.
TEXT_I = r"regexp_replace(text, '(\s+)', '^' || i || '\1', 'g') || '^' || i"

TABLES: dict[str, str] = {
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
                   CAST([embedding[k] + 0.05 * sin(vec_id * 19 + i * 11 + k)
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
