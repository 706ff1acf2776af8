"""Deterministic sf10 -> sf100 upscaler for the NEXT-DECADE soak.

Round-7 verdict item #4: the sf30 soak (3x) found two genuine walls that
sf10 linearity had hidden (driver-bound memory sink; double-built q139
spans agg) — the next decade is where any remaining walls live.  This
generates ONLY the tables the three heaviest relational queries read —
lineitem + orders (q139 interval overlap, q199 Hamilton allocation, q108
PageRank pair expansion) — as 10 disjoint-key copies of sf10 with the
block stride widened 10x again (~600M lineitem rows, ~18 GB parquet;
fits the sandbox disk with >3x headroom, unlike a full-table sf100).

Output: /root/repo/testdata_sf100/{orders,lineitem}.parquet.
Deterministic — safe to rerun (overwrites).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = str(Path(__file__).resolve().parent.parent / "testdata_sf10")
DST = Path(__file__).resolve().parent.parent / "testdata_sf100"
COPIES = 10

# sf10 keys already occupy [0, 10 * K_sf1); widen the stride 10x again
# (same constants as tools/make_sf30.py so the two datasets' key spaces
# are constructed identically — copy i of sf100 covers copies {i} of a
# would-be sf30 run).
K_ORDER = 1_000_000_000
K_CUST = 100_000_000
K_PART = 100_000_000
K_SUPP = 10_000_000

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
