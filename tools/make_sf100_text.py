"""Deterministic sf10 -> sf100 upscaler for the TEXT/STREAMING tranche.

Round-8 continuation of the next-decade soak: tools/make_sf100.py covers
the relational trio (q199/q139/q108 over lineitem+orders); this adds the
tables the OTHER heavy families read at the same decade —

  * events      (q141/q151/q116 streaming state-store paths; 100M rows,
                 the auto state-store rule must flip to RocksDB here)
  * documents   (q37 token stats — the worst sf30 grower at 4.37x on 3x
                 data — plus q146 containment, q191 cluster canonicals)
  * embeddings  (q197 principal share; 2M vectors)

as 10 disjoint-key copies of sf10 with the block stride widened 10x
(same constants as tools/make_sf100.py so key spaces line up).  Each
copy's document text is re-marked with a decade-distinct separator
('@' || i; sf10 used '~', sf30 '^') so NO n-grams cross copies: pair
stages scale linearly instead of degenerating into one giant bucket.
Embeddings get a fresh deterministic sinusoidal perturbation per copy.

Output: /root/repo/testdata_sf100/{events,documents,embeddings}.parquet.
Deterministic — safe to rerun (overwrites).
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb

SRC = str(Path(__file__).resolve().parent.parent / "testdata_sf10")
DST = Path(__file__).resolve().parent.parent / "testdata_sf100"
COPIES = 10

# Same stride constants as tools/make_sf100.py.
K_CUST = 100_000_000
K_EVENT = 10_000_000_000
K_DOC = 100_000_000
K_VEC = 100_000_000

TEXT_I = r"regexp_replace(text, '(\s+)', '@' || i || '\1', 'g') || '@' || i"

TABLES: dict[str, str] = {
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
                   CAST([embedding[k] + 0.05 * sin(vec_id * 23 + i * 13 + k)
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
