"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and order-insensitive values.  Usage:

    python tools/oracle_check.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name and rows by all values; stringify cells the way
    an order-insensitive value hash would."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        df[c] = df[c].map(lambda v: _cell(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _cell(v) -> str:
    # Dtype-faithful renderer, matching the driver's value hash: an integral
    # float64 (e.g. a DuckDB HUGEINT materialized by pandas as 912.0) must
    # NOT hash equal to Spark's int64 912 — the driver treats them as
    # different values, so the local gate must too.
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return "<null>"
    if pd.isna(v) if not isinstance(v, (list, tuple, set, dict)) else False:
        return "<null>"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, float):  # np.float64 subclasses float; strip the numpy repr
        return repr(float(v))
    if isinstance(v, int):  # np.int* via int() below
        return str(int(v))
    try:
        import numpy as np

        if isinstance(v, np.integer):
            return str(int(v))
        if isinstance(v, np.floating):
            return repr(float(v))
    except ImportError:  # pragma: no cover
        pass
    return str(v)


def compare(name: str, spark_df, oracle_df) -> list[str]:
    problems: list[str] = []
    if sorted(spark_df.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_df.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(spark_df) != len(oracle_df):
        problems.append(f"row count: spark={len(spark_df)} oracle={len(oracle_df)}")
    a, b = normalize(spark_df), normalize(oracle_df)
    if len(a) == len(b) and not a.equals(b):
        diff_mask = (a != b).any(axis=1)
        idx = list(a.index[diff_mask])[:3]
        for i in idx:
            problems.append(f"row {i}: spark={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
        problems.append(f"value mismatch in {int(diff_mask.sum())} rows")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ominimo_dynamic_data_pipeline_spark import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duck_connect(sf_dir)
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"     {p}")
        else:
            print(f"ok   {name}: {len(sdf)} rows match")
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
