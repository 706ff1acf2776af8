"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pricing-summary query at sf0.001;
``queries()`` exposes the full catalog (one entry per implemented operator
family, SURVEY.md §2); ``oracle_sql()`` gives the DuckDB-equivalent ANSI
SQL for every SQL-expressible query.  Implementation lives in
``ominimo_dynamic_data_pipeline_spark.queries``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ominimo_dynamic_data_pipeline_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    _configure(spark)
    return QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return dict(ORACLES)


def _wrap(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        _configure(spark)
        return fn(spark, sf_dir)

    return runner


def _configure(spark: SparkSession) -> None:
    """Align a driver-provided session with our engine semantics (the
    driver may build its own bare SparkSession)."""
    for key, value in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "false"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.adaptive.enabled", "true"),
    ):
        try:
            spark.conf.set(key, value)
        except Exception as exc:
            # Non-modifiable on some builds; queries avoid ANSI traps.  A
            # rejected timezone/ANSI conf can shift date hashes, so say it
            # loudly instead of failing silently (round-3 verdict item).
            import logging

            logging.getLogger(__name__).warning(
                "could not set %s=%s on the provided SparkSession: %s",
                key, value, exc,
            )
