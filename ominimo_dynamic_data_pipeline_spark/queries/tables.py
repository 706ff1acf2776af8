"""Test-table loading for the driver-contract query catalog.

Tables live as one parquet file per table under a scale-factor directory
(TESTDATA.md).  Reads are lazy; Catalyst pushes filters/projections into
the parquet scans (verify with ``df.explain``: PushedFilters/ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # events.ts as TIMESTAMP(NANOS) parquet, surfaced as epoch-nanos
            # via spark.sql.legacy.parquet.nanosAsLong; convert to a
            # microsecond timestamp (integer division — double division
            # would lose precision on ~1.7e18 nanos).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Session tz is pinned to UTC, so this cast is value-preserving;
            # plain TIMESTAMP is required by streaming watermarks and keeps
            # one temporal type across the whole engine.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}
