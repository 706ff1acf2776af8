"""Batch twins of the streaming windowed operators (catalog entries).

Spark's unified semantics mean ``streaming.ops`` transformations run
unchanged on static frames; these catalog entries hash-verify that logic
against DuckDB (time_bucket for tumbling windows, lag/cumsum
sessionization for session windows) — the batch-equivalence tests then tie
the streaming runs to these same results.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table
from ominimo_dynamic_data_pipeline_spark.streaming import ops as stream_ops

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


_TUMBLING_SQL = """
    SELECT STRFTIME(time_bucket(INTERVAL '10 minutes', ts), '%Y-%m-%d %H:%M:%S')
               AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY window_start, event_type
    """


@query("q33_tumbling_event_counts", _TUMBLING_SQL)
def q33_tumbling_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = stream_ops.tumbling_counts(e, window="10 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "value_sum",
    )


@query(
    "q34_user_sessions",
    """
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '5 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessioned AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           STRFTIME(MAX(ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS session_end,
           COUNT(*) AS n_events
    FROM sessioned
    GROUP BY user_id, session_id
    """,
)
def q34_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = stream_ops.session_counts(e, gap="5 minutes")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


# --------------------------------------------------------------------------
# q101 — the STREAMING path end to end, hash-verified: unlike q33 (which
# runs the same transformation on a static frame), this entry actually
# drives readStream -> watermark -> windowed aggregation -> writeStream
# with Trigger.AvailableNow into a sink, then returns the sink contents —
# so the driver's correctness gate exercises the file-stream source,
# micro-batch planner, and state store, not just the unified batch
# semantics.  Complete output mode surfaces every window (with
# availableNow the final watermark never closes the last windows in
# append mode — see run_to_completion); the oracle is q33's batch SQL,
# which must agree exactly because no event is late relative to a
# replayed file source.  The batch-equivalence suite in
# tests/test_streaming.py additionally covers append/update modes and the
# RocksDB state store.
# --------------------------------------------------------------------------
@query("q101_streaming_tumbling_e2e", _TUMBLING_SQL)
def q101_streaming_tumbling_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    agg = stream_ops.tumbling_counts(src, window="10 minutes")
    out = stream_ops.run_to_completion(agg, "q101_streaming_tumbling_sink")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n_events",
        "value_sum",
    )


# --------------------------------------------------------------------------
# q102 — SESSION windows through the real streaming path (q101's harness
# applied to q34's operator): readStream -> watermark -> session_window
# merge -> writeStream(availableNow).  Session windows are the hardest
# streaming state shape (variable-length windows that MERGE as events
# arrive, unlike fixed tumbling buckets), so driving them through the
# micro-batch planner + state store and hash-comparing against the
# lag/cumsum batch oracle verifies the merging state logic itself, not
# just the unified batch semantics.
# --------------------------------------------------------------------------
@query("q102_streaming_sessions_e2e", ORACLES["q34_user_sessions"])
def q102_streaming_sessions_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    agg = stream_ops.session_counts(src, gap="5 minutes")
    out = stream_ops.run_to_completion(agg, "q102_streaming_sessions_sink")
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )
