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
from pyspark.sql.window import Window

from ominimo_dynamic_data_pipeline_spark.queries.tables import (
    exact_str_double,
    load_table,
)
from ominimo_dynamic_data_pipeline_spark.streaming import ops as stream_ops
from ominimo_dynamic_data_pipeline_spark.llm.similarity import duck_round_expr

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
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS value_sum
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


# --------------------------------------------------------------------------
# q136 — SLIDING (hopping) windows, the overlap shape between q33's
# tumbling buckets and q34's sessions: every event lands in exactly
# window/slide = 2 overlapping windows.  The oracle replicates Spark's
# epoch-aligned window assignment by exploding each event to
# [bucket(slide), bucket(slide) - slide]: with window = 2 x slide an
# event at t always belongs to both (t in [tb, tb+10) and
# [tb-5, tb+5)), so no containment filter is needed and the count is a
# pure 2x fan-out + group — the same cost shape as the streaming state.
# --------------------------------------------------------------------------
@query(
    "q136_sliding_event_counts",
    """
    WITH ev AS (
        SELECT time_bucket(INTERVAL '5 minutes', ts) AS tb, event_type
        FROM events
    )
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           STRFTIME(ws + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S')
               AS window_end,
           event_type,
           COUNT(*) AS n_events
    FROM (
        SELECT event_type,
               unnest([tb, tb - INTERVAL '5 minutes']) AS ws
        FROM ev
    )
    GROUP BY ws, event_type
    """,
)
def q136_sliding_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = stream_ops.sliding_counts(e, window="10 minutes", slide="5 minutes")
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type",
        "n_events",
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
    out = stream_ops.run_to_completion(
        agg, "q101_streaming_tumbling_sink",
        shuffle_partitions=stream_ops.sized_state_partitions(spark, sf_dir),
        input_bytes=stream_ops.dataset_bytes(sf_dir),
    )
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
    out = stream_ops.run_to_completion(
        agg, "q102_streaming_sessions_sink",
        shuffle_partitions=stream_ops.sized_state_partitions(spark, sf_dir),
        input_bytes=stream_ops.dataset_bytes(sf_dir),
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
        "n_events",
    )


# --------------------------------------------------------------------------
# q115 — stream-STREAM interval join through the real streaming path:
# readStream -> two watermarked sides -> bounded-state interval join ->
# availableNow sink.  q61 registers the identical logic as a batch twin;
# this entry drives the micro-batch planner's symmetric join state store
# (clicks retained only lookback+watermark deep per side) and
# hash-compares against the same DuckDB oracle — inner joins emit
# eagerly per batch, so a full replay must reproduce the batch result
# exactly.  Completes the streaming family: windowed agg (q101), merging
# session windows (q102), stream-stream join (this).
# --------------------------------------------------------------------------
from ominimo_dynamic_data_pipeline_spark.queries.llm import (
    ORACLES as _LLM_ORACLES,
)


@query("q115_streaming_attribution_e2e", _LLM_ORACLES["q61_interval_attribution"])
def q115_streaming_attribution_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    joined = stream_ops.interval_click_attribution(src, lookback="1 hour")
    # the join's state is O(lookback window) per side regardless of input
    # volume, so per-batch overhead dominates: a FIXED small state-store
    # count wins at every measured scale (sf0.1 5.5->2.4 s, sf1 9.1->3.5 s
    # vs the session's 32)
    out = stream_ops.run_to_completion(
        joined, "q115_streaming_attribution_sink", shuffle_partitions=8
    )
    lag = F.floor(
        (F.unix_micros("p_ts") - F.unix_micros("c_ts")) / F.lit(1000000)
    )
    return out.select(
        "purchase_id", "click_id", "user_id", lag.alias("lag_seconds")
    )


# --------------------------------------------------------------------------
# q116 — CUSTOM stateful operator through the real streaming path:
# readStream -> applyInPandasWithState per-user running totals (arbitrary
# per-key state transitions, the escape hatch beyond built-in windowed
# aggs) -> update-mode availableNow sink.  The sink holds one row per
# user per micro-batch; the final state per user (max_by batches) must
# equal the one-shot batch aggregate.  value_sum: the event values are
# cent-exact, so the operator's arrival-order double accumulation and
# the oracle's exact DECIMAL sum agree after ROUND(.., 2) (error < 1e-9
# against a cent-multiple true sum).
# --------------------------------------------------------------------------
@query(
    "q116_streaming_stateful_totals_e2e",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS VARCHAR) AS DOUBLE)
               AS value_sum
    FROM events GROUP BY user_id
    """,
)
def q116_streaming_stateful_totals_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    totals = stream_ops.stateful_user_totals(src)
    # python-stateful ops are WORKER-bound, not state-bound: every row
    # crosses into pandas, so the partition count sets python-worker
    # parallelism — keep the session's full width (8 partitions measured
    # 17.7 s vs 4.8 s at 32 on sf1)
    out = stream_ops.run_to_completion(
        totals,
        "q116_stateful_totals_sink",
        output_mode="update",
        # auto-posture: heap store below the measured 8 GB crossover,
        # RocksDB above (q116 was the crossover's measurement subject)
        input_bytes=stream_ops.dataset_bytes(sf_dir),
    )
    final = out.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "value_sum"), "batches").alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        duck_round_expr("s.value_sum", 2).alias("value_sum"),
    )


# --------------------------------------------------------------------------
# q130 — streaming INCREMENTAL DEDUP end to end: the continuous-ingest
# deployment of q106.  readStream over the documents parquet -> per-doc
# fingerprint -> stream-static LEFT ANTI join against the curated
# corpus's fingerprint index (static side, broadcast) -> streaming
# group-min per fingerprint (state = one tiny row per fresh fp) ->
# availableNow sink.  A replayed file source must reproduce the batch
# operator exactly, so the oracle IS q106's — the hash comparison
# verifies the stream-static anti-join path and dedup state, not just
# the unified batch semantics.  Completes the streaming family's join
# coverage: stream-static inner (enrichment test), stream-stream
# interval (q115), and now stream-static ANTI.
# --------------------------------------------------------------------------
@query(
    "q130_streaming_incremental_dedup_e2e",
    _LLM_ORACLES["q106_incremental_dedup"],
)
def q130_streaming_incremental_dedup_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.llm.text import normalize_text

    static = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 10 < 8
    )
    ref_fps = static.select(
        F.md5(normalize_text(F.col("text"))).alias("fp")
    )
    src = stream_ops.read_documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % 10 >= 8
    )
    fresh = stream_ops.streaming_incremental_dedup(src, ref_fps)
    return stream_ops.run_to_completion(
        fresh,
        "q130_incremental_dedup_sink",
        shuffle_partitions=stream_ops.sized_state_partitions(
            spark, sf_dir, table="documents.parquet"
        ),
        input_bytes=stream_ops.dataset_bytes(sf_dir, table="documents.parquet"),
    )


# --------------------------------------------------------------------------
# q131 — stream-STATIC enrichment through the real streaming path: the
# classic "fact stream x dimension table" shape (events enriched with the
# customer's market segment, then windowed per-segment rollups).
# readStream -> broadcast join against the static dim -> watermarked
# tumbling aggregate -> availableNow sink.  The static side keeps NO
# state (it is re-read per micro-batch, so slowly-changing dims pick up
# updates between batches) and broadcasts — the stream never shuffles
# for the join, only for the windowed aggregate.  Completes the
# streaming catalog family: windowed agg (q101), merging sessions
# (q102), stream-stream interval join (q115), arbitrary state (q116),
# stream-static ANTI join (q130), stream-static INNER join (this).
# Oracle: the batch join+rollup in DuckDB — exact agreement because a
# replayed file source has no late data.
# --------------------------------------------------------------------------
@query(
    "q131_streaming_enrichment_e2e",
    """
    SELECT STRFTIME(time_bucket(INTERVAL '1 hour', e.ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           c.c_mktsegment,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS value_sum
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY window_start, c.c_mktsegment
    """,
)
def q131_streaming_enrichment_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    dim = load_table(spark, sf_dir, "customer")
    agg = stream_ops.enriched_segment_counts(src, dim, window="1 hour")
    out = stream_ops.run_to_completion(
        agg,
        "q131_streaming_enrichment_sink",
        shuffle_partitions=stream_ops.sized_state_partitions(spark, sf_dir),
        input_bytes=stream_ops.dataset_bytes(sf_dir),
    )
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "c_mktsegment",
        "n_events",
        "value_sum",
    )


# --------------------------------------------------------------------------
# q141 — streaming EXACT DEDUP e2e (dropDuplicatesWithinWatermark, the
# last stock stateful operator without its own driver-verified entry):
# the event stream is unioned with ITSELF — every row arrives twice in
# the same micro-batch — and stream_dedup must collapse the duplicates
# back out within the watermark horizon before a batch-side rollup.
# Without the dedup state every count would be exactly 2x the oracle's,
# so the hash comparison verifies the state store did the work, not the
# aggregation.  Oracle: the plain batch rollup over the original table.
# --------------------------------------------------------------------------
@query(
    "q141_streaming_dedup_e2e",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY event_type
    """,
)
def q141_streaming_dedup_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    doubled = src.union(src)
    fresh = stream_ops.stream_dedup(doubled, keys=("event_id",))
    out = stream_ops.run_to_completion(
        fresh,
        "q141_streaming_dedup_sink",
        shuffle_partitions=stream_ops.sized_state_partitions(spark, sf_dir),
        input_bytes=stream_ops.dataset_bytes(sf_dir),
    )
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
    )


# --------------------------------------------------------------------------
# q149 — session transcript assembly (streaming/ops.py
# session_transcripts): interaction logs -> ordered chat-style training
# samples, one row per (user, 5-minute-gap session), turns concatenated
# in (ts, event_id) order with a max_turns truncation guard.  The same
# operator runs on readStream (session_window state + watermark
# eviction); this entry verifies the batch semantics hash-exactly.
# Oracle: q34's lag+cumsum sessionization + string_agg ORDER BY.
# --------------------------------------------------------------------------
_Q149_MAX_TURNS = 500


@query(
    "q149_session_transcripts",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '5 minutes'
                    OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessioned AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
        FROM flagged
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id, session_id ORDER BY ts, event_id) AS rn
        FROM sessioned
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_turns,
           string_agg(CASE WHEN rn <= {_Q149_MAX_TURNS} THEN event_type END,
                      ' ' ORDER BY ts, event_id) AS transcript,
           COUNT(*) > {_Q149_MAX_TURNS} AS truncated
    FROM ranked
    GROUP BY user_id, session_id
    """,
)
def q149_session_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    out = stream_ops.session_transcripts(
        e, gap="5 minutes", max_turns=_Q149_MAX_TURNS
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_turns",
        "transcript",
        "truncated",
    )


# --------------------------------------------------------------------------
# q151 — session TRANSCRIPT assembly through the real streaming path:
# readStream -> session_window merging state carrying the collect_list
# turn buffers -> availableNow sink, hash-compared to q149's batch
# oracle (a replayed file source has no late data, so the merged state
# must reproduce the batch assembly bit-exactly — including turn ORDER
# inside each merged session, which exercises the state-merge path far
# harder than q102's count-only sessions).  Eighth real streaming e2e
# catalog path.
# --------------------------------------------------------------------------
@query("q151_streaming_transcripts_e2e", ORACLES["q149_session_transcripts"])
def q151_streaming_transcripts_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    agg = stream_ops.session_transcripts(src, gap="5 minutes")
    out = stream_ops.run_to_completion(
        agg, "q151_streaming_transcripts_sink",
        shuffle_partitions=stream_ops.sized_state_partitions(spark, sf_dir),
        input_bytes=stream_ops.dataset_bytes(sf_dir),
    )
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias(
            "session_start"
        ),
        "n_turns",
        "transcript",
        "truncated",
    )


# --------------------------------------------------------------------------
# q168 — CUMULATIVE DISTINCT users per event_type by day: the audience-
# growth curve every event pipeline reports, and a window shape Spark
# plain does not have (COUNT(DISTINCT) OVER a running frame raises
# DISTINCT_WINDOW_FUNCTION_UNSUPPORTED).  The operator composes it from
# primitives Spark scales: first-seen day per (event_type, user) — ONE
# wide shuffle with map-side partial dedup, the only stage that touches
# |users| rows — then a per-day count and a running SUM over the tiny
# (event_type, day) grid.  At 100 TB the window input is |types|x|days|
# rows, not |events|; the oracle is DuckDB's NATIVE distinct-over-window,
# so the gate checks the composition against an independent engine
# implementation rather than a restatement of the same trick.  Days with
# events but no new users stay present (grid left-join, 0-coalesced).
# --------------------------------------------------------------------------
@query(
    "q168_cumulative_distinct_users",
    """
    WITH d AS (
        SELECT event_type, CAST(ts AS DATE) AS day, user_id FROM events
    ),
    cum AS (
        SELECT DISTINCT event_type, day,
               CAST(COUNT(DISTINCT user_id) OVER (
                   PARTITION BY event_type ORDER BY day) AS BIGINT)
                   AS cum_users
        FROM d
    )
    SELECT event_type,
           STRFTIME(day, '%Y-%m-%d') AS day,
           CAST(cum_users - COALESCE(LAG(cum_users) OVER (
               PARTITION BY event_type ORDER BY day), 0) AS BIGINT)
               AS n_new_users,
           cum_users
    FROM cum
    """,
)
def q168_cumulative_distinct_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select(
        "event_type", F.col("ts").cast("date").alias("day"), "user_id"
    )
    # One wide shuffle: each user's first-seen day per type (partial agg
    # dedups map-side, so the exchange carries ~|distinct pairs| rows).
    firsts = d.groupBy("event_type", "user_id").agg(
        F.min("day").alias("day")
    )
    new_per_day = firsts.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("nn")
    )
    # The (event_type, day) grid keeps zero-new-user days in the output;
    # it is bounded by |types| x |days| regardless of event volume.
    grid = d.select("event_type", "day").distinct()
    joined = grid.join(new_per_day, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("nn", F.lit(0)).alias("nn")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("nn").cast("bigint").alias("n_new_users"),
        F.sum("nn").over(w).cast("bigint").alias("cum_users"),
    )


# --------------------------------------------------------------------------
# q183 — TOP SESSION PATHS: the most common whole-session event-type
# sequences (q34's sessionization composed with ordered path assembly)
# — the path-analysis table product teams read next to q126's Markov
# transitions, and the conversation-shape profile a transcript pipeline
# (q149) mines.  Session cut: per-user lag gap compared in exact
# integer MICROS with the STRICT > boundary — empirically pinned
# (tests/test_properties.py session-boundary test) to match
# F.session_window, which MERGES an event arriving at exactly
# last + gap (closed boundary); q34's lag-based oracle uses the same
# strict form, so q183 path counts sum to q34's session count even on
# exact-boundary data.  Path assembly is ordered
# identically in both engines: Spark sorts collected
# (ts, event_id, type) structs lexicographically; DuckDB string_aggs
# with the same ORDER BY — (ts, event_id) is a total order, so the
# strings agree byte-for-byte.  share = n/total is one division of
# exact counts.  Top-20 with deterministic (n DESC, path) tie-break
# via distributed TakeOrdered.
# --------------------------------------------------------------------------
@query(
    "q183_top_session_paths",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id)
                        > 300000000
                    OR LAG(ts) OVER (
                        PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessioned AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM flagged
    ),
    paths AS (
        SELECT user_id, session_id,
               string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        FROM sessioned GROUP BY user_id, session_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions FROM paths),
    agg AS (
        SELECT path, CAST(COUNT(*) AS BIGINT) AS n FROM paths GROUP BY path
    )
    SELECT path, n,
           CAST(n AS DOUBLE) / CAST(tot.n_sessions AS DOUBLE) AS share
    FROM agg CROSS JOIN tot
    ORDER BY n DESC, path LIMIT 20
    """,
)
def q183_top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            (gap > 300000000) | F.lag("ts").over(w).isNull(), 1
        ).otherwise(0).alias("new_session"),
    )
    cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessioned = flagged.withColumn(
        "session_id", F.sum("new_session").over(cum)
    )
    paths = (
        sessioned.groupBy("user_id", "session_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "event_type"))
            ).alias("evs")
        )
        .select(
            F.array_join(
                F.transform(F.col("evs"), lambda x: x["event_type"]), ">"
            ).alias("path")
        )
    )
    tot = paths.agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
    agg = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "path",
            "n",
            (F.col("n").cast("double") / F.col("n_sessions").cast("double"))
            .alias("share"),
        )
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q185 — WINDOW FUNNEL (view -> click -> purchase within 7 days of the
# first view): the ordered-step conversion primitive product analytics
# runs next to q126's transitions and q183's paths, with greedy-earliest
# FIRST-ANCHOR semantics — each step's timestamp is the MIN event time
# at or after the previous step, and every step must land within the
# horizon anchored at the user's FIRST step-1 event (ClickHouse's
# windowFunnel re-anchors on later step-1 events; this deliberately
# simpler contract is stated in the operator docstring).  All time comparisons are
# exact integer MICROS (q183 precedent) with an INCLUSIVE horizon and
# >= step ordering (a click sharing the first view's timestamp counts)
# so both engines evaluate the identical integer predicates.  Scale
# shape: ONE exchange on user_id, then three unbounded-frame window
# passes that reuse the partitioning (no sort — frames are
# whole-partition MINs), then a per-user agg and a single-row reduce.
# The funnel-time total accumulates in DECIMAL(38,0) and lands as a
# DOUBLE via the exact decimal-string route (sum of per-user
# micro-gaps passes 2^63 at the 100 TB posture; DuckDB's HUGEINT sum
# takes the same VARCHAR->strtod road).  Conversion rates are single
# divisions of exact counts.
# --------------------------------------------------------------------------
_Q185_HORIZON_US = 7 * 24 * 3600 * 1_000_000


@query(
    "q185_window_funnel",
    f"""
    WITH base AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events
    ),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN us END)
                      OVER (PARTITION BY user_id) AS t1
        FROM base
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND us >= t1
                                AND us - t1 <= {_Q185_HORIZON_US}
                           THEN us END)
                      OVER (PARTITION BY user_id) AS t2
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND us >= t2
                                AND us - t1 <= {_Q185_HORIZON_US}
                           THEN us END)
                      OVER (PARTITION BY user_id) AS t3
        FROM w2
    ),
    pu AS (
        SELECT user_id, MAX(t1) AS t1, MAX(t2) AS t2, MAX(t3) AS t3
        FROM w3 GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t1) AS BIGINT) AS n_view,
           CAST(COUNT(t2) AS BIGINT) AS n_click,
           CAST(COUNT(t3) AS BIGINT) AS n_purchase,
           CAST(COUNT(t2) AS DOUBLE) / CAST(COUNT(t1) AS DOUBLE)
               AS click_rate,
           CAST(COUNT(t3) AS DOUBLE) / CAST(COUNT(t2) AS DOUBLE)
               AS purchase_rate,
           CAST(CAST(SUM(t3 - t1) AS VARCHAR) AS DOUBLE) AS sum_funnel_us
    FROM pu
    """,
)
def q185_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.operators.features import (
        window_funnel,
    )

    ev = load_table(spark, sf_dir, "events")
    pu = window_funnel(
        ev,
        user_col="user_id",
        ts_col="ts",
        type_col="event_type",
        steps=("view", "click", "purchase"),
        horizon_us=_Q185_HORIZON_US,
    )
    t1, t2, t3 = "step_1_us", "step_2_us", "step_3_us"
    return pu.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count(t1).cast("bigint").alias("n_view"),
        F.count(t2).cast("bigint").alias("n_click"),
        F.count(t3).cast("bigint").alias("n_purchase"),
        (
            F.count(t2).cast("double") / F.count(t1).cast("double")
        ).alias("click_rate"),
        (
            F.count(t3).cast("double") / F.count(t2).cast("double")
        ).alias("purchase_rate"),
        exact_str_double(
            F.sum((F.col(t3) - F.col(t1)).cast("decimal(38,0)"))
        ).alias("sum_funnel_us"),
    )


# --------------------------------------------------------------------------
# q186 — ACTIVITY STREAKS: per-user longest run of consecutive active
# days (the classic gaps-and-islands engagement metric next to q174's
# cadence and q180's RFM).  Island key = epoch-day ordinal minus the
# per-user day ROW_NUMBER — constant within a consecutive run because
# distinct days make both strictly increase by 1 together; all
# arithmetic is exact integers so the grouping keys agree
# byte-for-byte across engines.  Scale shape: the (user, day) distinct
# is a partial-agg shuffle that carries ~|active user-days| rows (not
# event volume); the window + both rollups then share the user_id
# partitioning.  Output is one row per user — bounded by the user
# dimension, not event count.
# --------------------------------------------------------------------------
@query(
    "q186_activity_streaks",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
        SELECT user_id, day,
               (day - DATE '1970-01-01')
                   - ROW_NUMBER() OVER (
                         PARTITION BY user_id ORDER BY day) AS grp
        FROM days
    ),
    st AS (
        SELECT user_id, grp, COUNT(*) AS len
        FROM isl GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM st GROUP BY user_id
    """,
)
def q186_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.operators.features import (
        activity_streaks,
    )

    ev = load_table(spark, sf_dir, "events")
    return activity_streaks(ev, entity_col="user_id", ts_col="ts")


# --------------------------------------------------------------------------
# q189 — ROLLING 7-DAY DISTINCT ACTIVE USERS per observed day: the
# sliding-window twin of q168's cumulative distinct, and the distinct
# version of q136's sliding counts — the WAU curve dashboards plot.
# Spark has no COUNT(DISTINCT) OVER a moving frame, so the engine uses
# the bounded-fanout expansion: each distinct (user, day) covers the 7
# window-end days it contributes to (explode of a 7-element sequence —
# fanout is the constant window length, never data-dependent), dedupes
# (user, end-day), and counts per OBSERVED day (broadcast semi-join
# against the tiny day dimension drops synthetic end days past the
# span).  The shuffle carries <= 7x|active user-days| rows — linear.
# The oracle is genuinely INDEPENDENT: DuckDB's native
# COUNT(DISTINCT) OVER (RANGE 6 PRECEDING) evaluates the same window
# by a completely different mechanism.  All keys are exact
# integers/dates; the count is exact BIGINT.
# --------------------------------------------------------------------------
@query(
    "q189_rolling_7d_active_users",
    """
    WITH d AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    o AS (
        SELECT user_id, day, day - DATE '1970-01-01' AS dord FROM d
    ),
    w AS (
        SELECT day, COUNT(DISTINCT user_id) OVER (
                   ORDER BY dord
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                   AS users_7d
        FROM o
    )
    SELECT DISTINCT STRFTIME(day, '%Y-%m-%d') AS day,
           CAST(users_7d AS BIGINT) AS users_7d
    FROM w
    """,
)
def q189_rolling_7d_active_users(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.operators.features import (
        rolling_distinct,
    )

    ev = load_table(spark, sf_dir, "events")
    out = rolling_distinct(
        ev, entity_col="user_id", ts_col="ts", window_days=7
    )
    return out.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.col("n_distinct").alias("users_7d"),
    )


# --------------------------------------------------------------------------
# q190 — TIME-WEIGHTED AVERAGE value per user (step-hold TWAP): each
# event's value holds until the user's next event; the average weights
# each value by its holding duration — the standard exposure metric
# where q166's EWMA is the smoothing one.  Exact cross-engine: values
# quantize to integer MICRO-UNITS (2-decimal inputs scale exactly;
# the proven micro-unit-sum route), durations are integer micros from
# unix_micros, and the value x duration products accumulate in
# DECIMAL(38,0) (v_us ~ 1e8 times gap ~ 1e11 passes 2^63 per TERM) —
# both engines then divide the same two decimal-string doubles once.
# Single-event users have zero held time and are excluded (HAVING
# span > 0) rather than given an arbitrary convention.  Scale shape:
# ONE exchange on user_id, a LEAD window pass, then a per-user agg
# reusing the partitioning.
# --------------------------------------------------------------------------
@query(
    "q190_user_value_twap",
    """
    WITH e AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               CAST(ROUND(value * 1000000) AS BIGINT) AS v_us
        FROM events
    ),
    g AS (
        SELECT user_id, v_us,
               LEAD(us) OVER (
                   PARTITION BY user_id ORDER BY us, event_id) - us
                   AS gap_us
        FROM e
    ),
    a AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               SUM(CASE WHEN gap_us IS NOT NULL
                        THEN CAST(v_us AS DECIMAL(19,0))
                             * CAST(gap_us AS DECIMAL(19,0)) END)
                   AS num,
               CAST(SUM(gap_us) AS BIGINT) AS span_us
        FROM g GROUP BY user_id
        HAVING CAST(SUM(gap_us) AS BIGINT) > 0
    )
    SELECT user_id, n_events, span_us,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
               / CAST(CAST(CAST(span_us AS DECIMAL(19,0)) * 1000000
                           AS VARCHAR) AS DOUBLE) AS twap
    FROM a
    """,
)
def q190_user_value_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ominimo_dynamic_data_pipeline_spark.operators.features import twap

    ev = load_table(spark, sf_dir, "events")
    return twap(
        ev,
        group_col="user_id",
        ts_col="ts",
        value_col="value",
        tiebreak_cols=("event_id",),
    )


# --------------------------------------------------------------------------
# q201 — STREAMING FUNNEL end to end (the ninth real streaming path):
# readStream -> applyInPandasWithState greedy step-state per user
# (streaming/ops.stateful_funnel — the continuously-maintained
# deployment of q185) -> update-mode availableNow sink -> final state
# per user (max_by batches) -> the same one-row funnel summary.  The
# replayed file source must reproduce the batch operator exactly, so
# the oracle IS q185's — the hash comparison verifies the stateful
# step transitions and the state store, not just unified batch
# semantics.  The -1 unreached sentinels null out before counting.
# --------------------------------------------------------------------------
@query(
    "q201_streaming_funnel_e2e",
    ORACLES["q185_window_funnel"],
)
def q201_streaming_funnel_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    pu = stream_ops.stateful_funnel(src, horizon_us=_Q185_HORIZON_US)
    out = stream_ops.run_to_completion(
        pu,
        "q201_streaming_funnel_sink",
        output_mode="update",
        input_bytes=stream_ops.dataset_bytes(sf_dir),
    )
    final = out.groupBy("user_id").agg(
        F.max_by(
            F.struct("step_1_us", "step_2_us", "step_3_us"), "batches"
        ).alias("s")
    )
    def step(i: int):
        c = F.col(f"s.step_{i}_us")
        return F.when(c >= 0, c).alias(f"t{i}")

    pu_final = final.select("user_id", step(1), step(2), step(3))
    return pu_final.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.count("t1").cast("bigint").alias("n_view"),
        F.count("t2").cast("bigint").alias("n_click"),
        F.count("t3").cast("bigint").alias("n_purchase"),
        (
            F.count("t2").cast("double") / F.count("t1").cast("double")
        ).alias("click_rate"),
        (
            F.count("t3").cast("double") / F.count("t2").cast("double")
        ).alias("purchase_rate"),
        exact_str_double(
            F.sum((F.col("t3") - F.col("t1")).cast("decimal(38,0)"))
        ).alias("sum_funnel_us"),
    )


# --------------------------------------------------------------------------
# q202 — RocksDB-backed stateful streaming e2e (the TENTH real streaming
# path, round-7 verdict item #2's achievable half: TWS itself stays
# protobuf-blocked in this container, but the RocksDB state-store
# provider it pairs with is exercisable today).  Same dataflow as q116 —
# readStream -> applyInPandasWithState per-user running totals ->
# update-mode availableNow sink — but the per-key state lives in
# RocksDB instances (off-heap, on-disk, changelog-checkpointed) instead
# of the default heap-backed store.  THIS is the 100 TB state posture:
# the sf30 soak measured the heap store OOMing a 24g JVM on
# session-window state (BENCH_sf30.json), while RocksDB state is
# bounded by disk.  The oracle is q116's one-shot batch aggregate, so
# the hash comparison proves provider choice does not change
# semantics — same totals, byte-identical rendering.
# --------------------------------------------------------------------------
@query(
    "q202_streaming_totals_rocksdb_e2e",
    """
    SELECT user_id, COUNT(*) AS n_events,
           CAST(CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS VARCHAR) AS DOUBLE)
               AS value_sum
    FROM events GROUP BY user_id
    """,
)
def q202_streaming_totals_rocksdb_e2e(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    src = stream_ops.read_events_stream(spark, sf_dir)
    totals = stream_ops.stateful_user_totals(src)
    out = stream_ops.run_to_completion(
        totals,
        "q202_totals_rocksdb_sink",
        output_mode="update",
        state_store="rocksdb",
    )
    final = out.groupBy("user_id").agg(
        F.max_by(F.struct("n_events", "value_sum"), "batches").alias("s")
    )
    return final.select(
        "user_id",
        F.col("s.n_events").alias("n_events"),
        duck_round_expr("s.value_sum", 2).alias("value_sum"),
    )
