"""Round-10 experiment (round-9 verdict item 5): does a pre-bucketed
span layout remove the q139 overlap-join exchange, and what does it buy?

q139's residual at sf100 is shuffle volume: the 150M-row span frame
(lineitem⋈orders groupBy) feeds BOTH sides of the binned interval
overlap self-join, and each side exchanges on the join key.  The
at-scale answer is to keep the span frame bucketed on o_custkey —
HashPartitioning(custkey) satisfies the join's
ClusteredDistribution(custkey, bin) because it is a subset of the
clustering keys, so neither side shuffles (the repo already proves
zero-Exchange bucketed joins in tests/test_scale.py).

Protocol (cold process per condition, serialize with other timing):

  A. baseline — catalog q139 as shipped (span build + checkpoint +
     self-join), the BENCH_sf100 reference shape;
  B. build   — write the span frame ONCE as a bucketed table
     (bucketBy custkey, the one-time layout cost a real deployment
     amortizes across every downstream overlap query);
  C. bucketed-read — run the identical overlap join + projection
     reading the bucketed spans table, and verify the plan carries no
     Exchange above the scans (printed); result row count must equal A.

Adopt-or-reject: C's win must cover a sane amortization story vs A
(B is capex); hashes pinned by comparing A and C row counts + a
checksum.

Usage:
    python tools/exp_q139_bucketed.py <sf_dir> [A|BC]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WAREHOUSE_TABLE = "exp_q139_spans_bucketed"
BUCKETS = 256


def span_frame(spark, sf_dir):
    from pyspark.sql import functions as F

    from ominimo_dynamic_data_pipeline_spark.queries.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "o_orderkey")
        .agg(
            F.min(F.col("o_orderdate").cast("date")).alias("start_d"),
            F.max(F.col("l_shipdate").cast("date")).alias("end_d"),
        )
    )


def overlap(spans):
    from pyspark.sql import functions as F

    from ominimo_dynamic_data_pipeline_spark.operators.joins import (
        interval_overlap_join,
    )

    pairs = interval_overlap_join(
        spans,
        spans.select(
            "o_custkey",
            F.col("o_orderkey").alias("order_b"),
            F.col("start_d").alias("b_start"),
            F.col("end_d").alias("b_end"),
        ),
        "start_d", "end_d", "b_start", "b_end",
        by=["o_custkey"], bin_size=120,
    ).filter(F.col("o_orderkey") < F.col("order_b"))
    return pairs.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("order_a"),
        "order_b",
        (
            F.datediff(
                F.least("end_d", "b_end"), F.greatest("start_d", "b_start")
            )
            + 1
        )
        .cast("bigint")
        .alias("overlap_days"),
    )


def checksum(df) -> tuple[int, int]:
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("custkey") + F.col("order_a") + F.col("order_b")
              + F.col("overlap_days")).alias("s"),
    ).collect()[0]
    return int(row["n"]), int(row["s"] or 0)


def main() -> int:
    sf_dir = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "A"

    from ominimo_dynamic_data_pipeline_spark import get_spark
    from ominimo_dynamic_data_pipeline_spark.session import (
        estimate_input_bytes,
    )

    extra = {}
    if mode == "BC":
        # Two confs are REQUIRED for the zero-exchange read (verified at
        # sf10, plan probes this round):
        #  * autoBucketedScan auto-DISABLES the bucketed layout under
        #    the Generate(explode)->join shape, silently restoring the
        #    exchange ("Bucketed: false" in the scan);
        #  * requireAllClusterKeysForCoPartition (default true) rejects
        #    the subset co-partitioning HashPartitioning(custkey) ⊆
        #    ClusteredDistribution(custkey, bin) that makes bucket-only
        #    layouts usable under a composite equi-key.
        extra = {
            "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
            "spark.sql.requireAllClusterKeysForCoPartition": "false",
        }
    spark = get_spark(
        app_name=f"exp-q139-{mode}",
        input_bytes=estimate_input_bytes(sf_dir),
        extra_conf=extra or None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    if mode == "A":
        from ominimo_dynamic_data_pipeline_spark.queries import QUERIES

        t0 = time.time()
        n, s = checksum(QUERIES["q139_overlapping_order_spans"](spark, sf_dir))
        print(json.dumps({"mode": "A_baseline", "sec": round(time.time() - t0, 2),
                          "rows": n, "checksum": s}), flush=True)
    elif mode == "BC":
        # Build and read share one process: bucket metadata lives in the
        # session catalog (no Hive metastore in this container), so a
        # separate reader process would see plain parquet and re-shuffle.
        # The C reading therefore carries a warm-JVM advantage over A's
        # cold process — disclosed; the A-vs-C delta at sf100 (minutes)
        # dwarfs the ~3 s codegen warm-up.
        t0 = time.time()
        spark.sql(f"DROP TABLE IF EXISTS {WAREHOUSE_TABLE}")
        # a previous process's DROP only cleared ITS in-memory catalog;
        # the warehouse directory survives and blocks the CREATE
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "")
        if wh.startswith("file:"):
            wh = wh[len("file:"):]
        if wh:
            shutil.rmtree(Path(wh) / WAREHOUSE_TABLE, ignore_errors=True)
        (
            span_frame(spark, sf_dir)
            .write.bucketBy(BUCKETS, "o_custkey")
            .sortBy("o_custkey")
            .format("parquet")
            .mode("overwrite")
            .saveAsTable(WAREHOUSE_TABLE)
        )
        print(json.dumps({"mode": "B_build_bucketed",
                          "sec": round(time.time() - t0, 2),
                          "buckets": BUCKETS}), flush=True)
        spans = spark.table(WAREHOUSE_TABLE)
        out = overlap(spans)
        plan = out._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
        t0 = time.time()
        n, s = checksum(out)
        print(json.dumps({"mode": "C_bucketed_read",
                          "sec": round(time.time() - t0, 2),
                          "rows": n, "checksum": s,
                          "exchanges_in_plan": n_exchanges}), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
