"""Round-10 follow-up experiment: is q141's watermark-eviction residual
a ROCKSDB cost the auto provider rule over-pays for keys-only state?

The q141 decade decomposition (BENCH_sf100.json) shows the super-linear
term is state eviction under RocksDB (8.6 -> 469.7 task-s on 10x data),
and the auto crossover that selects RocksDB keys on SOURCE bytes — the
right guard for value-heavy state (q151's transcripts OOMed heap at
sf30) but possibly wrong for dropDuplicates state that stores KEYS ONLY
(100M x ~tens of bytes at sf100, well inside the 45g heap).

This measures q141's shape with the provider forced to heap, cold
process, same auto posture otherwise.  Compare against the same-session
rocksdb reading before adopting any rule change.

Usage: python tools/exp_q141_heap.py <sf_dir> [heap|rocksdb]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    sf_dir = sys.argv[1]
    store = sys.argv[2] if len(sys.argv) > 2 else "heap"

    from pyspark.sql import functions as F

    from ominimo_dynamic_data_pipeline_spark import get_spark
    from ominimo_dynamic_data_pipeline_spark.session import (
        estimate_input_bytes,
    )
    from ominimo_dynamic_data_pipeline_spark.streaming import ops as so

    spark = get_spark(
        app_name=f"exp-q141-{store}",
        input_bytes=estimate_input_bytes(sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    src = so.read_events_stream(spark, sf_dir)
    doubled = src.union(src)
    fresh = so.stream_dedup(doubled, keys=("event_id",))
    out = so.run_to_completion(
        fresh,
        f"exp_q141_{store}_sink",
        shuffle_partitions=so.sized_state_partitions(spark, sf_dir),
        state_store=store,
    )
    agg = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("value_sum"),
    )
    rows = sorted(
        (r["event_type"], r["n_events"], round(r["value_sum"], 2))
        for r in agg.collect()
    )
    wall = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "store": store,
                "wall_sec": wall,
                "streaming": so.LAST_RUN_STATS.get(
                    f"exp_q141_{store}_sink", {}
                ),
                "result_fingerprint": rows[:3],
                "n_groups": len(rows),
            }
        ),
        flush=True,
    )
    so.cleanup_scratch(spark)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
