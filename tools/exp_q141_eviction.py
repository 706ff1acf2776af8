"""Round-11 adopt-or-reject experiment on q141's watermark-eviction
residual (round-10 verdict item #4).

The q141 decade decomposition (BENCH_sf100.json,
round10_q141_decade_decomposition) names watermark eviction as the only
undominated scale cost: 8.6 -> 469.7 task-s on 10x data (54x), because
the RocksDB expiry pass iterates the full store.  Trigger cadence is
NOT a lever here — the availableNow run already performs exactly one
full-store eviction (the per-batch passes before it scan a part-filled
store), so "fewer, larger triggers" cannot remove work.  What the
iterator actually pays for is SST shape: every commit flushes the
memtable to an L0 SST, and the final expiry scan merges across those
files.  The remaining knobs scoped to the dedup shape:

  sst     writeBufferSizeMB=128 + maxWriteBufferNumber=4: larger
          memtables -> fewer, larger L0 files -> cheaper merge iterator
          (per-partition state at sf100 is ~45 MB, so 128 MB means ONE
          flush instead of several)
  cache   blockCacheSizeMB=64 (default 8): lets the expiry scan's index/
          filter blocks and any re-read data blocks stay resident; 548
          partitions x 64 MB is bounded by the store's own size, not
          the nominal cap (RocksDB allocates lazily)
  both    the two stacked

All are result-neutral (storage-layout/cache only).  One cold process
per reading; compare state_removal_sec + wall against a SAME-SESSION-
DAY baseline run.  Usage:

    python tools/exp_q141_eviction.py <sf_dir> [baseline|sst|cache|both]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

VARIANTS: dict[str, dict[str, str]] = {
    "baseline": {},
    "sst": {
        "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "128",
        "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber": "4",
    },
    "cache": {
        "spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB": "64",
    },
    "both": {
        "spark.sql.streaming.stateStore.rocksdb.writeBufferSizeMB": "128",
        "spark.sql.streaming.stateStore.rocksdb.maxWriteBufferNumber": "4",
        "spark.sql.streaming.stateStore.rocksdb.blockCacheSizeMB": "64",
    },
}


def main() -> int:
    sf_dir = sys.argv[1]
    variant = sys.argv[2] if len(sys.argv) > 2 else "baseline"

    from pyspark.sql import functions as F

    from ominimo_dynamic_data_pipeline_spark import get_spark
    from ominimo_dynamic_data_pipeline_spark.session import (
        estimate_input_bytes,
    )
    from ominimo_dynamic_data_pipeline_spark.streaming import ops as so

    spark = get_spark(
        app_name=f"exp-q141-evict-{variant}",
        input_bytes=estimate_input_bytes(sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in VARIANTS[variant].items():
        spark.conf.set(k, v)

    t0 = time.time()
    src = so.read_events_stream(spark, sf_dir)
    doubled = src.union(src)
    fresh = so.stream_dedup(doubled, keys=("event_id",))
    out = so.run_to_completion(
        fresh,
        f"exp_q141_evict_{variant}_sink",
        shuffle_partitions=so.sized_state_partitions(spark, sf_dir),
        state_store="rocksdb",
    )
    agg = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("value_sum"),
    )
    rows = sorted(
        (r["event_type"], r["n_events"], round(r["value_sum"], 2))
        for r in agg.collect()
    )
    wall = round(time.time() - t0, 3)
    print(
        json.dumps(
            {
                "variant": variant,
                "confs": VARIANTS[variant],
                "wall_sec": wall,
                "streaming": so.LAST_RUN_STATS.get(
                    f"exp_q141_evict_{variant}_sink", {}
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
