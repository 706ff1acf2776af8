"""Host-calibration probe (round-10 verdict item #5).

Round 10's isolated sf100 walls ran 1.3-2x over round 9's on IDENTICAL
code and data — pure host/IO variance — which made cross-round bench
numbers incomparable and forced every comparison to be serialized
within one session.  This probe runs a fixed ~20-30 s synthetic
workload whose cost is independent of the catalog and the scale factor,
and its timings are stamped into every BENCH record so any cross-round
ratio can be normalized by the probe ratio first:

    normalized = wall_r11 * (probe_r10.total / probe_r11.total)

Four axes, matching where the catalog spends time:
  cpu_sec       pure JVM whole-stage-codegen compute (hash + agg over
                spark.range) — no IO, no shuffle; isolates clock/JIT.
  shuffle_sec   one wide hash aggregate over a generated frame — the
                exchange write+read path (local disk + serialization).
  scan_sec      write a ~1 GB parquet once, then timed re-read with a
                noop sink — the parquet scan path (decompress + decode).
  fsync_sec     256 MB python write + os.fsync — raw durability path
                (checkpoint/commit-log analog), no JVM involvement.

The probe frame sizes are FIXED constants; do not scale them with the
dataset.  Each axis runs once warm-up + once timed (same discipline as
bench.py).  Total budget ~20-30 s on the reference 32-core box.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time
from typing import Any


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def run_probe(spark) -> dict[str, Any]:
    from pyspark.sql import functions as F

    out: dict[str, Any] = {}

    # cpu: 2^31 rows of xxhash64+agg, codegen-only (~0.5-1 s/run warm —
    # long enough that scheduler jitter is <10% of the reading)
    cpu_df = spark.range(1 << 31).select(
        F.sum(F.xxhash64("id")).alias("h")
    )
    _force(cpu_df)
    t0 = time.perf_counter()
    _force(cpu_df)
    out["cpu_sec"] = round(time.perf_counter() - t0, 3)

    # shuffle: 3e7 rows -> 3e6 groups, one full exchange (measured ~3 s)
    sh_df = (
        spark.range(30_000_000)
        .groupBy((F.col("id") % 3_000_000).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.sum(F.col("n") * F.col("k")).alias("s"))
    )
    _force(sh_df)
    t0 = time.perf_counter()
    _force(sh_df)
    out["shuffle_sec"] = round(time.perf_counter() - t0, 3)

    # scan: ~1 GB parquet written once, timed cold-ish re-read
    tmp = tempfile.mkdtemp(prefix="host_probe_")
    try:
        pq_path = os.path.join(tmp, "probe.parquet")
        (
            spark.range(40_000_000)
            .select(
                "id",
                F.xxhash64("id").alias("a"),
                (F.col("id") % 1000).cast("double").alias("b"),
                F.concat(F.lit("row-"), F.col("id")).alias("s"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(pq_path)
        )
        rd = spark.read.parquet(pq_path).select(
            F.sum("a").alias("sa"), F.sum("b").alias("sb")
        )
        _force(rd)
        t0 = time.perf_counter()
        _force(rd)
        out["scan_sec"] = round(time.perf_counter() - t0, 3)

        # fsync: 256 MB buffered write + fsync, python-side
        blob = b"\x5a" * (1 << 20)
        fp = os.path.join(tmp, "fsync.bin")
        t0 = time.perf_counter()
        with open(fp, "wb") as f:
            for _ in range(256):
                f.write(blob)
            f.flush()
            os.fsync(f.fileno())
        out["fsync_sec"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    out["total_sec"] = round(
        out["cpu_sec"] + out["shuffle_sec"] + out["scan_sec"]
        + out["fsync_sec"],
        3,
    )
    return out


if __name__ == "__main__":
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from ominimo_dynamic_data_pipeline_spark import get_spark

    spark = get_spark(app_name="host_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print(json.dumps({"host_probe": run_probe(spark)}))
    spark.stop()
