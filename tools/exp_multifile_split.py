"""Round-10 experiment (round-9 verdict item 4): validate the 16-wave
scan-split rule on MULTI-FILE parquet layouts.

The rule (``session.auto_max_partition_bytes``) was calibrated on sf100
SINGLE-file tables, where the dominant cost of over-splitting is each
task re-parsing a 17 GB file's multi-thousand-row-group footer.  A
multi-file layout of the same bytes has per-file footers a few KB deep,
so the footer tax ~vanishes and the optimal split may differ — a real
100 TB lake is multi-file, and the shipped rule could over-split it.

Protocol (serialize with every other timing run):

  1. re-write sf100 lineitem as N (default 64) parquet files into a
     scratch layout dir (one-time cost, reported);
  2. time the round-9 calibration workload — the 2-column lineitem
     scan (l_orderkey, l_extendedprice groupBy-sum, forces real column
     IO, no shuffle of note) — on BOTH layouts at each split setting
     (4 MB, the auto rule's value, 128 MB), cold process per reading;
  3. print one JSON line per reading and a summary.

Usage:
    python tools/exp_multifile_split.py [sf_dir] [n_files]
    # child mode (one cold-process reading):
    python tools/exp_multifile_split.py --scan <table_path> <split_bytes>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def scan_child(table_path: str, split_bytes: int) -> None:
    os.environ["SPARK_GRAFT_MAX_PARTITION_BYTES"] = str(split_bytes)
    from ominimo_dynamic_data_pipeline_spark import get_spark
    from ominimo_dynamic_data_pipeline_spark.session import (
        estimate_input_bytes,
    )

    spark = get_spark(
        app_name="exp-split", input_bytes=estimate_input_bytes(table_path)
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    row = (
        spark.read.parquet(table_path)
        .selectExpr(
            "sum(l_orderkey) AS s1", "sum(l_extendedprice) AS s2"
        )
        .collect()[0]
    )
    n = int(row["s1"] or 0) % 10**9
    wall = round(time.time() - t0, 2)
    print(
        json.dumps(
            {
                "table": table_path,
                "split_mb": split_bytes // 2**20,
                "scan_sec": wall,
                "checksum": n,
            }
        ),
        flush=True,
    )
    spark.stop()


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--scan":
        scan_child(sys.argv[2], int(sys.argv[3]))
        return 0

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else str(REPO / "testdata_sf100")
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    single = f"{sf_dir}/lineitem.parquet"
    multi = str(REPO / "output" / f"exp_lineitem_{n_files}f.parquet")

    if not Path(multi).is_dir():
        from ominimo_dynamic_data_pipeline_spark import get_spark

        spark = get_spark(app_name="exp-split-build")
        spark.sparkContext.setLogLevel("ERROR")
        t0 = time.time()
        # repartition by range on orderkey: realistic lake layout (files
        # carry disjoint key ranges, like a partitioned/ordered ingest)
        (
            spark.read.parquet(single)
            .repartitionByRange(n_files, "l_orderkey")
            .write.mode("overwrite")
            .parquet(multi)
        )
        print(
            json.dumps(
                {"built": multi, "files": n_files,
                 "build_sec": round(time.time() - t0, 2)}
            ),
            flush=True,
        )
        spark.stop()

    from ominimo_dynamic_data_pipeline_spark.session import (
        auto_max_partition_bytes,
        estimate_input_bytes,
    )

    auto = auto_max_partition_bytes(estimate_input_bytes(sf_dir))
    settings = sorted({4 * 2**20, auto, 128 * 2**20})
    results = []
    for table in (single, multi):
        for split in settings:
            env = {
                k: v
                for k, v in os.environ.items()
                if k != "SPARK_GRAFT_MAX_PARTITION_BYTES"
            }
            proc = subprocess.run(
                [sys.executable, __file__, "--scan", table, str(split)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
            for line in proc.stdout.splitlines():
                if line.startswith("{"):
                    rec = json.loads(line)
                    results.append(rec)
                    print(json.dumps(rec), flush=True)
    print(json.dumps({"summary": results}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
