"""Benchmark harness (driver contract).

Runs the query catalog at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced with the noop sink (full computation of every output
column, no driver-side materialization cost).  One warm-up run of the
flagship query absorbs JVM/codegen warm-up so per-query numbers reflect
steady state.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from ominimo_dynamic_data_pipeline_spark import get_spark
from ominimo_dynamic_data_pipeline_spark.queries import QUERIES


def force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    force(QUERIES["q01_pricing_summary"](spark, sf_dir))  # warm-up

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        start = time.perf_counter()
        force(fn(spark, sf_dir))
        timings[name] = round(time.perf_counter() - start, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
