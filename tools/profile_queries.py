"""Per-query wall breakdown: DataFrame CONSTRUCTION vs warm execution.

Round-12 found ~half of each sf0.1 query's wall is driver-side work
(plan construction + analysis); the SQL-rendered-literal fix (q44/q91/
q111/q129) came straight out of a cProfile of construction.  This tool
makes that measurement repeatable for any subset of the catalog:

    python tools/profile_queries.py q155_hybrid_rrf_retrieval q163_retrieval_eval
    python tools/profile_queries.py --cprofile q155_hybrid_rrf_retrieval

Per query it reports, on the bench session (same auto-posture):
  construct_sec  — fn(spark, sf_dir) wall (includes any eager
                   localCheckpoint work the query does at build time)
  warm_sec x N   — noop-forced walls after one warm-up pass (the bench's
                   timed quantity)

With --cprofile, construction is additionally profiled and the top
cumulative-time entries printed (py4j socket chatter shows up as
`socket.recv` / `get_return_value`).
"""

from __future__ import annotations

import argparse
import cProfile
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from ominimo_dynamic_data_pipeline_spark import get_spark
    from ominimo_dynamic_data_pipeline_spark.queries import QUERIES
    from ominimo_dynamic_data_pipeline_spark.session import (
        estimate_input_bytes,
    )

    unknown = [q for q in args.queries if q not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="profile-queries",
        input_bytes=estimate_input_bytes(args.sf_dir),
    )
    spark.sparkContext.setLogLevel("ERROR")

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # session warm-up (same rationale as bench.py)
    for t in Path(args.sf_dir).glob("*.parquet"):
        try:
            force(spark.read.parquet(str(t)))
        except Exception:
            pass

    for name in args.queries:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = fn(spark, args.sf_dir)
        construct = time.perf_counter() - t0
        t0 = time.perf_counter()
        force(df)
        first = time.perf_counter() - t0
        warms = []
        for _ in range(args.passes):
            t0 = time.perf_counter()
            force(fn(spark, args.sf_dir))
            warms.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: construct={construct:.3f}s first_force={first:.3f}s "
            f"warm={warms}"
        )
        if args.cprofile:
            prof = cProfile.Profile()
            prof.enable()
            df2 = fn(spark, args.sf_dir)
            prof.disable()
            # analysis phase is also driver-side construction cost
            df2.schema  # noqa: B018 — trigger analysis
            stats = pstats.Stats(prof, stream=sys.stdout)
            stats.sort_stats("cumulative").print_stats(25)
        spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
