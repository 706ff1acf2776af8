"""Heavy-tail soak runner: time the named catalog queries once each
against a scale directory, under AUTO-POSTURE (zero env knobs — the
session derives shuffle width and state-store provider from the
dataset's on-disk bytes; tools/make_sf100.py generates the data).

    python tools/soak_heavy.py <sf_dir> <query> [query ...]

Single-shot timings (no bench.py warm-up double-run): at soak scale the
~3 s one-time codegen cost is noise against 100+ s queries, and one run
of q108 at sf100 is ~20 min of compute.  Prints one JSON line per query
and a final summary line.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ominimo_dynamic_data_pipeline_spark import get_spark  # noqa: E402
from ominimo_dynamic_data_pipeline_spark.queries import QUERIES  # noqa: E402
from ominimo_dynamic_data_pipeline_spark.session import (  # noqa: E402
    estimate_input_bytes,
)


def main() -> int:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    nbytes = estimate_input_bytes(sf_dir)
    spark = get_spark(app_name="soak", input_bytes=nbytes)
    spark.sparkContext.setLogLevel("ERROR")
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "input_bytes": nbytes,
                "auto_shuffle_partitions": spark.conf.get(
                    "spark.sql.shuffle.partitions"
                ),
                "session_state_store_provider": spark.conf.get(
                    "spark.sql.streaming.stateStore.providerClass", "heap"
                ),
            }
        ),
        flush=True,
    )
    results: dict[str, float] = {}
    # try/finally: the JVM's exit hook does not reliably remove the
    # block-manager dir when Py4J tears down first — a soak session's
    # shuffle/spill files (tens of GB at sf100) must not outlive it,
    # INCLUDING on KeyboardInterrupt / unexpected exceptions mid-soak.
    try:
        for name in names:
            t0 = time.time()
            try:
                QUERIES[name](spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                results[name] = round(time.time() - t0, 3)
                print(json.dumps({name: results[name]}), flush=True)
            except Exception as exc:  # keep soaking the rest
                results[name] = -1.0
                print(
                    json.dumps({name: "ERROR", "err": repr(exc)[:200]}),
                    flush=True,
                )
        print(json.dumps({"summary": results}), flush=True)
    finally:
        # scratch before stop: results are consumed (noop-written) by
        # now, and leftover per-batch sink parquet + checkpoints from
        # streaming queries starve the NEXT soak's shuffle space
        # (measured round 9: 23 GB of accumulated scratch -> disk-full
        # errors mid-sf100)
        try:
            from ominimo_dynamic_data_pipeline_spark.streaming.ops import (
                cleanup_scratch,
            )

            cleanup_scratch(spark)
        except Exception:
            pass
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
