"""Assemble BENCH_sf30.json from the round-7 heavy-tail soak readings.

Round-6 verdict item #6: one more scale decade-third (sf10 -> sf30, 3x)
on the six heaviest queries — confirm the shapes or find the wall before
a cluster does.  Reads the two soak outputs (32-partition default run and
128-partition cluster-posture run) passed as argv, joins against
BENCH_sf10.json, and writes growth factors + the findings narrative.

Usage: python tools/assemble_bench_sf30.py soak32.json soak128.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

HEAVY = [
    "q108_pagerank_parts",
    "q199_invoice_allocation",
    "q139_overlapping_order_spans",
    "q141_streaming_dedup_e2e",
    "q151_streaming_transcripts_e2e",
    "q112_triangle_parts",
]


def _last_json_line(path: str) -> dict:
    lines = [
        ln for ln in Path(path).read_text().splitlines()
        if ln.startswith("{")
    ]
    assert lines, f"{path}: no JSON line found"
    return json.loads(lines[-1])


def main() -> int:
    soak32 = _last_json_line(sys.argv[1])
    soak128 = _last_json_line(sys.argv[2])
    sf10 = json.loads((REPO / "BENCH_sf10.json").read_text())["sf10"]

    q32, q128 = soak32.get("queries", {}), soak128.get("queries", {})
    growth = {
        q: round(q128[q] / sf10[q], 2)
        for q in HEAVY
        if q in q128 and q in sf10
    }
    rec = {
        "metric": "heavy_tail_sf30_soak",
        "unit": "sec",
        "data": (
            "testdata_sf30 = deterministic 3x upscale of sf10 "
            "(tools/make_sf30.py; lineitem/orders/events only — the "
            "tables the six heaviest queries read; 180M lineitem rows)"
        ),
        "selection": HEAVY,
        "sf30_default_32_partitions": q32,
        "sf30_errors_default_32_partitions": soak32.get("errors", {}),
        "sf30_cluster_posture_128_partitions": q128,
        "sf30_errors_128_partitions": soak128.get("errors", {}),
        "sf10_reference": {q: sf10[q] for q in HEAVY if q in sf10},
        "growth_x_on_3x_data_at_128": growth,
        "pass_le_4x": all(g <= 4.0 for g in growth.values()),
        "findings": [
            "WALL FOUND + FIXED: run_to_completion's memory sink "
            "serialized every streamed row through the driver — q141/"
            "q151 died at ~1 GiB of task results (spark.driver."
            "maxResultSize) at sf30. Replaced with a foreachBatch "
            "parquet scratch sink (executor-written, mode-faithful to "
            "the memory sink); both streams now complete.",
            "WALL FOUND + KNOB ADDED: the 32-partition local default "
            "spills and GC-thrashes on 180M-row shuffles (q139 10.7x "
            "on 3x data); at the documented cluster posture (initial "
            "width 128, AQE coalesces down) growth returns to the "
            "linear band. SPARK_GRAFT_SHUFFLE_PARTITIONS now "
            "exposes the knob without spark-submit.",
        ],
    }
    out = REPO / "BENCH_sf30.json"
    out.write_text(json.dumps(rec, indent=1) + "\n")
    print(json.dumps({k: rec[k] for k in (
        "sf30_cluster_posture_128_partitions", "growth_x_on_3x_data_at_128",
        "pass_le_4x")}, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
