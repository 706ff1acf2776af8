"""Merge new chunked sf1/sf10 bench runs into BENCH_sf10.json.

Round-5 extension of the second-decade scale check: every query whose
sf1 growth was >= 3x in BENCH_sf1.json gets an sf10 point.  Inputs are
paired bench.py outputs (same SPARK_GRAFT_QUERIES chunk at
testdata_sf1 and testdata_sf10); re-measuring sf1 in the same session
keeps the ratio apples-to-apples after round-4/5 speedups.

Usage: python tools/assemble_bench_sf10.py /tmp/sf10run
(reads sf1_c*.json / sf10_c*.json pairs, rewrites BENCH_sf10.json).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    run_dir = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10run")
    rec = json.loads((ROOT / "BENCH_sf10.json").read_text())
    new_sf1: dict[str, float] = {}
    new_sf10: dict[str, float] = {}
    streaming: dict[str, dict] = {"sf1": {}, "sf10": {}}
    for f in sorted(run_dir.glob("sf1_c*.json")):
        d = json.loads(f.read_text())
        new_sf1.update(d["queries"])
        streaming["sf1"].update(d.get("streaming", {}))
    for f in sorted(run_dir.glob("sf10_c*.json")):
        d = json.loads(f.read_text())
        new_sf10.update(d["queries"])
        streaming["sf10"].update(d.get("streaming", {}))
    if not new_sf10:
        raise SystemExit("no sf10 chunk outputs found")

    # Newly-measured queries replace/extend the record wholesale: both
    # scales were re-run in the same session, so their ratio is current.
    for q, t in new_sf10.items():
        if q not in new_sf1:
            raise SystemExit(f"{q} has an sf10 run but no paired sf1 run")
        rec["sf1"][q] = new_sf1[q]
        rec["sf10"][q] = t
        rec["growth_x_on_10x_data"][q] = round(t / new_sf1[q], 2)

    growth = rec["growth_x_on_10x_data"]
    rec["n_queries"] = len(rec["sf10"])
    rec["max_growth"] = max(growth.values())
    rec["pass_le_12x"] = all(g <= 12 for g in growth.values())
    worst = sorted(growth.items(), key=lambda kv: -kv[1])[:5]
    rec["worst_5"] = dict(worst)
    if streaming["sf10"]:
        rec["streaming_breakdown"] = streaming
    (ROOT / "BENCH_sf10.json").write_text(json.dumps(rec, indent=1) + "\n")
    print(
        f"BENCH_sf10.json: {rec['n_queries']} queries, "
        f"max growth {rec['max_growth']}x, pass_le_12x={rec['pass_le_12x']}"
    )
    for q, g in worst:
        print(f"  worst: {q} {g}x")
    return 0


if __name__ == "__main__":
    main()
