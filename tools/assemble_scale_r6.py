"""Rebuild BENCH_sf1.json / BENCH_sf10.json from the round-6 fresh
full-catalog single-session runs (verdict item 4: re-measure the
carried-over sf0.1 numbers; extended here to re-measure all three scales
in one session each so every decade ratio is fresh, same-methodology
data).

Usage: python tools/assemble_scale_r6.py SF01_JSON SF1_JSON SF10_JSON
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def load(p: str) -> dict:
    return json.loads(Path(p).read_text().strip().splitlines()[-1])


def main() -> int:
    sf01, sf1, sf10 = (load(p) for p in sys.argv[1:4])
    q01, q1, q10 = sf01["queries"], sf1["queries"], sf10["queries"]

    def growth(a: dict, b: dict) -> dict:
        return {
            k: round(b[k] / a[k], 2)
            for k in b
            if k in a and a[k] > 0.02
        }

    g1 = growth(q01, q1)
    worst1 = sorted(g1.items(), key=lambda kv: -kv[1])
    out1 = {
        "metric": "full_catalog_scale_check",
        "unit": "sec",
        "n_queries": len(q1),
        "sf0.1": dict(sorted((k, round(v, 3)) for k, v in q01.items())),
        "sf1": dict(sorted((k, round(v, 3)) for k, v in q1.items())),
        "growth_x_on_10x_data": dict(sorted(g1.items())),
        "total_sf0.1": round(sum(q01.values()), 3),
        "total_sf1": round(sum(q1.values()), 3),
        "max_growth": worst1[0][1] if worst1 else None,
        "worst_5": [{"query": k, "growth_x": v} for k, v in worst1[:5]],
        "pass_le_12x": all(v <= 12 for v in g1.values()),
        "notes": [
            "round 6: all three scales re-measured FRESH (one full-catalog "
            "session per scale, per-query warm-then-time — bench.py "
            "methodology), replacing round 5's carried-over sf0.1 column",
            "includes the round-6 additions q142-q144",
        ],
    }
    for k in ("streaming", "streaming_breakdown"):
        if k in sf1:
            out1["streaming_breakdown_sf1"] = sf1[k]
    (ROOT / "BENCH_sf1.json").write_text(json.dumps(out1, indent=1))

    g10 = growth(q1, q10)
    worst10 = sorted(g10.items(), key=lambda kv: -kv[1])
    out10 = {
        "metric": "second_decade_scale_check",
        "unit": "sec",
        "n_queries": len(q10),
        "data": (
            "testdata_sf10 = deterministic 10x upscale of sf1 "
            "(tools/make_sf10.py; 60M lineitem rows, 1.8 GB)"
        ),
        "selection": (
            "FULL CATALOG (round 6): all queries re-measured at sf1 AND "
            "sf10, one fresh full-catalog session per scale with "
            "per-query warm-then-time (round-5 used chunked paired "
            "sessions; the single-session totals came out FASTER than "
            "round 5's, so JVM pressure is not distorting the ratios)"
        ),
        "sf1": dict(sorted((k, round(v, 3)) for k, v in q1.items())),
        "sf10": dict(sorted((k, round(v, 3)) for k, v in q10.items())),
        "growth_x_on_10x_data": dict(sorted(g10.items())),
        "total_sf1": round(sum(q1.values()), 3),
        "total_sf10": round(sum(q10.values()), 3),
        "max_growth": worst10[0][1] if worst10 else None,
        "worst_5": [{"query": k, "growth_x": v} for k, v in worst10[:5]],
        "pass_le_12x": all(v <= 12 for v in g10.values()),
        "streaming_breakdown": {
            "sf1": sf1.get("streaming", sf1.get("streaming_breakdown")),
            "sf10": sf10.get("streaming", sf10.get("streaming_breakdown")),
        },
    }
    (ROOT / "BENCH_sf10.json").write_text(json.dumps(out10, indent=1))
    print(
        f"sf0.1 {out1['total_sf0.1']}s  sf1 {out1['total_sf1']}s "
        f"(max growth {out1['max_growth']}x)  sf10 {out10['total_sf10']}s "
        f"(max growth {out10['max_growth']}x)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
