"""Assemble BENCH_sf1.json from the full-catalog sf0.1 + sf1 bench runs.

Inputs (produced by bench.py, one JSON line each):
  --sf01 PATH          full-catalog run at /root/testdata/sf0.1
  --sf1 PATH [PATH..]  chunked full-catalog runs at testdata_sf1 (merged)
  --stability PATH     jsonl of repeated q26/q49/q57 sf1 runs (optional)

Writes BENCH_sf1.json at the repo root: per-query sf0.1/sf1 seconds,
growth on 10x data, the <=12x gate, and run notes.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf01", required=True)
    ap.add_argument("--sf1", nargs="+", required=True)
    ap.add_argument("--stability")
    ap.add_argument("--notes")
    args = ap.parse_args()

    sf01 = json.loads(Path(args.sf01).read_text())["queries"]
    sf1: dict[str, float] = {}
    for p in args.sf1:
        sf1.update(json.loads(Path(p).read_text())["queries"])

    growth = {
        k: round(sf1[k] / sf01[k], 2)
        for k in sf1
        if k in sf01 and sf01[k] > 0
    }
    worst = sorted(growth.items(), key=lambda kv: -kv[1])
    out = {
        "metric": "full_catalog_scale_check",
        "unit": "sec",
        "n_queries": len(sf1),
        "sf0.1": dict(sorted(sf01.items())),
        "sf1": dict(sorted(sf1.items())),
        "growth_x_on_10x_data": dict(sorted(growth.items())),
        "total_sf0.1": round(sum(sf01.values()), 3),
        "total_sf1": round(sum(sf1.values()), 3),
        "max_growth": worst[0][1] if worst else None,
        "worst_5": [{"query": k, "growth_x": v} for k, v in worst[:5]],
        "pass_le_12x": all(v <= 12 for _, v in worst),
    }
    if args.stability:
        runs = [
            json.loads(line)["queries"]
            for line in Path(args.stability).read_text().splitlines()
            if line.strip()
        ]
        all_queries = sorted({q for r in runs for q in r})
        if runs:
            out["dedup_stability_3_runs_sf1"] = {
                q: [r.get(q) for r in runs] for q in all_queries
            }
    if args.notes:
        out["notes"] = json.loads(Path(args.notes).read_text())
    (ROOT / "BENCH_sf1.json").write_text(json.dumps(out, indent=1))
    print(
        f"BENCH_sf1.json: {len(sf1)} queries, total "
        f"{out['total_sf0.1']}s -> {out['total_sf1']}s, "
        f"max growth {out['max_growth']}x, pass<=12x: {out['pass_le_12x']}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
