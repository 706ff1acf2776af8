"""Assemble BENCH_sf100.json from the ROUND-9 next-decade soak readings.

Round 9 re-ran the full twelve-query sf100 soak under the round-9
posture (auto scan splits ~36 MB via the 16-wave rule, RocksDB changelog
checkpointing + no row tracking, q108/q112 rank-lineage checkpoints,
q97 adaptive apriori prefilter), zero env knobs.  Readings:

  argv[1]  sf100 relational tranche, one session (5 queries)
  argv[2]  sf100 text/streaming tranche, one session (7 queries)
  argv[3]  sf10 reference, same posture, one session (12 queries)

Isolated re-measures for the late-session streaming drag (q116/q151/q37)
are inline below, with the in-session numbers kept as the canonical
soak readings (matching the round-8 protocol).

Usage: python tools/assemble_bench_sf100_r9.py rel100.json text100.json ref10.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

# round-8 canonical readings (BENCH_sf100.json as of commit b13a863),
# kept for the decade-over-decade comparison
R8_SF100 = {
    "q199_invoice_allocation": 235.755,
    "q108_pagerank_parts": 832.247,
    "q112_triangle_parts": 358.475,
    "q97_copurchase_pairs": 350.689,
    "q139_overlapping_order_spans": 480.368,
    "q37_token_stats": 136.512,
    "q146_containment_near_dups": 99.486,
    "q191_cluster_canonical_docs": 70.345,
    "q197_embedding_principal_share": 42.963,
    "q141_streaming_dedup_e2e": 155.517,
    "q151_streaming_transcripts_e2e": 119.446,
    "q116_streaming_stateful_totals_e2e": 158.959,
}

ISOLATED_R9 = {
    "q116_streaming_stateful_totals_e2e": 160.467,
    "q151_streaming_transcripts_e2e": 80.933,
    "q37_token_stats": 139.616,
    "q139_overlapping_order_spans": 341.507,
}


def _times(path: str) -> dict[str, float]:
    times: dict[str, float] = {}
    for ln in Path(path).read_text().splitlines():
        if not ln.startswith("{"):
            continue
        obj = json.loads(ln)
        if "sf_dir" in obj or "summary" in obj or "err" in obj:
            continue
        for k, v in obj.items():
            if isinstance(v, (int, float)):
                times[k] = v
    return times


def main() -> int:
    rel100 = _times(sys.argv[1])
    text100 = _times(sys.argv[2])
    ref10 = _times(sys.argv[3])
    sf100 = {**rel100, **text100}
    growth = {
        q: round(sf100[q] / ref10[q], 2) for q in sf100 if q in ref10
    }
    growth_r8 = {q: round(R8_SF100[q] / ref10[q], 2) for q in R8_SF100}
    record = {
        "metric": "sf100_heavy_tail_soak_sec",
        "unit": "sec",
        "round": 9,
        "data": (
            "testdata_sf100 (tools/make_sf100.py + make_sf100_text.py): "
            "600M lineitem / 150M orders / 100M events / 5M docs / 6M "
            "vecs, 18.4 GB parquet"
        ),
        "posture": (
            "ZERO env knobs - all auto: 548 shuffle partitions, 45g "
            "heap, ~36 MB scan splits (16-wave rule), ParallelGC, "
            "RocksDB changelog checkpointing on / row tracking off, "
            "state-store per stream at the 256 MB source crossover"
        ),
        "sf100_in_session": sf100,
        "sf100_isolated_remeasures": ISOLATED_R9,
        "sf10_same_posture_reference": ref10,
        "growth_x_on_10x_data": growth,
        "max_growth": max(growth.values()),
        "round8_sf100_same_queries": R8_SF100,
        "round8_growth_vs_r9_sf10_reference": growth_r8,
        "findings": [
            "WALL FOUND + FIXED: the 4 MB local scan split (miniature-"
            "measured round 3) is a 12x scan wall on sf100 single-file "
            "tables - ~4300 tasks each re-parse the multi-thousand-row-"
            "group footer (2-column lineitem scan 167.9 s vs 14.2 s at "
            "128 MB). auto_max_partition_bytes scales splits with input.",
            "WALL FOUND + BRACKETED: 128 MB splits make each map task "
            "external-sort multi-million-row join inputs; the spill-then-"
            "merge transient doubled per-task disk and ENOSPC'd q139 at "
            "52 GB of shuffle. The shipped 16-wave rule (~36 MB at "
            "sf100, ~1M-row map inputs) completes q139 in 314.4 s "
            "in-session (341.5 isolated) vs 480.4 s round 8.",
            "q108's 832 s was rank-chain lineage replay (r0 un-"
            "materialized, r referenced twice per iteration => ~2^iters "
            "pipeline re-instantiations); checkpointing r0 + per-"
            "iteration ranks (the Pregel discipline) + the split fix "
            "lands 252.6 s (5.9x on 10x).",
            "q97 27.8x -> 11.7x: scan-split fix (379.6 -> 221.5 s "
            "isolated) dominates; the adaptive apriori prefilter census "
            "costs ~1% at sf100 (223.8 vs 221.5 s) and prunes nothing "
            "on this distribution (measured: 100.00% of parts appear in "
            ">= 3 orders at every sf); salted RLE pair counting was "
            "measured and REJECTED (516.7 vs 379.6 s - CPU-bound "
            "harness, exchange rides page cache).",
            "RocksDB knob pass (sf30 measured, sf100 confirmed): "
            "changelog checkpointing + trackTotalNumberOfRows=false "
            "take q141 155.5 -> 106.7 s in-session and q151 119.4 -> "
            "80.9 s isolated.",
            "IN-SESSION DRAG on late streaming queries: q116 291.5 s as "
            "the 7th query of the session vs 160.5 s isolated (round-8 "
            "parity); q151 142.5 vs 80.9. Pre-existing (round-8 q116 "
            "was also session-last at 159.0 but its session was "
            "lighter); cause unresolved - carried as a finding, "
            "isolated readings recorded alongside.",
            "Streaming scratch accumulation (23 GB of per-batch sink "
            "parquet + checkpoints across probe sessions) starved the "
            "first sf100 soak's shuffle space -> ENOSPC; bench.py and "
            "soak_heavy.py now call streaming.ops.cleanup_scratch().",
        ],
    }
    out = REPO / "BENCH_sf100.json"
    out.write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {out}: max growth {record['max_growth']}x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
