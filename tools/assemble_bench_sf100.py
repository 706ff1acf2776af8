"""Assemble BENCH_sf100.json from the round-8 next-decade soak readings.

Round-7 verdict item #4: extend the soak one more decade — sf10 -> sf100
(10x, 600M lineitem rows) on the heavy tail, zero env knobs (the
auto-posture rules pick shuffle width, heap, and state-store provider
from the dataset's on-disk bytes).  Readings, in the order they were
measured this round:

  argv[1]  sf100 relational, G1 (the JVM default) — the run that FOUND
           the wall: superlinear growth + GCLocker OOM
  argv[2]  sf100 relational, ParallelGC session defaults (the fix)
  argv[3]  sf10 relational, same defaults — apples-to-apples growth base
  argv[4]  sf100 text/streaming tranche, ParallelGC defaults
  argv[5]  sf10 text/streaming tranche, same defaults

Usage: python tools/assemble_bench_sf100.py g1.json pgc.json ref10.json \
           text100.json text10.json
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _readings(path: str) -> tuple[dict, dict, dict]:
    """(header, per-query seconds, per-query errors) from a soak log."""
    header: dict = {}
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for ln in Path(path).read_text().splitlines():
        if not ln.startswith("{"):
            continue
        obj = json.loads(ln)
        if "sf_dir" in obj:
            header = obj
        elif "summary" in obj:
            continue
        elif "err" in obj:
            errors[next(k for k in obj if k != "err")] = obj["err"]
        else:
            for k, v in obj.items():
                if isinstance(v, (int, float)):
                    times[k] = v
    # a later successful reading supersedes an earlier error for the
    # same query (e.g. a re-run appended to the log); the finding that
    # explains the transient failure stays in the record's narrative
    for k in list(errors):
        if k in times:
            del errors[k]
    return header, times, errors


def main() -> int:
    g1_h, g1_t, g1_e = _readings(sys.argv[1])
    pgc_h, pgc_t, pgc_e = _readings(sys.argv[2])
    ref_h, ref_t, _ = _readings(sys.argv[3])
    txt_h, txt_t, txt_e = _readings(sys.argv[4])
    txt10_h, txt10_t, _ = _readings(sys.argv[5])

    def growth(hi: dict, lo: dict) -> dict:
        return {
            k: round(hi[k] / lo[k], 2)
            for k in hi
            if k in lo and lo[k] > 0
        }

    rel_growth = growth(pgc_t, ref_t)
    txt_growth = growth(txt_t, txt10_t)
    all_growth = {**rel_growth, **txt_growth}

    record = {
        "metric": "heavy_tail_sf100_soak",
        "unit": "sec",
        "data": (
            "testdata_sf100 = deterministic 10x upscale of sf10 "
            "(tools/make_sf100.py lineitem+orders: 600M lineitem rows, "
            "~16 GB; tools/make_sf100_text.py events/documents/"
            "embeddings: 100M events, 5M docs, 2M vectors)"
        ),
        "posture": (
            "ZERO env knobs at every scale: auto_shuffle_partitions "
            f"picked {pgc_h.get('auto_shuffle_partitions')} (relational dir) / "
            f"{txt_h.get('auto_shuffle_partitions')} (full dir) at sf100, "
            f"{ref_h.get('auto_shuffle_partitions')} at sf10; heap "
            "auto-scaled to 45g (3x input, clamped to half RAM); "
            "state-store provider auto-flips to RocksDB per stream at "
            ">= 256 MB of streamed source"
        ),
        "sf100_relational_g1_default": {
            "queries": g1_t,
            "errors": g1_e,
        },
        "sf100_relational_parallelgc": pgc_t,
        "sf10_same_posture_reference": ref_t,
        "sf100_text_streaming_parallelgc": {"queries": txt_t, "errors": txt_e},
        "sf10_text_streaming_reference": txt10_t,
        "growth_x_on_10x_data": all_growth,
        "max_growth": max(all_growth.values()) if all_growth else None,
        "findings": [
            "WALL FOUND + FIXED: under the JVM-default G1 collector the "
            "600M-row shuffles hit GCLocker-starved allocation "
            "('Retried waiting for GCLocker too often' on ~64 MB "
            "humongous sort arrays while lz4/snappy+Arrow hold "
            "JNI-critical regions): q199 663.8 s, q139 971.8 s, and q97 "
            "threw OutOfMemoryError WITH FREE HEAP REMAINING (isolated "
            "re-run reproduced the OOM). ParallelGC session defaults "
            "(driver+executor) fix all three: q199 254.0 s isolated / "
            "235.8 s in-session, q139 502.3 s, q97 318.9 s. Pinned by "
            "tests/test_posture.py::test_batch_gc_posture_pinned.",
            "WALL FOUND + FIXED (pre-GC recalibration): the first width "
            "target (96 MB/partition, derived from sf30's whole-dir "
            "bytes) put 3.8M rows in each q199 partition and OOMed; "
            "32 MB/partition reproduces the measured-good ~1.2M "
            "rows/partition density. The 24g base heap also OOMed mid "
            "shuffle-write at ANY width; the heap now auto-scales to "
            "~3x input (45g here), env-overridable.",
            "spark.cleaner.periodicGC.interval 30min -> 5min: long "
            "multi-query sessions no longer carry dead localCheckpoint/"
            "broadcast blocks (sf30 measured q108 203 s late-session vs "
            "174 s isolated from this accumulation).",
            "WALL FOUND + FIXED (local disk): q139's first in-session "
            "run died on SPILL_OUT_OF_MEMORY 'No space left on device' — "
            "a crashed G1 probe JVM had left an 18 GB block-manager dir "
            "behind (Py4J teardown raced the JVM exit hook) on top of "
            "the predecessor query's shuffle files inside the 5-min "
            "periodic-GC window. tools/soak_heavy.py now stops its "
            "session explicitly; with the stale dir removed q139 "
            "completes in 480.4 s (502.3 s isolated probe). At cluster "
            "scale this is the per-node shuffle-headroom provisioning "
            "constraint: a 600M-row overlap self-join spills ~2x its "
            "shuffle volume transiently.",
            "Streaming at the decade: the auto state-store rule flipped "
            "the three streaming paths to RocksDB per stream (1.2 GB "
            "events source >= the 256 MB crossover) with zero knobs; "
            "q116 stateful totals 8.0x, q151 session transcripts 12.4x, "
            "q141 dedup 16.8x on 10x data, all completing where sf30's "
            "heap store OOMed at a third of this size.",
            "Text family stays in band at the decade: q37 token stats "
            "9.5x (the sf30 4.37x-on-3x worry does NOT compound), q146 "
            "containment 5.1x, q191 canonicals 4.6x, q197 principal "
            "share 3.2x on 10x data — the bucketed candidate generators "
            "and partial-agg moment paths hold their shapes.",
            "q97 copurchase pairs is the heaviest grower (27.8x on 10x): "
            "its pair-expansion shuffle is ~6x the input volume and the "
            "single local disk serializes it; completes green after the "
            "GC fix (it OOMed under G1 even isolated).",
        ],
    }
    out = REPO / "BENCH_sf100.json"
    out.write_text(json.dumps(record, indent=2) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
