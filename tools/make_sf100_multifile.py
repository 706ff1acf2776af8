"""Re-layout the sf100 soak tables as ~64-file parquet directories.

Round-10 item: the single-file testdata layout overstates scan cost ~3x
even at the best split setting (tools/exp_multifile_split.py measured a
64-file lineitem at 7.9/6.2/6.3 s across 4/34/128 MB splits vs
317.9/46.9/19.1 s for the single 14 GB file — the footer/rowgroup
decode is a per-file serial wall that real multi-file lakes never hit).
A 100 TB lake is ALWAYS multi-file, so the heavy-tail envelope should
be stamped on the representative layout; this script rewrites each
sf100 table into ``testdata_sf100_mf/<table>.parquet/`` as a 64-file
directory (8 files for the small text/vector tables, which are already
sub-GB) with the SAME rows — `spark.read.parquet` treats the directory
identically, and every soak query's hash must come out unchanged.

Rows are redistributed round-robin (repartition), which permutes
row order; all 12 soak queries aggregate/join before any ordering, so
results are order-independent — the sweep re-verifies hashes anyway.

    python tools/make_sf100_multifile.py [table ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from ominimo_dynamic_data_pipeline_spark import get_spark  # noqa: E402

SRC = Path(__file__).resolve().parent.parent / "testdata_sf100"
DST = Path(__file__).resolve().parent.parent / "testdata_sf100_mf"

# table -> output file count (64 for the >1 GB tables per the measured
# 16-wave rule at 32 cores; 8 keeps the small ones from fragmenting)
FILES = {
    "lineitem": 64,
    "orders": 64,
    "events": 64,
    "documents": 8,
    "embeddings": 8,
}


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(app_name="make_sf100_multifile")
    spark.sparkContext.setLogLevel("ERROR")
    DST.mkdir(exist_ok=True)
    for table, n in FILES.items():
        if only and table not in only:
            continue
        src = SRC / f"{table}.parquet"
        if not src.exists():
            print(f"SKIP {table}: {src} missing")
            continue
        t0 = time.time()
        (
            spark.read.parquet(str(src))
            .repartition(n)
            .write.mode("overwrite")
            .parquet(str(DST / f"{table}.parquet"))
        )
        print(f"{table}: {n} files in {time.time() - t0:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
