"""Independent-mechanism twins for the two highest-risk shared oracle
conventions (round-11 verdict item #4).

The DuckDB oracles for the minhash and winnow query families restate the
repo's hash-chain conventions in SQL, so a bug INSIDE the convention
(docs/ORACLES.md class C) would produce the same wrong answer on both
sides.  The existing pins cover tiny literals; these tests add
DISTRIBUTIONAL coverage: a pure-Python reference built from hashlib +
list comprehensions over the documented convention — no Spark Column
expressions, no rendered SQL fragments, no shared staging tricks — run
over a real slice of the documents corpus and compared value-for-value.

Mechanism independence matters more than spec independence here: the
Spark side computes signatures through a staged HOF chain (md5 -> conv ->
shiftright/bitwiseAND -> nested transform/zip_with/array_min) and winnow
through posexplode + lead windows + rowsBetween minima; the twins below
use none of that machinery, so an implementation bug in either chain (or
in the oracle SQL that mirrors it) diverges from the twin.
"""

from __future__ import annotations

import hashlib
import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

# --- the documented convention, from first principles -----------------
# normalize_text: lower -> trim(space) -> collapse ASCII whitespace runs.
# Java regex \s (no UNICODE_CHARACTER_CLASS) is exactly [ \t\n\x0B\f\r];
# F.trim strips the space character only.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")
MINHASH_PRIME = 1073741789  # largest prime < 2^30 (llm/dedup.py)


def py_tokens(text: str) -> list[str]:
    norm = _WS.sub(" ", text.lower().strip(" "))
    return [t for t in norm.split(" ") if t != ""]


def py_md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def py_minhash(text: str, num_hashes: int = 16, n: int = 3) -> list[int] | None:
    toks = py_tokens(text)
    if len(toks) < n:
        return None  # shingle_frame drops shingle-less docs
    shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    halves = [
        (h >> 30, h & ((1 << 30) - 1))
        for h in (py_md5_long(s) for s in shingles)
    ]
    return [
        min((hi + i * lo) % MINHASH_PRIME for hi, lo in halves)
        for i in range(1, num_hashes + 1)
    ]


def py_band_buckets(sig: list[int], bands: int = 4) -> list[tuple[int, str]]:
    rows = len(sig) // bands
    return [
        (
            b,
            hashlib.md5(
                "-".join(str(v) for v in sig[b * rows : (b + 1) * rows]).encode()
            ).hexdigest(),
        )
        for b in range(bands)
    ]


def py_winnow(text: str, k: int = 3, window: int = 4) -> set[int]:
    toks = py_tokens(text)
    grams = [" ".join(toks[p : p + k]) for p in range(len(toks) - k + 1)]
    hashes = [py_md5_long(g) for g in grams]
    return {
        min(hashes[p : p + window])
        for p in range(len(hashes) - window + 1)  # full windows only
    }


@pytest.fixture(scope="module")
def doc_slice(spark):
    sf = "/root/testdata/sf0.01"
    if not Path(sf).exists():
        pytest.skip("sf0.01 testdata missing")
    # deterministic bounded slice of the REAL corpus (not literals): the
    # 150 lowest doc_ids, pulled once driver-side for the Python twins
    df = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(150)
    )
    rows = df.collect()
    assert len(rows) == 150
    return df, {r["doc_id"]: r["text"] for r in rows}


def test_minhash_signatures_first_principles_twin(spark, doc_slice):
    """Every mh_i of every doc in the slice equals the hashlib/list-
    comprehension reference — the distributional second pin for the
    minhash signature convention shared by the q26/q49/q167/q176/q191/
    q195 oracles."""
    from ominimo_dynamic_data_pipeline_spark.llm.dedup import (
        minhash_signatures,
    )

    df, texts = doc_slice
    got = {
        r["doc_id"]: [r[f"mh_{i}"] for i in range(16)]
        for r in minhash_signatures(df, num_hashes=16, shingle_n=3).collect()
    }
    want = {
        did: sig
        for did, t in texts.items()
        if (sig := py_minhash(t, num_hashes=16, n=3)) is not None
    }
    assert set(got) == set(want)
    mismatches = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not mismatches, list(mismatches.items())[:3]


def test_minhash_band_buckets_first_principles_twin(spark, doc_slice):
    """The (band, bucket) LSH index rows equal hashlib-recomputed band
    keys from the twin signatures — covers the banding half of the
    convention (concat_ws('-') + md5 over each band's rows)."""
    from ominimo_dynamic_data_pipeline_spark.llm.dedup import (
        minhash_band_buckets,
        minhash_signatures,
    )

    df, texts = doc_slice
    sigs = minhash_signatures(df, num_hashes=16, shingle_n=3)
    got = {
        (r["doc_id"], r["band"], r["bucket"])
        for r in minhash_band_buckets(sigs, num_hashes=16, bands=4).collect()
    }
    want = {
        (did, band, bucket)
        for did, t in texts.items()
        if (sig := py_minhash(t)) is not None
        for band, bucket in py_band_buckets(sig, bands=4)
    }
    assert got == want


def test_winnow_fingerprints_brute_force_twin(spark, doc_slice):
    """Per-doc winnow fingerprint SETS equal the brute-force all-windows
    reference on a 50-doc slice — the distributional second pin for the
    winnow convention shared by the q147/q152/q90/q93 oracles.  The
    Spark side selects minima through lead-window gram assembly and
    rowsBetween running minima; the twin slices token lists directly."""
    from ominimo_dynamic_data_pipeline_spark.llm.text import (
        winnow_fingerprints,
    )

    df, texts = doc_slice
    sub_ids = sorted(texts)[:50]
    sub = df.filter(F.col("doc_id").isin(sub_ids))
    out = winnow_fingerprints(sub, k=3, window=4).collect()
    got: dict[object, set[int]] = {}
    for r in out:
        got.setdefault(r["doc_id"], set()).add(r["fp"])
    want = {
        did: fps
        for did in sub_ids
        if (fps := py_winnow(texts[did], k=3, window=4))
    }
    assert set(got) == set(want)
    mismatches = {d: (got[d], want[d]) for d in want if got[d] != want[d]}
    assert not mismatches, list(mismatches.items())[:3]


def test_winnow_shared_substring_guarantee(spark):
    """Schleimer/Wilkerson/Aiken's winnowing guarantee, checked against
    the REAL implementation: any shared token run of length >=
    k + window - 1 must surface as at least one shared fingerprint.
    Planted pairs share exactly a 6-token run (k=3, window=4) inside
    otherwise-disjoint text."""
    from ominimo_dynamic_data_pipeline_spark.llm.text import (
        winnow_fingerprints,
    )

    shared = "quick brown foxes jump over walls"  # 6 tokens = k + w - 1
    rows = [
        (1, f"alpha beta gamma {shared} delta epsilon"),
        (2, f"one two three four {shared} five six seven"),
        (3, "totally unrelated text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps: dict[int, set[int]] = {1: set(), 2: set(), 3: set()}
    for r in winnow_fingerprints(df, k=3, window=4).collect():
        fps[r["doc_id"]].add(r["fp"])
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
