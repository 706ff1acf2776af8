"""Full-catalog DuckDB oracle parity gate.

One parametrized case per catalog query: runs the Spark implementation and
its ``oracle_sql()`` twin over the same sf0.01 parquet, then asserts row
count, column names, and order-insensitive values all match (the same
comparison the driver's correctness gate applies).  Queries without an
oracle (engine-private randomness: LSH hyperplanes, IVF centroids, zlib
byte counts) get a rows-only floor here; their recall floors are pinned in
``tests/test_llm.py``.

This closes the round-2 verdict's top item: previously only the driver's
50-query window plus a manual ``tools/oracle_check.py`` run asserted
parity, so a regression in any unwindowed query would ship silently.  Now
``pytest tests/`` fails the moment any oracle-expressible query loses
hash parity.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.oracle_check import compare, duck_connect  # noqa: E402

from ominimo_dynamic_data_pipeline_spark.queries import ORACLES, QUERIES  # noqa: E402

ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
)

pytestmark = pytest.mark.skipif(
    not Path(ORACLE_SF_DIR).is_dir(),
    reason=f"oracle data dir {ORACLE_SF_DIR} missing",
)


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(ORACLE_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_oracle_parity(name: str, spark, duck) -> None:
    from tests.test_plans import assert_no_unbounded_global_window

    df = QUERIES[name](spark, ORACLE_SF_DIR)
    # suite-wide scale gate (round-7 verdict #1): no catalog query may
    # plan an unpartitioned WindowExec over unbounded input
    assert_no_unbounded_global_window(name, df)
    sdf = df.toPandas()
    if name not in ORACLES:
        # Rows-only by design; quality floors live in test_llm.py.
        assert len(sdf) > 0, f"{name}: rows-only query returned no rows"
        return
    odf = duck.execute(ORACLES[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name} lost oracle parity: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_no_hugeint_oracle_output(name: str, duck) -> None:
    """No oracle may emit a HUGEINT/UHUGEINT column.

    DuckDB's ``count_if`` and windowed ``SUM(BIGINT)`` return HUGEINT, which
    pandas materializes as float64 — so the driver's value hash renders
    ``912.0`` against Spark's ``912`` and flags a red even though the values
    are numerically identical (round-5 verdict: q55/q68/q70/q78).  Casting
    to BIGINT in the oracle SQL is the fix; this lint makes the class
    unshippable again.
    """
    desc = duck.execute(f"DESCRIBE {ORACLES[name]}").df()
    huge = [
        (r["column_name"], r["column_type"])
        for _, r in desc.iterrows()
        if "HUGEINT" in str(r["column_type"]).upper()
    ]
    assert not huge, (
        f"{name} oracle emits HUGEINT column(s) {huge}: wrap in "
        f"CAST(... AS BIGINT) so the driver's pandas rendering matches Spark"
    )


def test_every_oracle_has_a_query() -> None:
    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"oracle_sql() entries without queries(): {orphans}"


# One representative per SURVEY.md §2.4 family; the driver's external
# correctness gate only sees the first 50 queries() entries, so every
# family must keep at least one member inside that window.  The map now
# lives in queries/catalog.py (single source of truth — the rotation
# builder enforces these floors when computing the window).
from ominimo_dynamic_data_pipeline_spark.queries.catalog import (  # noqa: E402
    FAMILY_REPS as _FAMILY_REPS,
)


def test_driver_window_covers_every_family() -> None:
    window = set(list(QUERIES)[:50])
    dropped = {
        family: sorted(reps)
        for family, reps in _FAMILY_REPS.items()
        if not (reps & window)
    }
    assert not dropped, (
        f"operator families with no query in the driver's 50-entry "
        f"correctness window: {dropped}"
    )


def test_hugeint_lint_premise_still_holds(duck) -> None:
    """The HUGEINT lint is only meaningful while DuckDB actually returns
    HUGEINT for count_if — if a DuckDB upgrade changes that, this pin
    fails and the lint (plus the BIGINT casts in the 4 fixed oracles)
    can be retired instead of silently going vacuous."""
    desc = duck.execute(
        "DESCRIBE SELECT count_if(1=1) AS c FROM region"
    ).df()
    assert any(
        "HUGEINT" in str(t).upper() for t in desc["column_type"]
    ), "DuckDB no longer emits HUGEINT for count_if — retire the lint"


def test_rotation_window_policy() -> None:
    """The driver window is COMPUTED (oldest-green-first + family floors),
    not hand-picked: never-driver-verified oracle-backed entries lead,
    ages are non-decreasing apart from family-floor swaps, and the
    builder is deterministic."""
    from ominimo_dynamic_data_pipeline_spark.queries.catalog import (
        CORRECTNESS_WINDOW,
        build_correctness_window,
    )
    from ominimo_dynamic_data_pipeline_spark.queries.rotation_state import (
        DRIVER_GREEN_ROUND,
    )

    assert build_correctness_window() == CORRECTNESS_WINDOW  # deterministic
    assert len(CORRECTNESS_WINDOW) == 50
    assert list(QUERIES)[:50] == CORRECTNESS_WINDOW
    # every never-verified oracle-backed query is in the window
    never = {
        q
        for q in QUERIES
        if q in ORACLES and DRIVER_GREEN_ROUND.get(q, 0) == 0
    }
    assert never <= set(CORRECTNESS_WINDOW), (
        f"never-driver-verified queries left out: "
        f"{sorted(never - set(CORRECTNESS_WINDOW))}"
    )
    # no rows-only entry burns a slot on a weaker check
    assert all(q in ORACLES for q in CORRECTNESS_WINDOW)
