"""Unified query catalog: merges every query family into the single
``QUERIES`` / ``ORACLES`` maps consumed by ``__spark_entry__.py``."""

from __future__ import annotations

from ominimo_dynamic_data_pipeline_spark.queries import relational
from ominimo_dynamic_data_pipeline_spark.queries.tables import load_tables

QUERIES = dict(relational.QUERIES)
ORACLES = dict(relational.ORACLES)


def _merge(module) -> None:
    for name, fn in module.QUERIES.items():
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
    ORACLES.update(module.ORACLES)


from ominimo_dynamic_data_pipeline_spark.queries import analytics as _an
from ominimo_dynamic_data_pipeline_spark.queries import extensions as _ext
from ominimo_dynamic_data_pipeline_spark.queries import llm as _llm
from ominimo_dynamic_data_pipeline_spark.queries import windows_batch as _wb

_merge(_llm)
_merge(_wb)
_merge(_ext)
_merge(_an)

__all__ = ["QUERIES", "ORACLES", "load_tables"]
