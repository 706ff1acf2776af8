from ominimo_dynamic_data_pipeline_spark.queries.catalog import (
    ORACLES,
    QUERIES,
    load_tables,
)

__all__ = ["ORACLES", "QUERIES", "load_tables"]
