from ominimo_dynamic_data_pipeline_spark.operators.registry import (
    OPERATORS,
    apply_transformations,
    register_operator,
)

__all__ = ["OPERATORS", "apply_transformations", "register_operator"]
