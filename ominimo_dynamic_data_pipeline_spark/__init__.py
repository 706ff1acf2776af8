"""ominimo_dynamic_data_pipeline_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference metadata-driven ETL/validation pipeline
(darkmuha/ominimo-dynamic-data-pipeline), extended with large-scale
LLM-training-data operators (dedup, similarity search, text analysis,
multimodal columns) and Structured Streaming parity.

Design principles (SURVEY.md §7):
  * DataFrame/SQL only — plans are declared, Catalyst optimizes.
  * Compile is pure: config -> dict[str, DataFrame] of *lazy* plans;
    actions (counts, stats, writes) happen only in an explicit run phase.
  * UDFs are the escape hatch, not the default; when needed they are
    Arrow-batched pandas UDFs.
  * Every operator is designed for a 1000-executor / 100 TB posture:
    broadcast small dims, partial aggregation, AQE, partitioned sinks.
"""

from ominimo_dynamic_data_pipeline_spark.session import get_spark, stop_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "stop_spark", "__version__"]
