from ominimo_dynamic_data_pipeline_spark.io.reader import read_source, read_sources
from ominimo_dynamic_data_pipeline_spark.io.writer import write_sink, write_sinks

__all__ = ["read_source", "read_sources", "write_sink", "write_sinks"]
