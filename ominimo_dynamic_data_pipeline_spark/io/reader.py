"""Sources.

Reference behavior being re-expressed (not copied):
  * JSON-lines source with full schema inference
    (``/root/reference/src/reader.py:10-28``).
  * CSV source with ``header=true, inferSchema=true, sep=',', quote='"',
    escape='"', multiLine=false, encoding=UTF-8``
    (``/root/reference/src/reader.py:29-40``).
  * Driver-side glob expansion joined into a comma string and injected into
    the first source only (``/root/reference/main.py:26-39,116-117``) — a
    quirk we fix: Spark readers natively take globs and *lists* of paths,
    so ``path`` may be a str (glob ok) or list[str].

Improvements for scale:
  * ``schema`` may be declared in metadata (DDL string) which removes the
    extra inference scan the reference pays on every CSV read
    (SURVEY.md §4.2 inefficiency 2).
  * parquet is first-class (columnar, splittable, predicate-pushdown-able —
    the 100 TB format).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession

_CSV_DEFAULTS = {
    "header": "true",
    "sep": ",",
    "quote": '"',
    "escape": '"',
    "multiLine": "false",
    "encoding": "UTF-8",
}


def read_source(spark: SparkSession, source: Mapping[str, Any]) -> DataFrame:
    """Read one source spec ``{name, path, format, schema?, options?}``.

    ``format`` is case-insensitive: JSON (json-lines), CSV, PARQUET.
    ``path`` may be a string (globs allowed) or a list of paths.
    """
    fmt = str(source.get("format", "parquet")).strip().lower()
    path = source["path"]
    paths = path if isinstance(path, list) else [path]
    schema = source.get("schema")  # DDL string, optional
    options = dict(source.get("options") or {})

    if fmt == "json":
        reader = spark.read.options(**options)
        if schema:
            reader = reader.schema(schema)
        return reader.json(paths)
    if fmt == "csv":
        opts = dict(_CSV_DEFAULTS)
        opts.update(options)
        reader = spark.read.options(**opts)
        if schema:
            reader = reader.schema(schema)
        else:
            # Without a declared schema, fall back to inference (reference
            # behavior) — costs an extra scan; declare schemas at scale.
            reader = reader.option("inferSchema", "true")
        return reader.csv(paths)
    if fmt == "parquet":
        reader = spark.read.options(**options)
        if schema:
            reader = reader.schema(schema)
        return reader.parquet(*paths)
    if fmt == "orc":
        reader = spark.read.options(**options)
        if schema:
            reader = reader.schema(schema)
        return reader.orc(*paths)
    if fmt == "text":
        # One row per line (column ``value``); wholetext=true via options
        # reads one row per file — raw-corpus ingestion for the text ops.
        reader = spark.read.options(**options)
        return reader.text(paths)
    if fmt == "xml":
        # Native XML source (Spark >= 4.0): one row per ``rowTag`` element,
        # schema inferred unless declared.  rowTag defaults to "row" here so
        # metadata stays minimal; nested elements land as structs/arrays and
        # flow straight into normalize_fields' recursive flattening.
        opts = {"rowTag": "row", **options}
        reader = spark.read.format("xml").options(**opts)
        if schema:
            reader = reader.schema(schema)
        return reader.load(paths)
    if fmt == "binaryfile":
        # Multimodal ingestion: (path, modificationTime, length, content)
        # rows; narrow with options.pathGlobFilter (e.g. "*.jpg").
        return spark.read.format("binaryFile").options(**options).load(paths)
    raise ValueError(f"Unsupported source format: {source.get('format')!r}")


def read_sources(
    spark: SparkSession, dataflow: Mapping[str, Any]
) -> dict[str, DataFrame]:
    """Read every source of a dataflow into the named-frames environment."""
    frames: dict[str, DataFrame] = {}
    for source in dataflow.get("sources", []):
        frames[source["name"]] = read_source(spark, source)
    return frames
