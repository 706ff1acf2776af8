"""Schema normalization: coalesce-projection + automatic struct flattening.

Re-expresses ``normalize_fields`` (``/root/reference/src/transformations.py:131-222``
plus helpers ``:21-128``) with identical observable behavior:

  * Each declared target field becomes ``coalesce(src1, src2, ...)`` over a
    priority list of source paths (flat or dotted-nested).  Sources missing
    from the schema are pruned at plan-build time ("dynamic schema
    tolerance"); a target with no surviving source is skipped entirely.
  * Every leaf under any struct column is auto-discovered; matching nested
    paths are appended to explicitly-declared targets whose name equals the
    flattened leaf name, and undeclared leaves auto-generate
    ``flattened <- [nested.path, flat_variant]`` mappings.
  * Naming conventions for flattening: ``snake_case`` (default),
    ``keep_dot``, ``camelCase``; anything else raises.

Implementation differs from the reference: all targets are computed in ONE
``withColumns`` projection (one Catalyst node) rather than an iterative
``withColumn`` chain — same result, flatter plan.  Pure metadata-driven
plan construction; no actions, no UDFs, shuffle-free at any scale.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

NAMING_CONVENTIONS = ("snake_case", "keep_dot", "camelCase")


def flatten_name(path: str, convention: str) -> str:
    """Flatten a dotted path per the naming convention."""
    if convention == "keep_dot":
        return path
    if convention == "snake_case":
        return path.replace(".", "_")
    if convention == "camelCase":
        head, *rest = path.split(".")
        return head + "".join(p[:1].upper() + p[1:] for p in rest if p)
    raise ValueError(
        f"Unsupported naming convention: {convention!r}. "
        f"Supported values: {', '.join(map(repr, NAMING_CONVENTIONS))}"
    )


def path_exists(schema: StructType, path: str) -> bool:
    """True if a (possibly dotted) path resolves through the schema."""
    node: Any = schema
    parts = path.split(".")
    for i, part in enumerate(parts):
        if not isinstance(node, StructType):
            return False
        match = next((f for f in node.fields if f.name == part), None)
        if match is None:
            return False
        node = match.dataType
    return True


def struct_leaf_paths(schema: StructType) -> list[str]:
    """Every non-struct leaf path that lives UNDER a struct column.

    Top-level scalar columns are not included (they need no flattening).
    """
    leaves: list[str] = []

    def walk(node: StructType, prefix: str) -> None:
        for field in node.fields:
            path = f"{prefix}.{field.name}" if prefix else field.name
            if isinstance(field.dataType, StructType):
                walk(field.dataType, path)
            elif prefix:
                leaves.append(path)

    walk(schema, "")
    return leaves


def resolve_field_mappings(
    schema: StructType,
    fields: Sequence[Mapping[str, Any]],
    naming_convention: str = "snake_case",
) -> list[tuple[str, list[str]]]:
    """Compute the final (target, source-paths) list: declared fields enhanced
    with matching discovered nested paths, then auto-generated mappings for
    undeclared leaves.  Pure function of the schema — unit-testable without
    Spark."""
    declared = {f["name"] for f in fields}
    leaves = struct_leaf_paths(schema)

    by_flat: dict[str, list[str]] = {}
    for path in leaves:
        by_flat.setdefault(flatten_name(path, naming_convention), []).append(path)

    mappings: list[tuple[str, list[str]]] = []
    for f in fields:
        sources = list(f.get("sources", []))
        for path in by_flat.get(f["name"], []):
            if path not in sources:
                sources.append(path)
        mappings.append((f["name"], sources))

    for path in leaves:
        flat = flatten_name(path, naming_convention)
        if flat in declared:
            continue
        sources = [path]
        flat_variant = path.replace(".", "_")
        if flat_variant != path:
            sources.append(flat_variant)
        mappings.append((flat, sources))

    return mappings


def normalize_fields(
    df: DataFrame,
    fields: Sequence[Mapping[str, Any]],
    naming_convention: str = "snake_case",
) -> DataFrame:
    """Apply the resolved coalesce mappings in a single projection.

    NO-CHAINING CONTRACT: every source resolves against the ORIGINAL input
    schema.  A sequential withColumn chain (the reference's shape) would
    let a later mapping read an earlier mapping's freshly-computed target;
    this single-projection form cannot, so metadata that tries to chain is
    rejected loudly instead of silently diverging.  To chain, declare two
    consecutive normalize steps in the dataflow."""
    exprs: dict[str, Column] = {}
    seen_targets: set[str] = set()
    for target, sources in resolve_field_mappings(
        df.schema, fields, naming_convention
    ):
        chained = [s for s in sources if s in seen_targets]
        if chained:
            raise ValueError(
                f"normalize_fields does not chain mappings: source(s) "
                f"{chained} of target '{target}' name earlier targets, but "
                "all sources resolve against the original input schema. "
                "Split the dataflow into two normalize steps to chain."
            )
        seen_targets.add(target)
        live = [s for s in sources if path_exists(df.schema, s)]
        if not live:
            continue  # dynamic schema tolerance: skip fully-missing targets
        cols = [F.col(p) for p in live]
        exprs[target] = F.coalesce(*cols) if len(cols) > 1 else cols[0]
    if not exprs:
        return df
    return df.withColumns(exprs)
