"""Metadata document loading + validation.

The reference loads the JSON verbatim with no validation of the metadata
itself (``/root/reference/src/metadata_loader.py:10-24``); a typo'd key
surfaces as a KeyError deep inside the interpreter.  We validate shape at
load time so errors carry the dataflow/step that caused them.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Mapping


class MetadataError(ValueError):
    pass


def load_metadata(path: str | Path) -> dict[str, Any]:
    p = Path(path)
    if not p.exists():
        raise FileNotFoundError(f"Metadata file not found: {p}")
    with p.open("r", encoding="utf-8") as fh:
        doc = json.load(fh)
    validate_metadata(doc)
    return doc


def validate_metadata(doc: Mapping[str, Any]) -> None:
    flows = doc.get("dataflows")
    if not isinstance(flows, list) or not flows:
        raise MetadataError("metadata must contain a non-empty 'dataflows' list")
    seen: set[str] = set()
    for i, flow in enumerate(flows):
        name = flow.get("name")
        if not name or not isinstance(name, str):
            raise MetadataError(f"dataflows[{i}] missing 'name'")
        if name in seen:
            raise MetadataError(f"duplicate dataflow name {name!r}")
        seen.add(name)
        for j, src in enumerate(flow.get("sources", []) or []):
            for key in ("name", "path"):
                if key not in src:
                    raise MetadataError(f"{name}: sources[{j}] missing {key!r}")
        for j, step in enumerate(flow.get("transformations", []) or []):
            if "type" not in step:
                raise MetadataError(f"{name}: transformations[{j}] missing 'type'")
            if "name" not in step:
                raise MetadataError(f"{name}: transformations[{j}] missing 'name'")
        for j, sink in enumerate(flow.get("sinks", []) or []):
            if "input" not in sink:
                raise MetadataError(f"{name}: sinks[{j}] missing 'input'")
            if "paths" not in sink and "path" not in sink:
                raise MetadataError(f"{name}: sinks[{j}] missing 'paths'")


def select_dataflow(doc: Mapping[str, Any], name: str | None) -> Mapping[str, Any]:
    """Pick a dataflow by name, or default to the first (reference contract,
    ``main.py:101-109``)."""
    flows = doc["dataflows"]
    if name is None:
        return flows[0]
    for flow in flows:
        if flow["name"] == name:
            return flow
    raise MetadataError(
        f"Dataflow {name!r} not found; available: {[f['name'] for f in flows]}"
    )
