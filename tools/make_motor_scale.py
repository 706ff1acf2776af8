"""Deterministic upscaler for the reference's 10-row motor-policies sample.

Replicates the golden rows (every normalization/validation behavior the
reference exercises — nested structs, stringified ages, missing fields,
rule violations) N times with unique policy numbers, preserving the
10-row behavior mix, so the reference engine and ours can be timed
head-to-head on identical REALISTIC data at a scale where engine cost
dominates JVM startup.

Usage: python tools/make_motor_scale.py N OUT.json   (N = total rows)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

GOLDEN = Path("/root/reference/Data/motor_policies.json")


def main() -> int:
    n = int(sys.argv[1])
    out = Path(sys.argv[2])
    rows = [json.loads(line) for line in GOLDEN.read_text().splitlines()]
    out.parent.mkdir(parents=True, exist_ok=True)
    with out.open("w") as fh:
        for i in range(n):
            row = dict(rows[i % len(rows)])
            # unique policy number, stable behavior mix
            base = row.get("policy_number", "P-0")
            row["policy_number"] = f"{base}-{i // len(rows)}"
            fh.write(json.dumps(row) + "\n")
    print(f"{n} rows -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
