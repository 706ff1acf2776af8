"""Pure-Python readers for Spark's serialized sketch payloads.

Spark's ``count_min_sketch`` SQL aggregate returns the sketch as binary,
but ships no SQL-side point query — the only readback Spark itself offers
is the JVM ``org.apache.spark.util.sketch.CountMinSketch`` class, which is
unreachable under Spark Connect (no Py4J ``_jvm`` bridge).  This module
decodes the serialized bytes directly, replicating the PUBLIC format and
hash documented in Apache Spark's ``CountMinSketchImpl``
(``common/sketch/src/main/java/org/apache/spark/util/sketch/``):

- ``writeTo``: DataOutputStream big-endian — int version (1), long
  totalCount, int depth, int width, ``depth`` longs of ``hashA``, then the
  ``depth x width`` long count table, row-major.
- long-item hash (the ``addLong``/``estimateCount`` path Spark's SQL
  aggregate uses for integral columns): ``h = hashA[i] * item`` in
  wrapping 64-bit arithmetic, ``h += h >> 32`` (arithmetic shift),
  ``h &= (1 << 31) - 1``, bucket ``h % width``.

Everything here is driver-side math over a KB-sized payload — no Spark
session, no JVM, no Connect/classic divergence.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_PRIME_MODULUS = (1 << 31) - 1
_U64 = 1 << 64
_I64_SIGN = 1 << 63


def _to_i64(x: int) -> int:
    """Wrap an arbitrary-precision int to Java signed-64 semantics."""
    return ((x + _I64_SIGN) % _U64) - _I64_SIGN


@dataclass(frozen=True)
class CountMinSketch:
    """Decoded Spark CountMinSketch (long-item flavor).

    ``estimate(item)`` mirrors ``estimateCountForLongItem``: the minimum
    over rows of the counter each row hashes the item to.  Only integral
    items are supported — that is the path Spark's ``count_min_sketch``
    aggregate takes for integral columns (strings/binary hash through
    Murmur3 on UTF-8 bytes instead; add that flavor if a catalog query
    ever sketches a string column).
    """

    total_count: int
    depth: int
    width: int
    hash_a: tuple[int, ...]
    table: tuple[tuple[int, ...], ...]

    @classmethod
    def from_bytes(cls, payload: bytes) -> "CountMinSketch":
        if len(payload) < 20:
            raise ValueError(
                f"count-min payload too short ({len(payload)} bytes)"
            )
        version, total, depth, width = struct.unpack_from(">iqii", payload, 0)
        if version != 1:
            raise ValueError(
                f"unsupported CountMinSketch serialization version {version}"
            )
        if depth <= 0 or width <= 0:
            raise ValueError(f"corrupt sketch dims depth={depth} width={width}")
        need = 20 + 8 * depth + 8 * depth * width
        if len(payload) != need:
            raise ValueError(
                f"count-min payload is {len(payload)} bytes, expected {need} "
                f"for depth={depth} width={width}"
            )
        off = 20
        hash_a = struct.unpack_from(f">{depth}q", payload, off)
        off += 8 * depth
        rows = []
        for _ in range(depth):
            rows.append(struct.unpack_from(f">{width}q", payload, off))
            off += 8 * width
        return cls(total, depth, width, hash_a, tuple(rows))

    def _bucket(self, item: int, row: int) -> int:
        h = _to_i64(self.hash_a[row] * item)
        h = _to_i64(h + (h >> 32))
        h &= _PRIME_MODULUS
        return h % self.width

    def estimate(self, item: int) -> int:
        item = int(item)
        return min(
            self.table[i][self._bucket(item, i)] for i in range(self.depth)
        )
