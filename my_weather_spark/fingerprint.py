"""Order-insensitive result fingerprints for regression pinning.

Six registry queries have no portable SQL twin (RDP simplification,
IVF/SRP approximate retrieval, HLL sketches, raw-typed end extension,
the transactional streaming ingest), so the driver's oracle check
records only a row count for them. They are still DETERMINISTIC per
engine build: this module hashes a canonical form of the result so a
pinned fixture catches silent drift the same way oracle hashes do for
the other 126 queries (tests/test_rows_only_pins.py).

The canonical form mirrors the driver-style comparison in
scripts/check_correctness.py: columns sorted by name, every cell
rendered with the same float/timestamp conventions, rows sorted — so
the fingerprint is independent of partitioning, task order, and
column order, and sensitive to any value change.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame


def canon_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if math.isinf(v):
            # guard BEFORE int(v): int(inf) raises OverflowError.
            # Spark's non-ANSI double math can emit infinities (x/0.0)
            return "Infinity" if v > 0 else "-Infinity"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return str(v)


def result_fingerprint(df: DataFrame) -> str:
    """Hex SHA-256 of the canonicalized result (collects — intended
    for test/CI-scale frames, not production data)."""
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(canon_cell(r[i]) for i in order) for r in df.collect()]
    rows.sort()
    h = hashlib.sha256()
    h.update(("|".join(c.lower() for c in sorted(cols)) + "\n").encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\n").encode())
    return h.hexdigest()
