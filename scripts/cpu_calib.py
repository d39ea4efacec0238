"""Container-speed calibration: a fixed, deterministic CPU workload
timed single-thread and all-threads, printed as one JSON line.

Why: this container shows sustained 1.5-2x speed drift between
sitting windows (NOTES.md, BASELINE.md) — gate sweeps taken hours
apart are not comparable in absolute seconds, and even same-sitting
Spark/DuckDB ratios shift when drift hits the two engines' thread
profiles differently. Running this immediately before/after a
perf_probe sweep stamps the window: the st_ms / mt_ms numbers are
pure CPU (no JVM, no disk), so a sweep recorded at st_ms ~2x the
reference window's is known-slow and its absolute totals should not
be compared across sittings.

Usage: python scripts/cpu_calib.py
Reference window (round 7, third sitting, recorded in NOTES.md):
see the sweep log entry that cites this script.
"""

from __future__ import annotations

import json
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def _single_thread() -> float:
    """Pure-python + small-numpy mix, one thread, ~1-2 s nominal."""
    t0 = time.perf_counter()
    acc = 0
    for i in range(2_000_000):
        acc = (acc * 1315423911 + i) & 0xFFFFFFFFFFFF
    rng = np.random.default_rng(42)
    a = rng.standard_normal((256, 256))
    for _ in range(60):
        a = np.tanh(a @ a.T / 256.0)
    return time.perf_counter() - t0


def _multi_thread(n: int = 32) -> float:
    """n concurrent numpy matmuls (releases the GIL), ~1 s nominal."""
    rng = np.random.default_rng(7)
    mats = [rng.standard_normal((384, 384)) for _ in range(n)]

    def work(m: np.ndarray) -> float:
        x = m
        for _ in range(40):
            x = np.tanh(x @ m / 384.0)
        return float(x[0, 0])

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=n) as ex:
        list(ex.map(work, mats))
    return time.perf_counter() - t0


def main() -> None:
    st = min(_single_thread() for _ in range(3))
    mt = min(_multi_thread() for _ in range(3))
    print(json.dumps({
        "metric": "cpu_calibration",
        "st_ms": round(st * 1000, 1),
        "mt32_ms": round(mt * 1000, 1),
        "unit": "ms (best of 3, lower = faster container window)",
    }))


if __name__ == "__main__":
    main()
