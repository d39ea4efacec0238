"""Container-speed calibration: a fixed, deterministic CPU workload
timed single-thread and all-threads, printed as one JSON line.

Why: this container shows sustained 1.5-2x speed drift between
sitting windows (NOTES.md, BASELINE.md) — gate sweeps taken hours
apart are not comparable in absolute seconds, and even same-sitting
Spark/DuckDB ratios shift when drift hits the two engines' thread
profiles differently. Running this immediately before/after a
perf_probe sweep stamps the window: the st_ms / mt_ms numbers are
pure CPU (no JVM, no disk), so the sweep's absolute totals can be
discounted when the stamp says the window was degraded.

Reading the stamp (matches BASELINE.md's drift protocol): degradation
keys on **mt32_ms** — observed drift lands almost entirely on the
all-threads side, which is exactly where Spark's 32 threads pay and
single-connection-per-query DuckDB pays less. st_ms is the secondary
sanity check that the probe itself ran normally.

BLAS pinning: thread-pool env vars are forced to 1 BEFORE numpy
loads, so _single_thread is truly one thread and _multi_thread is 32
Python threads each running single-threaded BLAS — without this the
readings measure the ambient OpenBLAS/OMP pool configuration, not
container speed (measured: unpinned mt32 read 1530-2333 ms of pool
oversubscription where the pinned workload reads ~570-610 ms).
Import-order contract: keep the environ lines above `import numpy`.

Usage: python scripts/cpu_calib.py [--mini]
Reference window (round 7, third sitting, pinned-BLAS): st ~270-300
ms, mt32 ~570-610 ms healthy. Degraded-window thresholds under
pinning are still being learned — treat mt32 sustained >= 1.5x the
reference as a degraded stamp and record the reading beside any
sweep it stamps.

--mini: st single-rep, mt32 still best-of-3 (~2.5 s healthy vs
~2.7 s full) for the in-bench calib_track stamps that fire every ~25
timed executions. Two r11 calibration measurements shaped this:
(a) the r10 degradation mode was mt-only — BENCH_r10 calib_mid read
st 296 ms (healthy) beside mt32 1521 ms (2.6x degraded) — so the
st-only mini first sketched in the r10 verdict is blind to exactly
the drift being tracked; (b) short mt probes bias high one-sidedly
(same borderline window: best-of-3 620-820 ms, min-of-2 906-1745,
min-of-1 715-1416), enough to flap any threshold keyed to the
best-of-3 bands, so the classification axis keeps its 3 reps and the
saving comes only from the st side. mt32 in a mini stamp is
therefore directly comparable to the full before/mid/after stamps;
treat mini st as a sanity axis only.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

for _v in (
    "OMP_NUM_THREADS",
    "OPENBLAS_NUM_THREADS",
    "MKL_NUM_THREADS",
    "BLIS_NUM_THREADS",
    "NUMEXPR_NUM_THREADS",
):
    os.environ[_v] = "1"

import numpy as np  # noqa: E402  (after the thread pinning above)


def _single_thread() -> float:
    """Pure-python + small-numpy mix, one thread; ~270-300 ms in the
    round-7 pinned-BLAS reference window (best of 3) — same window the
    module docstring quotes. (An earlier pre-pinning draft read
    ~230-250 ms because the ambient pool parallelized the numpy part.)
    """
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
    """n concurrent single-threaded-BLAS matmul chains; ~570-610 ms in
    the round-7 pinned-BLAS reference window (best of 3) — same window
    the module docstring quotes. (The ~1.5-2.3 s readings in round-7
    NOTES were the pre-pinning draft measuring pool oversubscription,
    not container speed.)"""
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


def main(mini: bool = False) -> None:
    n_st = 1 if mini else 3
    st = min(_single_thread() for _ in range(n_st))
    mt = min(_multi_thread() for _ in range(3))  # see --mini note (b)
    rec = {
        "metric": "cpu_calibration",
        "st_ms": round(st * 1000, 1),
        "mt32_ms": round(mt * 1000, 1),
        "unit": f"ms (st best of {n_st}, mt32 best of 3; "
                "lower = faster container window)",
    }
    if mini:
        rec["mini"] = True
    print(json.dumps(rec))


if __name__ == "__main__":
    import sys

    main(mini="--mini" in sys.argv[1:])
