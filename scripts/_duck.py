"""One place that knows how to open the DuckDB oracle connection used
in a process that ALSO hosts a live Spark JVM (perf_probe, floor_probe,
check_correctness, verify_drive).

Thread headroom rationale (round-10 root cause of the historical
oracle bimodality): DuckDB at threads == all cores convoys on its
pipeline barriers whenever any co-resident JVM background thread
wakes — measured 27-253 s on the lsh_jaccard_near_dup oracle at
sf0.1 vs 7-14 s standalone (zero spill bytes either way); leaving a
few cores of headroom (24 and 28 both measured on the 32-core box)
restores standalone parity. This is the fair setting: while the
oracle runs, Spark is idle, and a dormant DuckDB connection costs
Spark nothing in the reverse direction, so Spark keeps local[32].
scripts/oracle_bench.py (no JVM in-process) intentionally keeps all
cores and does NOT use this helper.
"""

from __future__ import annotations

import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def oracle_threads() -> int:
    return max(1, (os.cpu_count() or 8) - 4)


def oracle_connect(sf_dir: str, tables=tuple(TABLES)) -> duckdb.DuckDBPyConnection:
    """A fresh connection with JVM-headroom threads and the standard
    table views registered over `sf_dir`'s parquet files."""
    con = duckdb.connect()
    con.execute(f"SET threads TO {oracle_threads()}")
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con
