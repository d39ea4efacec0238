"""Time every oracle_sql() twin in DuckDB at a given sf dir — the
apples-to-apples denominator for bench.py's Spark totals, measured in
the SAME container (cross-container absolute times are not comparable;
see NOTES.md bench-noise note).

Usage: python scripts/oracle_bench.py [sf_dir] [--include-cc]

`near_dup_components` is excluded by default: its oracle is a
recursive-CTE label propagation that DuckDB grinds for >12 minutes at
sf0.1 (it exists to verify the Spark star-CC at the sf0.01 driver
scale, where it runs in seconds). --include-cc runs it anyway.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    include_cc = "--include-cc" in sys.argv
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count() or 8}")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    oracles = entrymod.oracle_sql()
    total = 0.0
    n = 0
    times: dict[str, float] = {}
    for name, sql in oracles.items():
        if name == "near_dup_components" and not include_cc:
            print("    SKIP  near_dup_components (recursive CTE; --include-cc to run)")
            continue
        t0 = time.time()
        con.execute(sql).fetchall()
        dt = time.time() - t0
        times[name] = dt
        total += dt
        n += 1
        print("%8.2f  %s" % (dt, name), flush=True)
    print("\nslowest:")
    for k, v in sorted(times.items(), key=lambda kv: -kv[1])[:8]:
        print("  %6.2f  %s" % (v, k))
    print("\nTOTAL %.1f s over %d oracles at %s" % (total, n, sf_dir))


if __name__ == "__main__":
    main()
