"""Compute the result fingerprints pinned in
tests/test_rows_only_pins.py (VERDICT r7 item 5).

Run twice in separate processes before pinning — identical output
across runs is the determinism check; any query whose fingerprint
moves between runs must NOT be pinned (and its nondeterminism is a
finding in itself).

Usage: python scripts/pin_rows_only.py [--queries a,b] [sf_dir ...]
Prints one JSON line per (query, sf). --queries restricts to a
comma-separated subset (e.g. the sf0.1 stream_ingest_accepted pin,
where running all six at that scale buys nothing).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from my_weather_spark.fingerprint import result_fingerprint
from my_weather_spark.session import get_spark

QUERIES = [
    "w4_rdp_downsample",
    "w2_end_extension_raw",
    "approx_distinct_users",
    "srp_cosine_near_dup",
    "ann_ivf_topk",
    "stream_ingest_accepted",
]


def main() -> None:
    argv = sys.argv[1:]
    queries = QUERIES
    if "--queries" in argv:  # accept the flag in any position
        i = argv.index("--queries")
        if i + 1 >= len(argv):
            raise SystemExit("usage: pin_rows_only.py [--queries a,b] [sf_dir ...]")
        wanted = argv[i + 1].split(",")
        unknown = set(wanted) - set(QUERIES)
        if unknown:
            raise SystemExit(f"not rows-only queries: {sorted(unknown)}")
        queries = wanted
        argv = argv[:i] + argv[i + 2:]
    sf_dirs = argv or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    spark = get_spark(
        app_name="pin_rows_only",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entrymod.queries()
    for sf_dir in sf_dirs:
        for name in queries:
            df = qs[name](spark, sf_dir)
            fp = result_fingerprint(df)
            print(
                json.dumps(
                    {"query": name, "sf": os.path.basename(sf_dir), "fp": fp}
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
