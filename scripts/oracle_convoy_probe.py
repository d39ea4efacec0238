"""Standalone-vs-cosparked DuckDB oracle probe — the r10 method that
root-caused the lsh_jaccard_near_dup oracle bimodality (DuckDB at
threads == all cores convoys on pipeline barriers whenever a
co-resident idle Spark JVM's background threads wake), generalized to
any named oracle so the same question can be answered for other
swinging denominators (r10 VERDICT item 4: mm_wav_audio_stats).

One invocation measures ONE topology: a fresh DuckDB connection per
rep at --threads, optionally with an idle Spark JVM first started in
this process (--cospark — exactly perf_probe's topology). Run it
several ways and compare:

    python scripts/oracle_convoy_probe.py mm_wav_audio_stats --reps 5
    python scripts/oracle_convoy_probe.py mm_wav_audio_stats --reps 5 --cospark
    python scripts/oracle_convoy_probe.py mm_wav_audio_stats --reps 5 --cospark --threads 28

Per rep it records wall seconds and the /proc/self/io read/write
deltas (the spill/IO axis: the lsh probe showed zero spill bytes in
both stable and convoying runs, pinning the cause on scheduling, not
memory). Prints one JSON line. Timed probe: machine otherwise idle,
cpu_calib stamps beside it in NOTES.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _io() -> dict[str, int]:
    out: dict[str, int] = {}
    try:
        with open("/proc/self/io") as fh:
            for line in fh:
                k, _, v = line.partition(":")
                out[k.strip()] = int(v)
    except OSError:
        pass
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--threads", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--cospark", action="store_true",
                    help="start an idle Spark JVM in this process first")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()[args.name]
    if args.cospark:
        from my_weather_spark.session import get_spark

        get_spark(app_name="convoy_probe_idle_jvm",
                  extra_conf={"spark.ui.showConsoleProgress": "false"})

    times: list[float] = []
    io_deltas: list[dict[str, float]] = []
    for _ in range(args.reps):
        con = duckdb.connect()
        con.execute(f"SET threads TO {args.threads}")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
            )
        io0 = _io()
        t0 = time.perf_counter()
        con.execute(sql).fetchall()
        times.append(round(time.perf_counter() - t0, 2))
        io1 = _io()
        io_deltas.append({
            k: round((io1.get(k, 0) - io0.get(k, 0)) / 1e6, 1)
            for k in ("read_bytes", "write_bytes")
        })
        con.close()
    print(json.dumps({
        "metric": "oracle_convoy_probe",
        "name": args.name,
        "sf": args.sf,
        "threads": args.threads,
        "cospark": args.cospark,
        "reps_sec": times,
        "min_sec": min(times),
        "max_sec": max(times),
        "io_mb_deltas": io_deltas,
    }))


if __name__ == "__main__":
    main()
