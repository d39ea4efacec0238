"""Floor-vs-work decomposition for the honest-shuffle quartet
(VERDICT r7 item 2): split_leakage_stats, dup_span_stats,
decontam_flags, dsir_selected.

Each query's sf0.1 wall time is modeled as

    t(s) = floor + work * s

where ``floor`` is the data-independent per-query cost (stage
scheduling, task launch, plan/codegen, broadcast setup — the ~125 x
per-query stage-floor story BASELINE.md documents) and ``work`` is the
data-proportional part. Two measurements pin both terms: the natural
sf0.1 corpus (s=1) and a 4x self-union with re-keyed doc_ids (s=4):

    floor = (4*t1 - t4) / 3        work_at_1x = (t4 - t1) / 3

A floor share >= the query's excess over the 2x gate means the ratio
is stage-floor-dominated at toy scale (the oracle pays one process-
local pipeline; Spark pays per-stage scheduling that amortizes at real
data sizes) — sanctionable with these numbers. A low floor share means
the plan does real excess work and needs a fix, not a sanction.

Alongside the decomposition the probe records, per query:
- jobs/stages/tasks actually run at 1x (statusTracker via job group);
- Exchange operators in the final adaptive plan;
- same-sitting DuckDB oracle best-of-N and the resulting ratio;
- scripts/cpu_calib.py stamps belong NEXT TO this probe's output in
  NOTES (run it separately; it restarts BLAS pools).

Usage: python scripts/floor_probe.py [name ...] [--reps N]
Prints one JSON line per query plus a summary table.
"""

from __future__ import annotations

import gc
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from _duck import oracle_connect
from my_weather_spark.session import get_spark
from my_weather_spark.tables import load_table

# abspath: the per-table symlinks below resolve RELATIVE TO THE LINK'S
# DIRECTORY (the tmp scaled dir), so a relative SF_DIR would dangle
SF_DIR = os.path.abspath(
    os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
)
QUARTET = ["split_leakage_stats", "dup_span_stats", "decontam_flags", "dsir_selected"]
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SCALE = 4
REKEY_OFFSET = 100_000_000  # keeps 4x doc_ids distinct and positive


def build_scaled_dir(spark, perturb: bool = False) -> str:
    """A synthetic sf dir whose documents table is a SCALE-x union of
    sf0.1 documents with re-keyed doc_ids; every other table is the
    sf0.1 file untouched (the quartet only reads documents).

    ``perturb`` suffixes every WORD of copy i>0 with a copy marker, so
    content-hash queries (span/gram collisions) see 4x distinct
    content with the per-copy duplication structure preserved — the
    plain self-union is instead a maximal-duplication corpus (every
    span recurs SCALE times), which shifts data characteristics, not
    just volume, for frequency-filtered plans like dup_span_stats."""
    root = tempfile.mkdtemp(prefix="mws_floor_")
    from pyspark.sql import functions as F

    # (table, [re-keyed columns]) — fact tables scale SCALE-x with
    # join keys offset in lockstep so every FK still resolves
    # (l_orderkey matches its copy's o_orderkey; o_custkey stays
    # within the unscaled customer dim, preserving join fan-in per
    # customer — dims are the broadcast side and stay fixed, which is
    # exactly how a 100 TB TPC-H grows).
    scaled_cols = {
        "documents": ["doc_id"],
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey"],
        "events": ["event_id"],
    }
    for t in TABLES:
        if t in scaled_cols:
            continue
        os.symlink(f"{SF_DIR}/{t}.parquet", f"{root}/{t}.parquet")
    for t, keys in scaled_cols.items():
        base = load_table(spark, SF_DIR, t)
        parts = []
        for i in range(SCALE):
            p = base
            for k in keys:
                p = p.withColumn(k, F.col(k) + F.lit(i * REKEY_OFFSET))
            if perturb and i > 0 and t == "documents":
                p = p.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", "$1q%d" % i)
                )
            parts.append(p)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(f"{root}/{t}.parquet")
    return root


def timed(fn, reps: int, spark) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
    return best


def job_stats(spark, group: str) -> dict:
    st = spark.sparkContext.statusTracker()
    jobs = st.getJobIdsForGroup(group)
    stages, tasks = 0, 0
    for j in jobs:
        info = st.getJobInfo(j)
        if info is None:
            continue
        for sid in info.stageIds:
            si = st.getStageInfo(sid)
            if si is not None and si.numTasks > 0:
                stages += 1
                tasks += si.numTasks
    return {"jobs": len(jobs), "stages": stages, "tasks": tasks}


def initial_exchange_count(df) -> int:
    """Exchange operators in the query's initial (pre-AQE) physical
    plan — an UPPER BOUND, not what ran: the instrumented noop write
    runs its own QueryExecution, so ``df``'s executedPlan() here
    belongs to a never-executed sibling plan whose AQE rewrites
    (broadcast conversions, coalesced exchanges) never happened.
    Renamed from exchange_count (r8 ADVICE — the old name plus the
    executedPlan() call read as the adaptive final plan, which this is
    not). Stage/task counts in job_stats are the executed-run ground
    truth; this field is supplementary."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> None:
    argv = sys.argv[1:]
    reps = 3
    perturb = False
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        elif argv[i] == "--perturb":
            perturb = True
            i += 1
        else:
            names.append(argv[i])
            i += 1
    names = names or QUARTET

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    spark = get_spark(
        app_name="floor_probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    # JVM-headroom oracle connection + standard views (_duck.py —
    # all-cores DuckDB convoys 2-30x when any JVM thread wakes)
    con = oracle_connect(SF_DIR)

    scaled = build_scaled_dir(spark, perturb=perturb)
    try:
        # warmup both scales (JIT/codegen)
        for n in names:
            qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            qs[n](spark, scaled).write.format("noop").mode("overwrite").save()
            if n in oracles:
                con.execute(oracles[n]).fetchall()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

        out = []
        for n in names:
            # instrumented single run at 1x: jobs/stages/tasks + plan
            group = f"floor_{n}"
            spark.sparkContext.setJobGroup(group, n)
            df = qs[n](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobGroup("", "")
            stats = job_stats(spark, group)
            nexch = initial_exchange_count(df)

            t1 = timed(
                lambda: qs[n](spark, SF_DIR)
                .write.format("noop").mode("overwrite").save(),
                reps, spark,
            )
            t4 = timed(
                lambda: qs[n](spark, scaled)
                .write.format("noop").mode("overwrite").save(),
                reps, spark,
            )
            to = float("nan")
            if n in oracles:
                to = timed(lambda: con.execute(oracles[n]).fetchall(), reps, spark)

            work1 = max((t4 - t1) / (SCALE - 1), 0.0)
            floor = max(t1 - work1, 0.0)
            rec = {
                "query": n,
                "sf": os.path.basename(SF_DIR),
                "t_1x": round(t1, 3),
                "t_4x": round(t4, 3),
                "oracle": round(to, 3) if to == to else None,
                "ratio": round(t1 / to, 2) if to == to and to > 0 else None,
                "floor_sec": round(floor, 3),
                "work_sec_1x": round(work1, 3),
                "floor_share": round(floor / t1, 3) if t1 > 0 else None,
                "scale_slope_4x": round(t4 / t1, 2) if t1 > 0 else None,
                **stats,
                "initial_exchanges": nexch,
                "reps": reps,
            }
            out.append(rec)
            print(json.dumps(rec), flush=True)

        print("\n%-24s %6s %6s %7s %7s %6s %6s %6s" % (
            "query", "t1x", "t4x", "floor", "work1x", "ratio",
            "stages", "exch0"))
        for r in out:
            print("%-24s %6.2f %6.2f %7.2f %7.2f %6s %6d %6d" % (
                r["query"], r["t_1x"], r["t_4x"], r["floor_sec"],
                r["work_sec_1x"], r["ratio"], r["stages"], r["initial_exchanges"]))
        print(
            "\nfloor_share >= (1 - 2*oracle/t1x) means the >2x excess is"
            " fully inside the data-independent floor."
        )
    finally:
        shutil.rmtree(scaled, ignore_errors=True)


if __name__ == "__main__":
    main()
