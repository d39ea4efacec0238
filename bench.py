"""Benchmark harness: run the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print the record as JSON lines: the full
per-query map (also written to bench_full.json), then a compact final
line {"metric", "value", "unit", "queries" (slowest-N), "sf", ...}
sized to survive a 2000-char log-tail capture intact

Each query is materialized through the noop sink (full execution, no
driver-side result transfer) so timings measure the distributed plan,
not collect serialization.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod
from my_weather_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def calib_record(mini: bool = False) -> dict | None:
    """The cpu_calib JSON record, from a fresh subprocess (its BLAS
    pinning must precede numpy import there). Shared by bench and
    scripts/perf_probe.py — the ONE place that knows how to invoke and
    parse scripts/cpu_calib.py. Stamps the container window INSIDE the
    artifacts so a degraded-window record is recognizable without
    NOTES archaeology (BASELINE.md drift protocol; absolute seconds in
    this container drift 1.5-3x between sittings on identical code).

    mini=True is the in-run calib_track stamp: st single-rep, mt32
    still best-of-3. The mini keeps the mt32 workload — NOT st-only
    as first sketched — because the r10 degradation mode was mt-only
    (calib_mid st 296 ms healthy beside mt32 1521 ms degraded), and
    keeps mt32's 3 reps because short mt probes bias high enough to
    flap the 900 ms threshold (measured in the same borderline
    window: best-of-3 620-820 ms vs min-of-1 715-1416 ms) — see
    scripts/cpu_calib.py's --mini note.
    """
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable,
             os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "scripts", "cpu_calib.py")]
            + (["--mini"] if mini else []),
            capture_output=True, text=True, timeout=120,
        ).stdout
        for line in out.splitlines():
            if line.startswith("{"):
                return json.loads(line)
    except Exception:
        pass
    return None


def _calib() -> list[float] | None:
    """Compact [st_ms, mt32_ms] projection for the bench JSON lines.
    A cpu_calib output-format drift (missing/renamed keys) degrades
    the stamp to None — the one 'no valid calib' shape readers already
    handle — never crashes the bench at startup (r8 ADVICE)."""
    rec = calib_record()
    if not rec or rec.get("st_ms") is None or rec.get("mt32_ms") is None:
        return None
    return [rec["st_ms"], rec["mt32_ms"]]


# A window stamp is "degraded" when mt32 reads >= this absolute
# threshold. Anchor: the pinned-BLAS healthy band has been stable at
# mt32 ~536-610 ms across rounds 7-10 (BASELINE.md); the observed
# degraded readings are 1142-3776 ms. 900 ms = ~1.5x the healthy
# ceiling, the same multiplier cpu_calib.py's docstring prescribes,
# and sits in the empty gap between the two observed populations.
DEGRADED_MT32_MS = 900.0


def _stamp_degraded(stamp: list[float] | None) -> bool:
    """None (calib unavailable) classifies as NOT degraded: the track
    then simply can't tag that segment, matching the pre-r11 behavior
    of edge-stamps-only artifacts."""
    return stamp is not None and stamp[1] >= DEGRADED_MT32_MS


def track_span_degraded(
    track: list[dict], lo: int, hi: int
) -> bool:
    """True if any calib-track stamp bounding or inside the exec span
    (execs lo+1..hi; lo == hi-1 for a single rep) reads degraded —
    pessimistic: a window that flips between stamps can't be localized
    closer than the stamp spacing. The ONE shared implementation for
    bench reps and perf_probe query spans (an earlier perf_probe copy
    dropped the above-bound whenever the below-bound was absent, i.e.
    for every span before the first mini stamp — exactly the sweep's
    opening block was one-sidedly blind to a degradation first seen at
    stamp #1)."""
    below = max(
        (s for s in track if s["exec"] <= lo),
        key=lambda s: s["exec"],
        default=None,
    )
    above = min(
        (s for s in track if s["exec"] >= hi),
        key=lambda s: s["exec"],
        default=None,
    )
    bounds = [s for s in (below, above) if s is not None]
    inside = [s for s in track if lo < s["exec"] < hi]
    return any(_stamp_degraded(s["stamp"]) for s in bounds + inside)


# Bound the retry block (r11 solo-run lesson): a fully-degraded window
# can flag ~every query, and 100+ single reps in a window that is
# STILL degraded add minutes of wall for zero information (the r11
# retry bracket read [518 -> 1207] — the block itself re-degraded).
RETRY_CAP = 40


def plan_retries(
    degraded_queries: dict[str, list[int]],
    timings: dict[str, float],
    pre_stamp: list[float] | None,
    cap: int = RETRY_CAP,
) -> tuple[list[str], list[str], str]:
    """Decide which degraded-flagged queries get an end-of-run retry
    rep. Returns (retry_order, skipped, skip_reason). Two guards, both
    recorded in the artifact: (a) pre-retry stamp already degraded ->
    skip the whole block (the retries would carry the same inflation
    they exist to correct); (b) otherwise retry at most the `cap`
    slowest flagged queries (the most-watched inflations), listing the
    rest in skipped. Pure function so the guards are unit-testable —
    they first shipped untested and unexecuted (the sf0.001 smoke
    flagged zero queries)."""
    order = sorted(degraded_queries, key=lambda n: -timings[n])
    if _stamp_degraded(pre_stamp):
        return [], order, (
            "pre-retry stamp degraded; retries would carry the "
            "same window inflation"
        )
    if len(order) > cap:
        return order[:cap], order[cap:], f"retry cap {cap}"
    return order, [], ""


def main() -> None:
    # Console progress bars write to stdout and can leave "[Stage ..]"
    # fragments on the same line as the JSON record — the driver parses
    # stdout, so keep it clean.
    calib_before = _calib()  # stamp BEFORE Spark competes for cores
    spark = get_spark(
        app_name="my_weather_spark_bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entrymod.queries()

    # Warm-up (not timed): one full untimed pass over every query —
    # the standard microbenchmark warmup (JMH-style). A partial warmup
    # (3 representative queries) left the heavy Arrow/codegen paths on
    # the C2-compilation slope for their first timed rep: srp at sf0.1
    # runs 12s -> 7.7s -> 5.2s -> 5.0s steady in one session, so
    # min-of-3 after cold start was measuring JIT warmup depth (2-3x
    # run-to-run spread), not the plan. The full pass also absorbs the
    # one-off per-session builds (IVF index, CC labels, stream drains)
    # so timed reps measure the steady-state serving path.
    # The JVM half of the hygiene: ContextCleaner frees shuffle files /
    # broadcast blocks only when the JVM actually GCs, and the default
    # periodic GC (30 min) never fires mid-run — the session ages
    # across ~400 query executions without this. But a FULL GC after
    # EVERY execution measurably slows the next one (~7% per-block in
    # a same-session A/B: the following query re-pays young-gen growth
    # and buffer re-inflation), so fire every 5th timed execution —
    # the exact cadence the A/B measured as indistinguishable from
    # never-GC speed while still bounding the cleaner backlog (only
    # ~1/5 of queries run right after a full GC, diluting the ~7%
    # next-query penalty to ~1.4%, under the noise floor). The tick
    # unit is ONE SPARK EXECUTION — warmup AND timed, since round 9
    # (the r8 crash came precisely from the warmup's ~131 untracked
    # executions; same unit in perf_probe.py — keep them aligned; the
    # backlog grows per execution, not per query name). Always OUTSIDE
    # the timed windows.
    _gc_tick = 0

    def jvm_gc(force: bool = False) -> None:
        nonlocal _gc_tick
        _gc_tick += 1
        if not force and _gc_tick % 5:
            return
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    # Warmup ORDER and HYGIENE (round-8 postmortem — BENCH_r08 was
    # rc=1/parsed=null): the two real-streaming queries each run a
    # one-off drain with a hard awaitTermination timeout, and
    # stream_ingest_accepted sat LAST in registry order, reaching its
    # drain after ~131 executions with zero JVM GC (the jvm_gc cadence
    # below previously covered only the timed reps). NOTES' 10-rep
    # probe shows no-GC sessions degrading 8.5->80s on multi-exchange
    # plans — enough to eat the 8x margin of a 74s fresh-session drain
    # and blow the timeout, nulling the whole artifact. Three fixes:
    # (a) drain the stream builds FIRST on the fresh JVM, (b) run the
    # every-5th jvm_gc cadence inside the warmup loop too, (c) a query
    # that still fails is logged to stderr and SKIPPED — one slow
    # build must never raise out of main and zero the other 131
    # measurements. (The drain timeout itself was also raised to
    # 1800s in __spark_entry__.py.)
    _STREAMS = ("stream_ingest_accepted", "stream_curated_front")
    warm_order = [n for n in _STREAMS if n in qs] + [
        n for n in qs if n not in _STREAMS
    ]
    failed: dict[str, str] = {}
    for name in warm_order:
        try:
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # log-and-skip: never null the artifact
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[bench] WARMUP FAILED, skipping {name}: {failed[name]}",
                  file=sys.stderr)
        # Release this query's py4j plan refs before the next one:
        # localCheckpoint blocks stay pinned until the Python-side
        # DataFrame is collected, and the deferred finalizers let
        # storage/GC pressure accumulate over a 100-query session
        # (measured 3-4x inflation on late-running queries). The
        # collect runs OUTSIDE every timed window.
        gc.collect()
        jvm_gc()
    jvm_gc(force=True)

    # 3 reps per query: this container shows 2-4x run-to-run timing
    # noise on identical plans (see BASELINE.md). The headline stays
    # min-of-reps (the standard noise-resistant microbenchmark
    # estimator); per-query medians are reported alongside so the
    # noise floor itself is visible in the record.
    reps: dict[str, list[float]] = {
        name: [] for name in qs if name not in failed
    }
    # A flaky query's successful reps are preserved (not silently
    # discarded) so valid measurements survive alongside the error
    # string; they stay OUT of `value` — min-of-partial is not
    # comparable to min-of-3 (r9 ADVICE).
    failed_partial: dict[str, list[float]] = {}

    # Window-attribution track (VERDICT r10 item 2): BENCH_r10's
    # interleaved loop degraded mid-run (calib_mid mt32 1521) and
    # inflated five mid-loop queries 1.5-1.9x with no way to tell
    # which reps ran degraded — only the three edge/mid stamps
    # existed. Fix: a mini cpu_calib stamp (st x1 + mt32 best-of-3,
    # ~2.5 s, see calib_record) every 25 TIMED executions, plus the
    # three full stamps, all carrying the exec-counter position, so
    # every rep is bounded by two stamps. A rep is tagged degraded if
    # EITHER bounding stamp reads mt32 >= DEGRADED_MT32_MS
    # (pessimistic: a window that flips between stamps can't be
    # localized closer than the stamp spacing); a query whose reps
    # were ALL degraded gets ONE end-of-run retry rep, reported
    # separately — `value` stays pure min-of-3 (mixing regimes inside
    # one estimator was exactly the r10 heavy-first lesson).
    n_timed = 0
    rep_execs: dict[str, list[int]] = {name: [] for name in reps}
    calib_track: list[dict] = [
        {"exec": 0, "stamp": calib_before, "full": True}
    ]

    def track_stamp(stamp: list[float] | None = None,
                    full: bool = False) -> None:
        """Append a window stamp at the current exec position. With no
        stamp given, runs a mini calib (outside any timed window)."""
        if stamp is None and not full:
            rec = calib_record(mini=True)
            stamp = (
                None
                if not rec or rec.get("st_ms") is None
                or rec.get("mt32_ms") is None
                else [rec["st_ms"], rec["mt32_ms"]]
            )
        calib_track.append(
            {"exec": n_timed, "stamp": stamp, "full": full}
        )

    def _timed_rep(name: str) -> bool:
        """One timed noop execution of `name`; False drops the query."""
        nonlocal n_timed
        t0 = time.perf_counter()
        try:
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # log-and-skip (see warmup note)
            failed[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[bench] REP FAILED, dropping {name}: {failed[name]}",
                  file=sys.stderr)
            if reps.get(name):
                failed_partial[name] = reps[name]
            reps.pop(name, None)
            # A failed execution still ran jobs and allocated
            # blocks before raising — it ticks the GC cadence like
            # any other execution (the r8 failure mode was exactly
            # untracked executions aging the session).
            n_timed += 1
            gc.collect()
            jvm_gc()
            return False
        n_timed += 1
        reps[name].append(round(time.perf_counter() - t0, 3))
        rep_execs.setdefault(name, []).append(n_timed)
        gc.collect()  # see warmup note — outside the timed window
        jvm_gc()
        if n_timed % 25 == 0:
            track_stamp()
        return True

    # Heavy tail FIRST (VERDICT r9 item 1): BENCH_r09 recorded
    # lsh_jaccard_near_dup at 25.6 s min-of-3 while the same code in
    # the same round's three interleaved perf_probe sweeps read
    # 3.8-5.9 s — a 4-6x instrument error from in-bench session aging
    # (the query sat ~390 executions deep in the rep loop) on exactly
    # the most-watched queries. The multi-exchange sanctioned-heavy
    # set is timed immediately after the fresh-JVM warmup, consecutive
    # min-of-3 per query, with a FORCED full GC before every rep so
    # each read starts from a drained cleaner backlog. The force-GC
    # cost lands outside the timed window; the ~7% post-GC penalty on
    # the following query (NOTES A/B) is accepted here — it is noise
    # against a measured 4-6x aging skew.
    _HEAVY = [n for n in (
        "lsh_jaccard_near_dup", "simhash_hamming_pairs",
        "srp_cosine_near_dup", "minhash_lsh_pairs",
    ) if n in reps]
    for name in _HEAVY:
        for _rep in range(3):
            gc.collect()
            jvm_gc(force=True)
            if not _timed_rep(name):
                break
    # Mid-run calib stamp: the heavy block just ran on the freshest
    # window this process will ever have; stamp the window BETWEEN the
    # heavy block and the long interleaved loop so a degradation that
    # develops mid-run is visible inside the artifact itself, not just
    # at its edges (calib_before can be poisoned by whatever ran
    # before this process; calib_after by the run itself).
    calib_mid = _calib()
    track_stamp(stamp=calib_mid, full=True)

    for _rep in range(3):
        for name in list(reps):
            if name in _HEAVY:
                continue
            _timed_rep(name)

    timings = {name: min(ts) for name, ts in reps.items() if ts}
    medians = {
        name: sorted(ts)[len(ts) // 2] for name, ts in reps.items() if ts
    }
    total = round(sum(timings.values()), 3)
    calib_after = _calib()
    track_stamp(stamp=calib_after, full=True)

    # Degraded-segment tagging + end-of-run retry (VERDICT r10 item
    # 2). Bound each rep by its neighboring stamps; tag it degraded if
    # either bound is; retry (once) every query whose reps ALL ran
    # degraded. Retries get the heavy-block treatment (forced GC
    # before) and their own edge stamps so a retry taken in a still-
    # degraded window is recognizable as such.
    def _rep_degraded(e: int) -> bool:
        return track_span_degraded(calib_track, e - 1, e)

    degraded_queries = {
        name: execs
        for name, execs in rep_execs.items()
        if name in timings and execs and all(_rep_degraded(e) for e in execs)
    }
    retry_timings: dict[str, float] = {}
    retry_calib: list = []
    retry_skipped: list[str] = []
    retry_skipped_reason = ""
    if degraded_queries:
        rec = calib_record(mini=True)
        pre = (
            None
            if not rec or rec.get("st_ms") is None
            or rec.get("mt32_ms") is None
            else [rec["st_ms"], rec["mt32_ms"]]
        )
        retry_calib.append(pre)
        retry_order, retry_skipped, retry_skipped_reason = plan_retries(
            degraded_queries, timings, pre
        )
        for name in retry_order:
            gc.collect()
            jvm_gc(force=True)
            t0 = time.perf_counter()
            try:
                qs[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            except Exception as exc:
                print(f"[bench] RETRY FAILED for {name}: {exc}",
                      file=sys.stderr)
                continue
            retry_timings[name] = round(time.perf_counter() - t0, 3)
        rec = calib_record(mini=True)
        retry_calib.append(
            None
            if not rec or rec.get("st_ms") is None
            or rec.get("mt32_ms") is None
            else [rec["st_ms"], rec["mt32_ms"]]
        )
    full = {
        "metric": "total wall-clock of all declared queries (noop sink, best of 3)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "total_median": round(sum(medians.values()), 3),
        "sf": _sf_label(SF_DIR),
        "n_queries": len(timings),
        # log-and-skip casualties (normally {}): name -> first error.
        # A non-empty map means `value` under-covers the registry.
        "failed": failed,
        # successful reps a flaky query collected before failing —
        # kept for diagnosis, excluded from `value` (min-of-partial is
        # not comparable to min-of-3).
        "failed_partial_reps": failed_partial,
        # pinned-BLAS [st_ms, mt32_ms]; healthy ref ~[270-300, 570-610].
        # calib_mid is stamped between the heavy-first block and the
        # interleaved loop — a window that degrades mid-run shows here.
        "calib_before": calib_before,
        "calib_mid": calib_mid,
        "calib_after": calib_after,
        # which queries ran under the heavy-first forced-GC protocol
        # vs the interleaved every-5th-GC loop — two min-of-3 regimes
        # that must be attributable from the artifact alone (r10
        # ADVICE).
        "heavy_first": _HEAVY,
        # window-attribution track: a mini stamp (st x1, mt32
        # best-of-3) every 25 timed executions plus the three full
        # stamps, each entry {"exec": timed-exec counter, "stamp":
        # [st_ms, mt32_ms] or null, "full": bool}. mt32 values are
        # comparable across mini and full stamps; mini st is
        # single-rep and a sanity axis only.
        "calib_track": calib_track,
        "degraded_mt32_threshold_ms": DEGRADED_MT32_MS,
        # queries whose min-of-3 reps ALL ran inside degraded
        # segments (name -> rep exec positions); their `queries`
        # values carry window inflation. retry_timings holds ONE
        # end-of-run forced-GC rep per such query, bracketed by
        # retry_calib [before, after] mini stamps — reported beside,
        # never folded into, `value`.
        "degraded_queries": degraded_queries,
        "retry_timings": retry_timings,
        "retry_calib": retry_calib,
        # flagged queries NOT retried (degraded pre-retry stamp, or
        # past the cap) + why — see the retry-bound comment above.
        "retry_skipped": retry_skipped,
        "retry_skipped_reason": retry_skipped_reason,
    }
    # Full record: one line on stdout + a sidecar file for readers of
    # the repo (the driver's log keeps only the LAST ~2000 chars). The
    # leading newline guards against any carriage-return residue left
    # on the current stdout line.
    print()
    print(json.dumps(full, separators=(",", ":")))
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_full.json"), "w") as fh:
            json.dump(full, fh, indent=1)
    except OSError:
        pass
    # FINAL line: compact and guaranteed to fit the driver's 2000-char
    # tail capture intact (the full line is ~2.6KB and was recorded
    # truncated -> "parsed": null in BENCH_r01/r02). Carries the
    # headline numbers plus the slowest queries; the complete per-query
    # map is the line above / bench_full.json.
    ranked = sorted(timings.items(), key=lambda kv: -kv[1])
    # Track-health summary for the compact line: [degraded, total]
    # stamp counts. The full track lives in the full record above.
    track_health = [
        sum(1 for s in calib_track if _stamp_degraded(s["stamp"])),
        len(calib_track),
    ]
    # Shrink the slowest-N list until the line fits — degrading
    # coverage beats an oversized (truncated-unparseable) line, and an
    # assert would be stripped under python -O anyway.
    for top_n in range(40, 0, -5):
        compact = {
            "metric": "total_sec_all_queries_noop_best_of_3",
            "value": total,
            "unit": "sec",
            "queries": {k: round(v, 2) for k, v in ranked[:top_n]},
            "queries_omitted": len(timings) - min(top_n, len(timings)),
            "total_median": round(sum(medians.values()), 3),
            "sf": _sf_label(SF_DIR),
            "n_queries": len(timings),
            # Names capped at 10 so a mass-failure run (dead JVM ->
            # ~130 entries) can never push even the fallback record
            # over the 2000-char capture; the complete map is in the
            # full record / bench_full.json. Distinct key from the
            # full record's `failed` DICT — same key with two shapes
            # mis-parses generic readers (r9 ADVICE).
            "n_failed": len(failed),
            "failed_names": sorted(failed)[:10],
            "calib_before": calib_before,
            "calib_mid": calib_mid,
            "calib_after": calib_after,
            # [degraded, total] calib_track stamps; degraded-tagged
            # queries + their end-of-run retry reps (capped at 10 —
            # full maps in bench_full.json / the full line above).
            "track_degraded": track_health,
            "n_degraded": len(degraded_queries),
            "degraded_names": sorted(degraded_queries)[:10],
            "retry": {
                k: round(v, 2)
                for k, v in sorted(retry_timings.items())[:10]
            },
        }
        line = json.dumps(compact, separators=(",", ":"))
        if len(line) < 1950:
            break
    else:
        # Even the 5-entry record can overflow with long query names;
        # guarantee a parseable line by dropping the per-query map
        # entirely (scalars only — the full map is in bench_full.json).
        compact = {
            "metric": "total_sec_all_queries_noop_best_of_3",
            "value": total,
            "unit": "sec",
            "queries": {},
            "queries_omitted": len(timings),
            "total_median": round(sum(medians.values()), 3),
            "sf": _sf_label(SF_DIR),
            "n_queries": len(timings),
            "n_failed": len(failed),
            "failed_names": sorted(failed)[:10],  # capped — see loop above
            "calib_before": calib_before,
            "calib_mid": calib_mid,
            "calib_after": calib_after,
            "track_degraded": track_health,
            "n_degraded": len(degraded_queries),
        }
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
