"""Store + evaluate integration tests.

Mirrors the reference's service-layer goldens (SURVEY.md §5):
* routing fan-out across two mock repos -> first values [1,2,3] in
  input order (test_dtss_host.py:54-61)
* store-merge: [1,2,3] at t0..2 then [4,5,6] at t3..5 -> [1..6]
  (test_dtss_host.py:102-134)
* incremental collection idempotence (test_data_collection_task.py:66-106)
"""

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from my_weather_spark.evaluate import TsEngine
from my_weather_spark.model import UtcPeriod
from my_weather_spark.pipeline import (
    DataCollectionPeriodAbsolute,
    DataCollectionTask,
)
from my_weather_spark.session import EngineSession
from my_weather_spark.sources.heartbeat import HeartbeatAdapter
from my_weather_spark.sources.mock import MockAdapter
from my_weather_spark.store import TsStore


def _dt(s):
    return datetime.fromtimestamp(s, tz=timezone.utc)


@pytest.fixture()
def engine(spark, tmp_path):
    sess = EngineSession(spark)
    sess.register_adapter(MockAdapter("mock1", dt_seconds=1))
    sess.register_adapter(MockAdapter("mock2", dt_seconds=1))
    sess.register_adapter(HeartbeatAdapter())
    store = TsStore(spark, str(tmp_path / "ts_store"))
    return TsEngine(sess, store)


def test_routing_fanout_preserves_input_order(engine):
    # golden: FIXTURES.md / reference test_dtss_host.py:54-61
    ids = [
        "mock1://something/1",
        "mock2://something_else/2",
        "mock1://something_strange/3",
    ]
    res = engine.evaluate(ids, UtcPeriod(0, 9))
    rows = res.collect()  # ordered by (query_index, ts)
    firsts = {}
    for r in rows:
        firsts.setdefault(r["query_index"], r["value"])
    assert [firsts[i] for i in range(3)] == [1.0, 2.0, 3.0]
    # every series spans the inclusive period at 1 Hz -> 10 points each
    assert len(rows) == 30


def test_unknown_scheme_raises(engine):
    with pytest.raises(KeyError, match="bogus"):
        engine.evaluate(["bogus://x/1"], UtcPeriod(0, 1))


def test_heartbeat_grid_is_global_and_survives_fractional_start(spark):
    from my_weather_spark.sources.heartbeat import synthetic_series

    # fractional-second start in the last second of a day used to hand
    # sequence() inverted bounds for that day (job-killing); and a dt
    # that doesn't divide 86400 must keep ONE global grid across
    # midnight, not re-anchor per day.
    p = UtcPeriod(86399.5, 86400 + 3600)  # 23:59:59.5 day0 -> 01:00 day1
    pts = sorted(
        synthetic_series(spark, ["h://x/1"], p, value=1.0, dt_seconds=7).collect(),
        key=lambda r: r["ts"],
    )
    epochs = [r["ts"].replace(tzinfo=None).timestamp() - _dt(0).replace(tzinfo=None).timestamp() for r in pts]
    # every point on the global grid start + k*7
    assert all(abs((e - 86399.5) % 7) < 1e-6 for e in epochs)
    # constant cadence across the midnight boundary
    deltas = {round(b - a, 6) for a, b in zip(epochs, epochs[1:])}
    assert deltas == {7.0}
    assert epochs[0] >= 86399.5 and epochs[-1] <= 86400 + 3600


def test_evaluate_dedups_across_store_sources(spark, tmp_path):
    from my_weather_spark.session import EngineSession
    from my_weather_spark.store import TsStore
    from my_weather_spark.evaluate import TsEngine

    sid = "shyft://x/station/mod/temp"
    store = TsStore(spark, str(tmp_path / "xsrc"))
    df = spark.createDataFrame(
        [(sid, _dt(0), 1.0), (sid, _dt(1), 2.0)],
        "series_id string, ts timestamp, value double",
    )
    store.store(df, source="a", ingest_time=_dt(100))
    store.store(df, source="b", ingest_time=_dt(200))  # same series, 2nd source
    eng = TsEngine(EngineSession(spark), store)
    out = eng.evaluate([sid], UtcPeriod(0, 10)).collect()
    # one row per (query_index, ts), not one per source
    assert len(out) == 2
    assert [r["value"] for r in out] == [1.0, 2.0]


def test_fresh_store_dedups_intra_batch(spark, tmp_path):
    # The FIRST write into a brand-new store must collapse intra-batch
    # duplicate (series_id, ts) keys exactly like the merge path does —
    # dedup behavior must not depend on whether the store existed.
    from my_weather_spark.store import TsStore

    store = TsStore(spark, str(tmp_path / "fresh"))
    df = spark.createDataFrame(
        [("s1", _dt(0), 1.0), ("s1", _dt(0), 2.0), ("s1", _dt(1), 3.0)],
        "series_id string, ts timestamp, value double",
    )
    store.store(df, ingest_time=_dt(100))
    rows = sorted(store.scan().collect(), key=lambda r: r["ts"])
    assert len(rows) == 2
    assert rows[0]["value"] == 2.0  # merge_dedup's desc-value tie-break
    assert rows[1]["value"] == 3.0


def test_store_merge_union_of_time_ranges(spark, engine):
    # golden: reference test_dtss_host.py:116-128 ([1,2,3] + [4,5,6] -> [1..6])
    sid = "shyft://netatmo/superstation/livingroom/temperature"
    df1 = spark.createDataFrame(
        [(sid, _dt(t), float(v)) for t, v in [(0, 1), (1, 2), (2, 3)]],
        "series_id string, ts timestamp, value double",
    )
    df2 = spark.createDataFrame(
        [(sid, _dt(t), float(v)) for t, v in [(3, 4), (4, 5), (5, 6)]],
        "series_id string, ts timestamp, value double",
    )
    engine.store_ts(df1, ingest_time=_dt(1000))
    engine.store_ts(df2, ingest_time=_dt(2000))
    out = engine.evaluate([sid], UtcPeriod(0, 100)).collect()
    assert [r["value"] for r in out] == [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]


def test_store_merge_overwrites_same_ts_with_newest(spark, engine):
    sid = "shyft://netatmo/s/m/t"
    df1 = spark.createDataFrame(
        [(sid, _dt(0), 1.0), (sid, _dt(1), 2.0)],
        "series_id string, ts timestamp, value double",
    )
    df2 = spark.createDataFrame(
        [(sid, _dt(1), 99.0)], "series_id string, ts timestamp, value double"
    )
    engine.store_ts(df1, ingest_time=_dt(1000))
    engine.store_ts(df2, ingest_time=_dt(2000))
    out = engine.evaluate([sid], UtcPeriod(0, 10)).collect()
    assert [r["value"] for r in out] == [1.0, 99.0]


def test_store_overwrite_on_write_replaces_series(spark, engine):
    sid = "shyft://netatmo/s/m/t2"
    df1 = spark.createDataFrame(
        [(sid, _dt(0), 1.0), (sid, _dt(1), 2.0)],
        "series_id string, ts timestamp, value double",
    )
    df2 = spark.createDataFrame(
        [(sid, _dt(5), 9.0)], "series_id string, ts timestamp, value double"
    )
    engine.store_ts(df1, ingest_time=_dt(1000))
    engine.store_ts(df2, overwrite_on_write=True, ingest_time=_dt(2000))
    out = engine.evaluate([sid], UtcPeriod(0, 10)).collect()
    assert [r["value"] for r in out] == [9.0]


def test_find_over_store(spark, engine):
    sid = "shyft://netatmo/findme/m/t"
    df = spark.createDataFrame(
        [(sid, _dt(0), 1.0), (sid, _dt(9), 2.0)],
        "series_id string, ts timestamp, value double",
    )
    engine.store_ts(df, ingest_time=_dt(1000))
    info = engine.find(sid).collect()
    assert len(info) == 1
    assert info[0]["n_points"] == 2
    # full TsInfo field set (reference repository.py:293-301)
    assert set(info[0].asDict()) == {
        "name", "point_fx", "delta_t", "olson_tz_id",
        "data_period_start", "data_period_end", "created", "modified",
        "n_points",
    }
    assert info[0]["delta_t"] == 9.0  # mode of point spacing
    assert info[0]["created"] == _dt(1000).replace(tzinfo=None)
    assert info[0]["modified"] == _dt(1000).replace(tzinfo=None)
    assert info[0]["point_fx"] is None  # no catalog attached


def test_find_tsinfo_catalog_enrichment(spark, engine):
    # with a measurement catalog attached, store-side TsInfo carries
    # point_fx and the station timezone, like the reference's TsInfo
    sid = "shyft://netatmo/superstation/ute/temperature"
    df = spark.createDataFrame(
        [(sid, _dt(0), 1.0), (sid, _dt(60), 2.0), (sid, _dt(120), 3.0)],
        "series_id string, ts timestamp, value double",
    )
    engine.store_ts(df, ingest_time=_dt(500))
    cat = spark.createDataFrame(
        [(sid, "instant", "Europe/Oslo")],
        "store_id string, point_fx string, timezone string",
    )
    engine.catalog = cat
    info = engine.find(sid).collect()
    assert len(info) == 1
    assert info[0]["point_fx"] == "instant"
    assert info[0]["olson_tz_id"] == "Europe/Oslo"
    assert info[0]["delta_t"] == 60.0


def test_incremental_collection_idempotent(spark, engine):
    # mirror of reference test_data_collection_task.py:66-106:
    # pass 1 over [0, 3600] then pass 2 over [3600, 7200]; endpoints of
    # both passes present; re-ingestion of the overlap point (3600) is
    # deduped, total = 7201 points at 1 Hz inclusive.
    read_ids = ["mock1://station/7"]
    store_ids = ["shyft://collected/station/module/seven"]
    task1 = DataCollectionTask(
        "short", engine, read_ids, store_ids,
        DataCollectionPeriodAbsolute(_dt(0), _dt(3600)),
    )
    task1.collect(now=_dt(5000))
    first = engine.evaluate(store_ids, UtcPeriod(0, 10**6)).collect()
    assert len(first) == 3601
    assert first[0]["ts"].second == 0

    task2 = DataCollectionTask(
        "short2", engine, read_ids, store_ids,
        DataCollectionPeriodAbsolute(_dt(3600), _dt(7200)),
    )
    task2.collect(now=_dt(9000))
    second = engine.evaluate(store_ids, UtcPeriod(0, 10**6)).collect()
    assert len(second) == 7201  # 0..7200 inclusive, overlap deduped
    assert all(r["value"] == 7.0 for r in second[:5])


def test_engine_healthy(engine):
    assert engine.healthy()


def test_large_series_vector_semi_join(spark, engine):
    # >200 ids takes the broadcast semi-join path
    sid = "shyft://many/s/m/t"
    df = spark.createDataFrame(
        [(sid, _dt(i), float(i)) for i in range(5)],
        "series_id string, ts timestamp, value double",
    )
    engine.store_ts(df, ingest_time=_dt(1000))
    ids = [sid] + [f"shyft://many/s/m/none{i}" for i in range(300)]
    out = engine.evaluate(ids, UtcPeriod(0, 100))
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["query_index"] == 0 for r in rows)


def test_store_compaction_preserves_data(spark, engine):
    sid = "shyft://compact/s/m/t"
    for batch in range(3):
        df = spark.createDataFrame(
            [(sid, _dt(batch * 10 + i), float(i)) for i in range(10)],
            "series_id string, ts timestamp, value double",
        )
        engine.store_ts(df, ingest_time=_dt(1000 + batch))
    before = engine.evaluate([sid], UtcPeriod(0, 1000)).collect()
    engine.store.compact()
    after = engine.evaluate([sid], UtcPeriod(0, 1000)).collect()
    assert [r["value"] for r in after] == [r["value"] for r in before]
    assert len(after) == 30


def test_store_compaction_zorder_clusters_both_dims(spark, tmp_path):
    from my_weather_spark.store import TsStore

    store = TsStore(spark, str(tmp_path / "zstore"))
    # 8 series x 400 points, one day — enough rows for multiple files
    rows = [
        (f"shyft://z/s{s}", _dt(i * 60), float(s * 1000 + i))
        for s in range(8)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    store.store(df, source="zsrc")
    store.compact(target_records_per_file=400, cluster="zorder")

    out = spark.read.parquet(store.path)
    assert out.count() == 3200  # round-trips

    per_file = (
        out.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.countDistinct("series_id").alias("n_series"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "ts_span"
            ),
        )
        .collect()
    )
    assert len(per_file) >= 4
    full_span = 399 * 60
    # z-clustering: every file covers a narrow range of BOTH dims —
    # a linear (series, ts) sort would give files with ts_span == full
    assert all(r["n_series"] <= 4 for r in per_file)
    assert all(r["ts_span"] <= full_span * 0.75 for r in per_file)

    with pytest.raises(ValueError):
        store.compact(cluster="hilbert")


def test_evaluate_duplicate_ids_keep_positions(engine):
    ids = ["mock1://a/1", "mock1://a/1", "mock2://b/2"]
    rows = engine.evaluate(ids, UtcPeriod(0, 4)).collect()
    per_idx = {}
    for r in rows:
        per_idx.setdefault(r["query_index"], []).append(r["value"])
    # both positions of the duplicated id are materialized
    assert len(per_idx[0]) == 5 and len(per_idx[1]) == 5
    assert per_idx[0] == per_idx[1] == [1.0] * 5
    assert per_idx[2] == [2.0] * 5


def test_bucketed_serving_layout_avoids_shuffle(engine, spark):
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    # store three series across two days
    rows = [
        (f"shyft://bt/s{i}/m/Temperature", _dt(86400 * d + 60 * j), float(i + j))
        for i in range(3)
        for d in range(2)
        for j in range(5)
    ]
    df = spark.createDataFrame(rows, "series_id string, ts timestamp, value double")
    engine.store_ts(df)
    try:
        bt = engine.store.as_bucketed_table("bt_serving", n_buckets=4)
        # per-series window over the bucketed table: no shuffle planned
        w = W.partitionBy("series_id").orderBy("ts")
        lagged = bt.withColumn("prev", F.lag("value").over(w))
        plan = lagged._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        # and values round-trip exactly vs the plain store scan
        got = sorted(
            (r["series_id"], r["ts"], r["value"]) for r in bt.collect()
        )
        want = sorted(
            (r["series_id"], r["ts"], r["value"])
            for r in engine.store.scan().collect()
        )
        assert got == want and len(got) == 30
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_serving")


def test_find_fast_catalog_sidecar(spark, tmp_path):
    store = TsStore(spark, str(tmp_path / "cat_store"))
    sid_a, sid_b = "shyft://s/a/m/t", "shyft://s/b/m/t"
    df1 = spark.createDataFrame(
        [(sid_a, _dt(0), 1.0), (sid_a, _dt(60), 2.0), (sid_b, _dt(30), 5.0)],
        "series_id string, ts timestamp, value double",
    )
    store.store(df1, source="src1", ingest_time=_dt(1000))
    # second merge batch extends series a both directions
    df2 = spark.createDataFrame(
        [(sid_a, _dt(-60), 0.5), (sid_a, _dt(120), 3.0)],
        "series_id string, ts timestamp, value double",
    )
    store.store(df2, source="src1", ingest_time=_dt(2000))

    exact = {r["name"]: r for r in store.find().collect()}
    fast = {r["name"]: r for r in store.find(fast=True).collect()}
    assert set(fast) == set(exact) == {sid_a, sid_b}
    # the sidecar answers the reference TsInfo fields without a scan,
    # and the monotone merge tracked both extensions + both ingests
    for sid in (sid_a, sid_b):
        for f in ("data_period_start", "data_period_end", "created", "modified"):
            assert fast[sid][f] == exact[sid][f], (sid, f)
    assert fast[sid_a]["created"] == _dt(1000).replace(tzinfo=None)
    assert fast[sid_a]["modified"] == _dt(2000).replace(tzinfo=None)
    # v2 sidecar answers the scan-derived extras too, exactly
    assert fast[sid_a]["n_points"] == exact[sid_a]["n_points"] == 4
    assert fast[sid_a]["delta_t"] == exact[sid_a]["delta_t"]
    assert fast[sid_b]["n_points"] == 1 and fast[sid_b]["delta_t"] is None

    # re-ingesting the same batch is a no-op on the sidecar (idempotent)
    store.store(df2, source="src1", ingest_time=_dt(2000))
    fast2 = {r["name"]: r for r in store.find(fast=True).collect()}
    assert fast2[sid_a].asDict() == fast[sid_a].asDict()

    # whole-series replace resets the replaced series' catalog row and
    # leaves the other series untouched
    df3 = spark.createDataFrame(
        [(sid_a, _dt(500), 9.0)], "series_id string, ts timestamp, value double"
    )
    store.store(df3, source="src1", overwrite_on_write=True, ingest_time=_dt(3000))
    fast3 = {r["name"]: r for r in store.find(fast=True).collect()}
    assert fast3[sid_a]["data_period_start"] == _dt(500).replace(tzinfo=None)
    assert fast3[sid_a]["created"] == _dt(3000).replace(tzinfo=None)
    assert fast3[sid_b].asDict() == fast[sid_b].asDict()

    # pattern/source filters + rebuild-from-data recovery
    assert store.find(pattern="//s/a/", fast=True).count() == 1
    store.rebuild_catalog()
    fast4 = {r["name"]: r for r in store.find(fast=True).collect()}
    assert fast4[sid_a]["data_period_start"] == _dt(500).replace(tzinfo=None)
    # NOTE: rebuild derives created/modified from ingest_time (data),
    # which equals the tracked values in this engine (store() stamps
    # every row) — asserted so the recovery path stays equivalent
    assert fast4[sid_b]["created"] == fast[sid_b]["created"]


def test_find_fast_equals_exact_tsinfo(spark, tmp_path):
    """The v2 sidecar's fast path must return the IDENTICAL TsInfo row
    set as the exact data scan — including n_points and delta_t —
    across date-partition boundaries, under point replacement, and
    after a rebuild; a time-interleaved multi-source series gets its
    delta_t from the pruned exact-scan fallback (exact-equal), or NULL
    with exact_fallback=False (reference-faithful: its metadata find()
    reports NaN there always)."""
    from datetime import timedelta

    store = TsStore(spark, str(tmp_path / "parity_store"))
    day = 86400
    # series m: hourly cadence crossing a date boundary (23:00, 00:00,
    # 01:00, 03:00) -> mode 3600 needs the cross-partition gap
    rows_m = [("m", _dt(day - 3600), 1.0), ("m", _dt(day), 2.0),
              ("m", _dt(day + 3600), 3.0), ("m", _dt(day + 3 * 3600), 4.0)]
    # series s: single point (no spacings -> NULL delta_t both paths)
    rows_s = [("s", _dt(0), 9.0)]
    df1 = spark.createDataFrame(
        rows_m + rows_s, "series_id string, ts timestamp, value double"
    )
    store.store(df1, source="src1", ingest_time=_dt(1000))
    # replace a point of m with a newer ingest (same ts, new value):
    # the replaced row's ingest must leave BOTH paths' created
    df2 = spark.createDataFrame(
        [("m", _dt(day), 2.5)], "series_id string, ts timestamp, value double"
    )
    store.store(df2, source="src1", ingest_time=_dt(2000))

    def rows(fast):
        return {
            r["name"]: {
                k: r[k]
                for k in ("data_period_start", "data_period_end", "created",
                          "modified", "n_points", "delta_t")
            }
            for r in store.find(fast=fast).collect()
        }

    exact, fast = rows(False), rows(True)
    assert fast == exact
    assert fast["m"]["n_points"] == 4 and fast["m"]["delta_t"] == 3600.0
    assert fast["s"]["n_points"] == 1 and fast["s"]["delta_t"] is None

    # rebuild-from-data reproduces the same sidecar answers
    store.rebuild_catalog()
    assert rows(True) == exact

    # interleaved sources: same series, time-overlapping data under a
    # second source -> the sidecar alone can't order the merged ts
    # sequence, so fast delta_t comes from the pruned exact-scan
    # fallback and must EQUAL the exact path (VERDICT r7 item 4);
    # exact_fallback=False keeps the zero-read NULL answer
    df3 = spark.createDataFrame(
        [("m", _dt(day + 1800), 5.0), ("m", _dt(day + 5400), 6.0)],
        "series_id string, ts timestamp, value double",
    )
    store.store(df3, source="src2", ingest_time=_dt(3000))
    exact2, fast2 = rows(False), rows(True)
    assert fast2["m"]["n_points"] == exact2["m"]["n_points"] == 6
    assert exact2["m"]["delta_t"] == 1800.0
    assert fast2["m"]["delta_t"] == 1800.0
    assert fast2 == exact2
    # the untouched single-source series s must NOT pay the fallback
    # (still answered purely from the sidecar histograms)
    assert fast2["s"]["delta_t"] is None and fast2["s"]["n_points"] == 1
    meta = {
        r["name"]: r
        for r in store.find(fast=True, exact_fallback=False).collect()
    }
    assert meta["m"]["delta_t"] is None
    for f in ("data_period_start", "data_period_end", "created",
              "modified", "n_points"):
        assert meta["m"][f] == exact2["m"][f], f


def test_find_fast_caps_irregular_spacing_histogram(spark, tmp_path):
    """An irregular series (every spacing distinct) must not grow the
    sidecar toward data size: above DT_HIST_CAP distinct spacings the
    histogram is dropped, and fast delta_t comes from the pruned
    exact-scan fallback (exact-equal) — or NULL with
    exact_fallback=False, the zero-read metadata answer (the reference
    reports NaN there always). Every other field stays exact."""
    from datetime import timedelta

    store = TsStore(spark, str(tmp_path / "cap_store"))
    n = TsStore.DT_HIST_CAP + 6
    base = _dt(0)
    t, rows = 0, []
    for i in range(n):
        rows.append(("irr", base + timedelta(microseconds=t), float(i)))
        t += (i + 1)  # spacings 1,2,3,... us — all distinct
    df = spark.createDataFrame(
        rows, "series_id string, ts timestamp, value double"
    )
    store.store(df, source="src1", ingest_time=_dt(1000))
    exact = store.find().collect()[0]
    fast = store.find(fast=True).collect()[0]
    assert fast["n_points"] == exact["n_points"] == n
    assert exact["delta_t"] == 1e-06  # tie-break toward smallest
    assert fast["delta_t"] == 1e-06  # capped: exact-scan fallback
    meta = store.find(fast=True, exact_fallback=False).collect()[0]
    assert meta["delta_t"] is None  # capped + no fallback: honest NULL
    for f in ("data_period_start", "data_period_end", "created", "modified"):
        assert fast[f] == exact[f], f
    # the sidecar row itself must carry no histogram
    cat = spark.read.schema(store._catalog_schema()).parquet(
        store._catalog_path
    ).collect()[0]
    assert cat["n_spacings"] == n - 1 and cat["dt_hist"] is None


def test_catalog_sidecar_partitioned_by_source(spark, tmp_path):
    """The sidecar is hive-partitioned by source and a merge-mode
    store() rewrites ONLY the touched source's partition — an
    untouched source's sidecar file stays byte-identical on disk
    (the O(touched-source) catalog-maintenance contract)."""
    import hashlib
    from pathlib import Path

    store = TsStore(spark, str(tmp_path / "part_store"))
    df_a = spark.createDataFrame(
        [("s/a", _dt(0), 1.0)], "series_id string, ts timestamp, value double"
    )
    df_b = spark.createDataFrame(
        [("s/b", _dt(0), 2.0)], "series_id string, ts timestamp, value double"
    )
    store.store(df_a, source="src1", ingest_time=_dt(1000))
    store.store(df_b, source="src2", ingest_time=_dt(1000))

    cat_root = Path(store._catalog_path)
    src1_dir = cat_root / "source=src1"
    assert src1_dir.is_dir() and (cat_root / "source=src2").is_dir()

    def digest(d):
        return {
            p.name: hashlib.md5(p.read_bytes()).hexdigest()
            for p in sorted(d.glob("*.parquet"))
        }

    before = digest(src1_dir)
    assert before  # src1 partition holds data files
    # unrelated store() into src2 must not touch src1's files
    df_b2 = spark.createDataFrame(
        [("s/b", _dt(60), 3.0)], "series_id string, ts timestamp, value double"
    )
    store.store(df_b2, source="src2", ingest_time=_dt(2000))
    assert digest(src1_dir) == before
    # and the catalog still answers for both sources
    fast = {r["name"]: r for r in store.find(fast=True).collect()}
    assert fast["s/b"]["modified"] == _dt(2000).replace(tzinfo=None)
    assert fast["s/a"]["created"] == _dt(1000).replace(tzinfo=None)


def test_catalog_fresh_store_discards_stale_sidecar(spark, tmp_path):
    """A store deleted out of band leaves its sidecar behind; the next
    fresh-store write must overwrite it instead of merging ghost
    series into the new store's catalog."""
    import shutil

    root = tmp_path / "ghost_store"
    store = TsStore(spark, str(root))
    df_old = spark.createDataFrame(
        [("ghost", _dt(0), 1.0)], "series_id string, ts timestamp, value double"
    )
    store.store(df_old, source="src1", ingest_time=_dt(1000))
    shutil.rmtree(root)  # out-of-band delete: sidecar survives
    assert store._catalog_exists() and not store._exists()

    df_new = spark.createDataFrame(
        [("real", _dt(0), 2.0)], "series_id string, ts timestamp, value double"
    )
    store.store(df_new, source="src1", ingest_time=_dt(2000))
    names = {r["name"] for r in store.find(fast=True).collect()}
    assert names == {"real"}  # no ghost series


def test_catalog_intra_batch_duplicate_matches_exact(spark, tmp_path):
    """Intra-batch duplicate (series, ts) rows with distinct
    ingest_times: only the merge_dedup survivor lands, and the catalog
    must summarize the SURVIVOR, keeping find(fast) == find(exact)."""
    store = TsStore(spark, str(tmp_path / "dup_store"))
    df = spark.createDataFrame(
        [
            ("s/x", _dt(0), 1.0, _dt(1000)),
            ("s/x", _dt(0), 2.0, _dt(2000)),  # same point, newer ingest wins
        ],
        "series_id string, ts timestamp, value double, ingest_time timestamp",
    )
    store.store(df, source="src1")
    exact = store.find().collect()[0]
    fast = store.find(fast=True).collect()[0]
    assert exact["created"] == _dt(2000).replace(tzinfo=None)
    assert fast["created"] == exact["created"]
    assert fast["modified"] == exact["modified"]


def test_catalog_legacy_flat_layout_migrates(spark, tmp_path):
    """A pre-partitioning sidecar (flat parquet with source as a data
    column) is read correctly and migrated to the partitioned layout on
    the next store()."""
    from pathlib import Path

    store = TsStore(spark, str(tmp_path / "legacy_store"))
    df = spark.createDataFrame(
        [("s/a", _dt(0), 1.0)], "series_id string, ts timestamp, value double"
    )
    store.store(df, source="src1", ingest_time=_dt(1000))
    # rewrite the sidecar in the legacy flat layout
    cat = spark.read.schema(store._catalog_schema()).parquet(store._catalog_path)
    flat = cat.localCheckpoint(eager=True)
    flat.coalesce(1).write.mode("overwrite").parquet(store._catalog_path)
    assert not store._catalog_is_partitioned()

    df2 = spark.createDataFrame(
        [("s/a", _dt(60), 2.0)], "series_id string, ts timestamp, value double"
    )
    store.store(df2, source="src1", ingest_time=_dt(2000))
    assert store._catalog_is_partitioned()
    assert not list(Path(store._catalog_path).glob("*.parquet"))  # flat files gone
    fast = store.find(fast=True).collect()[0]
    assert fast["created"] == _dt(1000).replace(tzinfo=None)
    assert fast["modified"] == _dt(2000).replace(tzinfo=None)


def test_find_fast_is_bound_to_call_time_catalog_snapshot(spark, tmp_path):
    """find(fast, exact_fallback=True) pins the catalog snapshot at
    call time (r8 ADVICE): the fallback existence probe decides the
    plan shape eagerly, so the lazy result must read the SAME state —
    a store() between find() and execution must not surface a newly
    interleaved series with the fallback branch already pruned away
    (which would yield NULL delta_t despite the exact-equal
    guarantee). The held DataFrame answers as of find(); a fresh
    find() sees the new state exactly."""
    from datetime import timedelta

    store = TsStore(spark, str(tmp_path / "snap_store"))
    rows = [("m", _dt(i * 3600), float(i)) for i in range(4)]
    store.store(
        spark.createDataFrame(
            rows, "series_id string, ts timestamp, value double"
        ),
        source="src1",
        ingest_time=_dt(1000),
    )
    held = store.find(fast=True)  # snapshot pinned here

    # Interleave the same series under a second source AFTER find():
    # post-write catalog marks 'm' needs_scan, but the held plan was
    # built with needs_scan=False.
    store.store(
        spark.createDataFrame(
            [("m", _dt(1800), 9.0), ("m", _dt(5400), 9.5)],
            "series_id string, ts timestamp, value double",
        ),
        source="src2",
        ingest_time=_dt(2000),
    )

    got = {r["name"]: r for r in held.collect()}
    assert got["m"]["n_points"] == 4          # call-time state
    assert got["m"]["delta_t"] == 3600.0      # not NULL, not post-write

    # A fresh find() reflects the interleaved store and stays
    # exact-equal to the scan path.
    fresh = {r["name"]: r for r in store.find(fast=True).collect()}
    exact = {r["name"]: r for r in store.find(fast=False).collect()}
    assert fresh["m"]["n_points"] == 6
    assert fresh["m"]["delta_t"] == exact["m"]["delta_t"]
    assert fresh["m"]["delta_t"] is not None
