"""End-to-end reference lifecycle: query-form ids -> domain resolve ->
module-grouped paginated fetch -> evaluate -> collect into store under
store ids -> re-evaluate from the store (the full §3 loop)."""

from datetime import datetime, timezone

import pytest

from my_weather_spark.evaluate import TsEngine
from my_weather_spark.model import UtcPeriod, create_query_id
from my_weather_spark.pipeline import DataCollectionPeriodAbsolute, DataCollectionTask
from my_weather_spark.session import EngineSession
from my_weather_spark.sources.domain_source import DomainAdapter
from my_weather_spark.sources.file_source import ChunkedFileAdapter
from my_weather_spark.store import TsStore
from tests.test_domain import MOCK_STATIONS
from my_weather_spark.domain import Domain


def _dt(s):
    return datetime.fromtimestamp(s, tz=timezone.utc)


@pytest.fixture()
def rig(spark, tmp_path):
    # backing "cloud" data keyed by the domain's store ids
    dom = Domain(spark, MOCK_STATIONS)
    store_ids = [r["store_id"] for r in dom.measurements.collect()]
    rows = []
    for k, sid in enumerate(sorted(store_ids)):
        rows += [(sid, _dt(i * 300), float(k * 1000 + i)) for i in range(50)]
    backing_path = str(tmp_path / "cloud")
    spark.createDataFrame(
        rows, "series_id string, ts timestamp, value double"
    ).write.parquet(backing_path)

    backing = ChunkedFileAdapter("shyft", backing_path, max_points_per_call=1024)
    sess = EngineSession(spark)
    sess.register_adapter(DomainAdapter("netatmo", dom, backing))
    store = TsStore(spark, str(tmp_path / "store"))
    return TsEngine(sess, store), dom


def test_query_id_resolution_and_read(rig):
    engine, dom = rig
    qid = create_query_id("netatmo", "Superstation", "Livingroom", "Temperature")
    res = engine.evaluate([qid], UtcPeriod(0, 49 * 300)).collect()
    assert len(res) == 50
    assert all(r["series_id"] == qid for r in res)


def test_module_grouping_batches_calls(rig, spark):
    engine, dom = rig
    adapter = engine.session.adapter("netatmo")
    # 3 types of one module -> backing pagination called once (1 chunk)
    qids = [
        create_query_id("netatmo", "Superstation", "Livingroom", t)
        for t in ("Temperature", "CO2", "Humidity")
    ]
    calls_before = adapter.backing.calls_made
    res = engine.evaluate(qids, UtcPeriod(0, 49 * 300))
    n = res.count()
    assert n == 150
    assert adapter.backing.calls_made - calls_before == 1  # shared scan per module


def test_unknown_measurement_raises(rig):
    engine, _ = rig
    bad = create_query_id("netatmo", "Superstation", "Garage", "Temperature")
    with pytest.raises(KeyError, match="no measurement"):
        engine.evaluate([bad], UtcPeriod(0, 100))


def test_find_returns_tsinfo(rig):
    engine, _ = rig
    qid = create_query_id("netatmo", "Superstation", "Ute", "Humidity")
    info = engine.find(qid).collect()
    assert len(info) == 1
    assert info[0]["name"] == qid
    assert info[0]["olson_tz_id"] == "Europe/Oslo"
    assert info[0]["point_fx"] == "instant"


def test_full_collection_loop(rig, spark):
    # reference data_collection_task flow: read query ids, store under
    # store ids, re-evaluate from the shyft:// store
    engine, dom = rig
    qid = create_query_id("netatmo", "Superstation", "Livingroom", "Temperature")
    m = dom.get_measurement("Superstation", "Livingroom", "Temperature").collect()[0]
    task = DataCollectionTask(
        "collect",
        engine,
        [qid],
        [m["store_id"]],
        DataCollectionPeriodAbsolute(_dt(0), _dt(49 * 300)),
    )
    n = task.collect(now=_dt(10**6))
    assert n == 50
    stored = engine.evaluate([m["store_id"]], UtcPeriod(0, 10**6)).collect()
    assert len(stored) == 50
    live = engine.evaluate([qid], UtcPeriod(0, 49 * 300)).collect()
    assert [r["value"] for r in stored] == [r["value"] for r in live]
