"""Domain catalog tests — mirrors reference test_netatmo_domain.py
over a fixture shaped like MOCK_STATION_CONFIG (FIXTURES.md §2)."""

import pytest

from my_weather_spark.domain import Domain

MOCK_STATIONS = [
    {
        "_id": "bogus:station:id:1",
        "station_name": "Superstation",
        "module_name": "Inne",
        "type": "NAMain",
        "data_type": ["Temperature", "CO2", "Humidity", "Noise", "Pressure"],
        "reachable": True,
        "wifi_status": 51,
        "place": {
            "altitude": 227.5,
            "city": "Somewhere",
            "country": "NO",
            "timezone": "Europe/Oslo",
            "location": [10.0, 60.0],
        },
        "modules": [
            {
                "_id": "bogus:module:id:1",
                "module_name": "Livingroom",
                "type": "NAModule4",
                "data_type": ["Temperature", "CO2", "Humidity"],
                "reachable": True,
            },
            {
                "_id": "bogus:module:id:2",
                "module_name": "Ute",
                "type": "NAModule1",
                "data_type": ["Temperature", "Humidity"],
                "reachable": True,
            },
        ],
    }
]


@pytest.fixture(scope="module")
def domain(spark):
    return Domain(spark, MOCK_STATIONS)


def test_station_dim(domain):
    rows = domain.stations.collect()
    assert len(rows) == 1
    assert rows[0]["station_name"] == "Superstation"
    assert rows[0]["timezone"] == "Europe/Oslo"


def test_station_as_module_normalization(domain):
    # reference domain.py:204-216: the base unit becomes a module row
    mods = {r["module_name"]: r for r in domain.modules.collect()}
    assert set(mods) == {"Inne", "Livingroom", "Ute"}
    assert mods["Inne"]["module_id"] == "bogus:station:id:1"
    assert "Pressure" in mods["Inne"]["data_type"]


def test_measurements_view_and_ids(domain):
    m = domain.get_measurement("Superstation", "Livingroom", "Temperature").collect()
    assert len(m) == 1
    row = m[0]
    # golden display name (reference test_netatmo_domain.py:51)
    assert row["measurement_name"] == "Superstation\\Livingroom\\Temperature"
    assert row["store_id"] == "shyft://netatmo/superstation/livingroom/temperature"
    assert (
        row["query_id"]
        == "netatmo://?station_name=Superstation&module_name=Livingroom&data_type=Temperature"
    )
    assert row["unit"] == "°C"
    assert row["point_fx"] == "instant"


def test_measurement_count(domain):
    # 5 (station-as-module) + 3 + 2 = 10 measurements
    assert domain.measurements.count() == 10


def test_attach_measurements_broadcast_join(spark, domain):
    facts = spark.createDataFrame(
        [("bogus:module:id:1", "Temperature", 21.5)],
        "module_id string, data_type string, value double",
    )
    joined = domain.attach_measurements(facts, on=["module_id", "data_type"])
    rows = joined.collect()
    assert len(rows) == 1
    assert rows[0]["station_name"] == "Superstation"
    # the dim side must be broadcast (no shuffle of the fact table)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
