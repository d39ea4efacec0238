"""Pure-function tests: URL codec, periods, scalar string functions.

Mirrors the reference's pure-function layer (SURVEY.md §5):
test_netatmo_identifiers.py, test_ascii_clean.py.
"""

from datetime import datetime, timezone

import pytest

from my_weather_spark.model import (
    SeriesRef,
    UtcPeriod,
    create_query_id,
    create_store_id,
    parse_query_id,
)
from my_weather_spark.ops.scalars import ascii_clean_py, camel_to_snake_py


def test_store_id_round_trip():
    url = create_store_id("netatmo", "Superstation", "Livingroom", "Temperature")
    assert url == "shyft://netatmo/superstation/livingroom/temperature"
    ref = SeriesRef.parse(url)
    assert ref.scheme == "shyft"
    assert ref.path == ("netatmo", "superstation", "livingroom", "temperature")


def test_query_id_round_trip():
    # golden from reference test_netatmo_identifiers.py:7-20
    url = create_query_id("netatmo", "this_station", "Somewhere", "Earthquake")
    assert (
        url
        == "netatmo://?station_name=this_station&module_name=Somewhere&data_type=Earthquake"
    )
    params = parse_query_id(url, {"station_name", "module_name", "data_type"})
    assert params == {
        "station_name": "this_station",
        "module_name": "Somewhere",
        "data_type": "Earthquake",
    }


def test_query_id_rejects_unknown_params():
    with pytest.raises(ValueError):
        parse_query_id("netatmo://?bogus=1", {"station_name"})


def test_query_id_rejects_delimiter_names():
    import pytest

    from my_weather_spark.model import create_query_id

    with pytest.raises(ValueError, match="delimiter"):
        create_query_id("netatmo", "Living & Dining", "mod", "Temperature")
    with pytest.raises(ValueError, match="delimiter"):
        create_query_id("netatmo", "st", "a=b", "Temperature")


def test_bad_url_rejected():
    with pytest.raises(ValueError):
        SeriesRef.parse("not a url")


def test_ascii_clean_golden():
    # golden from reference test_ascii_clean.py:3-7
    assert ascii_clean_py("Eftasåsen4") == "eftas-sen4"
    assert ascii_clean_py("Superstation") == "superstation"


def test_camel_to_snake():
    assert camel_to_snake_py("WindStrength") == "wind_strength"
    assert camel_to_snake_py("CO2") == "co2"
    assert camel_to_snake_py("dashboardData2X") == "dashboard_data2_x"


def test_period_inclusive_contract():
    p = UtcPeriod(0, 3600)
    assert p.contains(0) and p.contains(3600)
    assert not p.contains(3601)
    assert p.start == datetime(1970, 1, 1, tzinfo=timezone.utc)


def test_period_rejects_negative_span():
    with pytest.raises(ValueError):
        UtcPeriod(10, 5)
