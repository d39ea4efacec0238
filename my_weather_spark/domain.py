"""Domain catalog: stations -> modules -> measurements (SURVEY.md §2 S7/J1).

Re-expression of the reference's metadata domain (weather/data_sources/
netatmo/domain.py): nested device metadata (stations with embedded
modules) is normalized into three dimension DataFrames plus a derived
``measurements`` view carrying both id forms (store id + query id).

Key reference semantics preserved:
* the station itself is normalized into a module row ("station as
  module", domain.py:204-216) so its on-board sensors address like any
  other module's;
* the measurement-type catalog is the fixed 10-entry table
  (domain.py:110-121);
* measurement display name is 'Station\\Module\\Type'
  (test_netatmo_domain.py:51);
* lookups (station_name, module_name, data_type) -> measurement are
  broadcast hash joins instead of the reference's linear search
  (domain.py:277-289).

Scale note: dimensions are tiny by construction (catalog data); every
join against facts must broadcast them — helpers here return plain
DataFrames the caller wraps in F.broadcast(), and `attach_measurements`
does it for you.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from my_weather_spark.model import MEASUREMENT_TYPES
from my_weather_spark.ops.scalars import query_id_col, store_id_col


class Domain:
    """Normalized catalog over nested station metadata."""

    def __init__(self, spark: SparkSession, device_metadata: list[dict[str, Any]]):
        self.spark = spark
        self._stations_raw = device_metadata
        self.stations = self._build_stations()
        self.modules = self._build_modules()
        self.measurement_types = self._build_measurement_types()
        self.measurements = self._build_measurements()

    # -- dimensions -----------------------------------------------------
    def _build_stations(self) -> DataFrame:
        rows = []
        for st in self._stations_raw:
            rows.append(
                {
                    "station_id": st["_id"],
                    "station_name": st.get("station_name", st.get("name", "")),
                    "timezone": (st.get("place") or {}).get("timezone"),
                    "city": (st.get("place") or {}).get("city"),
                    "country": (st.get("place") or {}).get("country"),
                    "altitude": float((st.get("place") or {}).get("altitude", 0.0) or 0.0),
                    "location": [float(x) for x in (st.get("place") or {}).get("location", [])],
                    "wifi_status": st.get("wifi_status"),
                    "reachable": st.get("reachable"),
                }
            )
        return self.spark.createDataFrame(
            rows,
            "station_id string, station_name string, timezone string, city string, "
            "country string, altitude double, location array<double>, "
            "wifi_status int, reachable boolean",
        )

    def _build_modules(self) -> DataFrame:
        rows = []
        for st in self._stations_raw:
            station_name = st.get("station_name", st.get("name", ""))
            # Station-as-module normalization (reference domain.py:204-216):
            # the base unit's own sensors (data_type on the station dict)
            # become module row 0 named module_name (or station_name).
            rows.append(
                {
                    "module_id": st["_id"],
                    "station_id": st["_id"],
                    "module_name": st.get("module_name", station_name),
                    "type": st.get("type", "NAMain"),
                    "data_type": list(st.get("data_type", [])),
                    "reachable": st.get("reachable"),
                }
            )
            for mod in st.get("modules", []):
                rows.append(
                    {
                        "module_id": mod["_id"],
                        "station_id": st["_id"],
                        "module_name": mod.get("module_name", ""),
                        "type": mod.get("type"),
                        "data_type": list(mod.get("data_type", [])),
                        "reachable": mod.get("reachable"),
                    }
                )
        return self.spark.createDataFrame(
            rows,
            "module_id string, station_id string, module_name string, type string, "
            "data_type array<string>, reachable boolean",
        )

    def _build_measurement_types(self) -> DataFrame:
        return self.spark.createDataFrame(
            MEASUREMENT_TYPES, "data_type string, unit string, point_fx string"
        )

    def _build_measurements(self) -> DataFrame:
        """One row per (station, module, data_type): the J1 lookup
        target, with both id forms and the display name."""
        exploded = self.modules.select(
            "module_id",
            "station_id",
            "module_name",
            F.explode("data_type").alias("data_type"),
        )
        named = exploded.join(
            F.broadcast(self.stations.select("station_id", "station_name", "timezone")),
            "station_id",
        ).join(F.broadcast(self.measurement_types), "data_type", "left")
        return named.select(
            "station_id",
            "station_name",
            "module_id",
            "module_name",
            "data_type",
            "unit",
            "point_fx",
            "timezone",
            # 'Superstation\Livingroom\Temperature' (test_netatmo_domain.py:51)
            F.concat_ws("\\", "station_name", "module_name", "data_type").alias(
                "measurement_name"
            ),
            store_id_col(
                "netatmo", F.col("station_name"), F.col("module_name"), F.col("data_type")
            ).alias("store_id"),
            query_id_col(
                "netatmo", F.col("station_name"), F.col("module_name"), F.col("data_type")
            ).alias("query_id"),
        )

    # -- lookups (J1) ---------------------------------------------------
    def get_measurement(
        self, station_name: str, module_name: str, data_type: str
    ) -> DataFrame:
        """Resolve one measurement (reference domain.py:277-289 did a
        linear scan; here it's a filter on the measurements view)."""
        return self.measurements.where(
            (F.lower("station_name") == station_name.lower())
            & (F.lower("module_name") == module_name.lower())
            & (F.lower("data_type") == data_type.lower())
        )

    def attach_measurements(self, facts: DataFrame, on: list[str]) -> DataFrame:
        """Broadcast-join the measurements dim onto a fact table."""
        return facts.join(F.broadcast(self.measurements), on)
