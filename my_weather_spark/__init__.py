"""my_weather_spark — a PySpark-native timeseries analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference weather platform (tobiasli/my_weather):
named-timeseries evaluation routed by URL scheme, a merge-on-write
parquet store, source adapters with chunked/paginated rate-limited
reads, point-interpretation-aware timeseries operators, scheduled
incremental collection pipelines — plus LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) designed
DataFrame-first for 100 TB scale.

Everything is built on the public Apache Spark DataFrame/SQL API; the
logical plan is declared declaratively and Catalyst/Tungsten/AQE pick
the physical strategy.
"""

from my_weather_spark.session import get_spark, EngineSession
from my_weather_spark.model import (
    OBSERVATION_SCHEMA,
    SeriesRef,
    UtcPeriod,
    POINT_INSTANT_VALUE,
    POINT_AVERAGE_VALUE,
)
from my_weather_spark.store import TsStore
from my_weather_spark.evaluate import TsEngine
from my_weather_spark.domain import Domain

__all__ = [
    "get_spark",
    "EngineSession",
    "OBSERVATION_SCHEMA",
    "SeriesRef",
    "UtcPeriod",
    "POINT_INSTANT_VALUE",
    "POINT_AVERAGE_VALUE",
    "TsStore",
    "TsEngine",
    "Domain",
]

__version__ = "0.1.0"
