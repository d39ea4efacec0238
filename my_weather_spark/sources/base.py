"""Source adapter protocol (SURVEY.md §2 X1/X2).

The reference plugs Python repositories into its server via abstract
``DataCollectionRepository`` (read_callback/find_callback, registered
by URL scheme — reference: weather/interfaces/
data_collection_repository.py:11-47, dtss_host.py:122-130).

The Spark-native twin: an adapter receives the batched list of series
refs for its scheme plus the period (manual predicate pushdown — the
same pushdown the reference does by passing date_begin/date_end to the
API) and returns ONE long-format DataFrame covering all of them.
Batching per scheme is the engine's shared-scan optimization
(reference: dtss_host.py:218-223).
"""

from __future__ import annotations

import abc

from pyspark.sql import DataFrame, SparkSession

from my_weather_spark.model import SeriesRef, UtcPeriod


class SourceAdapter(abc.ABC):
    """One backend, identified by URL scheme."""

    #: URL scheme this adapter serves (the registry key).
    scheme: str

    @abc.abstractmethod
    def read(
        self, spark: SparkSession, refs: list[SeriesRef], period: UtcPeriod
    ) -> DataFrame:
        """Return (series_id, ts, value) rows for all refs, restricted
        to the inclusive period. Must include a row set for every ref
        (possibly empty)."""

    @abc.abstractmethod
    def find(self, spark: SparkSession, query: SeriesRef) -> DataFrame:
        """Metadata search: TsInfo-shaped rows matching the query
        (reference find_callback: repository.py:279-306)."""

    def healthy(self, spark: SparkSession) -> bool:
        """Liveness probe (reference heartbeat: heartbeat.py:122-130);
        default: a trivial find round-trip must not raise."""
        try:
            self.find(spark, SeriesRef.parse(f"{self.scheme}://heartbeat"))
            return True
        except Exception:
            return False
