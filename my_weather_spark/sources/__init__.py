from my_weather_spark.sources.base import SourceAdapter
from my_weather_spark.sources.heartbeat import HeartbeatAdapter
from my_weather_spark.sources.mock import MockAdapter
from my_weather_spark.sources.file_source import ChunkedFileAdapter
from my_weather_spark.sources.rate_limiter import RateLimiter, rate_limited

__all__ = [
    "SourceAdapter",
    "HeartbeatAdapter",
    "MockAdapter",
    "ChunkedFileAdapter",
    "RateLimiter",
    "rate_limited",
]
