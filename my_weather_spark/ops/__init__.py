from my_weather_spark.ops import scalars, timeseries

__all__ = ["scalars", "timeseries"]
