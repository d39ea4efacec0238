"""Dashboard analytics: the data frames behind the reference's visual
clients, Spark-first.

The reference's Bokeh dashboards do the actual analytics client-side:
fetch a trailing period, compute min/max/last for tiles, expand
staircase/instant geometry, downsample long histories, format tile
text and color bands (reference: weather/visual/dashboard_data.py,
static_plot.py, dtss_serve_test.py:86-351). Here each of those
becomes a DataFrame the rendering layer merely draws.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from my_weather_spark.evaluate import TsEngine
from my_weather_spark.model import POINT_INSTANT_VALUE, UtcPeriod
from my_weather_spark.ops import timeseries as ts_ops
from my_weather_spark.ops.scalars import threshold_bins

# Reference color bands: temperature sign band; CO2 600/1000 bands
# (dtss_serve_test.py:289-301).
DEFAULT_BANDS: dict[str, tuple[list[float], list[str]]] = {
    "temperature": ([0.0], ["blue", "red"]),
    "co2": ([600.0, 1000.0], ["green", "yellow", "red"]),
}


def current_conditions(
    engine: TsEngine,
    series_ids: list[str],
    period: UtcPeriod,
    unit_by_series: dict[str, str] | None = None,
    bands: dict[str, tuple[list[float], list[str]]] | None = None,
) -> DataFrame:
    """Tile frame: one row per series with min/max/last, formatted tile
    text, and the color band of the latest value."""
    data = engine.evaluate(series_ids, period)
    stats = ts_ops.series_stats(
        data.select("series_id", "ts", "value")
    )
    # tile text carries the series' unit (reference: f'{v:0.2f} °C').
    # Map-literal lookup, not a per-entry CASE chain: hundreds of units
    # would nest the CASE hundreds deep (superlinear analysis time and
    # a codegen-size risk); element_at on a literal map is constant
    # depth. format_string matches the reference's f-format exactly —
    # format_number would add thousands separators it never prints.
    units = unit_by_series or {}
    if units:
        pairs = [x for sid in sorted(units) for x in (F.lit(sid), F.lit(" " + units[sid]))]
        unit = F.coalesce(
            F.element_at(F.create_map(*pairs), F.col("series_id")), F.lit("")
        )
    else:
        unit = F.lit("")
    out = stats.withColumn(
        "tile_text", F.concat(F.format_string("%.2f", "last_value"), unit)
    )
    bands = bands if bands is not None else DEFAULT_BANDS
    color = F.lit("default")
    for key, (thresholds, labels) in bands.items():
        color = F.when(
            F.col("series_id").contains(key),
            threshold_bins("last_value", thresholds, labels),
        ).otherwise(color)
    return out.withColumn("color", color)


def history_plot_frame(
    engine: TsEngine,
    series_ids: list[str],
    period: UtcPeriod,
    point_fx: str = POINT_INSTANT_VALUE,
    max_points: int | None = 200,
    use_rdp: bool = False,
) -> DataFrame:
    """Plot-geometry frame: per-series (ts, value) ready to draw —
    interpretation-expanded (staircase corners for AVERAGE), then
    downsampled (bucketed mean, or RDP when shape fidelity matters)."""
    data = engine.evaluate(series_ids, period).select("series_id", "ts", "value")
    geom = ts_ops.interpretation_expand(data, point_fx)
    if max_points:
        if use_rdp:
            geom = ts_ops.rdp_downsample(geom)
            # RDP's epsilon heuristic bounds shape error, not point
            # count — a noisy series can come back with thousands of
            # points. Honor the caller's max_points bound with an
            # even-stride thin over what RDP kept (endpoints retained).
            w = W.partitionBy("series_id").orderBy("ts")
            geom = (
                geom.withColumn("_rn", F.row_number().over(w) - 1)
                .withColumn("_n", F.count(F.lit(1)).over(W.partitionBy("series_id")))
                .withColumn("_stride", F.ceil(F.col("_n") / max_points))
                .where(
                    (F.col("_rn") % F.col("_stride") == 0)
                    | (F.col("_rn") == F.col("_n") - 1)
                )
                .drop("_rn", "_n", "_stride")
            )
        else:
            geom = ts_ops.bucket_downsample(geom, max_points, period)
    return geom.withColumn("plot_ms", F.unix_micros("ts") / 1000.0)


def refreshing_tail(
    engine: TsEngine,
    series_ids: list[str],
    period: UtcPeriod,
    keep_last: int = 100,
) -> DataFrame:
    """The dashboard's bounded streaming history: last-k points per
    series (reference Bokeh stream(new, 100), dashboard_test.py:81)."""
    data = engine.evaluate(series_ids, period).select("series_id", "ts", "value")
    return ts_ops.last_k_points(data, keep_last)
