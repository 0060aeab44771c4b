"""Raster grid generation + mesh bounding box (SURVEY O7, O11).

The reference builds the target raster with dask.array aranges +
meshgrids and takes *cell centroids* for interpolation
(run/adcircTime2cogs.py:49-92: aranges at :74-75, centroid midpoints
(x[1:]+x[:-1])/2 at :79-81, y descending at :75). Here the raster is a
generated dimension table: spark.range(nrows) x spark.range(ncols) with
closed-form centroid arithmetic — no window, no shuffle; Spark splits
the range across tasks so a 70M-cell grid (the reference's production
8837x7999) parallelizes for free.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class GridSpec:
    """Target raster spec (reference `targetgrid`,
    run/adcircTime2cogs.py:151-158): upper-left origin, square cells,
    x ascending / y descending like the reference's aranges."""

    ul_lon: float
    ul_lat: float
    res: float
    nx: int  # edge count in x (centroid cells = nx - 1)
    ny: int  # edge count in y


def bounding_box(nodes: DataFrame) -> dict[str, float]:
    """min/max/mean aggregates sizing the grid (reference
    run/adcircTime2cogs.py:155-158 + mean at adcirc_dask_utilities.py:20).

    One partial+final hash aggregate over the node table; returns a tiny
    driver-side dict (grid params are job config, not data).
    """
    row = nodes.agg(
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
        F.min("lat").alias("lat_min"),
        F.max("lat").alias("lat_max"),
        F.avg("lat").alias("lat_mean"),
    ).collect()[0]
    return row.asDict()


def grid_spec_from_bbox(bbox: dict[str, float], res: float) -> GridSpec:
    """Size the edge grid to cover the bbox at `res` (the reference
    hardcodes nx/ny for the production mesh; we derive them)."""
    import math

    nx = int(math.ceil((bbox["lon_max"] - bbox["lon_min"]) / res)) + 1
    ny = int(math.ceil((bbox["lat_max"] - bbox["lat_min"]) / res)) + 1
    return GridSpec(ul_lon=bbox["lon_min"], ul_lat=bbox["lat_max"], res=res, nx=nx, ny=ny)


def raster_cells(spark: SparkSession, spec: GridSpec) -> DataFrame:
    """Generate the centroid-cell dimension table
    (cell_id, grid_row, grid_col, cx, cy).

    cx/cy are pixel centers: ul + (idx + 0.5) * res, y descending —
    exactly the reference's midpoint vectors xm/ym
    (run/adcircTime2cogs.py:79-81). cell_id = row-major index.
    """
    ncols = spec.nx - 1
    nrows = spec.ny - 1
    rows = spark.range(nrows).select(F.col("id").alias("grid_row"))
    cols = spark.range(ncols).select(F.col("id").alias("grid_col"))
    return rows.crossJoin(cols).select(
        (F.col("grid_row") * ncols + F.col("grid_col")).alias("cell_id"),
        "grid_row",
        "grid_col",
        (F.lit(spec.ul_lon) + (F.col("grid_col") + 0.5) * spec.res).alias("cx"),
        (F.lit(spec.ul_lat) - (F.col("grid_row") + 0.5) * spec.res).alias("cy"),
    )
