"""COG sink (SURVEY O20): long raster table -> one Cloud-Optimized
GeoTIFF per timestep.

The reference writes COGs sequentially inside its timestep loop
(run/adcircTime2cogs.py:190-209, write_cog at :205-206 via
datacube+GDAL). Here the sink is `groupBy('ts').applyInPandas`: Spark
fans out ONE TASK PER TIMESTEP, each task pivots its long rows to a
dense 2-D array and writes its own file — embarrassingly parallel, and
GDAL never sees a shared file (SURVEY §7 "what's hard").

The default writer emits REAL tiled-deflate COGs through the pure
struct+zlib codec in sinks/geotiff.py (no GDAL needed); when rasterio
IS present its COG driver is preferred, and `write_cogs(...,
writer=...)` stays injectable for custom drivers.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from adcirctime2cogs_spark.plans.grid import GridSpec

# the reference's filename timestamp format (run/adcircTime2cogs.py:192)
TS_FMT = "%Y%m%dT%H%M%SZ"


def _geotransform(spec: GridSpec) -> list[float]:
    """GDAL-style affine: (ulx, xres, 0, uly, 0, -yres) — pixel edges,
    y descending like the reference grid (run/adcircTime2cogs.py:74-75)."""
    return [spec.ul_lon, spec.res, 0.0, spec.ul_lat, 0.0, -spec.res]


def _fallback_writer(
    fname: str, arr: np.ndarray, transform: list[float], crs: str
) -> None:
    """No-GDAL writer: a real tiled-deflate COG via the pure-Python
    codec (sinks/geotiff.py). Writes are ATOMIC (temp file +
    os.replace) so a speculative/retried task can never leave a
    half-written raster behind — the retry simply replaces it. The
    temp suffix deliberately does NOT end in .tif: a mosaic indexer
    globbing *.tif must never pick up an in-progress or orphaned temp
    (ADVICE r10)."""
    import uuid

    from adcirctime2cogs_spark.sinks.geotiff import write_geotiff

    tmp = f"{fname}.tif.tmp-{uuid.uuid4().hex[:8]}"
    write_geotiff(tmp, arr, transform, crs, nodata=float("nan"))
    os.replace(tmp, fname + ".tif")


def _rasterio_writer(
    fname: str, arr: np.ndarray, transform: list[float], crs: str
) -> None:
    """Same atomicity contract as _fallback_writer: write to a temp
    name that no *.tif glob matches, os.replace into place — a task
    killed mid-write by speculation/executor loss must never leave a
    truncated OR temp-named .tif for a mosaic indexer to pick up
    (review r10 + ADVICE r10)."""
    import uuid

    import rasterio
    from rasterio.transform import Affine

    t = Affine(transform[1], transform[2], transform[0],
               transform[4], transform[5], transform[3])
    tmp = f"{fname}.tif.tmp-{uuid.uuid4().hex[:8]}"
    with rasterio.open(
        tmp, "w", driver="COG", height=arr.shape[0],
        width=arr.shape[1], count=1, dtype="float64", crs=crs,
        transform=t, nodata=float("nan"), compress="deflate",
    ) as dst:
        dst.write(arr, 1)
    os.replace(tmp, fname + ".tif")


def _auto_writer(
    fname: str, arr: np.ndarray, transform: list[float], crs: str
) -> None:
    """Probe rasterio AT CALL TIME — the writer executes on executors,
    and a driver-side probe would bind the choice to the wrong
    environment when driver and executor images differ."""
    try:
        import rasterio  # noqa: F401
    except ImportError:
        _fallback_writer(fname, arr, transform, crs)
    else:
        _rasterio_writer(fname, arr, transform, crs)


def default_writer() -> Callable:
    return _auto_writer


def write_cogs(
    raster_long: DataFrame,
    spec: GridSpec,
    out_dir: str,
    prefix: str = "raster",
    crs: str = "EPSG:4326",
    writer: Callable | None = None,
) -> DataFrame:
    """Write one COG per distinct ts from the long regrid output
    (ts, grid_row, grid_col, value). Returns a manifest DataFrame
    (ts, path, n_cells) — an action the caller triggers.

    The groupBy ships each timestep's cells to one task; the pivot to a
    dense (nrows x ncols) array with NaN for masked cells happens
    task-side (the ONLY place the engine materializes a 2-D raster,
    exactly like the reference's create_xarray boundary,
    run/adcircTime2cogs.py:94-109).
    """
    os.makedirs(out_dir, exist_ok=True)
    nrows, ncols = spec.ny - 1, spec.nx - 1
    transform = _geotransform(spec)
    w = writer or default_writer()

    def write_one(pdf: pd.DataFrame) -> pd.DataFrame:
        # executor-side: out_dir must exist on the machine doing the
        # write (driver-side makedirs covers local mode only). On a
        # real cluster out_dir must be SHARED storage (NFS/Lustre —
        # the reference's HPC world) or an object-store mount; tasks
        # write their own files, never a shared one.
        os.makedirs(out_dir, exist_ok=True)
        ts = pdf["ts"].iloc[0]
        arr = np.full((nrows, ncols), np.nan, dtype="float64")
        arr[pdf["grid_row"].to_numpy(), pdf["grid_col"].to_numpy()] = (
            pdf["value"].to_numpy(dtype="float64")
        )
        label = (
            ts.strftime(TS_FMT)
            if hasattr(ts, "strftime")
            else str(ts).replace(" ", "T").replace(":", "") + "Z"
        )
        fname = os.path.join(out_dir, f"{prefix}.{label}")
        w(fname, arr, transform, crs)
        return pd.DataFrame(
            {"ts": [str(ts)], "path": [fname], "n_cells": [len(pdf)]}
        )

    return raster_long.groupBy("ts").applyInPandas(
        write_one, schema="ts string, path string, n_cells long"
    )
