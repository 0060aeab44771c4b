"""Spatial data-layout functions: Morton (Z-order) keys for
locality-preserving writes.

The reference's mesh is delivered in file order (node index order,
run/utilities/adcirc_utilities.py grid extraction) — spatially random,
so a bbox query (SURVEY O7) over parquet written that way reads every
row group. Sorting the write by an interleaved-bit key clusters
spatially-near nodes into the same row groups, and parquet min/max
stats on lon/lat then prune 2-D range scans — the standard Z-order
layout trick (Delta/Iceberg OPTIMIZE ZORDER), built here from plain
codegen-friendly column expressions (shifts and masks, no UDF).

Why it works: the Morton curve maps 2-D proximity to 1-D proximity, so
each row group covers a small spatial tile; a bbox predicate overlaps
few tiles and the scan skips the rest on stats alone. At 100 TB this is
the difference between a coastal-subset query reading gigabytes or the
whole mesh.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16  # per-dimension quantization (32-bit interleaved key)


def _spread_bits(x: Column) -> Column:
    """Spread a 16-bit int's bits to the even positions of a 32-bit
    lane (the classic mask-shift cascade, all int64 arithmetic)."""
    x = x.bitwiseOR(F.shiftleft(x, 8)).bitwiseAND(F.lit(0x00FF00FF))
    x = x.bitwiseOR(F.shiftleft(x, 4)).bitwiseAND(F.lit(0x0F0F0F0F))
    x = x.bitwiseOR(F.shiftleft(x, 2)).bitwiseAND(F.lit(0x33333333))
    x = x.bitwiseOR(F.shiftleft(x, 1)).bitwiseAND(F.lit(0x55555555))
    return x


def _quantize(c: Column, lo: float, hi: float) -> Column:
    """Clamp + scale a coordinate into [0, 2^BITS)."""
    unit = F.least(
        F.greatest((c - F.lit(lo)) / F.lit(hi - lo), F.lit(0.0)), F.lit(1.0)
    )
    return F.floor(unit * F.lit((1 << BITS) - 1)).cast("long")


def zorder_key(
    lon: Column, lat: Column, bbox: tuple[float, float, float, float]
) -> Column:
    """Morton key interleaving quantized (lon, lat) bits.

    bbox = (min_lon, min_lat, max_lon, max_lat) — the domain extent
    (micromesh_bbox computes it in one aggregate). Deterministic,
    stateless, pure codegen."""
    min_lon, min_lat, max_lon, max_lat = bbox
    qx = _spread_bits(_quantize(lon, min_lon, max_lon))
    qy = _spread_bits(_quantize(lat, min_lat, max_lat))
    return qx.bitwiseOR(F.shiftleft(qy, 1)).alias("zkey")


def write_zordered(
    df,
    out_path: str,
    bbox: tuple[float, float, float, float],
    n_files: int = 8,
    lon_col: str = "lon",
    lat_col: str = "lat",
    row_group_bytes: int | None = None,
) -> None:
    """Write a point table Z-order-clustered: range-partition + sort by
    the Morton key, drop the key before writing (it's a layout device,
    not data). row_group_bytes tightens parquet row groups so stats
    pruning has granularity to work with in small fixtures; leave None
    for the production default."""
    keyed = df.withColumn("zkey", zorder_key(F.col(lon_col), F.col(lat_col), bbox))
    writer = (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
    )
    if row_group_bytes is not None:
        writer = writer.option("parquet.block.size", str(row_group_bytes))
    writer.parquet(out_path)
