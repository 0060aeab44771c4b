"""Point-in-triangle location + barycentric weights as a spatial bin
join (SURVEY O13-O15 — the one genuinely custom operator).

The reference hides point location inside matplotlib/scipy C
interpolators rebuilt per run (run/adcircTime2cogs.py:170-183,
199-200); because the mesh connectivity is *given*
(run/adcircTime2cogs.py:164-168), no Delaunay/Qhull is needed — point
location is a join between raster centroids and the given triangles:

1. key both sides by a spatial bin: cells by floor(cx/bin), floor(cy/bin);
   triangles exploded to every bin their bbox overlaps (sequence+explode);
2. equi-join on (bx, by) — a plain shuffle join Catalyst handles at any
   scale (no O(cells x triangles) cross join);
3. filter by the barycentric sign test, compute the 3 weights in column
   arithmetic (whole-stage codegen, no UDF);
4. dedupe boundary cells that land in two triangles (min elem_id — the
   shared-edge value is identical either way, determinism is what
   matters).

The result is the static `weights(cell_id, grid_row, grid_col, elem_id,
n0, n1, n2, w0, w1, w2)` table, computed ONCE per mesh+grid and reused
for every timestep and variable (the reference rebuilds its
interpolator per timestep, run/adcircTime2cogs.py:199 — hoisting this
is our biggest structural win, SURVEY P6). Cells absent from `weights`
are outside the mesh domain: the reference's ones-interpolation mask
(run/adcircTime2cogs.py:178-185) falls out as a left-anti join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Sign-test tolerance: points exactly on a shared edge belong to both
# triangles (deduped below); slight negative slack keeps hull-edge
# centroids that fp arithmetic would otherwise drop.
EPS = 1e-12


def triangles_with_coords(nodes: DataFrame, elements: DataFrame) -> DataFrame:
    """Join connectivity to node coordinates: one row per triangle with
    its 3 vertices ((x0,y0),(x1,y1),(x2,y2)).

    Nodes are broadcast when small; at HSOFS scale (~1.8M nodes /
    ~3.6M elements) Catalyst picks shuffle joins on node_id — still one
    static pass.
    """
    n = nodes.select("node_id", "lon", "lat")

    def v(i: int) -> DataFrame:
        return n.select(
            F.col("node_id").alias(f"n{i}"),
            F.col("lon").alias(f"x{i}"),
            F.col("lat").alias(f"y{i}"),
        )

    return (
        elements.join(v(0), "n0")
        .join(v(1), "n1")
        .join(v(2), "n2")
        .select("elem_id", "n0", "n1", "n2", "x0", "y0", "x1", "y1", "x2", "y2")
    )


def _binned_triangles(tris: DataFrame, bin_size: float) -> DataFrame:
    """Explode each triangle to all (bx, by) bins its bbox overlaps."""
    xmin = F.least("x0", "x1", "x2")
    xmax = F.greatest("x0", "x1", "x2")
    ymin = F.least("y0", "y1", "y2")
    ymax = F.greatest("y0", "y1", "y2")
    bxs = F.sequence(
        F.floor(xmin / bin_size).cast("long"), F.floor(xmax / bin_size).cast("long")
    )
    bys = F.sequence(
        F.floor(ymin / bin_size).cast("long"), F.floor(ymax / bin_size).cast("long")
    )
    return tris.withColumn("bx", F.explode(bxs)).withColumn("by", F.explode(bys))


def build_weights(
    cells: DataFrame, nodes: DataFrame, elements: DataFrame, bin_size: float
) -> DataFrame:
    """The static weights table: for each raster centroid inside the
    mesh, its containing triangle and barycentric weights.

    bin_size should be ~the typical triangle diameter: small enough
    that a bin meets few triangles, large enough that a triangle spans
    few bins (reference mesh ~1km elements on a 0.005 deg grid → a few
    x res). The join is a plain equi-join on (bx, by); AQE's skew-join
    splitting covers coastal bins that are triangle-dense.
    """
    tris = _binned_triangles(triangles_with_coords(nodes, elements), bin_size)
    binned_cells = cells.withColumn(
        "bx", F.floor(F.col("cx") / bin_size).cast("long")
    ).withColumn("by", F.floor(F.col("cy") / bin_size).cast("long"))

    j = binned_cells.join(tris, ["bx", "by"])

    det = (F.col("y1") - F.col("y2")) * (F.col("x0") - F.col("x2")) + (
        F.col("x2") - F.col("x1")
    ) * (F.col("y0") - F.col("y2"))
    # degenerate (zero-area / sliver) triangles: det == 0 makes every
    # weight inf/NaN — drop them before the division so a broken mesh
    # element can never claim a cell (real meshes do contain slivers)
    j = j.filter(det != 0)
    w0 = (
        (F.col("y1") - F.col("y2")) * (F.col("cx") - F.col("x2"))
        + (F.col("x2") - F.col("x1")) * (F.col("cy") - F.col("y2"))
    ) / det
    w1 = (
        (F.col("y2") - F.col("y0")) * (F.col("cx") - F.col("x2"))
        + (F.col("x0") - F.col("x2")) * (F.col("cy") - F.col("y2"))
    ) / det

    candidates = (
        j.withColumn("w0", w0)
        .withColumn("w1", w1)
        .withColumn("w2", 1 - F.col("w0") - F.col("w1"))
        .filter(
            (F.col("w0") >= -EPS) & (F.col("w1") >= -EPS) & (F.col("w2") >= -EPS)
        )
    )

    # boundary centroids on a shared edge match both adjacent triangles;
    # keep the lowest elem_id for a deterministic single row per cell.
    # min_by hash-agg, not a row_number window: partial aggregation
    # collapses duplicates map-side and no sort is ever materialized —
    # at the reference's 70M-cell raster that's the difference between
    # shuffling candidate rows and shuffling one row per cell.
    # PER-COLUMN min_by, not min_by(struct, ...): a struct agg buffer
    # is not hash-agg mutable and regresses the whole aggregate to
    # SortAggregate (two per-task sorts of the candidate rows); seven
    # primitive-buffer aggregates stay HashAggregate in whole-stage
    # codegen. elem_id is unique per candidate row within a cell, so
    # the per-column picks are mutually consistent by construction.
    return (
        candidates.groupBy("cell_id", "grid_row", "grid_col")
        .agg(
            F.min("elem_id").alias("elem_id"),
            *[
                F.min_by(c, "elem_id").alias(c)
                for c in ("n0", "n1", "n2", "w0", "w1", "w2")
            ],
        )
        .select(
            "cell_id", "grid_row", "grid_col", "elem_id",
            "n0", "n1", "n2", "w0", "w1", "w2",
        )
    )


def domain_mask(cells: DataFrame, weights: DataFrame) -> DataFrame:
    """Out-of-domain cells = cells with no containing triangle
    (reference ones-mask, run/adcircTime2cogs.py:178-185 → anti-join)."""
    return cells.join(weights.select("cell_id"), "cell_id", "left_anti")
