"""Per-timestep linear regrid: weights x timeseries -> raster values
(SURVEY O16-O17).

The reference loops timesteps sequentially, rebuilding a scipy
interpolator each iteration (run/adcircTime2cogs.py:190-209). Here ALL
timesteps regrid in one set-oriented plan:

    weights (static, cached)     timeseries (long: ts, node_id, value)
        |  explode to (cell, node, w)     |
        +-------- shuffle join on node_id +
                       |
        groupBy(ts, cell) -> sum(w * value)   [partial+final agg]

One shuffle keyed on node_id, one on (ts, cell_id); Spark parallelizes
across the full ts x cell space where the reference is sequential per
timestep (SURVEY P9). Dry-node semantics: a null node value nulls the
whole cell (the reference's masked-array NaN propagation,
run/utilities/adcirc_utilities.py:30) — enforced by counting non-null
contributions per cell against the expected 3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_weights(weights: DataFrame) -> DataFrame:
    """(cell, n0..n2, w0..w2) -> 3 rows (cell_id, grid_row, grid_col,
    node_id, w). inline stack: no shuffle, stays in codegen."""
    return weights.selectExpr(
        "cell_id",
        "grid_row",
        "grid_col",
        "stack(3, n0, w0, n1, w1, n2, w2) AS (node_id, w)",
    )


def regrid(
    weights: DataFrame, timeseries: DataFrame, broadcast_ts: bool = False
) -> DataFrame:
    """All-timestep regrid -> long raster table
    (ts, cell_id, grid_row, grid_col, value).

    value is null when any of the cell's 3 nodes is null at that ts
    (dry element). Out-of-domain cells simply don't appear (mask ==
    anti-join semantics; pivot to dense 2-D only inside the COG sink).

    broadcast_ts=True ships the node values to the weights instead of
    shuffling the (3 x n_cells) exploded weights on node_id — measured
    ~3x on the bench workload. Correct whenever the timeseries slice
    fits executor memory: one HSOFS timestep is ~14.5 MB packed
    (BASELINE.md), so per-variable forecasts broadcast comfortably;
    unbounded ts ranges should keep the default shuffle join (AQE still
    picks broadcast on its own when stats allow).
    """
    return regrid_multi(weights, timeseries, ["value"], broadcast_ts)


def regrid_multi(
    weights: DataFrame,
    timeseries: DataFrame,
    value_cols: list[str],
    broadcast_ts: bool = False,
) -> DataFrame:
    """Regrid N variables in ONE join + ONE aggregation pass.

    The reference runs its whole pipeline once per variable (the CLI
    takes a single inputVariable, run/adcircTime2cogs.py:266); here
    extra variables are extra sum(w*v) aggregates on the same shuffle —
    the join and groupBy cost is paid once however many variables ride
    along. Per-variable null semantics match regrid(): a variable nulls
    a cell only where ITS node values are null at that ts.
    """
    flat = explode_weights(weights)
    ts_side = F.broadcast(timeseries) if broadcast_ts else timeseries
    joined = flat.join(ts_side, "node_id")
    return aggregate_cells(joined, value_cols)


def aggregate_cells(joined: DataFrame, value_cols: list[str]) -> DataFrame:
    """The shared (ts, cell) aggregation over exploded-weights ⋈
    timeseries rows — ONE implementation for regrid, regrid_multi and
    the streaming regrid, so the null-mask semantics cannot drift.

    A cell publishes a variable's value only when it received EXACTLY
    the expected 3 non-null contributions (one per triangle vertex).
    Comparing to the literal 3 — not to the joined row count — is
    load-bearing: a node row MISSING from the timeseries at some ts
    drops both counts together, so an equality between them would
    publish a silently wrong partial sum (w0*v0 + w1*v1 with the
    w2*v2 term gone); duplicate (ts, node) rows likewise over-count
    both sides. Against the literal 3, missing rows, dry (null)
    nodes, and duplicates all surface as null, never as a wrong
    number."""
    aggs = []
    for c in value_cols:
        aggs.append(F.sum(F.col("w") * F.col(c)).alias(f"_sum_{c}"))
        aggs.append(F.count(c).alias(f"_nv_{c}"))
    out = joined.groupBy("ts", "cell_id", "grid_row", "grid_col").agg(*aggs)
    return out.select(
        "ts",
        "cell_id",
        "grid_row",
        "grid_col",
        *[
            F.when(F.col(f"_nv_{c}") == 3, F.col(f"_sum_{c}")).alias(c)
            for c in value_cols
        ],
    )
