"""Reproduce the README "Scale validation" numbers on this machine.

Runs the HSOFS-class synthetic workloads (plans/synthetic.py) at the
two README configurations and checks linear-field exactness cell by
cell — regrid output for a linear field must equal the field at the
centroid wherever the cell is in-domain, at ANY scale:

  1. broadcast path: 1,000,000-node mesh (1001^2? no — n=1000 ->
     1,000,000 nodes, 1,996,002 triangles), 1,000,000-cell raster
     (grid_n=1001), 2 timesteps;
  2. shuffle path: same mesh, 501^2-cell raster, 50 timesteps
     (50M-row value table — above the broadcast cutoff).

Usage:  python tools/scale_check.py [--quick]

--quick runs n=300/grid 301/5 ts (~seconds) for smoke use in CI.
Prints one JSON line per leg: {leg, n_nodes, n_cells_out, wall_sec,
violations}. violations MUST be 0.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def run_leg(spark, leg: str, n: int, grid_n: int, n_ts: int) -> dict:
    from adcirctime2cogs_spark.plans.synthetic import synth_grid, synth_regrid

    spec = synth_grid(grid_n)
    t0 = time.time()
    out = synth_regrid(spark, n, grid_n, n_ts, bin_size=4.0 / (grid_n - 1))
    # analytic check distributed — never collect the raster
    cx = spec.ul_lon + (F.col("grid_col") + 0.5) * spec.res
    cy = spec.ul_lat - (F.col("grid_row") + 0.5) * spec.res
    k = F.substring("ts", 2, 8).cast("int")
    expect = 4.0 * cx - 7.0 * cy + 2.0 + k
    stats = out.agg(
        F.count("*").alias("cells"),
        F.sum(
            (F.abs(F.col("value") - expect) > 1e-9).cast("long")
        ).alias("viol"),
    ).first()
    return {
        "leg": leg,
        "n_nodes": n * n,
        "n_ts": n_ts,
        "n_cells_out": stats.cells,
        "violations": int(stats.viol or 0),
        "wall_sec": round(time.time() - t0, 2),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    from adcirctime2cogs_spark.session import get_spark

    spark = get_spark(app_name="scale_check")
    legs = (
        [("quick", 300, 301, 5)]
        if args.quick
        else [("broadcast_1M", 1000, 1001, 2), ("shuffle_50ts", 1000, 501, 50)]
    )
    rc = 0
    for leg, n, grid_n, n_ts in legs:
        res = run_leg(spark, leg, n, grid_n, n_ts)
        print(json.dumps(res))
        if res["violations"]:
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
