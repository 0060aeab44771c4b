#!/usr/bin/env python
"""Capture .explain("formatted") for a named set of registered queries
into plans/<outdir>/<query>_<tag>.txt — the optimization round's
before/after plan evidence (spark_optimization_guide §1 / §7.2).

Usage: python tools/capture_plans.py <outdir> <tag> [query ...]
Defaults to the bench HEADLINE + TRACKED sets when no queries given.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from adcirctime2cogs_spark import registry
from adcirctime2cogs_spark.session import get_spark


def main() -> None:
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    if not names:
        import bench

        names = bench.HEADLINE + bench.TRACKED
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="plan_capture")
    queries = registry.all_queries()
    for name in names:
        df = queries[name](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n")
            f.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
