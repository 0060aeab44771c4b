"""Driver contract for the spark-graft builder (PySpark target).

Assembles the engine's query registry from adcirctime2cogs_spark
operator modules. Each ``queries()`` entry is a (spark, sf_dir) ->
DataFrame callable; ``oracle_sql()`` holds the DuckDB-equivalent SQL
(omitted for ops whose values are engine-specific, e.g. HLL sketches —
those get the driver's rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary: scan -> filter -> partial+final
    hash aggregate — the spine of SURVEY.md §2A's dataflow.
    """
    from adcirctime2cogs_spark.operators.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from adcirctime2cogs_spark import registry

    return dict(registry.all_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query key (subset: rows-only
    checks for sketch/stream ops are intentionally omitted)."""
    from adcirctime2cogs_spark import registry

    return dict(registry.all_oracles())
