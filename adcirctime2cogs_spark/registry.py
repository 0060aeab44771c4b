"""Central query/oracle registry.

Operator modules self-register into module-level QUERIES/ORACLES dicts;
this module merges them. Import order is the §2 build order. Modules
are imported lazily and defensively so one broken optional dependency
never takes down the whole registry.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_OPERATOR_MODULES = [
    "adcirctime2cogs_spark.operators.relational",
    "adcirctime2cogs_spark.operators.relational2",
    "adcirctime2cogs_spark.operators.udfs",
    "adcirctime2cogs_spark.operators.dedup",
    "adcirctime2cogs_spark.operators.similarity",
    "adcirctime2cogs_spark.operators.textstats",
    "adcirctime2cogs_spark.operators.dataprep",
    "adcirctime2cogs_spark.operators.multimodal",
    "adcirctime2cogs_spark.operators.eventwindows",
    "adcirctime2cogs_spark.plans.domain_queries",
    "adcirctime2cogs_spark.plans.synthetic_queries",
]


def _modules():
    for modname in _OPERATOR_MODULES:
        try:
            yield importlib.import_module(modname)
        except ImportError:
            continue


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _modules():
        dupes = out.keys() & mod.QUERIES.keys()
        if dupes:
            raise ValueError(f"duplicate query names in {mod.__name__}: {sorted(dupes)}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from adcirctime2cogs_spark.functions.numeric import expand_round_sql

    out: dict[str, str] = {}
    for mod in _modules():
        # round(X, 4) in oracle SQL is expanded to the engine-exact
        # floor form (see functions/numeric.py) — DuckDB's double
        # round() mis-rounds at half-boundaries.
        out.update({k: expand_round_sql(v) for k, v in mod.ORACLES.items()})
    return out
