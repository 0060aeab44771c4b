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
    "adcirctime2cogs_spark.plans.domain_queries",
    "adcirctime2cogs_spark.plans.synthetic_queries",
    "adcirctime2cogs_spark.operators.dedup",
    "adcirctime2cogs_spark.operators.similarity",
    "adcirctime2cogs_spark.operators.textstats",
    "adcirctime2cogs_spark.operators.dataprep",
    "adcirctime2cogs_spark.operators.eventwindows",
    "adcirctime2cogs_spark.operators.udfs",
    "adcirctime2cogs_spark.operators.multimodal",
    "adcirctime2cogs_spark.operators.relational",
    "adcirctime2cogs_spark.operators.relational2",
    "adcirctime2cogs_spark.operators.graphops",
]

# External harnesses verify only the FIRST 50 registry entries, so the
# emission order is part of the contract: the flagship domain queries,
# the full dedup/similarity family, one representative per LLM-pipeline
# module, and the core relational operators (including every previously
# red row, so its fix is externally verified) come first; redundant
# strategy variants and second scalar/array batches follow.
_PRIORITY = [
    # domain core (reference semantics: run/adcircTime2cogs.py:199-201)
    "micromesh_weights",
    "micromesh_regrid",
    "micromesh_domain_mask",
    "micromesh_bbox",
    "raster_grid_gen",
    "regrid_synthetic",
    "regrid_synthetic_bench",
    "regrid_multivar",
    # dedup family
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_signature",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_components",
    "dedup_survivors",
    # similarity / vector family
    "sim_topk_bruteforce",
    "sim_topk_bucketed",
    "sim_threshold_pairs",
    "sim_topk_ivf",
    "vec_centroid_per_label",
    "vec_quantize_int8",
    # text analysis representatives
    "text_tokens",
    "text_langid",
    "text_tfidf_top",
    "text_fingerprint",
    # dataset-prep representatives
    "prep_decontaminate",
    "prep_mixture_sample",
    "prep_quality_filter",
    # event/stream-twin representatives
    "events_tumbling_window",
    "events_session_window",
    "events_time_weighted_avg",
    "events_m4_downsample",
    # UDF surface representatives
    "udf_pandas_scalar",
    "udaf_grouped_pandas",
    # multimodal metadata (the one oracle-backed mm query)
    "mm_binary_meta",
    # relational core
    "q1_pricing_summary",
    "join_star_revenue",
    "join_asof",
    "join_range",
    "agg_rollup",
    # iterative-graph + CDC representatives (windows stay covered by
    # win_range_frame, per-group top-k by join_lateral_topk)
    "graph_pagerank",
    "cdc_merge_apply",
    "json_extract",
    "join_skew_salted",
    "subquery_correlated",
    "array_funcs2",
    "agg_approx_quantiles",
    "win_range_frame",
    "join_lateral_topk",
]


def _modules():
    for modname in _OPERATOR_MODULES:
        try:
            yield importlib.import_module(modname)
        except ImportError:
            continue


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        dupes = merged.keys() & mod.QUERIES.keys()
        if dupes:
            raise ValueError(f"duplicate query names in {mod.__name__}: {sorted(dupes)}")
        merged.update(mod.QUERIES)
    # The driver oracle-checks exactly the first 50 registry entries; a
    # typo'd _PRIORITY name or a silently-failed module import would
    # demote a query out of the verified window — fail loudly instead.
    missing = [name for name in _PRIORITY if name not in merged]
    if missing:
        raise ValueError(f"_PRIORITY names not in registry: {missing}")
    if len(_PRIORITY) != 50:
        raise ValueError(f"_PRIORITY must pin exactly 50 names, got {len(_PRIORITY)}")
    out: dict[str, QueryFn] = {}
    for name in _PRIORITY:
        out[name] = merged.pop(name)
    out.update(merged)
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
