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
    "adcirctime2cogs_spark.operators.tpch",
    "adcirctime2cogs_spark.operators.graphops",
]

# External harnesses verify only the FIRST 50 registry entries, so the
# emission order is part of the contract: the flagship domain queries,
# the full dedup/similarity family, one representative per LLM-pipeline
# module, and the core relational operators (including every previously
# red row, so its fix is externally verified) come first; redundant
# strategy variants and second scalar/array batches follow.
_PRIORITY = [
    # Round-4 rotation: external verification is the one signal the
    # repo can't manufacture, so 20 multi-round-verified entries were
    # swapped out for 20 oracled-but-never-driver-verified ones (plus
    # queries modified this round, which always stay in-window). The
    # full which-query-verified-in-which-round ledger is generated
    # into COVERAGE.md by tools/coverage_ledger.py; swapped-out
    # queries remain covered by the repo's own all-oracle parity
    # sweep (tests/test_oracle_parity.py).
    #
    # domain core (reference semantics: run/adcircTime2cogs.py:199-201)
    "micromesh_weights",
    "micromesh_regrid",
    "micromesh_domain_mask",
    "regrid_synthetic_bench",
    # dedup family (lsh_pairs retained: r04 bench-regression suspect)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh_pairs",
    "dedup_embedding_cosine",
    "dedup_components",
    "dedup_survivors",
    # similarity / vector family (bucketed retained: multi-table LSH
    # rewrite this round; covariance newly rotated in)
    "sim_topk_bruteforce",
    "sim_topk_bucketed",
    "sim_knn_join",
    "sim_topk_ivf",
    "vec_matryoshka_truncate",
    "vec_covariance_matrix",
    # text analysis
    "text_pii_redact",
    "text_bm25_topk",
    "text_quality",
    # dataset-prep (chunking + seeded shuffle are new this round;
    # decontaminate/quality_filter rotate out r03-verified;
    # source_cap is the new skew-safe per-domain cap)
    "prep_chunk_windows",
    "prep_seeded_shuffle",
    "prep_source_cap",
    # event/stream-twin + behavioral suite (funnel/retention/PIT/
    # sessionize/LOCF newly rotated in; feature_rollup new this round)
    "events_feature_rollup",
    "events_funnel",
    "events_retention_cohorts",
    "events_pit_enrich",
    "events_sessionize_gap",
    "events_gap_fill_locf",
    # UDF/UDTF surface
    "udaf_grouped_pandas",
    "udtf_expand_rows",
    # multimodal metadata (the one oracle-backed mm query)
    "mm_binary_meta",
    # relational core (q3 retained-in after its broadcast fix;
    # join_bucketed is new this round — co-located bucket join;
    # q1/join_star/agg_rollup/join_skew_salted/join_lateral_topk
    # rotate out after three green rounds each, replaced by four
    # queries from the new TPC-H suite — never externally verified)
    "join_asof_nearest",
    "join_bucketed",
    "tpch_q3_shipping_priority",
    "tpch_q18_large_volume",
    "tpch_q5_local_supplier",
    "tpch_q7_volume_shipping",
    "tpch_q10_returned_items",
    "tpch_q22_sales_opportunity",
    "agg_rfm_segmentation",
    "agg_heavy_hitters",
    "join_relational_division",
    "subquery_scalar_select",
    "json_variant_agg",
    "scd2_intervals",
    "agg_approx_quantiles",
    # iterative-graph + CDC + mining
    "graph_pagerank",
    "graph_triangle_count",
    "cdc_merge_apply",
    "cdc_rollup_refresh",
    "mining_basket_pairs",
]


def _modules():
    for modname in _OPERATOR_MODULES:
        try:
            yield importlib.import_module(modname)
        except ImportError as exc:
            # only a genuinely OPTIONAL third-party dependency may
            # drop a module; an ImportError rooted in this package,
            # pyspark, or the always-present libs is a bug that would
            # otherwise silently shrink the registry and the oracle
            # sweep's coverage
            root = (exc.name or "").split(".")[0]
            if root in {
                "adcirctime2cogs_spark", "pyspark", "pandas", "numpy", ""
            }:
                raise
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
        dupes = out.keys() & mod.ORACLES.keys()
        if dupes:
            raise ValueError(
                f"duplicate oracle names in {mod.__name__}: {sorted(dupes)}"
            )
        # round(X, 4) in oracle SQL is expanded to the engine-exact
        # floor form (see functions/numeric.py) — DuckDB's double
        # round() mis-rounds at half-boundaries.
        out.update({k: expand_round_sql(v) for k, v in mod.ORACLES.items()})
    return out
