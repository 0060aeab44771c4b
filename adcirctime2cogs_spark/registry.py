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
    "adcirctime2cogs_spark.streaming.parity",
]

# External harnesses verify only the FIRST 50 registry entries, so the
# emission order is part of the contract: the flagship domain queries,
# the full dedup/similarity family, one representative per LLM-pipeline
# module, and the core relational operators (including every previously
# red row, so its fix is externally verified) come first; redundant
# strategy variants and second scalar/array batches follow.
_PRIORITY = [
    # Round-5 rotation: r04's 29 freshly-verified survivors rotate out
    # (they stay covered by tests/test_oracle_parity.py's all-oracle
    # sweep) in favor of (a) the 5 r04 RED rows — numerically proven
    # identical, red only on the DuckDB-HUGEINT-vs-Spark-BIGINT hash
    # artifact, oracles now CAST ... AS BIGINT and gated by
    # test_oracle_no_exotic_types — which MUST stay in-window until the
    # driver re-verifies them green; (b) every remaining
    # oracled-but-never-driver-verified query (31); (c) the three new
    # oracle-backed streaming parity rows; (d) the seven TPC-H
    # queries completed this round (22/22 suite) — new queries have
    # NO external signal yet, which outranks refreshing stale r01
    # greens. Ledger in COVERAGE.md.
    #
    # domain core (reference semantics: run/adcircTime2cogs.py:199-201)
    "micromesh_weights",
    "micromesh_regrid",
    "micromesh_domain_mask",
    "regrid_synthetic_bench",
    # r04 red rows, oracle type fixed this round — keep until green
    "events_feature_rollup",
    "events_sessionize_gap",
    "tpch_q22_sales_opportunity",
    "json_variant_agg",
    "cdc_rollup_refresh",
    # new this round: REAL Structured Streaming run, externally hashed
    # against the batch sessionize oracle (stream == batch contract)
    "stream_session_flush",
    # TPC-H tail — never externally verified
    "tpch_q4_order_priority",
    "tpch_q6_revenue_forecast",
    "tpch_q12_late_shipments",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_effect",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_disjunctive_pred",
    # dedup tail — never externally verified
    "dedup_corpus_emit",
    "dedup_containment_pairs",
    # text tail — never externally verified
    "text_profile",
    "text_blocked_editdist",
    "text_train_test_split",
    "text_pack_sequences",
    "text_unigram_logprob",
    "text_bpe_pair_counts",
    # prep tail — never externally verified
    "prep_denylist_scrub",
    "prep_repetition_filter",
    "prep_dataset_card",
    # events/behavioral tail — never externally verified
    "events_sliding_window",
    "events_multires_rollup",
    "events_dedup_first",
    "events_anomaly_zscore",
    "events_markov_transitions",
    "events_gaps_islands",
    "events_running_distinct",
    # joins/UDF/scan tail — never externally verified (crs_reproject
    # is a SURVEY §2A row whose only driver check was r01)
    "join_interval_overlap",
    "udf_pandas_iter",
    "udtf_python_native",
    "agg_boolean_flags",
    "crs_reproject",
    # new this round — the TPC-H completions (pseudo-partsupp +
    # lateness adaptations) and the other two streaming parity rows
    "tpch_q2_min_cost_supplier",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q11_important_stock",
    "tpch_q16_supplier_count",
    "tpch_q20_excess_stock",
    "tpch_q21_waiting_orders",
    "stream_tumbling_rollup",
    "stream_static_enrich",
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
