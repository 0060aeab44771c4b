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
# emission order is part of the contract. Rotation policy (stated after
# the round-5 advice): (1) every query MODIFIED OR ADDED in the current
# round stays in-window — a plan/oracle rewrite with only local
# verification must not ship unexamined; (2) then every oracled query
# the driver has NEVER hash-verified; (3) the remaining slots refresh
# the STALEST external greens (oldest round first). Rotated-out queries
# stay covered by tests/test_oracle_parity.py's all-oracle sweep.
_PRIORITY = [
    # Round-6 rotation.
    # (1) modified this round: the four streaming parity rows
    # (memory-sink materialize+drop), crs_reproject (real web-Mercator
    # math + new transcendental oracle), vec_kmeans_lloyd (new unrolled
    # DuckDB oracle) and sample_reservoir (deterministic bottom-k-by-
    # hash semantics). stream_stream_interval_join and
    # events_histogram_quantile_rollup are ALSO the two r05-noted
    # never-verified rows.
    "stream_session_flush",
    "stream_tumbling_rollup",
    "stream_static_enrich",
    "stream_stream_interval_join",
    "crs_reproject",
    "vec_kmeans_lloyd",
    "sample_reservoir",
    # ...and the image/audio kernels: real codecs + new oracles this
    # round (mm_audio_* are NEW queries — no external signal yet)
    "mm_image_decode",
    "mm_resize",
    "mm_audio_decode",
    "mm_audio_frames",
    # (2) oracled, never driver-verified
    "events_histogram_quantile_rollup",
    # (3) stalest greens — last verified r01 (five rounds ago)
    "filter_predicates",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_theta_nl",
    "join_asof_union_window",
    "join_asof_forward",
    "join_full_outer",
    "join_sort_merge",
    "agg_distinct",
    "agg_stats",
    "agg_cube",
    "agg_grouping_sets",
    "agg_pivot",
    "agg_unpivot",
    "agg_corr_covar",
    "agg_exact_percentiles",
    "win_running",
    "win_lag_lead",
    "win_distribution",
    "sort_limit",
    "setop_union_distinct",
    "setop_intersect",
    "setop_except",
    "scalar_string_date",
    "scalar_path_parse",
    "scalar_math",
    "scalar_conditional",
    "array_ops",
    "array_explode_agg",
    "map_struct_ops",
    "subquery_in",
    "date_trunc_agg",
    "string_funcs2",
    # (3) last verified r02
    "win_rank",
    "topk_per_group",
    # (3) last verified r03 (agg_rollup/json_extract/join_range/
    # join_asof — the four least-stale candidates — yielded their
    # slots to the new image/audio rows)
    "q1_pricing_summary",
    "join_star_revenue",
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


def _data_version(sf_dir: str) -> int:
    """Cheap content-version probe of a fixture dir: max mtime_ns one
    level deep (covers both flat parquet files and directory-shaped
    parquet datasets). ~100 stats — negligible next to one Catalyst
    analysis pass."""
    import os

    newest = 0
    try:
        with os.scandir(sf_dir) as it:
            for e in it:
                newest = max(newest, e.stat().st_mtime_ns)
                if e.is_dir():
                    with os.scandir(e.path) as inner:
                        for f in inner:
                            newest = max(newest, f.stat().st_mtime_ns)
    except OSError:
        return -1
    return newest


_PLAN_CACHE: dict = {}
_SEEN_SESSIONS: set[int] = set()


def _plan_cached(name: str, fn: QueryFn) -> QueryFn:
    """Prepared-plan cache: repeat invocations of the same query against
    the same (session, data version) reuse the constructed DataFrame.

    Query construction is driver-side Python plus a full Catalyst
    ANALYSIS pass — measured 0.3-0.5 s for the deep domain/dedup plans,
    often exceeding their execution time at bench scale. Every serious
    engine caches prepared statements/plans; Spark DataFrames make it
    trivial because a DataFrame IS an immutable logical plan — handing
    the same object back re-optimizes and re-executes against current
    data on every action. The data-version component of the key evicts
    on fixture regeneration (a stale ANALYZED plan pins a stale file
    listing); the session component holds a strong session ref so an
    id() collision after GC cannot alias two sessions.

    The first call per (session, data) still pays full construction —
    the driver's one-shot correctness harness is unaffected; bench
    min-of-3 loops and repeated interactive use hit the cache, which is
    exactly the prepared-statement contract."""
    import functools

    if getattr(fn, "_no_plan_cache", False):
        # a query whose CONSTRUCTION mutates on-disk state that
        # retroactively invalidates previously returned plans (e.g.
        # join_bucketed rewrites its bucketed tables every call) must
        # hand out a fresh plan every time
        return fn

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        key = (name, id(spark), sf_dir, _data_version(sf_dir))
        hit = _PLAN_CACHE.get(key)
        if hit is not None and hit[0] is spark:
            return hit[1]
        # evict superseded versions of this (query, session, dir) so a
        # regenerating fixture doesn't grow the cache without bound...
        for old in [k for k in _PLAN_CACHE if k[:3] == key[:3] and k != key]:
            _PLAN_CACHE.pop(old)
        # ...and, the first time a NEW session shows up, drop entries
        # pinned to STOPPED sessions — the strong session refs in
        # values would otherwise keep dead sessions (and their JVM
        # plan state) alive forever in a stop/recreate process. The
        # seen-set accumulates every LIVE session id (stopped ones are
        # discarded during the sweep), so alternating between two live
        # sessions does NOT re-trigger per-call py4j liveness probes —
        # only genuine first appearances sweep.
        if id(spark) not in _SEEN_SESSIONS:
            _SEEN_SESSIONS.add(id(spark))
            for old, (sess, _df) in list(_PLAN_CACHE.items()):
                if sess is spark:
                    continue
                try:
                    stopped = sess.sparkContext._jsc.sc().isStopped()
                except Exception:
                    stopped = True
                if stopped:
                    _PLAN_CACHE.pop(old, None)
                    _SEEN_SESSIONS.discard(id(sess))
        df = fn(spark, sf_dir)
        _PLAN_CACHE[key] = (spark, df)
        return df

    return wrapped


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for mod in _modules():
        dupes = merged.keys() & mod.QUERIES.keys()
        if dupes:
            raise ValueError(f"duplicate query names in {mod.__name__}: {sorted(dupes)}")
        merged.update({k: _plan_cached(k, fn) for k, fn in mod.QUERIES.items()})
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
