"""Every registered query with an oracle must hash-match DuckDB locally
(sf0.001 for speed; the driver re-checks at sf0.01)."""

import pytest

from adcirctime2cogs_spark import registry
from tests.oracle_util import compare

ALL_QUERIES = registry.all_queries()
ALL_ORACLES = registry.all_oracles()


# Oracled queries allowed to return ZERO rows at sf0.001 — anything
# else that comes back empty is vacuous (the hash check compares
# empty==empty and verifies no semantics), a bug class that has
# already bitten: the as-of family silently returned nothing for two
# rounds because fixture events (2024) and orders (1995-2001) shared
# no time domain.
EMPTY_OK = {
    "tpch_q7_volume_shipping",  # 2-nation 2-year trade: no qualifying
    # lineitem among sf0.001's 600 rows; non-empty from sf0.01 up
    "setop_except",  # the mirror case: customers-without-suppliers
    # nations exist only at sf0.001 (10 supplier nations); from
    # sf0.01 up the supplier table covers all 25 nations and the
    # EXCEPT is legitimately empty — the non-vacuous semantics stay
    # pinned by the sf0.001 sweep, where it returns 15 rows
}


# Queries whose oracle is exact only under a measurable precondition;
# when the precondition fails on a given dataset the divergence is BY
# DESIGN (documented at the registration site), so the sweep skips
# with the reason instead of reporting a false red (ADVICE r07).
def _parity_precondition(spark, sf_dir, name):
    if name == "dedup_minhash_lsh_pairs":
        from adcirctime2cogs_spark.operators.dedup import lsh_bucket_stats

        stats = lsh_bucket_stats(spark, sf_dir)
        if stats["n_over_cap"] > 0:
            return (
                f"{stats['n_over_cap']} LSH buckets exceed "
                f"LSH_BUCKET_CAP={stats['bucket_cap']} — star path "
                "diverges from the all-pairs oracle by design"
            )
    if name in ("dedup_semantic_pairs", "dedup_semantic_keepers"):
        from adcirctime2cogs_spark.operators.dedup import sem_cell_stats

        stats = sem_cell_stats(spark, sf_dir)
        if stats["n_over_cap"] > 0:
            return (
                f"{stats['n_over_cap']} IVF cells exceed "
                f"SEM_CELL_CAP={stats['cell_cap']} — star path "
                "diverges from the all-pairs oracle by design"
            )
    if name in ("sim_threshold_pairs", "dedup_embedding_cosine"):
        from adcirctime2cogs_spark.operators.similarity import (
            sign_bucket_stats,
        )

        stats = sign_bucket_stats(spark, sf_dir)
        if stats["n_over_cap"] > 0:
            return (
                f"{stats['n_over_cap']} sign-LSH buckets exceed "
                f"SIGN_BUCKET_CAP={stats['bucket_cap']} — star path "
                "diverges from the all-pairs oracle by design"
            )
    # agg_distinct needs no precondition since round 10: its distinct
    # sum runs over exact integer cents, deterministic at every SF.
    return None


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_parity(spark, sf_dir, name):
    reason = _parity_precondition(spark, sf_dir, name)
    if reason:
        pytest.skip(reason)
    n = compare(spark, sf_dir, ALL_QUERIES[name], ALL_ORACLES[name])
    if name not in EMPTY_OK:
        assert n > 0, f"{name} returned 0 rows — vacuous oracle check"


@pytest.mark.parametrize("name", sorted(set(ALL_QUERIES) - set(ALL_ORACLES)))
def test_rows_only(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_oracle_no_exotic_types(sf_dir, name):
    """Every oracle's DuckDB result schema must be losslessly
    representable in Spark. DuckDB widens sum(INTEGER/BIGINT) and
    count_if to HUGEINT (int128) while Spark's sum stays BIGINT; the
    external harness's value hasher is type-sensitive, so a HUGEINT
    column hash-mismatches even when every value is identical — this
    exact class produced the only 5 red rows in CORRECTNESS_r04
    (adjudicated numerically identical). Oracles must CAST such
    aggregates to BIGINT. The local comparator (oracle_util._norm)
    normalizes through Python ints, which is why this was invisible to
    test_oracle_parity for four rounds."""
    from tests.oracle_util import duckdb_con

    con = duckdb_con(sf_dir)
    try:
        rel = con.sql(ALL_ORACLES[name])
        bad = [
            (c, t)
            for c, t in zip(rel.columns, (str(t).upper() for t in rel.types))
            if "HUGEINT" in t or "INTERVAL" in t or t.startswith("DECIMAL")
        ]
    finally:
        con.close()
    assert not bad, (
        f"{name}: oracle emits Spark-unrepresentable column types {bad}; "
        "wrap the aggregate in CAST(... AS BIGINT/DOUBLE)"
    )


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_spark_no_exotic_types(spark, sf_dir, name):
    """Mirror of test_oracle_no_exotic_types on the SPARK side — the
    blind spot that burned the r11 window. The local comparator
    collapses Decimal→float, so a Spark plan emitting decimal(28,7)
    where DuckDB emits DOUBLE is locally green but red under the
    external type-sensitive hasher (join_lateral_topk, r11: Spark SQL
    parses `10000.0` as DECIMAL, keeping a decimal input's arithmetic
    exact-decimal). Gate: no registered query's Spark result schema
    may contain DECIMAL or CALENDAR-INTERVAL anywhere (nested types
    included — simpleString() is recursive). Schema-only: one Catalyst
    analysis pass per query, no execution."""
    ss = ALL_QUERIES[name](spark, sf_dir).schema.simpleString()
    assert "decimal" not in ss and "interval" not in ss, (
        f"{name}: Spark result schema contains a hash-divergence-prone "
        f"type: {ss}; cast to double/bigint before returning"
    )


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_priority_window_is_pinned():
    """The external harness verifies exactly the first 50 registry
    entries; their identity and order are part of the contract."""
    from adcirctime2cogs_spark.registry import _PRIORITY

    assert len(_PRIORITY) == 50
    assert list(ALL_QUERIES)[:50] == _PRIORITY
    # every windowed entry must actually be runnable with an oracle or
    # documented rows-only (approx sketch)
    for name in _PRIORITY:
        assert name in ALL_QUERIES
