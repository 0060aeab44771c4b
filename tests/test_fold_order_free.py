"""Fold-order independence of the r13 exact-decimal migrations.

VERDICT r12 item 2: the queries that sum money/value doubles over
LARGE (scale-growing) groups hash-matched DuckDB only because the
single-task fixture scan folds in DuckDB's sequential order; on a
well-split 100 TB table Spark re-associates the fold and the 4dp grid
can flip. Optimization r13 migrated them to exact decimal sums
(q1's r11 discipline). These tests pin the property that migration
bought: REPARTITIONING THE INPUT 32 WAYS LEAVES EVERY RESULT
BIT-IDENTICAL, and the oracle still matches (the two-scale parity
sweep covers the latter; here we additionally force the repartition).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from adcirctime2cogs_spark import registry
from adcirctime2cogs_spark.tables import TABLE_SCHEMAS, load_table
from tests.oracle_util import compare

SF = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"

# (query, fact table whose fold order used to matter)
MIGRATED = [
    ("join_star_revenue", "lineitem"),
    ("join_left_outer", "orders"),
    ("events_tumbling_window", "events"),
    ("events_session_window", "events"),
    ("tpch_q5_local_supplier", "lineitem"),
    ("tpch_q6_revenue_forecast", "lineitem"),
    ("tpch_q7_volume_shipping", "lineitem"),
    ("tpch_q10_returned_items", "lineitem"),
    ("tpch_q14_promo_effect", "lineitem"),
    ("tpch_q19_disjunctive_pred", "lineitem"),
    ("agg_rollup", "customer"),
    ("agg_grouping_sets", "customer"),
    ("agg_cube", "orders"),
    ("date_trunc_agg", "orders"),
    ("join_skew_salted", "orders"),
    ("events_multires_rollup", "events"),
    ("events_gap_fill_locf", "events"),
    ("events_feature_rollup", "events"),
]


def _rows(df):
    return sorted(
        [tuple(r) for r in df.collect()],
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


@pytest.mark.parametrize("name,table", MIGRATED)
def test_migrated_query_is_fold_order_free(spark, name, table):
    """Re-run the query with the fact table's scan REPLACED by a 32-way
    round-robin repartition of itself (a different fold order per run
    group) and require bit-identical output. Works through the temp-
    view seam: load_table reads {sf}/{t}.parquet; we materialize a
    32-way repartitioned copy and point a same-schema reader at it."""
    import os
    import shutil
    import tempfile

    qs = registry.all_queries()
    base = _rows(qs[name](spark, SF))

    tmp = tempfile.mkdtemp(prefix="foldorder_")
    try:
        # copy the fixture dir entries as symlinks, then overwrite the
        # fact table with a 32-way shuffled/re-chunked rewrite: many
        # small row groups => the scan packs them into multiple splits
        # with a different fold order than the original single group.
        for t in TABLE_SCHEMAS:
            srcp = os.path.join(SF, f"{t}.parquet")
            if os.path.exists(srcp) and t != table:
                os.symlink(srcp, os.path.join(tmp, f"{t}.parquet"))
        (
            load_table(spark, SF, table)
            .repartition(32)
            .write.mode("overwrite")
            .parquet(os.path.join(tmp, f"{table}.parquet"))
        )
        reordered = _rows(qs[name](spark, tmp))
        assert reordered == base, f"{name} changed under a 32-way refold"
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_exact_decimal_sum_is_order_independent_unit(spark):
    """Micro-pin of the mechanism itself: the decimal revenue term
    sums to the same EXACT value at 1 and 32 partitions, including
    past the compact-long unscaled range (escalation to BigDecimal
    is exact — the property q1's r11 analysis relies on)."""
    df = spark.range(200).select(
        F.lit("99999999999999.9999").cast("decimal(18,4)").alias("v")
    )
    one = df.coalesce(1).agg(F.sum("v")).collect()[0][0]
    many = df.repartition(32).agg(F.sum("v")).collect()[0][0]
    assert str(one) == "19999999999999999.9800"
    assert one == many


@pytest.mark.parametrize("name", [m[0] for m in MIGRATED])
def test_migrated_query_oracle_green_two_scales(spark, name):
    qs, oracles = registry.all_queries(), registry.all_oracles()
    for sf in (SF, SF2):
        compare(spark, sf, qs[name], oracles[name])
