"""Third-engine cross-checks: the as-of join family against pandas
merge_asof — an implementation independent of BOTH Spark and the
DuckDB oracles, so a shared misunderstanding between the two can't
hide (each engine pair agreeing is necessary but not sufficient)."""

import pandas as pd
from pyspark.sql import functions as F

from adcirctime2cogs_spark.operators.relational import (
    join_asof,
    join_asof_forward,
)
from adcirctime2cogs_spark.tables import load_table


def _frames(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            (F.col("ts") - F.expr("INTERVAL 28 YEARS")).alias("t"),
        )
        .toPandas()
        .sort_values("t")
        .reset_index(drop=True)
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .toPandas()
        .sort_values("o_orderdate")
        .reset_index(drop=True)
    )
    return ev, orders


def _engine_pick(df, date_col):
    return {
        r.event_id: (r.o_orderkey, r[date_col][:10]) for _, r in
        df.toPandas().iterrows()
    }


def test_join_asof_matches_pandas_merge_asof(spark, sf_dir):
    """Backward as-of: every event's engine pick must carry the same
    order DATE pandas merge_asof(direction='backward') selects. (The
    orderkey itself can differ when several same-user orders share the
    pick date — the engine tie-breaks on the LARGEST orderkey, a rule
    merge_asof cannot express — so the date, which defines as-of
    correctness, is the cross-checked value.)"""
    ev, orders = _frames(spark, sf_dir)
    merged = pd.merge_asof(
        ev,
        orders.rename(columns={"o_custkey": "user_id"}),
        left_on="t",
        right_on="o_orderdate",
        by="user_id",
        direction="backward",
    )
    expected = {
        r.event_id: str(r.o_orderdate)[:10]
        for _, r in merged.iterrows()
        if pd.notna(r.o_orderkey)
    }
    got = _engine_pick(join_asof(spark, sf_dir), "asof_orderdate")
    assert set(got) == set(expected)
    mism = [e for e, d in expected.items() if got[e][1] != d]
    assert not mism, f"{len(mism)} as-of date mismatches vs pandas: {mism[:5]}"


def test_join_asof_forward_matches_pandas_merge_asof(spark, sf_dir):
    """Forward as-of: same cross-check with direction='forward'."""
    ev, orders = _frames(spark, sf_dir)
    merged = pd.merge_asof(
        ev,
        orders.rename(columns={"o_custkey": "user_id"}),
        left_on="t",
        right_on="o_orderdate",
        by="user_id",
        direction="forward",
    )
    expected = {
        r.event_id: str(r.o_orderdate)[:10]
        for _, r in merged.iterrows()
        if pd.notna(r.o_orderkey)
    }
    got = _engine_pick(join_asof_forward(spark, sf_dir), "next_orderdate")
    assert set(got) == set(expected)
    mism = [e for e, d in expected.items() if got[e][1] != d]
    assert not mism, f"{len(mism)} forward-as-of mismatches vs pandas: {mism[:5]}"
