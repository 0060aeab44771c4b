"""functions/distwindow: the distributed two-phase parallel scan must
be BIT-IDENTICAL to the single-partition global window it replaces —
checked directly against the naive form on seeded data, including
skewed bucket keys (correctness may not depend on bucket shape), plus
the closed-form ntile arithmetic across every n-mod-k residue."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from adcirctime2cogs_spark.functions.distwindow import (
    bucket_offsets,
    global_rank,
    ntile_from_rank,
    prefix_sum,
)


def _seeded(spark, n, skewed=False):
    key = (
        # 90% of rows pile into 10% of the key range
        F.when(F.pmod(F.xxhash64("id"), F.lit(10)) < 9,
               F.pmod(F.xxhash64("id", F.lit(1)), F.lit(100)))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(2)), F.lit(1000)))
        if skewed
        else F.pmod(F.xxhash64("id"), F.lit(1000))
    )
    return spark.range(n).select(
        F.col("id"),
        key.cast("bigint").alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500)).alias("v"),
    )


@pytest.mark.parametrize("skewed", [False, True])
def test_prefix_sum_equals_global_window(spark, skewed):
    df = _seeded(spark, 5000, skewed)
    got = prefix_sum(df, F.col("k"), ["k", "id"], F.col("v"), "cum")
    w = W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert (
        got.exceptAll(want).count() == 0
        and want.exceptAll(got).count() == 0
    )


@pytest.mark.parametrize("skewed", [False, True])
def test_global_rank_equals_row_number(spark, skewed):
    df = _seeded(spark, 5000, skewed)
    got = global_rank(
        df, -F.col("k"), [F.col("k").desc(), "id"], "rn"
    )
    w = W.orderBy(F.col("k").desc(), "id")
    want = df.withColumn("rn", F.row_number().over(w).cast("bigint"))
    assert (
        got.exceptAll(want).count() == 0
        and want.exceptAll(got).count() == 0
    )


@pytest.mark.parametrize("n", [1, 4, 5, 6, 23, 100, 101, 104])
def test_ntile_from_rank_matches_spark_ntile(spark, n):
    """Every n mod 5 residue: the closed form must reproduce
    F.ntile(5) exactly (ANSI wide-buckets-first allocation)."""
    df = spark.range(n).select(F.col("id"))
    w = W.orderBy("id")
    want = df.withColumn("b", F.ntile(5).over(w))
    got = df.withColumn(
        "b",
        ntile_from_rank(
            F.row_number().over(w).cast("bigint"),
            F.lit(n).cast("bigint"),
            5,
        ),
    )
    assert got.exceptAll(want).count() == 0


def test_plan_has_no_data_scale_global_window(spark):
    """The data-scale window must be partitioned by the bucket id; the
    only unpartitioned window allowed is the constant-size offsets
    combine (its input is one row per bucket)."""
    df = _seeded(spark, 2000)
    got = prefix_sum(df, F.col("k"), ["k", "id"], F.col("v"), "cum")
    plan = got._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    data_windows = [
        line for line in plan.splitlines()
        if "Window [" in line and "sum(_v" in line
    ]
    assert data_windows, "expected the per-bucket data window"
    for line in data_windows:
        assert "_pid" in line.split("windowspecdefinition")[1][:60], line


@pytest.mark.parametrize("skewed", [False, True])
def test_collected_offsets_bit_identical_and_join_free(spark, skewed):
    """Optimization r12: the collected-offsets form must (a) equal the
    lazy join-back form AND the naive global window bit-for-bit, and
    (b) plan NO join — the lazy form's build side derives from its
    probe side, so every reference re-executes the input subtree
    (chained ranks multiplied agg_rfm_segmentation's base plan 8x)."""
    df = _seeded(spark, 5000, skewed)
    lo, hi = df.agg(
        F.min("k").cast("bigint"), F.max("k").cast("bigint")
    ).first()
    offs = bucket_offsets(df, F.col("k"), bounds=(lo, hi),
                          value=F.col("v"))
    got = prefix_sum(df, F.col("k"), ["k", "id"], F.col("v"), "cum",
                     bounds=(lo, hi), offsets=offs)
    w = W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert (
        got.exceptAll(want).count() == 0
        and want.exceptAll(got).count() == 0
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "Join" not in plan, plan
    r_offs = bucket_offsets(df, F.col("k"), bounds=(lo, hi))
    rk = global_rank(df, F.col("k"), ["k", "id"], "rn",
                     bounds=(lo, hi), offsets=r_offs)
    w2 = W.orderBy("k", "id")
    want2 = df.withColumn("rn", F.row_number().over(w2).cast("bigint"))
    assert (
        rk.exceptAll(want2).count() == 0
        and want2.exceptAll(rk).count() == 0
    )
    p2 = rk._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p2.split("== Initial Plan ==")[0]


def test_offsets_without_bounds_rejected(spark):
    """Collected offsets are only meaningful under the bounds they
    were computed with — a missing-bounds call must fail loudly, not
    recalibrate onto misaligned bucket ids."""
    df = _seeded(spark, 100)
    with pytest.raises(ValueError):
        prefix_sum(df, F.col("k"), ["k", "id"], F.col("v"), "cum",
                   offsets=[0])
    with pytest.raises(ValueError):
        global_rank(df, F.col("k"), ["k", "id"], "rn", offsets=[0])


def test_full_range_hash_keys_do_not_overflow(spark):
    """Review r12: a full-range 64-bit key (raw xxhash64, span ~2^64)
    must still produce a monotone bucketing — the naive
    ((key - lo) * n_parts) div span form wraps int64 and silently
    mis-buckets. Pinned by exact equality with the naive global window
    on raw-hash keys."""
    df = spark.range(4000).select(
        F.col("id"), F.xxhash64("id").alias("k"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(500)).alias("v"),
    )
    got = prefix_sum(df, F.col("k"), ["k", "id"], F.col("v"), "cum")
    w = W.orderBy("k", "id").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = df.withColumn("cum", F.sum("v").over(w))
    assert (
        got.exceptAll(want).count() == 0
        and want.exceptAll(got).count() == 0
    )
    rk = global_rank(df, F.col("k"), ["k", "id"], "rn")
    stats = rk.agg(
        F.min("rn"), F.max("rn"), F.count_distinct("rn")
    ).first()
    assert tuple(stats) == (1, 4000, 4000)


def test_offsets_frame_mismatch_fails_loudly(spark):
    """ADVICE r12: offsets collected over a DIFFERENT frame/bounds
    must raise at execution, not silently return NULL/wrapped ranks
    (non-ANSI element_at indexes negatives from the array END)."""
    import pyspark.errors

    df = _seeded(spark, 500)
    bounds = (0, 999)
    # offsets deliberately built over a tiny sub-frame: most pids in
    # the full frame fall outside the 1-entry dense array
    offsets = bucket_offsets(df.filter("k = 0"), F.col("k"), bounds=bounds)
    assert len(offsets) == 1
    bad = global_rank(
        df, F.col("k"), ["k", "id"], "r", bounds=bounds, offsets=offsets
    )
    with pytest.raises(pyspark.errors.PySparkException) as ei:
        bad.collect()
    assert "distwindow" in str(ei.value)


def test_bucket_offsets_rejects_null_keys(spark):
    """ADVICE r12: the collected and lazy forms disagreed on NULL
    bucket keys (TypeError vs silent row drop) — reject loudly."""
    df = spark.range(100).select(
        F.when(F.col("id") % 10 == 0, None)
        .otherwise(F.col("id"))
        .cast("bigint")
        .alias("k"),
        F.col("id"),
    )
    with pytest.raises(ValueError, match="NULL bucket key"):
        bucket_offsets(df, F.col("k"), bounds=(0, 99))
