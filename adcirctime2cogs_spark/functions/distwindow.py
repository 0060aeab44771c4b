"""Distributed exact global-order window primitives.

A `Window.orderBy(...)` with no partitionBy moves EVERY row through one
partition — the canonical 100 TB scale killer (Spark itself warns "No
Partition Defined for Window operation"). But the two global-order
quantities this engine needs — prefix sums (sequence packing) and
global ranks (quantile bucketing) — recombine EXACTLY from
per-partition pieces, the textbook parallel-scan construction:

1. assign each row an ORDER-MONOTONE bucket id from its leading sort
   key: equal-width integer buckets over the driver-collected
   [min, max] of that key (two scalars — the PSI calibration
   precedent). Deterministic and data-derived, unlike
   repartitionByRange, whose sampled boundaries differ per evaluation
   and would make a two-branch plan correct only when the optimizer
   happens to reuse the exchange;
2. ONE hash shuffle on the bucket id, a window partitioned by it
   (each bucket sorts locally — nothing funnels through one reducer);
3. aggregate one row per bucket (count/sum), prefix-combine THOSE
   (a window over n_buckets rows — constant work), broadcast the
   offsets back, and add.

Bit-identical to the single-partition window for associative integer
combines (BIGINT sums, row counts): offsets recombine exactly under
ANY bucket boundaries, so correctness never depends on the bucket
shape — only parallelism does. A heavily skewed leading key piles
rows into few buckets (slower, still exact); production freezes
approx-quantile cut points instead of equal widths, same construction.
Floating combines would re-associate — quantize first (the
_CUSUM_SCALE / _LP_SCALE discipline).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_PARTS = 32  # match spark.sql.shuffle.partitions in the test harness


def _with_bucket(
    df: DataFrame,
    bucket_key: Column,
    n_parts: int,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Append `_pid`: equal-width integer bucket of the (ascending,
    integer) leading sort key. Calibration is the key's [min, max] —
    collected here (two exact integer scalars; the plan-cache's
    data-version key re-collects on new data) or passed via `bounds`
    by callers that already collected them in a combined agg.

    Overflow discipline (review r12): the bucket id divides FIRST —
    (key div width) minus the driver-computed (lo div width) — so no
    expression ever subtracts or multiplies two raw keys: the naive
    ((key - lo) * n_parts) div span overflows int64 once span exceeds
    ~2^63/n_parts (any full-range 64-bit hash key) and silently wraps
    _pid non-monotone. SQL `div` truncates toward zero, which is still
    monotone non-decreasing for positive width (one extra step
    boundary at zero), so bucket ids ascend with the key and the count
    stays <= n_parts + 2."""
    if bounds is None:
        lo, hi = df.agg(
            F.min(bucket_key).cast("bigint"),
            F.max(bucket_key).cast("bigint"),
        ).first()
    else:
        lo, hi = bounds
    if lo is None:  # empty input: any constant bucket works
        return df.withColumn("_pid", F.lit(0))
    lo, hi = int(lo), int(hi)
    # span can exceed int64 (hi=2^63-1, lo=-2^63): unbounded Python
    span = hi - lo + 1
    width = max(1, -(-span // n_parts))  # ceil div
    lo_div = lo // width if lo >= 0 else -((-lo) // width)  # trunc, like SQL
    return (
        df.withColumn("_bk", bucket_key.cast("bigint"))
        .withColumn(
            "_pid",
            (F.expr(f"_bk div {width}L") - F.lit(lo_div)).cast("int"),
        )
        .drop("_bk")
    )


def _offsets(per_part: DataFrame, agg_col: str) -> DataFrame:
    # prefix-combine the per-bucket totals: n_parts rows, constant
    # work — the one place a no-partition window is legitimate
    w = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    return per_part.select(
        "_pid",
        F.coalesce(F.sum(agg_col).over(w), F.lit(0).cast("bigint"))
        .alias("_off"),
    )


def prefix_sum(
    df: DataFrame,
    bucket_key: Column,
    order_cols: list,
    value: Column,
    out: str,
    n_parts: int = _PARTS,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Exact running sum of `value` (an integer column) in the total
    order of `order_cols`, inclusive of the current row — equal to
    `F.sum(value).over(Window.orderBy(*order_cols))` but distributed.
    `bucket_key` must be an integer expression monotone-ascending in
    the leading sort key; `order_cols` must be a total order; pass
    `bounds` = (min, max) of the bucket key if already collected."""
    d = _with_bucket(df, bucket_key, n_parts, bounds).withColumn("_v", value)
    per_part = d.groupBy("_pid").agg(F.sum("_v").alias("_pt"))
    w_loc = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        d.join(F.broadcast(_offsets(per_part, "_pt")), "_pid")
        .withColumn(out, F.col("_off") + F.sum("_v").over(w_loc))
        .drop("_pid", "_off", "_v")
    )


def global_rank(
    df: DataFrame,
    bucket_key: Column,
    order_cols: list,
    out: str,
    n_parts: int = _PARTS,
    bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """1-based global row_number in the total order of `order_cols`
    (names or sort-order expressions like F.col("x").desc()),
    distributed as above. For a DESCENDING leading key pass its
    negation as `bucket_key` (bucket ids must ascend with the sort)
    and negated `bounds` likewise. The order must be total (include a
    unique tiebreak)."""
    d = _with_bucket(df, bucket_key, n_parts, bounds)
    per_part = d.groupBy("_pid").agg(
        F.count("*").cast("bigint").alias("_pn")
    )
    w_loc = W.partitionBy("_pid").orderBy(*order_cols)
    return (
        d.join(F.broadcast(_offsets(per_part, "_pn")), "_pid")
        .withColumn(out, F.col("_off") + F.row_number().over(w_loc))
        .drop("_pid", "_off")
    )


def ntile_from_rank(rank: Column, n_total: Column, k: int) -> Column:
    """ANSI ntile(k) from a 1-based global rank and the total row
    count: the first (n mod k) buckets take ceil(n/k) rows, the rest
    floor(n/k) — exact integer arithmetic, matching Spark's and
    DuckDB's ntile bit-for-bit."""
    q = F.floor(n_total / k).cast("bigint")
    m = n_total - q * k  # n mod k
    big = (q + 1) * m  # rows covered by the wide buckets
    return F.when(
        rank <= big, F.floor((rank - 1) / (q + 1)).cast("int") + 1
    ).otherwise(
        (m + F.floor((rank - 1 - big) / F.greatest(q, F.lit(1)))).cast("int")
        + 1
    )
