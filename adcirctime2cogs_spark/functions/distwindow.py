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
   (constant work over n_buckets values), and add each bucket's offset
   to its rows' local window result.

Bit-identical to the single-partition window for associative integer
combines (BIGINT sums, row counts): offsets recombine exactly under
ANY bucket boundaries, so correctness never depends on the bucket
shape — only parallelism does. A heavily skewed leading key piles
rows into few buckets (slower, still exact); production freezes
approx-quantile cut points instead of equal widths, same construction.
Floating combines would re-associate — quantize first (the
_CUSUM_SCALE / _LP_SCALE discipline).

Two ways to attach the offsets (optimization r12):

- LAZY (default when `offsets` is None): aggregate per-bucket totals
  from the input frame and broadcast-join them back on `_pid`. Fully
  lazy, but the join's build side DERIVES FROM the probe side, and
  Spark re-executes a subtree referenced twice — chaining k ranks
  multiplied the upstream plan 2^k times (agg_rfm_segmentation's
  three chained ntiles planned its base aggregation 8x, 44 Exchanges).
- COLLECTED (`offsets=` a list from `bucket_offsets()`): the
  per-bucket totals are one tiny driver job at plan-construction time
  (n_buckets+2 rows — the same eager-calibration discipline as the
  [min, max] bounds collect), baked in as a literal array lookup.
  No join-back, no subtree duplication: k chained ranks plan the
  input subtree exactly once. Callers under the registry plan cache
  re-collect per data version automatically.
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


def bucket_offsets(
    df: DataFrame,
    bucket_key: Column,
    n_parts: int = _PARTS,
    bounds: tuple[int, int] | None = None,
    value: Column | None = None,
) -> list[int]:
    """Driver-collected dense per-bucket prefix offsets: out[p] = total
    of `value` (row count when None) over all buckets with id < p,
    under the SAME bucketing as `_with_bucket(df, bucket_key, n_parts,
    bounds)`. One small job (n_buckets+2 output rows); pass the result
    as `offsets=` to prefix_sum/global_rank together with the SAME
    `bounds` so the bucket ids line up. Empty buckets inherit the
    running total, so the lookup is a dense array over [0, max_pid]."""
    d = _with_bucket(df, bucket_key, n_parts, bounds)
    agg = (F.count("*") if value is None else F.sum(value)).cast("bigint")
    rows = d.groupBy("_pid").agg(agg.alias("_t")).collect()
    per = {r["_pid"]: (r["_t"] or 0) for r in rows}
    if None in per:
        # A NULL bucket key has no position in the total order: the
        # collected path would crash below (max over None) and the
        # lazy join-back path would silently DROP the rows via its
        # inner join on _pid — fail loudly instead (ADVICE r12).
        raise ValueError(
            "bucket_offsets: NULL bucket key — distwindow requires a "
            "non-null leading sort key (filter or coalesce it first)"
        )
    if not per:
        return [0]
    out, run = [], 0
    for p in range(max(per) + 1):
        out.append(run)
        run += per.get(p, 0)
    return out


def _offset_lookup(offsets: list[int]) -> Column:
    """`_off` as a literal dense-array lookup on `_pid` (codegen, no
    join). Rows only ever carry pids that had rows at collect time, so
    the array covers every pid the lookup can see — PROVIDED the
    caller passed offsets collected over the same frame and bounds.
    The range guard makes a mismatch fail loudly (ADVICE r12):
    non-ANSI element_at would return NULL for an over-range _pid and
    index from the END of the array for a negative one — silently
    wrong ranks instead of an error."""
    arr = F.array(*[F.lit(int(o)).cast("bigint") for o in offsets])
    in_range = (F.col("_pid") >= 0) & (F.col("_pid") < len(offsets))
    return F.when(
        in_range, F.element_at(arr, F.col("_pid") + 1)
    ).otherwise(
        F.raise_error(
            F.format_string(
                "distwindow: _pid %s outside the collected offsets "
                f"[0, {len(offsets)}) — offsets were built over a "
                "different frame/bounds or the data changed between "
                "collect and execution",
                F.col("_pid"),
            )
        )
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
    offsets: list[int] | None = None,
) -> DataFrame:
    """Exact running sum of `value` (an integer column) in the total
    order of `order_cols`, inclusive of the current row — equal to
    `F.sum(value).over(Window.orderBy(*order_cols))` but distributed.
    `bucket_key` must be an integer expression monotone-ascending in
    the leading sort key; `order_cols` must be a total order; pass
    `bounds` = (min, max) of the bucket key if already collected, and
    `offsets` from bucket_offsets(value=...) under the same bounds to
    skip the lazy join-back (see module doc)."""
    if offsets is not None and bounds is None:
        raise ValueError("offsets requires the bounds they were built with")
    d = _with_bucket(df, bucket_key, n_parts, bounds).withColumn("_v", value)
    w_loc = (
        W.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    if offsets is not None:
        return (
            d.withColumn(
                out, _offset_lookup(offsets) + F.sum("_v").over(w_loc)
            )
            .drop("_pid", "_v")
        )
    per_part = d.groupBy("_pid").agg(F.sum("_v").alias("_pt"))
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
    offsets: list[int] | None = None,
) -> DataFrame:
    """1-based global row_number in the total order of `order_cols`
    (names or sort-order expressions like F.col("x").desc()),
    distributed as above. For a DESCENDING leading key pass its
    negation as `bucket_key` (bucket ids must ascend with the sort)
    and negated `bounds` likewise. The order must be total (include a
    unique tiebreak). `offsets` (from bucket_offsets under the same
    bounds) replaces the lazy join-back with a literal lookup — the
    form that chains without duplicating the input subtree."""
    if offsets is not None and bounds is None:
        raise ValueError("offsets requires the bounds they were built with")
    d = _with_bucket(df, bucket_key, n_parts, bounds)
    w_loc = W.partitionBy("_pid").orderBy(*order_cols)
    if offsets is not None:
        return (
            d.withColumn(
                out, _offset_lookup(offsets) + F.row_number().over(w_loc)
            )
            .drop("_pid")
        )
    per_part = d.groupBy("_pid").agg(
        F.count("*").cast("bigint").alias("_pn")
    )
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
