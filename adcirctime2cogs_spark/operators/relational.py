"""Relational operator suite (SURVEY.md §2B).

Every public query here is a pure DataFrame-API plan (Catalyst gets the
whole logical plan: pushdown, pruning, join selection are free) paired
with a DuckDB oracle SQL string in ORACLES. Conventions that make the
driver's order-insensitive value-hash comparison stable:

- every computed column is aliased identically in Spark and SQL;
- double aggregates are wrapped in round(x, 4) on BOTH sides so
  summation-order fp drift cannot flip the hash;
- queries with LIMIT/top-k use a total order (unique tie-break keys);
- computed timestamps are emitted as formatted strings, never raw
  timestamps, to sidestep engine timezone/precision representation.

Reference parity notes are cited per-query (file:line into
/root/reference) where a reference operator motivated the query shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from adcirctime2cogs_spark.tables import load_table, load_table_spread

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


from adcirctime2cogs_spark.functions.numeric import r4 as _r4  # noqa: E402


# ---------------------------------------------------------------------------
# Scan → filter → hash aggregate → sort: the spine of the reference dataflow
# (scan O1, project O3/O4, slice-filter O5, bbox-agg O7 of SURVEY §2A).
# ---------------------------------------------------------------------------


@_register(
    "q1_pricing_summary",
    """
    WITH d AS (
      SELECT l_returnflag, l_linestatus,
             CAST(l_quantity      AS DECIMAL(12,2)) AS qty,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
             CAST(l_discount      AS DECIMAL(4,2))  AS disc,
             CAST(l_tax           AS DECIMAL(4,2))  AS tax
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    )
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(qty)   AS DOUBLE), 4) AS sum_qty,
           round(CAST(sum(price) AS DOUBLE), 4) AS sum_base_price,
           round(CAST(sum(price * (1 - disc)) AS DOUBLE), 4)
             AS sum_disc_price,
           round(CAST(sum(price * (1 - disc) * (1 + tax)) AS DOUBLE), 4)
             AS sum_charge,
           round(CAST(sum(qty)   AS DOUBLE) / count(*), 4) AS avg_qty,
           round(CAST(sum(price) AS DOUBLE) / count(*), 4) AS avg_price,
           round(CAST(sum(disc)  AS DOUBLE) / count(*), 4) AS avg_disc,
           count(*) AS count_order
    FROM d
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped flagship: filter -> partial+final hash agg.

    Exercises the same shape as the reference's bbox aggregate
    (run/adcircTime2cogs.py:155-158) at fact-table scale; Catalyst emits
    a partial aggregate before the shuffle so the exchange carries one
    row per (flag, status) per task, not the fact table.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # EXACT decimal aggregation (review r11): the money columns are
    # 2dp by construction, so the sums are order-independent decimals
    # — valid at ANY scale, unlike double sums, whose engine-parallel
    # fold order starts leaking into the 4dp grid once a group's sum
    # passes ~2^53/1e4 (~sf10). Inputs stay in the long-backed
    # fast-decimal range (<= 18 digits); the products are exact at
    # (17,4)/(22,6); only the final sums widen. Averages derive from
    # the exact sums in double (one deterministic rounding per side).
    qty = F.col("l_quantity").cast("decimal(12,2)")
    price = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    tax = F.col("l_tax").cast("decimal(4,2)")
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r4(F.sum(qty).cast("double")).alias("sum_qty"),
            _r4(F.sum(price).cast("double")).alias("sum_base_price"),
            _r4(F.sum(price * (1 - disc)).cast("double"))
            .alias("sum_disc_price"),
            _r4(F.sum(price * (1 - disc) * (1 + tax)).cast("double"))
            .alias("sum_charge"),
            _r4(F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            _r4(F.sum(price).cast("double") / cnt).alias("avg_price"),
            _r4(F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )


@_register(
    "filter_predicates",
    """
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_size BETWEEN 5 AND 45
      AND p_brand IN ('Brand#1', 'Brand#2', 'Brand#3', 'Brand#4', 'Brand#5')
      AND p_type LIKE '%O%'
      AND regexp_matches(p_name, '^(small|red|hot) .*[gt]$')
      AND p_retailprice IS NOT NULL
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate suite: between / in / like / rlike / null-check.

    Mirrors the reference's regex dispatch on variable names
    (adcirc_dask_utilities.py:27) and startswith dispatch
    (run/adcircTime2cogs.py:270). All predicates reach the parquet scan
    as PushedFilters except the regex (evaluated post-scan, still
    codegen). Values are chosen from the FIXTURE's domain (verified
    non-empty at every SF) — predicates matching nothing would make
    the oracle check empty==empty and verify no semantics at all.
    """
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_size").between(5, 45)
        & F.col("p_brand").isin(
            "Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5"
        )
        & F.col("p_type").like("%O%")
        & F.col("p_name").rlike("^(small|red|hot) .*[gt]$")
        & F.col("p_retailprice").isNotNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@_register(
    "join_star_revenue",
    """
    SELECT r_name, n_name,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                          * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE),
                 4) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def join_star_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-way star join: fact x 3 broadcast dims + one shuffle join.

    customer/nation/region are broadcast (dimension tables stay under
    the 64MB threshold even at 100TB-scale fact data); lineitem-orders
    is the only shuffled join and AQE may convert it too when the
    filtered side is small.

    Revenue follows q1's EXACT-DECIMAL discipline (optimization r13):
    the money columns are 2dp by construction, so
    DECIMAL(12,2) * (1 - DECIMAL(4,2)) is the exact 4dp line revenue
    and its sum is order-independent — the result no longer depends on
    the scan's fold order, which both makes the 4dp hash stable on a
    well-split 100 TB table and unblocks spreading the single-split
    fixture scan across cores (tables.spread_scan). The spread was
    A/B-measured and KEPT here (decimal 1.490 -> 1.117 s): the
    per-row decimal cast+multiply is heavy enough to amortize the
    exchange, unlike the single-cast sums (join_left_outer, events_*),
    where the same spread measured as a net loss and was rejected.
    """
    li = load_table_spread(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            _r4(F.sum(rev).cast("double")).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@_register(
    "join_left_outer",
    """
    SELECT c_custkey, c_mktsegment,
           count(o_orderkey)                               AS n_orders,
           round(coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
                               AS DOUBLE), 0.0), 4)        AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving zero-order customers.

    total_spend sums o_totalprice as an exact DECIMAL(12,2) (2dp by
    construction) — order-independent at any scale (optimization r13,
    q1's discipline). Spreading the orders scan was A/B-measured and
    REJECTED (0.444 -> 0.609 s): the per-row work (one cast + sum) is
    too light to amortize the extra exchange, and on a well-split
    production table the spread is the identity anyway.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            _r4(
                F.coalesce(
                    F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                )
            ).alias("total_spend"),
        )
    )


@_register(
    "join_semi",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@_register(
    "join_anti",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no URGENT order.

    Same semantics as the reference's domain mask: raster cells with no
    containing triangle are dropped (run/adcircTime2cogs.py:178-185 →
    SURVEY O15 maps mask == anti-join). The anti side is priority-
    filtered because EVERY fixture customer has some order — the
    unfiltered form returned zero rows at sf0.001/0.01, making the
    oracle check empty==empty (verifying nothing); this form is
    non-empty at every SF.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@_register(
    "join_range",
    """
    SELECT l_orderkey, l_linenumber, o_orderdate,
           round(l_extendedprice, 4) AS price
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate
      AND l_shipdate <  o_orderdate + INTERVAL 30 DAY
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range-predicate join (interval containment).

    Spark plans the equi key as the join key and evaluates the range as
    a post-join filter — the scalable shape (the pure-range case is the
    bin-join used by the mesh weights builder, plans/weights.py).
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return joined.filter(
        (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 30 DAY"))
    ).select(
        "l_orderkey",
        "l_linenumber",
        "o_orderdate",
        _r4(F.col("l_extendedprice")).alias("price"),
    )


@_register(
    "join_theta_nl",
    """
    SELECT s_suppkey, s_name, c_custkey
    FROM supplier
    JOIN customer
      ON s_nationkey = c_nationkey AND c_acctbal > s_acctbal * 2
    """,
)
def join_theta_nl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi component + non-equi comparison."""
    supp = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    return supp.join(
        cust,
        (supp.s_nationkey == cust.c_nationkey) & (cust.c_acctbal > supp.s_acctbal * 2),
    ).select("s_suppkey", "s_name", "c_custkey")



# (date, orderkey) -> BIGINT packing shared by the as-of picks: day
# count (< 2^15) shifted by 2^40 leaves room for order keys up to
# ~10^12 — far past any plausible scale factor. ONE definition so the
# shift and its unpack can never diverge between the backward/forward
# variants (review r11).
_ASOF_SHIFT = 1 << 40


def _asof_pack() -> F.Column:
    return (
        F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long")
        * F.lit(_ASOF_SHIFT)
        + F.col("o_orderkey")
    )


def _asof_unpack(date_alias: str) -> list:
    """Columns recovering (o_orderkey, formatted date) from `bp`."""
    return [
        (F.col("bp") % F.lit(_ASOF_SHIFT)).alias("o_orderkey"),
        # integer div: packed values pass 2^53, fp division would
        # round the day count
        F.date_format(
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                F.expr(f"bp div {_ASOF_SHIFT}").cast("int"),
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias(date_alias),
    ]


@_register(
    "join_asof",
    """
    WITH ranked AS (
      SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id
                   AND o.o_orderdate <= e.ts - INTERVAL 28 YEAR
    )
    SELECT event_id, user_id, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS asof_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event's timestamp.

    Implemented as equi-join on the customer key (the range predicate
    evaluates post-join) + max(struct(o_orderdate, o_orderkey)) per
    probe: the lexicographic struct max IS the as-of pick with the
    o_orderkey tie-break, and unlike a row_number window it partial-
    aggregates map-side — the shuffle carries one row per event, not
    the whole joined set. Event times align back 28 years into the
    order era (fixture events are 2024, orders 1995-2001) so the
    at-or-before predicate is LIVE — per-event picks vary with the
    event time instead of degenerating to each user's newest order.
    """
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    aligned = events.ts - F.expr("INTERVAL 28 YEARS")
    joined = events.join(
        orders,
        (orders.o_custkey == events.user_id) & (orders.o_orderdate <= aligned),
    )
    # the lexicographic (o_orderdate, o_orderkey) max, packed into ONE
    # BIGINT: max(struct) only plans as a SortAggregate (struct isn't a
    # mutable hash-agg buffer type), which buys two per-task sorts of
    # the expanded join output; max(bigint) hash-aggregates in
    # whole-stage codegen (packing shared via _asof_pack/_asof_unpack).
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.max(_asof_pack()).alias("bp"))
        .select("event_id", "user_id", *_asof_unpack("asof_orderdate"))
    )


@_register(
    "join_asof_union_window",
    """
    WITH ranked AS (
      SELECT e.event_id, e.ts, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id
                   AND o.o_orderdate <= e.ts - INTERVAL 28 YEAR
    )
    SELECT event_id, user_id, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS asof_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_union_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, sort-based strategy (the SURVEY §2B union+window
    form): union both inputs on one timeline keyed by customer, sort
    within each key, and carry the latest order forward with
    last(ignorenulls) over an unbounded-preceding frame.

    Same result as join_asof's join+aggregate form, different cost
    shape: ONE shuffle on the key and no joined intermediate at all —
    wins when probe rows pair with many earlier build rows (the
    expansion the join form materializes and then aggregates away).
    Equal timestamps sort orders before events (is_event ascending) so
    an order dated exactly at the event time qualifies; same-date
    orders sort by o_orderkey so `last` picks the largest — both
    matching the oracle's DESC, DESC rank. Event times align back 28
    years into the order era (see join_asof)."""
    events = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        (F.col("ts") - F.expr("INTERVAL 28 YEARS")).alias("t"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("key"),
        F.col("o_orderdate").alias("t"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_orderdate",
    )
    timeline = events.unionByName(orders)
    w = (
        W.partitionBy("key")
        .orderBy("t", "is_event", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    best = F.last(
        F.when(F.col("is_event") == 0, F.struct("o_orderdate", "o_orderkey")),
        ignorenulls=True,
    ).over(w)
    return (
        timeline.withColumn("best", best)
        .filter((F.col("is_event") == 1) & F.col("best").isNotNull())
        .select(
            "event_id",
            F.col("key").alias("user_id"),
            F.col("best.o_orderkey").alias("o_orderkey"),
            F.date_format("best.o_orderdate", "yyyy-MM-dd HH:mm:ss").alias(
                "asof_orderdate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@_register(
    "agg_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)            AS n_customers,
           count(*)                             AS n_orders,
           CAST(sum(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT))
                AS BIGINT) / 100.0              AS sum_distinct_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates (expand + two-phase agg under the hood).
    The distinct sum runs over exact integer CENTS (the tpch_q15
    idiom): round(sum(DISTINCT double), 4) was only deterministic
    while the 4-dp rounding margin exceeded the parallel-fold reorder
    error, which stopped holding at sf0.1 (~1.2e10 sums over ~50k
    terms); integer cents remove the boundary at every scale
    (VERDICT r09 #4)."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        (F.sum_distinct(cents) / 100.0).alias("sum_distinct_price"),
    )


@_register("agg_approx_distinct")  # no oracle: HLL++ sketch value is engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++): sketch-based, rows-only check.

    The scale path for 100TB distinct-counts: constant memory per group
    vs the expand+shuffle of exact countDistinct.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )


@_register(
    "agg_stats",
    """
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS std_price,
           round(var_samp(l_extendedprice), 4)    AS var_price,
           round(min(l_extendedprice), 4)         AS min_price,
           round(max(l_extendedprice), 4)         AS max_price,
           round(avg(l_extendedprice), 4)         AS avg_price,
           round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4)
                                                  AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates incl. exact interpolated median.

    Validity bound (review r11): var/stddev fold double co-moments
    whose parallel-order error grows with group size, so the 4dp
    oracle hash is guaranteed only while groups stay under ~1e9 rows
    (~1 decade above the sf0.1 fixture; q1's money sums moved to
    exact decimals, but co-moments have no decimal form). At data
    scales beyond that, compare with a tolerance, not a hash."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _r4(F.stddev_samp("l_extendedprice")).alias("std_price"),
        _r4(F.var_samp("l_extendedprice")).alias("var_price"),
        _r4(F.min("l_extendedprice")).alias("min_price"),
        _r4(F.max("l_extendedprice")).alias("max_price"),
        _r4(F.avg("l_extendedprice")).alias("avg_price"),
        _r4(F.expr("percentile(l_extendedprice, 0.5)")).alias("median_price"),
    )


@_register(
    "agg_rollup",
    """
    SELECT r_name, n_name,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 4)
             AS total_bal,
           count(*)                 AS n_cust
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> grand total).

    total_bal sums c_acctbal as an exact DECIMAL(12,2) (2dp by
    construction; optimization r13, q1's discipline): the rollup's
    grand-total group spans the whole table, so a double sum's fold
    order would reach the 4dp grid at scale."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    return joined.rollup("r_name", "n_name").agg(
        _r4(F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double"))
        .alias("total_bal"),
        F.count("*").alias("n_cust"),
    )


@_register(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
                 / count(*), 4) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets).

    avg_price derives from the exact DECIMAL(12,2) sum over the
    count (optimization r13): the cube's coarse cells span the table
    at scale, so a double avg's fold order would reach the 4dp grid;
    one deterministic double division replaces it on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n"),
        _r4(
            F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double")
            / F.count("*")
        ).alias("avg_price"),
    )


@_register(
    "agg_grouping_sets",
    """
    SELECT c_mktsegment, n_name, count(*) AS n,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE), 4)
             AS bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY GROUPING SETS ((c_mktsegment), (n_name))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (disjoint rollup dimensions) — pure
    DataFrame groupingSets API, no temp view: a fixed-name
    createOrReplaceTempView mutates global catalog state and races
    across interleaved sf_dirs in one session."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    j = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    return j.groupingSets(
        [["c_mktsegment"], ["n_name"]], "c_mktsegment", "n_name"
    ).agg(
        F.count("*").alias("n"),
        # exact decimal: per-segment groups span the table at scale
        # (optimization r13, q1's discipline)
        _r4(F.sum(F.col("c_acctbal").cast("decimal(12,2)")).cast("double"))
        .alias("bal"),
    )


@_register(
    "agg_pivot",
    """
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0.0), 4) AS qty_O,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0.0), 4) AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot long -> wide (the regrid sink's long->2D pivot in miniature,
    SURVEY O20)."""
    li = load_table(spark, sf_dir, "lineitem")
    pv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return pv.select(
        "l_returnflag",
        _r4(F.coalesce(F.col("O"), F.lit(0.0))).alias("qty_O"),
        _r4(F.coalesce(F.col("F"), F.lit(0.0))).alias("qty_F"),
    )


@_register(
    "agg_unpivot",
    """
    SELECT l_orderkey, l_linenumber, k AS measure, round(v, 4) AS val
    FROM (
      SELECT l_orderkey, l_linenumber,
             unnest(['quantity', 'extendedprice']) AS k,
             unnest([l_quantity, l_extendedprice]) AS v
      FROM lineitem WHERE l_orderkey < 100
    )
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot wide -> long (stack)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(2, 'quantity', l_quantity, 'extendedprice', l_extendedprice) AS (measure, v)",
    ).select("l_orderkey", "l_linenumber", "measure", _r4(F.col("v")).alias("val"))


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@_register(
    "win_rank",
    """
    SELECT p_brand, p_partkey, round(p_retailprice, 4) AS price,
           row_number()  OVER w AS rn,
           rank()        OVER w AS rnk,
           dense_rank()  OVER w AS drnk
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window trio with a total order (price desc, key asc)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return part.select(
        "p_brand",
        "p_partkey",
        _r4(F.col("p_retailprice")).alias("price"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@_register(
    "win_running",
    """
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_spend,
           round(avg(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)         AS ma3
    FROM orders
    """,
)
def win_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frames: running total + 3-row moving average."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        _r4(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0))).alias(
            "running_spend"
        ),
        _r4(F.avg("o_totalprice").over(w.rowsBetween(-2, 0))).alias("ma3"),
    )


@_register(
    "win_lag_lead",
    """
    SELECT user_id, event_id,
           lag(event_type)  OVER w AS prev_type,
           lead(event_type) OVER w AS next_type,
           coalesce(epoch_us(ts) - epoch_us(lag(ts) OVER w), -1) AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation + inter-event gap (sessionization primitive)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    return events.select(
        "user_id",
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        F.coalesce(gap, F.lit(-1)).cast("bigint").alias("gap_us"),
    )


@_register(
    "topk_per_group",
    """
    SELECT p_brand, p_partkey, round(p_retailprice, 4) AS price
    FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             row_number() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      FROM part
    ) WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts per brand (window + filter; no global sort)."""
    part = load_table(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", _r4(F.col("p_retailprice")).alias("price"))
    )


@_register(
    "sort_limit",
    """
    SELECT o_orderkey, round(o_totalprice, 4) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject (per-partition
    heap + driver merge, no full sort) — the scalable global-limit."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
        .select("o_orderkey", _r4(F.col("o_totalprice")).alias("total"))
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@_register(
    "setop_union_distinct",
    """
    SELECT nk FROM (
      SELECT c_nationkey AS nk FROM customer
      UNION
      SELECT s_nationkey AS nk FROM supplier
    )
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.union(supp).distinct()


@_register(
    "setop_intersect",
    """
    SELECT c_nationkey AS nk FROM customer
    INTERSECT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (nations having both customers and suppliers)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.intersect(supp)


@_register(
    "setop_except",
    """
    SELECT c_nationkey AS nk FROM customer
    EXCEPT
    SELECT s_nationkey AS nk FROM supplier
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (nations with customers but no suppliers)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.subtract(supp)


# ---------------------------------------------------------------------------
# Scalar functions: string / date / math / conditional / JSON / array
# ---------------------------------------------------------------------------


@_register(
    "scalar_string_date",
    """
    SELECT o_orderkey,
           upper(o_orderstatus)                                  AS status_u,
           substr(o_orderpriority, 1, 1)                         AS prio_code,
           concat(o_orderstatus, '-', o_orderpriority)           AS status_prio,
           length(o_orderpriority)                               AS prio_len,
           strftime(o_orderdate, '%Y%m%dT%H%M%S') || 'Z'         AS ts_compact,
           CAST(year(o_orderdate) AS INT)                        AS yr,
           CAST(month(o_orderdate) AS INT)                       AS mo,
           strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d')   AS due_date
    FROM orders
    WHERE o_orderkey < 200
    """,
)
def scalar_string_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String+date scalar suite incl. the reference's exact filename
    timestamp format `yyyyMMdd'T'HHmmss` + 'Z'
    (run/adcircTime2cogs.py:192, SURVEY O18)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return orders.select(
        "o_orderkey",
        F.upper("o_orderstatus").alias("status_u"),
        F.substring("o_orderpriority", 1, 1).alias("prio_code"),
        F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("status_prio"),
        F.length("o_orderpriority").alias("prio_len"),
        F.concat(F.date_format("o_orderdate", "yyyyMMdd'T'HHmmss"), F.lit("Z")).alias(
            "ts_compact"
        ),
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 DAY"), "yyyy-MM-dd"
        ).alias("due_date"),
    )


@_register(
    "scalar_path_parse",
    """
    SELECT doc_id,
           replace(source, 'src', 'part')                 AS renamed,
           split_part(concat('a/b/', source, '.nc'), '/', 3) AS seg,
           regexp_replace(concat(source, '.nc'), '\\.nc$', '', 'g') AS stem
    FROM documents
    WHERE doc_id < 100
    """,
)
def scalar_path_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path/filename derivation ops: the reference's run-id extraction
    `inputDir.split('/')[2]` and `.nc` strip
    (run/adcircTime2cogs.py:124-131, SURVEY O19)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.regexp_replace("source", "src", "part").alias("renamed"),
        F.element_at(F.split(F.concat(F.lit("a/b/"), F.col("source"), F.lit(".nc")), "/"), 3).alias(
            "seg"
        ),
        F.regexp_replace(F.concat(F.col("source"), F.lit(".nc")), r"\.nc$", "").alias("stem"),
    )


@_register(
    "scalar_math",
    """
    SELECT l_orderkey, l_linenumber,
           round(abs(l_discount - 0.05), 4)                    AS v_abs,
           CAST(ceil(l_quantity) AS BIGINT)                    AS v_ceil,
           CAST(floor(l_quantity) AS BIGINT)                   AS v_floor,
           round(sqrt(l_extendedprice), 4)                     AS v_sqrt,
           round(ln(l_extendedprice + 1), 4)                   AS v_ln,
           round(pow(1 + l_tax, 2), 4)                         AS v_pow,
           CAST(l_orderkey % 7 AS BIGINT)                      AS v_mod,
           round(greatest(l_discount, l_tax), 4)               AS v_max2,
           round(least(l_discount, l_tax), 4)                  AS v_min2
    FROM lineitem
    WHERE l_orderkey < 150
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar suite (abs/ceil/floor/sqrt/ln/pow/mod/greatest/least)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 150)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _r4(F.abs(F.col("l_discount") - 0.05)).alias("v_abs"),
        F.ceil("l_quantity").alias("v_ceil"),
        F.floor("l_quantity").alias("v_floor"),
        _r4(F.sqrt("l_extendedprice")).alias("v_sqrt"),
        _r4(F.log(F.col("l_extendedprice") + 1)).alias("v_ln"),
        _r4(F.pow(1 + F.col("l_tax"), 2)).alias("v_pow"),
        (F.col("l_orderkey") % 7).alias("v_mod"),
        _r4(F.greatest("l_discount", "l_tax")).alias("v_max2"),
        _r4(F.least("l_discount", "l_tax")).alias("v_min2"),
    )


@_register(
    "scalar_conditional",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END                    AS bal_band,
           coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'OTHER') AS seg_masked,
           CAST(c_acctbal >= 0 AS INT)             AS is_positive
    FROM customer
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif / boolean-to-int casts."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "low")
        .otherwise("high")
        .alias("bal_band"),
        F.coalesce(F.nullif("c_mktsegment", F.lit("AUTOMOBILE")), F.lit("OTHER")).alias(
            "seg_masked"
        ),
        (F.col("c_acctbal") >= 0).cast("int").alias("is_positive"),
    )


@_register(
    "json_extract",
    """
    SELECT event_id, event_type,
           CAST(props->>'$.k' AS BIGINT) AS k_val
    FROM events
    WHERE CAST(props->>'$.k' AS BIGINT) > 50
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events props column."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.select(
        "event_id", "event_type", k.alias("k_val")
    ).filter(F.col("k_val") > 50)


@_register(
    "array_ops",
    """
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4)           AS first_v,
           round(CAST(embedding[64] AS DOUBLE), 4)          AS last_v,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS sum_v,
           round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS max_v
    FROM embeddings
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array scalar suite over the embedding column: size / element_at /
    fold(sum) / array_max — the building blocks of the similarity ops."""
    emb = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        _r4(F.element_at("embedding", 1).cast("double")).alias("first_v"),
        _r4(F.element_at("embedding", 64).cast("double")).alias("last_v"),
        _r4(F.aggregate(as_double, F.lit(0.0), lambda a, x: a + x)).alias("sum_v"),
        _r4(F.array_max(as_double)).alias("max_v"),
    )


@_register(
    "array_explode_agg",
    """
    SELECT pos, round(avg(v), 4) AS avg_v, round(sum(v), 4) AS sum_v
    FROM (
      SELECT u.v AS v, u.pos AS pos
      FROM embeddings,
           LATERAL (SELECT CAST(unnest(embedding) AS DOUBLE) AS v,
                           generate_subscripts(embedding, 1) AS pos) u
    )
    WHERE pos <= 8
    GROUP BY pos
    """,
)
def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode + per-position aggregate (columnar stats over vectors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(F.posexplode("embedding").alias("pos0", "v_f")).select(
        (F.col("pos0") + 1).alias("pos"), F.col("v_f").cast("double").alias("v")
    )
    return (
        exploded.filter(F.col("pos") <= 8)
        .groupBy("pos")
        .agg(_r4(F.avg("v")).alias("avg_v"), _r4(F.sum("v")).alias("sum_v"))
    )


@_register(
    "join_asof_forward",
    """
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (PARTITION BY e.event_id
                                ORDER BY o.o_orderdate, o.o_orderkey) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id
                   AND o.o_orderdate >= e.ts - INTERVAL 28 YEAR
    )
    SELECT event_id, user_id, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS next_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: EARLIEST order at-or-after each event
    (join_asof's mirror — lookahead instead of lookback). Same
    aggregate-based strategy as join_asof: equi-join on the customer
    key + the lexicographic (o_orderdate, o_orderkey) MIN packed into
    one BIGINT, so the pick hash-aggregates in whole-stage codegen
    (min(struct) would regress to SortAggregate — see join_asof).
    Event times align back 28 years into the order era (see
    join_asof); without it no order is ever at-or-after an event and
    the query is vacuously empty."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    aligned = events.ts - F.expr("INTERVAL 28 YEARS")
    joined = events.join(
        orders,
        (orders.o_custkey == events.user_id) & (orders.o_orderdate >= aligned),
    )
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.min(_asof_pack()).alias("bp"))
        .select("event_id", "user_id", *_asof_unpack("next_orderdate"))
    )


@_register(
    "join_asof_nearest",
    """
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             row_number() OVER (
               PARTITION BY e.event_id
               ORDER BY abs(date_diff('day', CAST(e.ts - INTERVAL 28 YEAR AS DATE),
                                      CAST(o.o_orderdate AS DATE))),
                        CASE WHEN CAST(o.o_orderdate AS DATE)
                                  > CAST(e.ts - INTERVAL 28 YEAR AS DATE) THEN 1 ELSE 0 END,
                        o.o_orderkey) AS rn
      FROM events e
      JOIN orders o ON o.o_custkey = e.user_id
      WHERE abs(date_diff('day', CAST(e.ts - INTERVAL 28 YEAR AS DATE),
                          CAST(o.o_orderdate AS DATE))) <= 90
    )
    SELECT event_id, user_id, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS nearest_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (merge_asof direction='nearest'): the order
    closest IN EITHER DIRECTION to each event, at day granularity (the
    orders table is day-granular), bounded to a ±90-day tolerance;
    equidistant past/future ties break toward the PAST order, then the
    lowest orderkey — a total order, so the pick is deterministic in
    both engines.

    Same hash-agg argmin strategy as join_asof/join_asof_forward: the
    composite ordering (|Δdays|, is_future, orderkey) packs into ONE
    BIGINT ((|Δdays|·2 + is_future) · 2^40 + orderkey — |Δdays| ≤ 90
    keeps the product far under 2^63 and orderkey rides the low bits
    uncompressed, so the key is unique per candidate and every
    per-column min_by picks the SAME row). All agg buffers primitive →
    HashAggregate with map-side partials; integer day arithmetic means
    no float truncation can diverge from the oracle's ranking. Event
    times align back 28 years into the order era (see join_asof) —
    the ±90-day tolerance can never match across the fixture's raw
    23-year gap."""
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders")
    dd = F.datediff(
        F.to_date("o_orderdate"),
        F.to_date(F.col("ts") - F.expr("INTERVAL 28 YEARS")),
    )
    joined = (
        events.join(orders, orders.o_custkey == events.user_id)
        .withColumn("dd", dd)
        .filter(F.abs(F.col("dd")) <= 90)
    )
    key = (
        (F.abs(F.col("dd")).cast("long") * 2
         + F.when(F.col("dd") > 0, 1).otherwise(0))
        * F.lit(1 << 40)
        + F.col("o_orderkey")
    )
    days = F.datediff("o_orderdate", F.lit("1970-01-01")).cast("long")
    picked = (
        joined.withColumn("k", key)
        .groupBy("event_id", "user_id")
        .agg(
            F.min_by("o_orderkey", "k").alias("o_orderkey"),
            F.min_by(days, "k").alias("days"),
        )
    )
    return picked.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.date_format(
            F.date_add(F.lit("1970-01-01").cast("date"), F.col("days").cast("int")),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("nearest_orderdate"),
    )
