"""TPC-H decision-support suite (the classic shapes beyond Q1/Q3/Q18,
which live in relational.py / relational2.py).

The fixture schema is a reduced TPC-H — no partsupp table, and
lineitem carries only shipdate (no commit/receipt dates) — so every
query is adapted to the columns that exist and each docstring notes
its adaptation. The partsupp queries (Q2/Q11/Q16/Q20) run against a
deterministic PSEUDO-PARTSUPP derived from the part x supplier keys
(see _pseudo_partsupp below): the derivation is pure column
arithmetic, stated identically in the oracle SQL, so the four
queries exercise their canonical plan shapes (min-cost correlated
subquery, group-threshold having, distinct-supplier counting,
excess-stock semi-join chain) with externally hashable results.
Q4/Q12/Q21's commit/receipt lateness predicates are restated on
shipdate offsets the same way. What matters for the engine is the PLAN SHAPE each
query exercises — multi-hop dim pruning (Q5), pure scan-pushdown agg
(Q6), bi-directional nation pairing (Q7), top-k over a filtered
fact join (Q10), outer-join histogram (Q13), conditional-aggregate
ratio (Q14), scalar-max semi-selection (Q15), correlated per-group
threshold (Q17), disjunctive multi-range predicates (Q19), and
anti-join with a global scalar gate (Q22).

Money arithmetic follows the repo convention (optimization r13 —
q1's exact-decimal discipline): per-line revenue terms are EXACT
decimals (DECIMAL(12,2) price x (1 - DECIMAL(4,2)) discount — the
fixture's money columns are 2dp by construction, so the product is
the exact 4dp value), summed in exact decimal so the result is
order-independent at any scale, then cast to double for the
bit-stable r4. Any value that feeds a cross-engine comparison,
ratio, or threshold is projected to exact integer cents/units
(CAST(round(x*100) AS BIGINT)) so fold order can never flip a
filter or a rank (see functions/numeric.py).

Reference parity: the reference engine has no relational suite at
all (its pipeline is run/adcircTime2cogs.py:199-207 regrid+COG); this
module is part of the §2B "required categories" coverage — joins,
aggregation, subqueery decorrelation — at TPC-H's canonical shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adcirctime2cogs_spark.functions.numeric import r4
from adcirctime2cogs_spark.tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _rev_term() -> F.Column:
    """Per-line revenue l_extendedprice*(1-l_discount) as an EXACT
    decimal (optimization r13, q1's discipline): the money columns are
    2dp by construction, so DECIMAL(12,2) * (1 - DECIMAL(4,2)) is the
    exact 4dp line revenue — numerically identical to the previous
    4dp-rounded double term, but its SUM is order-independent, so the
    revenue aggregates no longer depend on the scan's fold order (and
    under-split scans may be spread). Consumers r4() the sum, which
    casts the exact decimal to double before the bit-stable round."""
    return F.col("l_extendedprice").cast("decimal(12,2)") * (
        1 - F.col("l_discount").cast("decimal(4,2)")
    )


# oracle-side spelling of the same exact-decimal term
_REV_SQL = (
    "(CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (1 - CAST(l_discount AS DECIMAL(4,2))))"
)


@_register(
    "tpch_q4_order_priority",
    f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
      AND o.o_orderdate <  TIMESTAMP '1996-10-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted: the fixture has no
    l_commitdate/l_receiptdate, so "late" is a lineitem shipped more
    than 60 days after the order date — same EXISTS-correlated
    semi-join shape, same quarter window.

    Plan shape: the date range pushes to the orders scan, the EXISTS
    becomes a LeftSemi equi-join on orderkey with the ship-lag
    residual as a join filter (no secondary shuffle, no decorrelation
    subquery re-scan), then a 5-group hash agg. At 100 TB the semi
    join keeps only one bit per order — nothing from lineitem is
    carried past the join."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
        "semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@_register(
    "tpch_q5_local_supplier",
    f"""
    SELECT n_name, round(sum({_REV_SQL}), 4) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation where the
    customer and supplier share an ASIA nation.

    Plan shape at 100 TB: region→nation→supplier collapses into ONE
    broadcast dim (region 5 rows prunes nation, nation prunes
    supplier; supplier is ~10k rows/SF — MBs even at SF1e5). The two
    fact tables join on orderkey (shuffle), the dim broadcasts into
    the fact side, and customer joins last on custkey with the
    c_nationkey = s_nationkey residual as a join filter — AQE picks
    shuffle vs broadcast for that side by actual post-filter size.
    Both date bounds push to the orders scan."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    return (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(
            c,
            (F.col("o_custkey") == c.c_custkey)
            & (c.c_nationkey == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(r4(F.sum(_rev_term())).alias("revenue"))
    )


@_register(
    "tpch_q6_revenue_forecast",
    """
    SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE),
                 4) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): the canonical
    scan-pushdown aggregate — no join, no groupBy key, one global sum.

    Plan shape: every predicate (two date bounds, discount band,
    quantity cap) reaches the parquet scan as a pushed filter and the
    scan reads only 4 columns; the aggregate is a partial+final pair
    with a single-row exchange. This is the query where scan
    efficiency IS the query — at 100 TB it is bounded by parquet
    row-group pruning, not compute."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            r4(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(12,2)")
                    * F.col("l_discount").cast("decimal(4,2)")
                ).cast("double")
            ).alias("revenue")
        )
    )


@_register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           round(sum({_REV_SQL.replace('l_', 'l.l_')}), 4) AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(year(l.l_shipdate) AS INT)
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): trade volume between two nations in
    both directions, by ship year.

    Plan shape: the nation filter prunes BOTH dim chains before they
    touch a fact table — supplier and customer are each semi-reduced
    to two nations by a broadcast join, so the fact-side shuffle
    (lineitem ⋈ orders on orderkey) carries only the ~8% of rows a
    two-nation supplier produces, and the cross-pair disjunction runs
    as a cheap residual on the already-joined row, not as a join
    strategy. Group key cardinality is 2 pairs × years."""
    nations = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cus = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nations), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cus, o.o_custkey == cus.c_custkey)
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(r4(F.sum(_rev_term())).alias("revenue"))
    )


@_register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           round(sum({_REV_SQL.replace('l_', 'l.l_')}), 4) AS revenue,
           round(c.c_acctbal, 4) AS acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned item reporting): top-20 customers by lost
    revenue on returned lines in one quarter. (The fixture customer
    has no address/phone/comment columns; the projection carries what
    exists.)

    Plan shape: both selective predicates (quarter on orders,
    returnflag on lineitem) push to their scans BEFORE the orderkey
    shuffle; aggregation keys on the customer so the wide customer/
    nation attributes join AFTER the agg onto ~|customers| rows, and
    the top-20 plans as TakeOrderedAndProject (per-partition heap, no
    global sort). Revenue is bit-stable (r4 terms) and ties break on
    c_custkey, so rank order cannot flip across engines."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(r4(F.sum(_rev_term())).alias("revenue"))
    )
    return (
        rev.join(c, rev.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            r4(F.col("c_acctbal")).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@_register(
    "tpch_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey
       AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
)
def tpch_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by
    non-urgent order count, zeros preserved. (The spec's o_comment
    NOT LIKE filter is adapted to a priority filter — the fixture has
    no comment column; the shape under test is the filtered LEFT
    OUTER join whose filter must stay on the JOIN, not the WHERE,
    to keep zero-order customers.)

    Plan shape: the priority filter pushes to the orders scan (it is
    a join-side filter, not an outer-side one), the outer join
    shuffles on custkey, and the double aggregate is two hash aggs —
    the second one tiny (≤ max order count keys). At 100 TB the
    first agg's map-side combine collapses each customer's orders
    before the exchange."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@_register(
    "tpch_q14_promo_effect",
    f"""
    SELECT round(
      100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                       THEN CAST(round({_REV_SQL.replace('l_', 'l.l_')} * 10000) AS BIGINT)
                       ELSE 0 END)
            / sum(CAST(round({_REV_SQL.replace('l_', 'l.l_')} * 10000) AS BIGINT)),
      4) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): percentage of one month's revenue
    from PROMO-type parts (the fixture's p_type is a single token, so
    the spec's LIKE 'PROMO%%' is an equality).

    Plan shape: the month window pushes to the lineitem scan, part
    broadcasts (dim-scale), and the ratio is ONE pass — two
    conditional sums in the same aggregate, no second scan or join.
    Both sums are exact integers (the exact-decimal revenue terms
    scaled to 1e-4 units), so the final ratio is computed from
    identical values in both engines regardless of fold order."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-09-01")
        & (F.col("l_shipdate") < "1996-10-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    units = F.round(_rev_term() * 10000).cast("bigint")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    return j.agg(
        r4(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", units).otherwise(F.lit(0)))
            / F.sum(units)
        ).alias("promo_revenue_pct")
    )


@_register(
    "tpch_q15_top_supplier",
    """
    WITH rev AS (
      SELECT l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                           AS BIGINT)) AS BIGINT) AS total_cents
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM supplier s
    JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the supplier(s) with maximum revenue
    in a quarter — the create-view / scalar-max / equality-select
    shape.

    Plan shape: one hash agg over the quarter-filtered lineitem
    builds the per-supplier revenue ONCE, then a global-max window
    over that AGGREGATE (|suppliers| rows, not the fact table) selects
    the ties. The naive scalar-subquery form (rev.agg(max) broadcast
    back into rev) plans as TWO full lineitem scans: per-branch column
    pruning makes the two rev subtrees non-identical, so ReuseExchange
    never fires — measured 4 parquet scans vs this form's 1. Moving
    the per-supplier rollup to a single partition for the max is the
    explicit trade: ~|suppliers| tiny rows through one task vs a
    second 100 TB scan. Revenue is exact integer cents, so the
    max-equality cannot miss by an ulp in either engine."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    rev = li.groupBy("l_suppkey").agg(F.sum(cents).alias("total_cents"))
    mx = F.max("total_cents").over(W.partitionBy())
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.withColumn("mx", mx)
        .filter(F.col("total_cents") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
    )


@_register(
    "tpch_q17_small_qty_revenue",
    """
    SELECT round(
      sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) / 700.0, 4)
      AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#7'
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = p.p_partkey)
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): lines of one brand
    whose quantity is below 20% of that part's average — the
    correlated per-group threshold shape. (Adapted: brand only; the
    fixture part has no container column.)

    Plan shape: the brand filter prunes part to ~1/25 and broadcasts;
    the per-part 20%-of-average threshold is a window over the
    brand-pruned lines partitioned by partkey — ONE pass over one
    shuffle. The agg-then-broadcast-back decorrelation read the
    brand-pruned lineitem twice (per-branch column pruning diverges
    the two subtree copies, so ReuseExchange cannot merge them — the
    same defect fixed in Q2/Q15). Quantities are integral doubles, so
    their sums (hence the avg and the 0.2× threshold) are EXACT in
    any fold order; the final revenue is integer cents over 700.0."""
    from pyspark.sql import Window as W

    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#7"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_lines = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        li.l_partkey, "l_quantity", "l_extendedprice"
    )
    th = (F.lit(0.2) * F.avg("l_quantity").over(W.partitionBy("l_partkey")))
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    return (
        brand_lines.withColumn("th", th)
        .filter(F.col("l_quantity") < F.col("th"))
        .agg(r4(F.sum(cents) / 700.0).alias("avg_yearly"))
    )


@_register(
    "tpch_q19_disjunctive_pred",
    f"""
    SELECT round(sum({_REV_SQL.replace('l_', 'l.l_')}), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): the disjunction-of-conjunctions
    query — three (brand, size-range, quantity-range) branches OR'd
    together. (Adapted: p_size ranges instead of the container lists
    the fixture lacks.)

    Plan shape: the implied predicates are hoisted so each side still
    prunes — part scans only the 3 brands with size ≤ 15 (pushed
    IN + range filter), lineitem scans only quantity 1–30 (pushed
    range over the union of branches); the exact disjunction then
    runs as a residual on the broadcast join's output. Without the
    hoist the OR would defeat pushdown entirely and both scans would
    be full — the difference between reading 3/25ths and all of a
    100 TB fact table."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#3", "Brand#14")
        & (F.col("p_size") >= 1)
        & (F.col("p_size") <= 15)
    ).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 30)
    )
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#14")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(branch).agg(r4(F.sum(_rev_term())).alias("revenue"))


@_register(
    "tpch_q22_sales_opportunity",
    """
    WITH bal AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
      FROM customer
    )
    SELECT b.c_nationkey, count(*) AS numcust,
           CAST(sum(b.cents) AS BIGINT) AS total_cents
    FROM bal b
    WHERE b.cents > (SELECT avg(cents) FROM bal WHERE cents > 0)
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = b.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY b.c_nationkey
    """,
)
def tpch_q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no recent activity, counted per nation. (Adapted:
    grouped by nationkey instead of the phone country code the
    fixture lacks, and "never ordered" relaxed to "no order since
    2000-01-01" — every fixture customer has some order.)

    Plan shape: the global average is a one-row aggregate broadcast
    into a non-equi filter join (the allowlisted single-row BNLJ
    pattern); the NOT EXISTS is a LeftAnti equi-join against orders
    pre-filtered by the pushed date bound — at 100 TB the anti side
    scans only the recent partition range, not order history.
    Balances compare as exact integer cents against an
    exact-integer-ratio average, so membership cannot flip on
    fold order."""
    bal = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("bigint").alias("cents"),
    )
    avg_pos = bal.filter(F.col("cents") > 0).agg(
        F.avg("cents").alias("avg_cents")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    return (
        bal.join(F.broadcast(avg_pos), bal.cents > F.col("avg_cents"))
        .join(recent, bal.c_custkey == recent.o_custkey, "anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("cents").alias("total_cents"),
        )
    )


@_register(
    "tpch_q12_late_shipments",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY l.l_linestatus
    """,
)
def tpch_q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping modes and order priority), adapted: the
    fixture has no l_shipmode/commit/receipt dates, so the group key
    is l_linestatus and "late" is shipped more than 90 days after the
    order date — the SHAPE under test is Q12's join + dual
    conditional-count split of priorities per lineitem attribute
    (distinct from Q4's EXISTS semi-join: here the order attributes
    survive the join into the aggregate).

    Plan: one orderkey join with the lateness residual, then a 2-group
    hash agg computing both priority splits in the same pass — no
    second scan, no CASE-induced shuffle."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate", "l_linestatus")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Pseudo-partsupp: the fixture has no partsupp table, so the four
# partsupp queries (Q2/Q11/Q16/Q20) derive one from lineitem —
# supplier-part pairs that actually traded, with availqty = total
# quantity supplied and supplycost = the pair's best unit price in
# exact integer cents. What each query exercises is its PLAN SHAPE
# (correlated per-group min, global-fraction HAVING, NOT-IN grouped
# distinct count, nested semi-joins with a correlated threshold); the
# derived table feeds those shapes with deterministic integers.
# ---------------------------------------------------------------------------

_PS_SQL = """
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         CAST(round(sum(l_quantity)) AS BIGINT) AS ps_availqty,
         CAST(min(CAST(round(l_extendedprice / l_quantity * 100) AS BIGINT))
              AS BIGINT) AS ps_supplycost_cents
  FROM lineitem GROUP BY 1, 2
"""


def _pseudo_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of _PS_SQL. Unit price divides two doubles (IEEE —
    bit-identical across engines), rounds to cents, and min/sum from
    there are exact integers; quantities are whole numbers so the
    availqty round/cast cannot disagree either."""
    li = load_table(spark, sf_dir, "lineitem")
    unit_cents = F.round(
        F.col("l_extendedprice") / F.col("l_quantity") * 100
    ).cast("bigint")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.round(F.sum("l_quantity")).cast("bigint").alias("ps_availqty"),
        F.min(unit_cents).alias("ps_supplycost_cents"),
    )


@_register(
    "tpch_q2_min_cost_supplier",
    f"""
    WITH ps AS ({_PS_SQL}),
    offer AS (
      SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, s.s_acctbal,
             ps.ps_supplycost_cents
      FROM part p
      JOIN ps ON p.p_partkey = ps.ps_partkey
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE' AND p.p_type = 'LARGE'
    ),
    mn AS (SELECT p_partkey, min(ps_supplycost_cents) AS mc
           FROM offer GROUP BY 1)
    SELECT o.p_partkey, o.p_brand, o.s_name, o.n_name,
           round(o.s_acctbal, 4) AS s_acctbal, o.ps_supplycost_cents
    FROM offer o
    JOIN mn ON o.p_partkey = mn.p_partkey
           AND o.ps_supplycost_cents = mn.mc
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier), adapted to the pseudo-partsupp
    (no partsupp table; region EUROPE, p_type = 'LARGE' stands in for
    the size/type predicate). The correlated scalar subquery ("the
    region's minimum cost for this part") decorrelates into a per-part
    min aggregate joined back on (part, cost) equality.

    Plan shape: nation/region/supplier prune to a broadcast dim; the
    per-part minimum is a window over the offer rows partitioned by
    p_partkey — ONE pass over one shuffle, where the agg-then-join-back
    decorrelation would rebuild the offer subtree per branch (column
    pruning diverges the two copies, so ReuseExchange cannot merge
    them — measured 3 lineitem scans that way vs 2 here, and the ps
    aggregate itself computed once instead of twice). Cost membership
    is exact integer cents, so the min-equality cannot miss by an
    ulp. At 100 TB the big shuffles are the ps aggregate keyed by
    (part, supplier) and the window repartition by part."""
    from pyspark.sql import Window as W

    ps = _pseudo_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "LARGE")
    offer = (
        ps.join(dim, ps.ps_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .select(
            "p_partkey", "p_brand", "s_name", "n_name", "s_acctbal",
            "ps_supplycost_cents",
        )
    )
    mc = F.min("ps_supplycost_cents").over(W.partitionBy("p_partkey"))
    return (
        offer.withColumn("mc", mc)
        .filter(F.col("ps_supplycost_cents") == F.col("mc"))
        .select(
            "p_partkey", "p_brand", "s_name", "n_name",
            r4("s_acctbal").alias("s_acctbal"), "ps_supplycost_cents",
        )
    )


@_register(
    "tpch_q8_market_share",
    """
    WITH an AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
               AS cents,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
      JOIN region r ON n1.n_regionkey = r.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           round(CAST(sum(CASE WHEN supp_nation = 'NATION_13'
                               THEN cents ELSE 0 END) AS DOUBLE)
                 / CAST(sum(cents) AS DOUBLE), 4) AS mkt_share
    FROM an GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): NATION_13's share of AMERICA's
    ECONOMY-part revenue by order year. (Adapted only in constants —
    the fixture's synthetic nation names replace BRAZIL/STEEL.)

    Plan shape: the widest dim fan in the suite — part, two nation
    hops, region, customer, supplier all broadcast after pruning; the
    only shuffles are lineitem⋈orders on orderkey and the final
    2-group agg. The share divides two exact integer-cent sums as
    doubles, so the ratio is bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_nation = F.broadcast(
        c.join(
            n.join(r, n.n_regionkey == r.r_regionkey).select("n_nationkey"),
            c.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nation = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            n.select(
                F.col("n_nationkey").alias("sn_key"),
                F.col("n_name").alias("supp_nation"),
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    an = (
        li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cust_nation, o.o_custkey == F.col("c_custkey"))
        .join(supp_nation, li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
    )
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_13", F.col("cents")).otherwise(0)
    )
    return an.groupBy("o_year").agg(
        r4(num.cast("double") / F.sum("cents").cast("double")).alias("mkt_share")
    )


@_register(
    "tpch_q9_product_profit",
    """
    SELECT n.n_name, year(o.o_orderdate) AS o_year,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100)
                         AS BIGINT)
                    - CAST(round(p.p_retailprice * l.l_quantity * 10)
                           AS BIGINT)) AS BIGINT) AS profit_cents
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit) adapted: no partsupp supplycost,
    so cost is proxied by 10% of p_retailprice per unit (deterministic
    column math — the shape under test is the profit expression over a
    4-dim star with a LIKE filter, grouped by supplier nation x order
    year). All money terms are exact integer cents, summed as BIGINT.

    Plan shape: part (LIKE-filtered), supplier+nation broadcast;
    lineitem⋈orders shuffles on orderkey; one hash agg on the
    (nation, year) pair. Profit per line is computed before the
    aggregate — no re-scan, no join after the agg."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", "n_name")
    )
    rev_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("bigint")
    cost_cents = F.round(
        F.col("p_retailprice") * F.col("l_quantity") * 10
    ).cast("bigint")
    return (
        li.join(
            F.broadcast(p.select("p_partkey", "p_retailprice")),
            li.l_partkey == p.p_partkey,
        )
        .join(supp, li.l_suppkey == F.col("s_suppkey"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .select(
            "n_name",
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            (rev_cents - cost_cents).alias("profit"),
        )
        .groupBy("n_name", "o_year")
        .agg(F.sum("profit").alias("profit_cents"))
    )


@_register(
    "tpch_q11_important_stock",
    f"""
    WITH ps AS ({_PS_SQL}),
    val AS (
      SELECT ps.ps_partkey,
             CAST(sum(ps.ps_supplycost_cents * ps.ps_availqty) AS BIGINT)
               AS value_cents
      FROM ps
      JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name IN ('EUROPE', 'ASIA')
      GROUP BY 1
    )
    SELECT ps_partkey, value_cents FROM val
    WHERE value_cents > (SELECT CAST(round(sum(value_cents) * 1.5 / count(*))
                                     AS BIGINT) FROM val)
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock identification) over pseudo-partsupp:
    per-part inventory value for EUROPE+ASIA suppliers, kept where the
    value exceeds a global threshold. Adapted threshold: 1.5x the mean
    part value rather than fraction-of-total — the original's 0.0001/SF
    scales with the part count, and mean-relative is the scale-invariant
    equivalent (≈7% selectivity at every fixture SF).

    Plan shape: one hash agg builds val; the threshold is a one-row
    aggregate of that same exchange broadcast into the filter
    (allowlisted single-row BNLJ) — the HAVING-on-global-scalar
    decorrelation. The threshold's count deliberately references
    ps_partkey (not count(*)): both branches then prune val's subtree
    to the same two columns, the canonical plans match, and
    ReuseExchange collapses them to ONE ps/lineitem pass (verified: 1
    lineitem scan + 1 ReusedExchange in the final plan; with count(*)
    the branches diverge and the whole ps aggregate runs twice).
    Exact integer cents both sides of the compare."""
    ps = _pseudo_partsupp(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("EUROPE", "ASIA")
    )
    dim = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    val = (
        ps.join(dim, ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("value_cents")
        )
    )
    thr = val.agg(
        F.round(F.sum("value_cents") * 1.5 / F.count("ps_partkey"))
        .cast("bigint")
        .alias("thr")
    )
    return (
        val.crossJoin(F.broadcast(thr))
        .filter(F.col("value_cents") > F.col("thr"))
        .select("ps_partkey", "value_cents")
    )


@_register(
    "tpch_q16_supplier_count",
    """
    WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT pairs.l_suppkey) AS supplier_cnt
    FROM pairs JOIN part p ON p.p_partkey = pairs.l_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1,4,7,10,13,16,19,22,25,28,31,34,37,40,43,46,49)
      AND pairs.l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
    GROUP BY 1, 2, 3
    """,
)
def tpch_q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship) adapted: partsupp pairs
    come from lineitem, and the "customer complaints" supplier
    exclusion (the fixture has no s_comment) becomes accounts in
    arrears (s_acctbal < 1000) — same NOT IN anti-join shape.

    Plan shape: distinct pair projection (map-side combinable), part
    broadcast after brand/type/size pruning, LeftAnti against the tiny
    excluded-supplier list (suppkey is non-null, so NOT IN == anti
    join), then count(DISTINCT supplier) per (brand, type, size)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(*range(1, 50, 3))
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 1000
    ).select("s_suppkey")
    return (
        pairs.join(
            F.broadcast(p.select("p_partkey", "p_brand", "p_type", "p_size")),
            pairs.l_partkey == p.p_partkey,
        )
        .join(
            F.broadcast(excluded),
            pairs.l_suppkey == F.col("s_suppkey"),
            "anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@_register(
    "tpch_q20_excess_stock",
    f"""
    WITH ps AS ({_PS_SQL}),
    shipped96 AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty96
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT ps.ps_suppkey FROM ps
      JOIN shipped96 sh ON sh.l_partkey = ps.ps_partkey
                       AND sh.l_suppkey = ps.ps_suppkey
      WHERE ps.ps_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'cold%')
        AND ps.ps_availqty > 8 * sh.qty96
    )
    """,
)
def tpch_q20_excess_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (potential part promotion) adapted: suppliers holding
    excess stock of 'cold%' parts — availqty (pseudo: all-time supplied
    quantity) above 8x what the pair shipped in 1996. The multiplier
    replaces the original's 0.5x-of-year because pseudo-availqty spans
    the fixture's ~6.5 years (8x keeps real selectivity at every SF:
    8/10, 15/100, 16/1000 suppliers).

    Plan shape: the nested IN chain becomes semi-joins — part names
    prune ps, the correlated per-pair scalar (that year's shipped
    quantity) is an equi-join on the (part, supplier) pair rather than
    a per-row subquery re-scan, and suppliers are kept by a final semi
    join. Both sides of the threshold compare exactly (integers vs
    0.5-exact doubles)."""
    ps = _pseudo_partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    shipped96 = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty96"))
    )
    cold = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("cold%")
    ).select("p_partkey")
    cand = (
        ps.join(
            shipped96,
            (ps.ps_partkey == shipped96.l_partkey)
            & (ps.ps_suppkey == shipped96.l_suppkey),
        )
        .join(F.broadcast(cold), ps.ps_partkey == F.col("p_partkey"), "semi")
        .filter(F.col("ps_availqty") > 8 * F.col("qty96"))
        .select("ps_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        cand, s.s_suppkey == F.col("ps_suppkey"), "semi"
    ).select("s_suppkey", "s_name")


@_register(
    "tpch_q21_waiting_orders",
    """
    WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
    late AS (
      SELECT DISTINCT l.l_orderkey, l.l_suppkey
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    ),
    ostats AS (
      SELECT p.l_orderkey,
             count(*) AS n_supp,
             count(lt.l_suppkey) AS n_late,
             max(lt.l_suppkey) AS late_supp
      FROM pairs p
      LEFT JOIN late lt ON lt.l_orderkey = p.l_orderkey
                       AND lt.l_suppkey = p.l_suppkey
      GROUP BY 1
    )
    SELECT s.s_name, count(*) AS numwait
    FROM ostats JOIN supplier s ON s.s_suppkey = ostats.late_supp
    WHERE ostats.n_supp > 1 AND ostats.n_late = 1
    GROUP BY 1
    """,
)
def tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting) adapted: "late" is
    shipped >60 days after the order date (no commit/receipt dates),
    and the metric counts waiting ORDERS per sole-late supplier.

    Plan shape: the original's EXISTS + NOT-EXISTS double correlated
    self-scan of lineitem is rewritten as ONE grouped pass — distinct
    (order, supplier) pairs left-joined to the late subset, then
    per-order counts decide "multi-supplier AND exactly one late" and
    max() recovers that sole supplier (exact because n_late = 1).
    Three scans of lineitem collapse to two, and the per-order state
    is three small integers — at 100 TB this is one orderkey shuffle
    instead of two correlated sub-plans re-shuffling per predicate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    pairs = li.select("l_orderkey", "l_suppkey").distinct()
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select(
            F.col("l_orderkey").alias("lt_orderkey"),
            F.col("l_suppkey").alias("lt_suppkey"),
        )
        .distinct()
    )
    ostats = (
        pairs.join(
            late,
            (pairs.l_orderkey == F.col("lt_orderkey"))
            & (pairs.l_suppkey == F.col("lt_suppkey")),
            "left",
        )
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_supp"),
            F.count("lt_suppkey").alias("n_late"),
            F.max("lt_suppkey").alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"))
    return (
        ostats.join(s, ostats.late_supp == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
