"""Graph & dimension-maintenance operators (SURVEY §2B extensions).

Large-scale training-data pipelines need a handful of operator shapes
the plain relational suite doesn't exercise:

- **iterative fixed-point over a graph** (`graph_pagerank`) — the
  canonical "loop of join+aggregate" pattern (same skeleton as
  dedup_components' connected components, but with floating-point
  state and per-edge weights);
- **wedge/triangle mining** (`graph_triangle_count`) — the self-join
  pattern whose cost is bounded by ordering each edge (a<b), the
  standard trick that also caps wedge skew;
- **heavy-hitter detection** (`agg_heavy_hitters`) — skew *detection*
  as a first-class query (the salting strategy in join_skew_salted
  needs to know its keys from somewhere);
- **SCD Type-2 dimension build** (`scd2_intervals`) — change-log →
  validity-interval reshaping, the standard warehouse maintenance op.

The event graph is deterministic: within each event_type stream ordered
by (ts, event_id), each event's user links to the next event's user —
a co-occurrence chain needing no RNG, so both engines derive the exact
same edge list.

All plans are single-pass DataFrame compositions; the PageRank loop
materializes only O(nodes) state per round and shuffles on the edge
key, which is the minimum any distributed PageRank pays.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from adcirctime2cogs_spark.functions.numeric import r4
from adcirctime2cogs_spark.tables import load_table

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


# shared deterministic edge derivation (Spark + the oracle CTE below)
_EDGES_CTE = """
WITH seq AS (
  SELECT user_id, ts, event_id,
         lead(user_id) OVER (PARTITION BY event_type
                             ORDER BY ts, event_id) AS nxt
  FROM events
),
edges AS (
  SELECT user_id AS src, nxt AS dst
  FROM seq WHERE nxt IS NOT NULL AND nxt <> user_id
)
"""


def _event_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed follow-on edges of the per-type event streams."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", F.lead("user_id").over(w).alias("nxt")
    )
    return seq.filter(
        F.col("nxt").isNotNull() & (F.col("nxt") != F.col("user_id"))
    ).select(F.col("user_id").alias("src"), F.col("nxt").alias("dst"))


_PAGERANK_SQL = (
    _EDGES_CTE
    + """,
nodes AS (
  SELECT DISTINCT u FROM (SELECT src AS u FROM edges
                          UNION SELECT dst FROM edges)
),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
r0 AS (SELECT u, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
r1 AS (
  SELECT nd.u, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.inc, 0.0) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS u, sum(r0.r / deg.d) AS inc
    FROM edges e JOIN r0 ON r0.u = e.src JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) s ON s.u = nd.u
),
r2 AS (
  SELECT nd.u, 0.15 / (SELECT n FROM nn) + 0.85 * coalesce(s.inc, 0.0) AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS u, sum(r1.r / deg.d) AS inc
    FROM edges e JOIN r1 ON r1.u = e.src JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) s ON s.u = nd.u
)
SELECT u AS user_id, round((SELECT n FROM nn) * r, 4) AS pr_scaled
FROM r2
"""
)


@_register("graph_pagerank", _PAGERANK_SQL)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two damped PageRank iterations over the event co-occurrence
    graph (damping 0.85, uniform init; the simplified variant without
    dangling-mass redistribution — dangling rank leaks identically in
    both engines).

    Scale shape: edges+degrees are computed once and persisted; each
    round is edges ⋈ ranks on src (one hash shuffle, reusable across
    rounds since the partitioning key never changes) → groupBy dst
    partial-aggregated contribution sum → left join back to the node
    set. State per round is O(nodes); with checkpointing every ~10
    rounds this is the textbook distributed PageRank. The fixed
    2-iteration form keeps a portable SQL oracle (each round is one
    CTE); convergence-loop users call `pagerank_iterations` directly.

    Ranks are emitted scaled by N (so values are O(1) and the shared
    round-4dp convention is meaningful at any graph size)."""
    return pagerank_iterations(_event_edges(spark, sf_dir), iterations=2)


def pagerank_iterations(
    edges: DataFrame, iterations: int, checkpoint_every: int = 10
) -> DataFrame:
    """PageRank driver: N damped rounds over (src, dst) edges, returning
    (user_id, pr_scaled). Persists the loop invariants and truncates
    the rank lineage with a localCheckpoint every `checkpoint_every`
    rounds — without it, deep iteration counts replan an ever-growing
    join tree (the same guard dedup_components uses)."""
    # eager localCheckpoint, not just persist: every iteration and both
    # node/degree branches re-reference edges, and an un-truncated
    # lineage makes each round's plan re-derive the source window
    edges = edges.localCheckpoint()
    nodes = (
        edges.select(F.col("src").alias("u"))
        .union(edges.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    # driver-side scalar: the node count parameterizes the teleport term
    n = nodes.count()
    if n == 0:
        # empty edge set: return an empty frame with the output schema
        # instead of dividing by zero at plan-build time (review r11;
        # the DuckDB oracle degrades to 0 rows the same way)
        return nodes.select(
            F.col("u").alias("user_id"),
            F.lit(0.0).alias("pr_scaled"),
        )
    ranks = nodes.withColumn("r", F.lit(1.0 / n))
    for i in range(iterations):
        contrib = (
            edges.join(ranks, ranks.u == edges.src)
            .join(deg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") / F.col("d")).alias("inc"))
        )
        ranks = nodes.join(contrib, nodes.u == contrib.dst, "left").select(
            "u",
            (F.lit(0.15 / n) + 0.85 * F.coalesce("inc", F.lit(0.0))).alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks.select(
        F.col("u").alias("user_id"), r4(F.lit(n) * F.col("r")).alias("pr_scaled")
    )


_TRIANGLE_SQL = (
    _EDGES_CTE
    + """,
ue AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM edges
),
tri AS (
  SELECT e1.a, e1.b, e2.b AS c
  FROM ue e1
  JOIN ue e2 ON e2.a = e1.b
  JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT v AS user_id, count(*) AS n_triangles
FROM (SELECT a AS v FROM tri UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
GROUP BY v
"""
)


@_register("graph_triangle_count", _TRIANGLE_SQL)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex triangle participation over the undirected event
    graph.

    Each triangle is enumerated exactly once by canonicalizing edges to
    a < b and chaining a<b<c — the ordering also bounds the wedge join
    (every wedge is rooted at its smallest vertex, the standard
    skew-capping trick: a hub node only roots wedges toward
    larger-id neighbors). Two equi-joins on the edge key; no cross
    join, no windows."""
    edges = _event_edges(spark, sf_dir)
    ue = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
        .localCheckpoint()  # three self-join branches read this
    )
    e2 = ue.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = ue.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        ue.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a3") == F.col("a")) & (F.col("c3") == F.col("c")))
        .select("a", "b", "c")
    )
    verts = (
        tri.select(F.col("a").alias("v"))
        .union(tri.select("b"))
        .union(tri.select("c"))
    )
    return verts.groupBy(F.col("v").alias("user_id")).agg(
        F.count("*").alias("n_triangles")
    )


@_register(
    "agg_heavy_hitters",
    """
    WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
    t AS (SELECT count(*) AS k, sum(n) AS tot FROM c)
    SELECT user_id, n AS n_events
    FROM c, t
    WHERE n * k * 20 > 23 * tot
    """,
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters: users with event volume > 1.15× the mean —
    the key inventory a skew-mitigation pass (join_skew_salted) salts.

    The threshold compare is integer-exact (cross-multiplied counts,
    n*k*20 > 23*tot) so no fp-average boundary can flip membership
    between engines. One hash aggregate + a broadcast of the two-value
    totals row; the per-key count table never leaves the executors.
    No explicit persist: counts feeds two branches of ONE plan, and
    the totals aggregate counts the user_id COLUMN (never null, equal
    to count(*)) precisely so both branches read counts' full
    (user_id, n) output — identical pruning means the partial-agg
    exchange canonicalizes the same and ReuseExchange serves both from
    one events scan (with count(*) the subtrees diverge and events is
    scanned and aggregated twice); a persist here would leak cached
    partitions in long-lived sessions (bench loops, sweeps)."""
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("n"))
    totals = counts.agg(
        F.count("user_id").alias("k"), F.sum("n").alias("tot")
    )
    return (
        counts.join(F.broadcast(totals))
        # integer-EXACT threshold in decimal(38,0): at 100 TB scale
        # n * k * 20 can exceed int64 (n ~ k ~ 1e9 -> 2e19) and the
        # non-ANSI long multiply would wrap negative, silently
        # dropping exactly the heavy hitters this query exists to
        # find (review r11); decimal(38,0) is exact to 1e38
        .filter(
            F.col("n").cast("decimal(38,0)") * F.col("k") * 20
            > F.lit(23).cast("decimal(38,0)") * F.col("tot")
        )
        .select("user_id", F.col("n").alias("n_events"))
    )


@_register(
    "scd2_intervals",
    """
    SELECT user_id,
           round(value, 4) AS attr,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           (lead(ts) OVER w IS NULL) AS is_current
    FROM events
    WHERE event_type = 'signup' AND user_id < 40
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: fold a change log (signup events as
    attribute updates) into validity intervals [valid_from, valid_to)
    with an is_current flag — the standard warehouse dimension-
    maintenance reshape.

    One window per natural key (partition-local sort after a single
    hash shuffle on user_id); no join, no second pass. At 100 TB the
    per-key history is small even when the log is huge, so the shuffle
    on the natural key is the whole cost."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        events.filter((F.col("event_type") == "signup") & (F.col("user_id") < 40))
        .select(
            "user_id",
            r4(F.col("value")).alias("attr"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
            F.coalesce(
                F.date_format(nxt, "yyyy-MM-dd HH:mm:ss"),
                F.lit("9999-12-31 00:00:00"),
            ).alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
    )


@_register(
    "cdc_merge_apply",
    """
    WITH latest AS (
      SELECT user_id + 1400 AS k,
             arg_max(value, ts) AS v,
             arg_max(event_type, ts) AS et
      FROM events GROUP BY user_id
    ),
    ch AS (
      SELECT k, round(v, 4) AS new_bal,
             CASE WHEN et = 'error' THEN 'D' ELSE 'U' END AS op
      FROM latest
    )
    SELECT coalesce(c.c_custkey, ch.k) AS c_custkey,
           coalesce(c.c_name, 'new-' || CAST(ch.k AS VARCHAR)) AS c_name,
           CASE WHEN ch.k IS NOT NULL THEN ch.new_bal
                ELSE round(c.c_acctbal, 4) END AS acctbal,
           coalesce(c.c_mktsegment, 'NEW') AS c_mktsegment,
           CASE WHEN ch.k IS NULL THEN 'carry'
                WHEN c.c_custkey IS NULL THEN 'insert'
                ELSE 'update' END AS action
    FROM customer c FULL OUTER JOIN ch ON c.c_custkey = ch.k
    WHERE ch.op IS NULL OR ch.op <> 'D'
    """,
)
def cdc_merge_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE apply (upsert + delete) without a table format: fold a
    change stream into a dimension snapshot in one full-outer join —
    the batch equivalent of Delta/Iceberg MERGE INTO, expressed as a
    pure Spark plan over immutable parquet.

    Change extraction is one hash agg (max_by on the unique-per-user
    event time picks the latest change); the merge itself is a single
    full-outer equi-join on the natural key, so the whole CDC apply
    shuffles each side once on that key. Matched 'error' changes delete
    the row, other matches update in place, unmatched changes insert,
    untouched rows carry — the action column makes the branch auditable
    downstream. The key offset (+1400) makes the change set straddle
    the snapshot boundary so every branch has rows at every SF."""
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    # the string event_type is reduced to an int flag BEFORE the agg:
    # max_by with a string agg buffer is not hash-agg mutable and
    # regressed the whole extraction to SortAggregate; downstream only
    # needs "was the latest change an error", so max_by(int, ts) keeps
    # every buffer primitive and the aggregate in hash/codegen
    latest = (
        events.select(
            (F.col("user_id") + 1400).alias("k"),
            "ts",
            "value",
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("ie"),
        )
        .groupBy("k")
        .agg(
            F.expr("max_by(value, ts)").alias("v"),
            F.expr("max_by(ie, ts)").alias("iev"),
        )
    )
    ch = latest.select(
        "k",
        r4(F.col("v")).alias("new_bal"),
        F.when(F.col("iev") == 1, "D").otherwise("U").alias("op"),
    )
    merged = customer.join(ch, customer.c_custkey == ch.k, "full_outer")
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "D"))
        .select(
            F.coalesce("c_custkey", "k").alias("c_custkey"),
            F.coalesce(
                "c_name", F.concat(F.lit("new-"), F.col("k").cast("string"))
            ).alias("c_name"),
            F.when(F.col("k").isNotNull(), F.col("new_bal"))
            .otherwise(r4(F.col("c_acctbal")))
            .alias("acctbal"),
            F.coalesce("c_mktsegment", F.lit("NEW")).alias("c_mktsegment"),
            F.when(F.col("k").isNull(), "carry")
            .when(F.col("c_custkey").isNull(), "insert")
            .otherwise("update")
            .alias("action"),
        )
    )


@_register(
    "mining_basket_pairs",
    """
    WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, count(*) AS support
    FROM pairs GROUP BY part_a, part_b
    HAVING count(*) >= 2
    """,
)
def mining_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: parts co-purchased in the same order,
    with support counts (the pairwise level of frequent-itemset
    mining).

    The pair explode self-joins on the order key, so its output is
    bounded by sum(basket²) — baskets are small and bounded (TPC-H ≤ 7
    lines), which is what makes the per-key self-join safe where a
    general self-join would not be; the a<b ordering halves the output
    and canonicalizes pairs. The support agg then shuffles once on the
    pair. Same inverted-index shape as dedup's shingle posting lists,
    with the basket as the posting list."""
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
    )


@_register(
    "events_pit_enrich",
    """
    WITH dim AS (
      SELECT user_id, round(value, 4) AS attr, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                      TIMESTAMP '9999-12-31') AS valid_to
      FROM events WHERE event_type = 'signup' AND user_id < 40
    )
    SELECT e.event_id, e.user_id,
           strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
           d.attr
    FROM events e
    JOIN dim d ON d.user_id = e.user_id
            AND e.ts >= d.valid_from AND e.ts < d.valid_to
    WHERE e.event_type = 'purchase' AND e.user_id < 40
    """,
)
def events_pit_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment (the feature-store temporal join): each
    purchase event picks up the dimension attribute that was valid AT
    its event time — never a later value (no training-serving leakage).

    Composes the SCD2 interval build (scd2_intervals' window) with an
    equi+range join on the natural key: the equi key does the
    distribution (one shuffle on user_id for both sides), the range
    predicate evaluates post-join against the handful of intervals per
    user — the standard shape when per-key history is small and the
    fact stream is huge."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    dim = (
        events.filter((F.col("event_type") == "signup") & (F.col("user_id") < 40))
        .select(
            F.col("user_id").alias("d_user"),
            r4(F.col("value")).alias("attr"),
            F.col("ts").alias("valid_from"),
            F.coalesce(
                F.lead("ts").over(w),
                F.lit("9999-12-31").cast("timestamp"),
            ).alias("valid_to"),
        )
    )
    fact = events.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 40)
    )
    return (
        fact.join(
            dim,
            (fact.user_id == dim.d_user)
            & (fact.ts >= dim.valid_from)
            & (fact.ts < dim.valid_to),
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("event_ts"),
            "attr",
        )
    )


_MV_CUTOFF = "2001-01-01"


@_register(
    "cdc_rollup_refresh",
    f"""
    WITH live AS (
      SELECT * FROM orders
      WHERE NOT (o_orderdate < TIMESTAMP '{_MV_CUTOFF}'
                 AND o_orderpriority = '1-URGENT')
    )
    SELECT o_custkey, count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM live GROUP BY o_custkey
    """,
)
def cdc_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: refresh a per-customer
    order rollup (count + sum) from a CDC delta batch WITHOUT
    rescanning history — the aggregate-maintenance twin of
    cdc_merge_apply's row merge.

    The scenario is synthesized from the fixture: the "materialized"
    base is the pre-cutoff rollup, the delta batch is post-cutoff
    inserts plus retractions of the base's urgent orders (a
    cancellation wave). Counts and sums are self-maintainable
    aggregates: each delta row contributes a SIGNED (±1, ±cents)
    increment, so the refresh is one hash agg over the DELTA ONLY plus
    one full-outer join against the view on the group key — cost
    proportional to |delta| + |view|, never |history|. Groups whose
    count reaches zero drop out, exactly as a recompute would lose
    them. (min/max are NOT self-maintainable under deletes — that case
    needs the SCD2/re-aggregate path, deliberately not offered here.)

    The oracle is the full recompute over (base minus retracted) ∪
    inserts — so the parity check IS the incremental==recompute
    equivalence proof, at every SF, in money-exact integer cents."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    is_base = F.col("o_orderdate") < _MV_CUTOFF
    mv = (
        orders.filter(is_base)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n0"), F.sum(cents).alias("c0"))
    )
    sign = F.when(is_base, F.lit(-1)).otherwise(F.lit(1))
    delta = orders.filter(
        (~is_base) | (F.col("o_orderpriority") == "1-URGENT")
    ).select(
        "o_custkey",
        sign.alias("dn"),
        (sign * cents).alias("dc"),
    )
    dagg = delta.groupBy("o_custkey").agg(
        F.sum("dn").alias("dn"), F.sum("dc").alias("dc")
    )
    merged = mv.join(dagg, "o_custkey", "full_outer")
    zl = lambda c: F.coalesce(F.col(c), F.lit(0))  # noqa: E731
    return (
        merged.select(
            "o_custkey",
            (zl("n0") + zl("dn")).alias("n_orders"),
            (zl("c0") + zl("dc")).alias("total_cents"),
        )
        .filter(F.col("n_orders") > 0)
    )
