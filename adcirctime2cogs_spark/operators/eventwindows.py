"""Time-window operators over the events table — batch twins of the
Structured Streaming jobs in streaming/windows.py (SURVEY §2B streaming
row). The streaming versions run the SAME aggregations through
readStream + memory sink; these batch twins give the driver an
oracle-checkable surface (window starts reduce to epoch arithmetic that
DuckDB reproduces exactly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from adcirctime2cogs_spark.functions.numeric import r4
from adcirctime2cogs_spark.tables import load_table

QUERIES = {}
ORACLES = {}

FMT = "yyyy-MM-dd HH:mm:ss"
SESSION_GAP_S = 30 * 60


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _fmt(col):
    return F.date_format(col, FMT)


@_register(
    "events_tumbling_window",
    """
    SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE), 4)
             AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-minute tumbling window aggregate (F.window — the exact groupBy
    Structured Streaming runs incrementally with a watermark).

    total_value sums value as an exact DECIMAL(10,2) (the fixture's
    values are 2dp by construction) — order-independent at any scale
    (optimization r13, q1's discipline). Spreading the scan was
    A/B-measured and REJECTED (0.276 -> 0.659 s): one cast + sum per
    row is too light to amortize the extra exchange."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            r4(F.sum(F.col("value").cast("decimal(10,2)")).cast("double")).alias(
                "total_value"
            ),
        )
        .select(
            _fmt("w.start").alias("win_start"), "event_type", "n", "total_value"
        )
    )


@_register(
    "events_sliding_window",
    """
    WITH wins AS (
      SELECT event_type, value,
             unnest([CAST(floor(epoch(ts) / 300) AS BIGINT) * 300,
                     CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 - 300]) AS ws
      FROM events
    )
    SELECT strftime(make_timestamp(ws * 1000000), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type, count(*) AS n, round(avg(value), 4) AS avg_value
    FROM wins
    GROUP BY 1, 2
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-minute window sliding by 5 minutes: each event lands in two
    overlapping windows (Spark expands via Expand, not a self-join)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), r4(F.avg("value")).alias("avg_value"))
        .select(
            _fmt("w.start").alias("win_start"), "event_type", "n", "avg_value"
        )
    )


@_register(
    "events_session_window",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))
                  > {SESSION_GAP_S} THEN 1
                  WHEN lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM ordered
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(max(ts) + INTERVAL {SESSION_GAP_S} SECOND,
                    '%Y-%m-%d %H:%M:%S') AS sess_end,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE), 4)
             AS total_value
    FROM sess
    GROUP BY user_id, sess_id
    """,
)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via F.session_window — the
    stateful-streaming operator's batch form. Session end = last event
    + gap, matching streaming semantics; oracle derives the same
    sessions with the lag/cumsum idiom.

    total_value sums value as an exact DECIMAL(10,2) — order-
    independent at any scale (optimization r13, q1's discipline).
    Spreading the scan was A/B-measured and REJECTED (0.443 ->
    0.697 s): too little per-row work to amortize the exchange."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n"),
            r4(F.sum(F.col("value").cast("decimal(10,2)")).cast("double")).alias(
                "total_value"
            ),
        )
        .select(
            "user_id",
            _fmt("w.start").alias("sess_start"),
            _fmt("w.end").alias("sess_end"),
            "n",
            "total_value",
        )
    )


_OVL_BUCKET_S = 3600  # 1-hour candidate bins for the interval join

@_register(
    "join_interval_overlap",
    f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id))
                  > {SESSION_GAP_S} THEN 1
                  WHEN lag(ts) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
                  ELSE 0 END AS new_session
      FROM events
    ),
    tagged AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    ),
    sess AS (
      SELECT user_id, min(ts) AS s,
             max(ts) + INTERVAL {SESSION_GAP_S} SECOND AS e
      FROM tagged GROUP BY user_id, sid
    )
    SELECT a.user_id,
           strftime(a.s, '%Y-%m-%d %H:%M:%S') AS sess_start,
           count(*) AS n_concurrent
    FROM sess a JOIN sess b
      ON a.user_id != b.user_id AND a.s < b.e AND b.s < a.e
    GROUP BY a.user_id, a.s
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (the third of SURVEY §2B's range/as-of/
    interval family): for every user session, how many other users'
    sessions were concurrent.

    The quadratic interval theta-join is avoided exactly the way the
    mesh weights builder avoids cells x triangles (plans/weights.py):
    each interval explodes to the 1-hour bins it spans, candidates meet
    through a bin equi-join, the true a.s < b.e AND b.s < a.e overlap
    filters candidates, and a distinct collapses intervals that share
    several bins. Comparisons scale with bin occupancy, not sessions^2.
    """
    ev = load_table(spark, sf_dir, "events")
    sess = (
        ev.groupBy(
            F.session_window("ts", f"{SESSION_GAP_S} seconds").alias("w"),
            "user_id",
        )
        .agg(F.count("*").alias("_n"))
        .select(
            "user_id", F.col("w.start").alias("s"), F.col("w.end").alias("e")
        )
    )
    bins = F.sequence(
        F.floor(F.unix_timestamp("s") / _OVL_BUCKET_S),
        F.floor(F.unix_timestamp("e") / _OVL_BUCKET_S),
    )
    binned = sess.withColumn("bk", F.explode(bins))
    a = binned.select(
        F.col("user_id").alias("a_user"), F.col("s").alias("a_s"),
        F.col("e").alias("a_e"), "bk",
    )
    b = binned.select(
        F.col("user_id").alias("b_user"), F.col("s").alias("b_s"),
        F.col("e").alias("b_e"), "bk",
    )
    pairs = (
        a.join(b, "bk")
        .filter(F.col("a_user") != F.col("b_user"))
        .filter((F.col("a_s") < F.col("b_e")) & (F.col("b_s") < F.col("a_e")))
        .select("a_user", "a_s", "b_user", "b_s")
        .distinct()
    )
    return (
        pairs.groupBy("a_user", "a_s")
        .agg(F.count("*").alias("n_concurrent"))
        .select(
            F.col("a_user").alias("user_id"),
            _fmt("a_s").alias("sess_start"),
            "n_concurrent",
        )
    )


@_register(
    "events_multires_rollup",
    """
    SELECT CASE WHEN GROUPING(date_trunc('day', ts)) = 1 THEN 'total'
                WHEN GROUPING(date_trunc('hour', ts)) = 1 THEN 'day'
                ELSE 'hour' END AS grain,
           strftime(date_trunc('day', ts), '%Y-%m-%d %H:%M:%S')  AS day_s,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_s,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE), 4)
             AS total_value
    FROM events
    GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hour, day, and total
    aggregates of the event stream in ONE pass (rollup over nested time
    buckets — Spark's Expand, one shuffle), the continuous-aggregate
    shape time-series stores maintain incrementally. At scale this is
    the backfill query; the streaming twin is the tumbling window."""
    events = load_table(spark, sf_dir, "events").select(
        "value",
        F.date_trunc("day", "ts").alias("_day"),
        F.date_trunc("hour", "ts").alias("_hour"),
    )
    grain = (
        F.when(F.grouping("_day") == 1, "total")
        .when(F.grouping("_hour") == 1, "day")
        .otherwise("hour")
    )
    return (
        events.rollup("_day", "_hour")
        .agg(
            grain.alias("grain"),
            F.count("*").alias("n"),
            # exact decimal: the rollup's total cell spans the table
            # at scale (optimization r13, q1's discipline)
            r4(F.sum(F.col("value").cast("decimal(10,2)")).cast("double"))
            .alias("total_value"),
        )
        .select(
            "grain",
            _fmt("_day").alias("day_s"),
            _fmt("_hour").alias("hour_s"),
            "n",
            "total_value",
        )
    )


@_register(
    "events_dedup_first",
    """
    SELECT event_id, user_id, event_type,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: first event per (user, type) — the batch
    twin of dropDuplicatesWithinWatermark (which keeps an arbitrary row;
    we pin the earliest for reproducibility)."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", _fmt("ts").alias("ts_s"))
    )


@_register(
    "events_time_weighted_avg",
    """
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS us,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
      FROM events
    )
    SELECT user_id,
           round(sum(value * (nxt - us)) / (max(us) - min(us)), 4) AS twa
    FROM seq
    GROUP BY user_id
    HAVING max(us) > min(us)
    """,
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (the hypertable/timescale-style
    irregular-sampling aggregate): each observation is held until the
    next one, so its weight is the duration to the successor; the last
    point carries no interval and drops out of the numerator.

    One window pass (lead over the per-user timeline) + one hash agg —
    both shuffles keyed on user_id, so at 100 TB it's a single
    repartition of the events stream; ties at equal ts break on
    event_id in both engines for determinism."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "user_id", "value", us.alias("us"), F.lead(us).over(w).alias("nxt")
    )
    return (
        seq.groupBy("user_id")
        .agg(
            r4(
                F.sum(F.col("value") * (F.col("nxt") - F.col("us")))
                / (F.max("us") - F.min("us"))
            ).alias("twa"),
            F.max("us").alias("_mx"),
            F.min("us").alias("_mn"),
        )
        .filter(F.col("_mx") > F.col("_mn"))
        .select("user_id", "twa")
    )


@_register(
    "events_gap_fill_locf",
    """
    WITH b AS (
      SELECT user_id,
             make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000) AS bucket,
             round(CAST(sum(CAST(value AS DECIMAL(10,2))) AS DOUBLE), 4)
               AS v
      FROM events GROUP BY 1, 2
    ),
    rng AS (SELECT user_id, min(bucket) AS mn, max(bucket) AS mx FROM b GROUP BY 1),
    allb AS (
      SELECT user_id, unnest(generate_series(mn, mx, INTERVAL 5 MINUTE)) AS bucket
      FROM rng
    ),
    f AS (
      SELECT a.user_id, a.bucket, b.v
      FROM allb a LEFT JOIN b ON b.user_id = a.user_id AND b.bucket = a.bucket
    )
    SELECT user_id,
           strftime(bucket, '%Y-%m-%d %H:%M:%S') AS bucket_s,
           v AS raw_v,
           last_value(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf,
           CAST(v IS NULL AS INT) AS gap_filled
    FROM f
    """,
)
def events_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap filling with last-observation-carried-forward
    (the hypertable time_bucket_gapfill + locf pair): missing 5-minute
    buckets between each user's first and last observation are
    generated (sequence + explode — no driver loop, no cross join
    against a global calendar) and filled from the last seen value by
    an ignorenulls window. Dense-output shape for downstream models
    that need regular sampling over irregular event feeds."""
    events = load_table(spark, sf_dir, "events")
    b = (
        events.groupBy("user_id", F.window("ts", "5 minutes").alias("w"))
        .agg(
            # exact decimal (optimization r13, q1's discipline)
            r4(F.sum(F.col("value").cast("decimal(10,2)")).cast("double"))
            .alias("v")
        )
        .select("user_id", F.col("w.start").alias("bucket"), "v")
    )
    rng = b.groupBy("user_id").agg(
        F.min("bucket").alias("mn"), F.max("bucket").alias("mx")
    )
    allb = rng.select(
        "user_id",
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 5 minutes"))
        ).alias("bucket"),
    )
    f = allb.join(b, ["user_id", "bucket"], "left")
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return f.select(
        "user_id",
        _fmt("bucket").alias("bucket_s"),
        F.col("v").alias("raw_v"),
        F.last("v", ignorenulls=True).over(w).alias("v_locf"),
        F.col("v").isNull().cast("int").alias("gap_filled"),
    )


@_register(
    "events_sessionize_gap",
    f"""
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) > {SESSION_GAP_S}
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    s AS (
      SELECT user_id, event_id, ts,
             CAST(sum(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS session_no
      FROM g
    )
    SELECT user_id, session_no, count(*) AS n_events,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS sess_end
    FROM s GROUP BY 1, 2
    """,
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization by cumulative gap counting — the portable window
    idiom (lag -> gap>30min flag -> running sum = session number), the
    strategy twin of events_session_window's F.session_window: same
    sessions, different machinery (two window passes over one user_id
    shuffle vs the merging-window state operator)."""
    events = load_table(spark, sf_dir, "events")
    ow = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(ow)
    # microsecond-exact gap: unix_timestamp() TRUNCATES to seconds, so
    # a true gap of 1800.5s would merge here yet split in
    # F.session_window (and in the oracle's fractional epoch()) — the
    # 10M-event cross-validation leg in tools/scale_check.py caught
    # exactly that divergence
    is_start = (
        prev.isNull()
        | (
            F.unix_micros("ts") - F.unix_micros(prev)
            > SESSION_GAP_S * 1_000_000
        )
    ).cast("bigint")
    run = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    s = events.select(
        "user_id", "event_id", "ts", F.sum(is_start).over(run).alias("session_no")
    )
    return s.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        _fmt(F.min("ts")).alias("sess_start"),
        _fmt(F.max("ts")).alias("sess_end"),
    )


_M4_SQL = """
SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900 * 1000000),
                '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       count(*) AS n,
       min(value) AS vmin,
       max(value) AS vmax,
       arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id)
         AS vfirst,
       arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 10000000000 + event_id)
         AS vlast
FROM events
GROUP BY 1, 2
"""


@_register("events_m4_downsample", _M4_SQL)
def events_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 time-series downsampling (min/max/first/last per series per
    15-min bucket) — the error-free line-visualization reduction from
    Jugel et al., VLDB 2014, and the shape a 100 TB telemetry store
    serves dashboards from.

    One hash aggregate with map-side partials: first/last ride min_by/
    max_by on a (ts, event_id) key packed into decimal(38,0), so ties
    on ts stay deterministic without a per-bucket window sort."""
    events = load_table(spark, sf_dir, "events")
    key = (
        F.unix_micros("ts").cast("decimal(38,0)") * 10000000000
        + F.col("event_id")
    )
    return (
        events.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("vmin"),
            F.max("value").alias("vmax"),
            F.min_by("value", key).alias("vfirst"),
            F.max_by("value", key).alias("vlast"),
        )
        .select(
            _fmt("w.start").alias("win_start"),
            "event_type",
            "n",
            "vmin",
            "vmax",
            "vfirst",
            "vlast",
        )
    )


_ZSCORE_SQL = """
WITH w AS (
  SELECT event_id, user_id, ts, value,
         avg(value) OVER win AS mu,
         stddev_samp(value) OVER win AS sd,
         count(*) OVER win AS n_prior
  FROM events
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       round(value, 4) AS value,
       round((value - mu) / sd, 4) AS z
FROM w
WHERE n_prior >= 5 AND sd > 0 AND abs(round((value - mu) / sd, 4)) > 3.0
"""


@_register("events_anomaly_zscore", _ZSCORE_SQL)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection per user stream: each event is
    scored against the mean/stddev of its 20 predecessors (the event
    itself excluded — no self-dampening), flagged at |z| > 3 with at
    least 5 priors.

    A single rows-frame window partitioned by user_id: state per
    series is O(frame), the partition key spreads across executors,
    and no shuffle beyond the one window exchange."""
    events = load_table(spark, sf_dir, "events")
    win = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    mu = F.avg("value").over(win)
    sd = F.stddev_samp("value").over(win)
    n_prior = F.count("*").over(win)
    z = (F.col("value") - mu) / sd
    scored = events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        mu.alias("mu"),
        sd.alias("sd"),
        n_prior.alias("n_prior"),
    )
    zc = (F.col("value") - F.col("mu")) / F.col("sd")
    return (
        scored.filter(
            # the outlier cut compares the ROUNDED z: mu/sd come from
            # engine-specific fold orders, so an unrounded |z| ~ 3.00000
            # boundary row could pass in one engine and fail in the other
            (F.col("n_prior") >= 5) & (F.col("sd") > 0) & (F.abs(r4(zc)) > 3.0)
        )
        .select(
            "event_id",
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            r4("value").alias("value"),
            r4(zc).alias("z"),
        )
    )


@_register(
    "events_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS vt FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS ct
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.vt
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.ct
      GROUP BY e.user_id
    )
    SELECT stage, n_users FROM (
      SELECT 1 AS stage, 'view' AS _s, count(*) AS n_users FROM v
      UNION ALL SELECT 2, 'click', count(*) FROM c
      UNION ALL SELECT 3, 'purchase', count(*) FROM p
    )
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: users who viewed, then clicked AFTER
    their first view, then purchased AFTER that first qualifying click
    — the product-analytics staple (strict event-order semantics, not
    mere set membership).

    Each stage is one conditional min-aggregate joined against the
    previous stage's first-qualifying timestamp; all three joins key on
    user_id, so at scale the event log shuffles once onto user_id and
    every stage reuses that partitioning. No window over the raw event
    stream, no per-user sort — stage k's state is one timestamp per
    surviving user."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    counts = [
        (1, v.agg(F.count("*").alias("n"))),
        (2, c.agg(F.count("*").alias("n"))),
        (3, p.agg(F.count("*").alias("n"))),
    ]
    out = None
    for stage, df in counts:
        row = df.select(
            F.lit(stage).alias("stage"), F.col("n").alias("n_users")
        )
        out = row if out is None else out.unionAll(row)
    return out


@_register(
    "events_retention_cohorts",
    """
    WITH firsts AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
    )
    SELECT strftime(date_trunc('week', f.first_ts), '%Y-%m-%d') AS cohort_week,
           CAST(floor(date_diff('day', date_trunc('week', f.first_ts),
                                 date_trunc('week', e.ts)) / 7) AS BIGINT)
             AS week_k,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON f.user_id = e.user_id
    GROUP BY 1, 2
    """,
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    counted as active in each subsequent week — the standard
    product-analytics retention triangle.

    Each user's cohort anchor is a min window over the user_id
    partitioning — ONE events scan and one shuffle (the agg-then-join
    decorrelation scanned events twice: the firsts subtree diverges
    under per-branch pruning, so ReuseExchange never merged it), then
    one distinct-count agg builds the matrix. Week arithmetic stays on
    day-granular truncated stamps so the /7 division is exact in both
    engines."""
    events = load_table(spark, sf_dir, "events")
    first_ts = F.min("ts").over(W.partitionBy("user_id"))
    cohort_w = F.date_trunc("week", F.col("first_ts"))
    event_w = F.date_trunc("week", F.col("ts"))
    return (
        events.withColumn("first_ts", first_ts)
        .groupBy(
            F.date_format(cohort_w, "yyyy-MM-dd").alias("cohort_week"),
            F.floor(F.datediff(event_w, cohort_w) / 7)
            .cast("long")
            .alias("week_k"),
        )
        .agg(F.count_distinct("user_id").alias("active_users"))
    )


@_register(
    "events_markov_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    pairs AS (
      SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
      FROM seq WHERE nxt IS NOT NULL
      GROUP BY 1, 2
    ),
    totals AS (SELECT from_type, sum(n) AS tot FROM pairs GROUP BY 1)
    SELECT p.from_type, p.to_type, p.n,
           round(p.n * 1.0 / t.tot, 4) AS p_transition
    FROM pairs p JOIN totals t ON t.from_type = p.from_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of per-user event streams:
    P(next event type | current event type) — the sequence-model
    sibling of the funnel query (empirical bigram over behavior
    streams).

    One window per user stream (single shuffle on user_id), one pair
    hash agg, and the row-normalizing totals as a sum window over the
    |types|² pair table itself — the groupBy-totals-then-join-back
    form re-ran the WHOLE lead-window pipeline a second time (its
    re-keyed aggregate exchange can never unify with the join branch's
    copy), doubling the events scan for a ≤25-row normalizer. The
    transition probability divides exact counts, so parity is exact up
    to the shared 4dp rounding."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("nxt").alias("to_type")
    ).agg(F.count("*").alias("n"))
    tot = F.sum("n").over(W.partitionBy("from_type"))
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        r4(F.col("n") * 1.0 / tot).alias("p_transition"),
    )


@_register("events_sketch_rollup")  # rows-only: HLL estimates are engine-specific
def events_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup: per-hour HLL sketches of distinct users,
    unioned into per-day estimates WITHOUT rescanning the events — the
    property that makes approximate distinct counts work in a rollup
    hierarchy at 100 TB (hour sketches persist once; day/week/month
    totals are sketch unions, never recounts).

    tests/test_dedup.py pins the algebra: the estimate from unioned
    hourly sketches equals the directly-computed daily estimate
    (identical sketch state either way). Rows-only for the driver —
    DataSketches estimates have no DuckDB twin."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
    ).agg(F.hll_sketch_agg("user_id").alias("sk"))
    return (
        hourly.groupBy("day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_hours"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "approx_users",
            "n_hours",
        )
    )


_HIST_BIN = 0.25  # value-histogram bin width (binary fraction: fp-exact)


@_register(
    "events_histogram_quantile_rollup",
    f"""
    WITH hourly AS (
      SELECT date_trunc('day', ts) AS day, date_trunc('hour', ts) AS hour,
             CAST(floor(value / {_HIST_BIN}) AS BIGINT) AS bin,
             count(*) AS c
      FROM events GROUP BY 1, 2, 3
    ),
    daily AS (
      SELECT day, bin, CAST(sum(c) AS BIGINT) AS c FROM hourly GROUP BY 1, 2
    ),
    cum AS (
      SELECT day, bin,
             CAST(sum(c) OVER (PARTITION BY day ORDER BY bin) AS BIGINT)
               AS cum,
             CAST(sum(c) OVER (PARTITION BY day) AS BIGINT) AS total
      FROM daily
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           round(min(CASE WHEN cum * 2 >= total THEN bin END)
                 * {_HIST_BIN}, 4) AS p50_lo,
           round(min(CASE WHEN cum * 10 >= 9 * total THEN bin END)
                 * {_HIST_BIN}, 4) AS p90_lo,
           CAST(max(total) AS BIGINT) AS n
    FROM cum GROUP BY 1
    """,
)
def events_histogram_quantile_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable QUANTILE rollup — the exact-oracle sibling of
    events_sketch_rollup's HLL: per-hour fixed-bin value histograms
    merge into per-day histograms by summing bin counts (never
    rescanning events), and day quantiles read off the cumulative bin
    distribution. This is how continuous-aggregate stores serve p50/p90
    at 100 TB: hour sketches persist once; wider windows are additions
    of small bin tables. Unlike approx_percentile (whose partial state
    is opaque and non-reusable across groupings), the histogram is
    closed under union BY CONSTRUCTION, so the rollup is an exact
    algebra the oracle can mirror.

    All comparisons are integers (cum*2 >= total), the bin width is a
    binary fraction, and the reported estimate is the lower edge of the
    first bin covering the target rank — engine-exact everywhere."""
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        F.floor(F.col("value") / _HIST_BIN).cast("bigint").alias("bin"),
    ).agg(F.count("*").alias("c"))
    daily = hourly.groupBy("day", "bin").agg(F.sum("c").alias("c"))
    cum = F.sum("c").over(
        W.partitionBy("day").orderBy("bin")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    total = F.sum("c").over(W.partitionBy("day"))
    binned = daily.select(
        "day", "bin", cum.alias("cum"), total.alias("total")
    )
    return binned.groupBy("day").agg(
        r4(
            F.min(F.when(F.col("cum") * 2 >= F.col("total"), F.col("bin")))
            * _HIST_BIN
        ).alias("p50_lo"),
        r4(
            F.min(
                F.when(F.col("cum") * 10 >= 9 * F.col("total"), F.col("bin"))
            )
            * _HIST_BIN
        ).alias("p90_lo"),
        F.max("total").alias("n"),
    ).select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "p50_lo",
        "p90_lo",
        "n",
    )


_DAY_US = 86_400_000_000


@_register(
    "events_feature_rollup",
    f"""
    WITH g AS (SELECT max(epoch_us(ts)) AS gmax FROM events)
    SELECT user_id,
           CAST(sum(CASE WHEN epoch_us(ts) > gmax - {_DAY_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_1d,
           CAST(sum(CASE WHEN epoch_us(ts) > gmax - 7 * {_DAY_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_7d,
           CAST(sum(CASE WHEN epoch_us(ts) > gmax - 30 * {_DAY_US}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_30d,
           round(CAST(sum(CAST(CASE WHEN epoch_us(ts) > gmax - 7 * {_DAY_US}
                               THEN value ELSE 0 END AS DECIMAL(10,2)))
                      AS DOUBLE), 4) AS val_7d,
           count(DISTINCT CASE WHEN epoch_us(ts) > gmax - 30 * {_DAY_US}
                               THEN event_type END) AS types_30d,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events, g
    GROUP BY user_id
    """,
)
def events_feature_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon feature rollup (the feature-store staple): per
    user, trailing 1d/7d/30d activity counts, 7d value sum, 30d
    distinct event types, and last-seen — all as of the corpus's max
    event time.

    ONE hash aggregate computes every horizon via conditional
    aggregation — no per-horizon scan, no window function, no
    self-join; the only extra input is the one-row global-max-ts
    broadcast (allowlisted BNLJ, same pattern as agg_rfm_segmentation).
    Horizon cuts compare integer epoch micros, so window membership is
    engine-exact. At 100 TB this is a single events shuffle on
    user_id."""
    events = load_table(spark, sf_dir, "events")
    gmax = events.agg(F.max(F.unix_micros("ts")).alias("gmax"))
    us = F.unix_micros("ts")
    in_h = lambda days: us > F.col("gmax") - days * _DAY_US  # noqa: E731
    return (
        events.crossJoin(F.broadcast(gmax))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(in_h(1), 1).otherwise(0)).alias("n_1d"),
            F.sum(F.when(in_h(7), 1).otherwise(0)).alias("n_7d"),
            F.sum(F.when(in_h(30), 1).otherwise(0)).alias("n_30d"),
            r4(
                F.sum(
                    F.when(in_h(7), F.col("value"))
                    .otherwise(0.0)
                    .cast("decimal(10,2)")
                ).cast("double")
            ).alias(
                "val_7d"
            ),
            F.countDistinct(
                F.when(in_h(30), F.col("event_type"))
            ).alias("types_30d"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


@_register(
    "events_gaps_islands",
    """
    WITH pd AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d
      FROM events WHERE event_type = 'purchase'
    ),
    rk AS (
      SELECT user_id, d,
             row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM pd
    )
    SELECT user_id,
           strftime(min(d), '%Y-%m-%d') AS island_start,
           strftime(max(d), '%Y-%m-%d') AS island_end,
           count(*) AS n_days
    FROM rk
    GROUP BY user_id, d - rn * INTERVAL 1 DAY
    """,
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE purchase-activity
    days per user — the canonical streak/retention shape SQL has no
    keyword for, expressed as the date-minus-row_number grouping trick
    (consecutive days share a constant d - rn anchor).

    Plan at scale: one distinct (map-side combined) collapses events
    to user-days BEFORE the window, so the per-user sort ranks ~30
    rows per user regardless of raw event volume; the island grouping
    is then a hash agg on the same partitioning (no second exchange —
    the window's hashpartitioning(user_id) carries into the groupBy)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    pd_ = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    anchored = pd_.withColumn("grp", F.date_sub(F.col("d"), rn))
    return (
        anchored.groupBy("user_id", "grp")
        .agg(
            F.date_format(F.min("d"), "yyyy-MM-dd").alias("island_start"),
            F.date_format(F.max("d"), "yyyy-MM-dd").alias("island_end"),
            F.count("*").alias("n_days"),
        )
        .drop("grp")
    )


@_register(
    "events_running_distinct",
    """
    SELECT event_id, user_id,
           count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS n_types_seen
    FROM events
    """,
)
def events_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over an ordered window (how many
    distinct event types has each user touched so far) — Spark's
    window aggregates reject DISTINCT, so the engine expresses it as
    size(collect_set() OVER w): the set state is bounded by the
    event-type cardinality (5 here; small enums in practice), NOT by
    history length, so the frame never grows beyond the type universe.
    For unbounded-cardinality columns the right tool is the
    approx-sketch rollup (events_sketch_rollup), not this exact form.
    One user_id exchange + per-partition sort — the same cost as any
    ordered window; ordering (ts, event_id) is total so ranks cannot
    flip."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_types_seen"),
    )


# ---------------------------------------------------------------------------
# Exponentially weighted moving average.

EWMA_DECAY = 0.5  # weight ratio between consecutive events
EWMA_LAGS = 8  # trailing events per smoothed point (current + 7 back)

_EWMA_NUM = " + ".join(
    f"coalesce(lag(value, {j}) OVER w, 0) * {EWMA_DECAY ** j!r}"
    for j in range(EWMA_LAGS)
)
_EWMA_DEN = " + ".join(
    f"(CASE WHEN lag(value, {j}) OVER w IS NOT NULL"
    f" THEN {EWMA_DECAY ** j!r} ELSE 0 END)"
    for j in range(EWMA_LAGS)
)

_EWMA_SQL = f"""
SELECT event_id, user_id, ts, value,
       floor(({_EWMA_NUM}) / ({_EWMA_DEN}) * 10000 + 0.5) / 10000 AS ewma
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@_register("events_ewma_smooth", _EWMA_SQL)
def events_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user: each event's
    value smoothed over its trailing EWMA_LAGS events with geometric
    decay EWMA_DECAY, the standard telemetry/metric smoother. The
    truncated-window form (normalize by the weights actually present)
    equals the classic recursive EWMA restarted at each user's first
    event, truncated at 8 terms — at decay 0.5 the dropped tail is
    < 2^-8 of the weight mass.

    Determinism: both engines evaluate the identical left-to-right
    sum of lag(value, j) * decay^j in IEEE double (decay powers are
    exact binary fractions), so the quotient is bit-identical and the
    4dp rounding can't straddle engines. Ordering within a user is
    total: (ts, event_id).

    100 TB shape: ONE window pass partitioned by user_id — all eight
    lags share the single window sort, Spark evaluates them in one
    WindowExec over the user partition; no self-join, no shuffle beyond
    the partitionBy. Skewed users are bounded by the per-user event
    count, not corpus size.

    Reference parity: none (no event surface) — events family,
    BASELINE.json."""
    events = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [F.lag("value", j).over(w) for j in range(EWMA_LAGS)]
    num = F.coalesce(lags[0], F.lit(0.0)) * (EWMA_DECAY ** 0)
    den = F.when(lags[0].isNotNull(), F.lit(EWMA_DECAY ** 0)).otherwise(0.0)
    for j in range(1, EWMA_LAGS):
        num = num + F.coalesce(lags[j], F.lit(0.0)) * (EWMA_DECAY ** j)
        den = den + F.when(
            lags[j].isNotNull(), F.lit(EWMA_DECAY ** j)
        ).otherwise(0.0)
    return events.select(
        "event_id", "user_id", "ts", "value", r4(num / den).alias("ewma")
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection (r13 queue: built + oracle ready, NOT
# registered — the r12 window is committed to the r08 staleness cohort
# and rows-only rotations; register into an r13 rule-2 slot with
# stream_ewma_smooth).

# Operating point (Page's textbook choice): slack k = 0.5 sigma,
# threshold h = 4 sigma. In the integer-unit arithmetic below these
# appear as `sd4` (0.5 * sd at scale 2e4) and `8 * sd4` (4 * sd).
CUSUM_K_SIGMA = 0.5
CUSUM_H_SIGMA = 4.0
# the threshold multiplier in 1/2-sigma units (sd4 = sigma/2 at the
# 2e4 scale): single-sourced here so the SQL oracle, the batch window
# query, and the streaming fold cannot desynchronize (review r12 —
# the '8' was previously hardcoded in three places)
_CUSUM_H_MULT = int(2 * CUSUM_H_SIGMA)

# All CUSUM arithmetic runs in EXACT bigint units of 1/_CUSUM_SCALE
# (the agg_distinct integer-cents discipline): a float prefix sum is
# association-sensitive — DuckDB's segment-tree window sum and Spark's
# running fold disagree in the last ULP, which both flips knife-edge
# threshold rows and breaks the 4dp output rounding. Integer sums are
# exact in any association. k = sd4 (= 0.5*sd at scale 2e4) and
# h = 8*sd4 (= 4*sd) stay integers because the scale is 2 * 10^4.
_CUSUM_SCALE = 20000

_CUSUM_SQL = f"""
WITH mu AS (
  SELECT event_type,
         CAST(floor(avg(value) * 10000 + 0.5) AS BIGINT) AS mu4,
         CAST(floor(stddev_samp(value) * 10000 + 0.5) AS BIGINT) AS sd4
  FROM events GROUP BY event_type
),
s AS (
  SELECT e.event_id, e.event_type, e.ts, m.sd4,
         sum(CAST(floor(e.value * {_CUSUM_SCALE} + 0.5) AS BIGINT)
             - (2 * m.mu4 + m.sd4)) OVER w AS run_sum
  FROM events e JOIN mu m USING (event_type)
  WINDOW w AS (PARTITION BY e.event_type
               ORDER BY e.ts, e.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
m2 AS (
  SELECT event_id, event_type, ts, sd4, run_sum,
         min(run_sum) OVER (PARTITION BY event_type
                            ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS run_min
  FROM s
)
SELECT event_id, event_type, ts,
       floor((run_sum - least(run_min, 0)) * 10000.0 / {_CUSUM_SCALE} + 0.5)
         / 10000 AS cusum
FROM m2
WHERE run_sum - least(run_min, 0) > {_CUSUM_H_MULT} * sd4
"""


@_register("events_cusum_changepoint", _CUSUM_SQL)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM change-point detector per event_type (Page
    1954), self-calibrating: flag events where the cumulative positive
    drift of value above (mean + 0.5*sigma) exceeds 4*sigma — the
    textbook k = sigma/2, h = 4 sigma operating point. The recursion
    c_i = max(0, c_{i-1} + x_i - mu - k) is NOT window-expressible
    directly, but has the exact prefix form
    c_i = S_i - min(0, S_1..S_i) with S the running sum of
    (x - mu - k) — two frames over ONE window sort, no recursion, no
    UDF. (min is clamped at 0 because the recursion floors at the
    implicit empty prefix.)

    Determinism: everything runs in exact bigint units of 1/20000
    (see _CUSUM_SCALE) — mu and sigma quantize to 4dp ints before
    use, each value quantizes to the scale, and the prefix sums are
    integer-exact in ANY association (a float prefix sum is not:
    DuckDB's segment-tree window aggregation associates differently
    from Spark's running fold, flipping knife-edge threshold rows
    and 4dp output roundings — both observed before this form).

    100 TB shape: the per-type (mean, sigma) is one hash-agg broadcast
    back by AQE; the detector is a single window partitioned by
    event_type — the same one-sort two-frame shape as win_running.
    With few, huge types the production path pre-splits time into
    epochs and chains the carry, unchanged semantics per epoch — which
    also bounds the int64 prefix sum: run_sum drifts by about
    -sd4 (~5e5 units here) per event, so a single unbroken series
    stays inside int64 to ~10^13 events per type; epoch splitting
    renews that headroom.

    Reference parity: none (no event surface) — events family,
    BASELINE.json."""
    events = load_table(spark, sf_dir, "events")

    def q4(col):  # 4dp quantize to bigint, engine-exact floor form
        return F.floor(col * 10000.0 + 0.5).cast("bigint")

    mu = events.groupBy("event_type").agg(
        q4(F.avg("value")).alias("mu4"),
        q4(F.stddev_samp("value")).alias("sd4"),
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    v_s = F.floor(F.col("value") * _CUSUM_SCALE + 0.5).cast("bigint")
    run_sum = F.sum(
        v_s - (2 * F.col("mu4") + F.col("sd4"))
    ).over(w)
    joined = events.join(mu, "event_type").select(
        "event_id",
        "event_type",
        "ts",
        "sd4",
        run_sum.alias("run_sum"),
    )
    run_min = F.min("run_sum").over(
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cusum_i = F.col("run_sum") - F.least(run_min, F.lit(0).cast("bigint"))
    return (
        joined.select(
            "event_id",
            "event_type",
            "ts",
            "sd4",
            cusum_i.alias("ci"),
        )
        .filter(F.col("ci") > _CUSUM_H_MULT * F.col("sd4"))
        .select(
            "event_id",
            "event_type",
            "ts",
            (
                F.floor(F.col("ci") * 10000.0 / _CUSUM_SCALE + 0.5) / 10000
            ).alias("cusum"),
        )
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test (registered r12 with the
# CUSUM detector above; both in the r12 external window).

_KS_SQL = """
WITH pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b
  FROM (SELECT DISTINCT event_type FROM events) a
  JOIN (SELECT DISTINCT event_type FROM events) b
    ON a.event_type < b.event_type
),
per_value AS (
  SELECT p.type_a, p.type_b, e.value,
         count(*) FILTER (e.event_type = p.type_a) AS ca,
         count(*) FILTER (e.event_type = p.type_b) AS cb
  FROM pairs p
  JOIN events e ON e.event_type IN (p.type_a, p.type_b)
  GROUP BY p.type_a, p.type_b, e.value
),
cum AS (
  SELECT type_a, type_b,
         sum(ca) OVER w AS cum_a,
         sum(cb) OVER w AS cum_b,
         sum(ca) OVER tot AS n_a,
         sum(cb) OVER tot AS n_b
  FROM per_value
  WINDOW w AS (PARTITION BY type_a, type_b ORDER BY value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         tot AS (PARTITION BY type_a, type_b)
)
SELECT type_a, type_b,
       CAST(max(n_a) AS BIGINT) AS n_a,
       CAST(max(n_b) AS BIGINT) AS n_b,
       floor(max(abs(cum_a * n_b - cum_b * n_a))
             / (1.0 * max(n_a) * max(n_b)) * 10000 + 0.5) / 10000 AS d_stat
FROM cum
GROUP BY type_a, type_b
"""


@_register("events_ks_drift", _KS_SQL)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic for every pair of
    event types: D = sup_x |ECDF_a(x) - ECDF_b(x)| over value — the
    standard distribution-drift test a telemetry pipeline runs beside
    a mean-shift detector (events_cusum_changepoint). Ties are handled
    by evaluating the ECDFs only at distinct-value boundaries (all
    rows equal to a value are consumed before the gap is measured),
    the right-continuous convention.

    Exactness: D is the max of |cum_a*n_b - cum_b*n_a| over INTEGER
    counts, divided once at the end — no float accumulates across
    rows, so engines can't diverge (the CUSUM lesson applied from the
    start). 4dp engine-exact rounding on the single final quotient.

    100 TB shape: the type-pair dimension is tiny (it's a self-join of
    DISTINCT types — broadcast); the heavy side groups each event once
    per pair containing it (k-1 replicas for k types), then ONE window
    per pair over DISTINCT values, not rows. For many types the
    production form fixes one reference type per comparison instead of
    all pairs, dropping the replication to 1. The pair generator
    (theta self-join of distinct types) and the OR-condition pair-dim
    broadcast are two deliberate BroadcastNestedLoopJoins, both
    bounded by the type universe — allowance pinned in
    tests/test_plans.py.

    Reference parity: none (no event surface) — events family,
    BASELINE.json."""
    events = load_table(spark, sf_dir, "events")
    types = events.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("type_a"))
        .join(
            types.select(F.col("event_type").alias("type_b")),
            F.col("type_a") < F.col("type_b"),
        )
    )
    joined = events.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    per_value = joined.groupBy("type_a", "type_b", "value").agg(
        F.count_if(F.col("event_type") == F.col("type_a")).alias("ca"),
        F.count_if(F.col("event_type") == F.col("type_b")).alias("cb"),
    )
    w = (
        W.partitionBy("type_a", "type_b")
        .orderBy("value")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tot = W.partitionBy("type_a", "type_b")
    cum = per_value.select(
        "type_a",
        "type_b",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
    )
    gap = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return cum.groupBy("type_a", "type_b").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        (
            F.floor(
                F.max(gap) / (F.max("n_a") * F.max("n_b") * 1.0) * 10000
                + 0.5
            )
            / 10000
        ).alias("d_stat"),
    )


# ---------------------------------------------------------------------------
# Welch's two-sample t-test between event types — the parametric
# mean-drift companion to the nonparametric KS distance above. All
# cross-row accumulation is EXACT integer arithmetic: values quantize
# to BIGINT cents (1e2), and the per-type (n, sum, sum-of-squares)
# triple aggregates exactly in any fold order; the t statistic is one
# fixed chain of double operations per pair, identical in both
# engines. Headroom: sum-of-squares of cent-scaled values |v| <= 1e3
# is 1e10/row, ~9e8 rows per type inside int64 (Spark side; DuckDB
# widens to HUGEINT regardless). 100 TB shape: events aggregate ONCE
# per type (one hash-agg over the data), then the k-row stat table
# theta-joins with itself — O(data) + O(k^2) on a broadcast-tiny side,
# strictly cheaper than the KS pair replication.

_TT_SCALE = 100

_TTEST_SQL = f"""
WITH s AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(floor(value * {_TT_SCALE} + 0.5) AS BIGINT))
              AS BIGINT) AS sv,
         CAST(sum(CAST(floor(value * {_TT_SCALE} + 0.5) AS BIGINT)
                  * CAST(floor(value * {_TT_SCALE} + 0.5) AS BIGINT))
              AS BIGINT) AS svv
  FROM events GROUP BY event_type
)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       a.n AS n_a, b.n AS n_b,
       floor((CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n)
             / {_TT_SCALE} * 1e4 + 0.5) / 1e4 AS mean_diff,
       -- degenerate-variance guard (review r12): greatest clamps the
       -- double cancellation noise of a constant-valued type to 0 and
       -- nullif turns the 0 denominator into NULL on BOTH engines
       -- (Spark x/0 is NULL, DuckDB is Inf — engine-divergent)
       floor((CAST(a.sv AS DOUBLE) / a.n - CAST(b.sv AS DOUBLE) / b.n)
             / sqrt(nullif(greatest(
                 (CAST(a.svv AS DOUBLE) - CAST(a.sv AS DOUBLE)
                    * CAST(a.sv AS DOUBLE) / a.n) / (a.n - 1) / a.n
                 + (CAST(b.svv AS DOUBLE) - CAST(b.sv AS DOUBLE)
                    * CAST(b.sv AS DOUBLE) / b.n) / (b.n - 1) / b.n,
                 CAST(0 AS DOUBLE)), CAST(0 AS DOUBLE)))
             * 1e4 + 0.5) / 1e4 AS t_stat
FROM s a JOIN s b ON a.event_type < b.event_type
WHERE a.n > 1 AND b.n > 1
"""


@_register("events_welch_ttest", _TTEST_SQL)
def events_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t statistic for every pair of event
    types: t = (mean_a - mean_b) / sqrt(var_a/n_a + var_b/n_b) — the
    parametric drift test run beside the KS distance (events_ks_drift)
    and the CUSUM detector (events_cusum_changepoint) in a telemetry
    quality suite. Means/variances derive from exact integer
    (n, sum, sum-of-squares) in cent units; see the module comment on
    the fold-order and headroom discipline. Registered r12, queued for
    an r13 rule-2 window slot (registry.py note).

    Reference parity: none (no event surface) — events family,
    BASELINE.json."""
    events = load_table(spark, sf_dir, "events")
    vq = F.floor(F.col("value") * _TT_SCALE + 0.5).cast("bigint")
    s = events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(vq).alias("sv"),
        F.sum(vq * vq).alias("svv"),
    )
    a = s.select(
        F.col("event_type").alias("type_a"),
        F.col("n").alias("n_a"),
        F.col("sv").alias("sv_a"),
        F.col("svv").alias("svv_a"),
    )
    b = s.select(
        F.col("event_type").alias("type_b"),
        F.col("n").alias("n_b"),
        F.col("sv").alias("sv_b"),
        F.col("svv").alias("svv_b"),
    )
    ma = F.col("sv_a").cast("double") / F.col("n_a")
    mb = F.col("sv_b").cast("double") / F.col("n_b")
    va = (
        F.col("svv_a").cast("double")
        - F.col("sv_a").cast("double") * F.col("sv_a").cast("double")
        / F.col("n_a")
    ) / (F.col("n_a") - 1) / F.col("n_a")
    vb = (
        F.col("svv_b").cast("double")
        - F.col("sv_b").cast("double") * F.col("sv_b").cast("double")
        / F.col("n_b")
    ) / (F.col("n_b") - 1) / F.col("n_b")
    # degenerate guards (review r12): drop n=1 types (the (n-1)
    # divisor) and NULL the t for zero pooled variance — Spark's
    # non-ANSI x/0 is NULL while DuckDB's IEEE division is Inf, an
    # engine-divergent value; greatest clamps the double cancellation
    # noise of a constant-valued type before the nullif
    sem2 = F.nullif(
        F.greatest(va + vb, F.lit(0.0)), F.lit(0.0)
    )
    return (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .filter((F.col("n_a") > 1) & (F.col("n_b") > 1))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            (F.floor((ma - mb) / _TT_SCALE * 1e4 + 0.5) / 1e4)
            .alias("mean_diff"),
            (F.floor((ma - mb) / F.sqrt(sem2) * 1e4 + 0.5) / 1e4)
            .alias("t_stat"),
        )
    )


# ---------------------------------------------------------------------------
# Population Stability Index — the third drift lens beside the KS
# distance (nonparametric sup-gap) and Welch's t (parametric mean):
# PSI over 10 equal-width value bins, the metric ML monitoring
# dashboards alarm on (PSI > 0.2 = significant shift). Engine
# determinism end to end: bin edges derive from the GLOBAL integer
# cent min/max (exact), bin assignment is pure integer arithmetic,
# per-bin proportions are Laplace-smoothed (+0.5 per bin) so empty
# bins need no epsilon hack, and the 10 per-bin terms quantize to
# BIGINT 1e-9 units before summing (the _LP_SCALE discipline — a
# 10-term double sum still has engine-divergent association).
# 100 TB shape: ONE (event_type, bin) hash-agg over the data, then a
# k*10-row self-join — same O(data) + O(k^2) as the t-test.

_PSI_BINS = 10
_PSI_Q = 10**9

_PSI_SQL = f"""
WITH b AS (
  SELECT CAST(floor(min(value) * 100 + 0.5) AS BIGINT) AS lo,
         CAST(floor(max(value) * 100 + 0.5) AS BIGINT) - 
           CAST(floor(min(value) * 100 + 0.5) AS BIGINT) + 1 AS span
  FROM events
),
c AS (
  SELECT event_type,
         least({_PSI_BINS - 1},
               ((CAST(floor(value * 100 + 0.5) AS BIGINT)
                 - (SELECT lo FROM b)) * {_PSI_BINS})
               // (SELECT span FROM b)) AS bin,
         count(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS nt FROM c GROUP BY 1),
grid AS (
  SELECT t.event_type, t.nt, g.bin, coalesce(c.n, 0) AS n
  FROM tot t
  CROSS JOIN (SELECT unnest(range(0, {_PSI_BINS})) AS bin) g
  LEFT JOIN c ON c.event_type = t.event_type AND c.bin = g.bin
),
terms AS (
  SELECT a.event_type AS type_a, b2.event_type AS type_b,
         a.nt AS n_a, b2.nt AS n_b,
         CAST(floor(
           ((a.n + 0.5) / (a.nt + {_PSI_BINS * 0.5})
            - (b2.n + 0.5) / (b2.nt + {_PSI_BINS * 0.5}))
           * ln(((a.n + 0.5) / (a.nt + {_PSI_BINS * 0.5}))
                / ((b2.n + 0.5) / (b2.nt + {_PSI_BINS * 0.5})))
           * {_PSI_Q} + 0.5) AS BIGINT) AS tq
  FROM grid a JOIN grid b2
    ON a.bin = b2.bin AND a.event_type < b2.event_type
)
SELECT type_a, type_b, n_a, n_b,
       floor(CAST(sum(tq) AS DOUBLE) / {_PSI_Q} * 1e4 + 0.5) / 1e4 AS psi
FROM terms
GROUP BY type_a, type_b, n_a, n_b
"""


@_register("events_psi_drift", _PSI_SQL)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between every pair of event types
    over 10 equal-width global-cent bins (see the module comment for
    the determinism discipline). Registered r12; in the r12 external
    window under the never-verified rule.

    Reference parity: none (no event surface) — events family,
    BASELINE.json."""
    events = load_table(spark, sf_dir, "events")
    vc = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    # calibration is TWO exact integer scalars — collect them on the
    # driver and inline as literals (the 4-scalar bbox precedent):
    # a one-row broadcast here would otherwise replicate a BNLJ into
    # every branch that reuses the binned relation
    lo, span = events.agg(
        F.min(vc).alias("lo"),
        (F.max(vc) - F.min(vc) + 1).alias("span"),
    ).first()
    if lo is None:
        # empty table: no pairs exist; constants keep the bin
        # expression well-formed instead of interpolating 'NoneL'
        # into the SQL literal (review r12)
        lo, span = 0, 1
    binned = events.select(
        "event_type",
        F.least(
            F.lit(_PSI_BINS - 1),
            F.expr(
                f"((CAST(floor(value * 100 + 0.5) AS BIGINT) - {lo}L)"
                f" * {_PSI_BINS}) div {span}L"
            ),
        ).alias("bin"),
    )
    c = binned.groupBy("event_type", "bin").agg(F.count("*").alias("n"))
    tot = c.groupBy("event_type").agg(F.sum("n").alias("nt"))
    # densify to the full 10-bin grid via explode — no join
    grid = (
        tot.select(
            "event_type", "nt",
            F.explode(
                F.sequence(F.lit(0).cast("bigint"),
                           F.lit(_PSI_BINS - 1).cast("bigint"))
            ).alias("bin"),
        )
        .join(c, ["event_type", "bin"], "left")
        .select(
            "event_type", "nt", "bin",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )
    half = _PSI_BINS * 0.5
    ga = grid.select(
        F.col("event_type").alias("type_a"), F.col("nt").alias("n_a"),
        "bin", F.col("n").alias("na"),
    )
    gb = grid.select(
        F.col("event_type").alias("type_b"), F.col("nt").alias("n_b"),
        F.col("bin").alias("bin_b"), F.col("n").alias("nb"),
    )
    pa = (F.col("na") + 0.5) / (F.col("n_a") + half)
    pb = (F.col("nb") + 0.5) / (F.col("n_b") + half)
    tq = F.floor((pa - pb) * F.log(pa / pb) * _PSI_Q + 0.5).cast("bigint")
    return (
        ga.join(gb, F.col("bin") == F.col("bin_b"))
        .filter(F.col("type_a") < F.col("type_b"))
        .select("type_a", "type_b", "n_a", "n_b", tq.alias("tq"))
        .groupBy("type_a", "type_b", "n_a", "n_b")
        .agg(
            (
                F.floor(F.sum("tq").cast("double") / _PSI_Q * 1e4 + 0.5)
                / 1e4
            ).alias("psi")
        )
    )
