"""Oracle-backed streaming parity query (SURVEY §2B streaming row).

``stream_session_flush`` REALLY runs Structured Streaming — the events
table is replayed through the file source in time-ordered micro-batches
into the stateful TTL sessionizer
(streaming/windows.py::session_flush_on_timeout, split_on_gap=True) —
and the flushed session records are returned as a plain DataFrame whose
oracle is the SAME SQL as the batch twin ``events_sessionize_gap``.
That closes the loop the pytest suite pins locally (stream == batch)
with an externally hashed correctness row: the driver cannot tell the
difference between this and any batch query, which is the point —
incremental execution must be invisible in the result.

Replay protocol (what makes the stream deterministic):
- the events table is range-repartitioned and sorted by ``ts`` into
  K parquet chunk files whose lexicographic part-file order equals
  time order; mtimes are set strictly increasing so the file source
  (oldest-first) consumes them in event-time order with
  ``maxFilesPerTrigger=1``;
- per-user arrival is therefore time-ordered, which is exactly the
  regime where split_on_gap sessionization is exact (late data would
  need the watermark story instead — that is what the 10-minute
  watermark + EventTimeTimeout half already handles);
- two far-future sentinel batches for a reserved negative user_id
  advance the event-time watermark past every real session's
  last+gap deadline (the second batch exists because a watermark
  computed after batch N takes effect in batch N+1), flushing all
  remaining state; the sentinel key itself is filtered out of the
  result.

At scale the file source swaps for Kafka and the memory sink for
foreachBatch — the state operator and its TTL bound are unchanged.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from adcirctime2cogs_spark.streaming.windows import (
    drain_and_stop,
    session_flush_on_timeout,
)
from adcirctime2cogs_spark.tables import load_table

QUERIES = {}
ORACLES = {}

_SENTINEL_USER = -1
_N_CHUNKS = 8


def stream_session_flush(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionize events by actually streaming them (see module
    docstring); result shape matches events_sessionize_gap."""
    events = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    tmp = tempfile.mkdtemp(prefix="stream_sess_")
    try:
        src = os.path.join(tmp, "src")
        (
            events.repartitionByRange(_N_CHUNKS, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(src)
        )
        files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        base = 1_000_000_000
        for i, f in enumerate(files):
            os.utime(os.path.join(src, f), (base + i, base + i))
        # sentinel batches: far past every real deadline; written last
        max_ts = events.agg(F.max("ts").alias("m")).first()["m"]
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        for j in range(2):
            pdf = pd.DataFrame(
                {
                    "user_id": [_SENTINEL_USER],
                    "event_id": [-1],
                    "ts": [max_ts + pd.Timedelta(days=10 + j)],
                }
            ).astype({"ts": "datetime64[us]"})
            p = os.path.join(src, f"zz-sentinel-{j}.parquet")
            pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), p)
            os.utime(p, (base + 10_000 + j, base + 10_000 + j))

        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sink = f"stream_sess_{uuid.uuid4().hex[:12]}"
        q = (
            session_flush_on_timeout(stream, gap_minutes=30, split_on_gap=True)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .start()
        )
        drain_and_stop(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    from adcirctime2cogs_spark.streaming.windows import (
        materialize_and_drop_sink,
    )

    out = materialize_and_drop_sink(spark, sink).filter(
        F.col("user_id") != _SENTINEL_USER
    )
    # sessions of one user are disjoint in time, so first_us ordering
    # reproduces the batch twin's cumulative session numbering
    w = W.partitionBy("user_id").orderBy("first_us")
    return out.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("session_no"),
        "n_events",
        F.date_format(F.timestamp_micros(F.col("first_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "sess_start"
        ),
        F.date_format(F.timestamp_micros(F.col("last_us")), "yyyy-MM-dd HH:mm:ss").alias(
            "sess_end"
        ),
    )


def stream_tumbling_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed streaming aggregate, externally hashed: the 5-minute
    tumbling count/sum rollup runs through readStream (file source over
    the fixture parquet, same shared ts-decode plan as batch) with a
    watermark, complete-mode memory sink — and must equal the plain
    GROUP BY its oracle states. No replay choreography is needed here:
    complete mode re-emits full state, and with the whole fixture in
    one batch the watermark never drops anything, so the oracle is the
    batch twin events_tumbling_window's SQL verbatim."""
    from adcirctime2cogs_spark.streaming.windows import (
        read_events_stream,
        run_to_memory,
        tumbling_counts,
    )

    sink = f"stream_tumb_{uuid.uuid4().hex[:12]}"
    return run_to_memory(
        tumbling_counts(read_events_stream(spark, sf_dir)), sink,
        mode="complete",
    )


def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join, externally hashed: each streamed event picks
    up its customer's market segment from the static customer dim
    (broadcast per micro-batch, zero stream state), appended to a
    memory sink — must equal the batch left join the oracle states."""
    from adcirctime2cogs_spark.streaming.windows import (
        enrich_with_users,
        read_events_stream,
        run_to_memory,
    )

    cust = load_table(spark, sf_dir, "customer")
    sink = f"stream_enrich_{uuid.uuid4().hex[:12]}"
    return run_to_memory(
        enrich_with_users(read_events_stream(spark, sf_dir), cust), sink,
        mode="append",
    )


QUERIES["stream_tumbling_rollup"] = stream_tumbling_rollup
# same SQL as the batch twin events_tumbling_window
ORACLES["stream_tumbling_rollup"] = """
    SELECT strftime(make_timestamp(CAST(floor(epoch(ts) / 300) AS BIGINT) * 300 * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1, 2
"""

QUERIES["stream_static_enrich"] = stream_static_enrich
ORACLES["stream_static_enrich"] = """
    SELECT e.event_id, e.user_id, e.event_type, e.value, c.c_mktsegment
    FROM events e
    LEFT JOIN customer c ON e.user_id = c.c_custkey
"""

def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join, externally hashed: every click a
    user makes within 30 minutes after one of their views, both sides
    streamed with watermarks (the join state store evicts buffered
    views once the click watermark passes view_ts + 30 min — the
    bounded-state property), appended to a memory sink — must equal
    the batch self-join with the identical range condition."""
    from adcirctime2cogs_spark.streaming.windows import (
        clicks_after_views,
        read_events_stream,
        run_to_memory,
    )

    stream = read_events_stream(spark, sf_dir)
    sink = f"stream_ssj_{uuid.uuid4().hex[:12]}"
    return run_to_memory(
        clicks_after_views(stream, stream), sink, mode="append"
    )


QUERIES["stream_stream_interval_join"] = stream_stream_interval_join
ORACLES["stream_stream_interval_join"] = """
    SELECT v.event_id AS view_id,
           c.event_id AS click_id,
           v.user_id,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts_s,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts_s
    FROM events v
    JOIN events c
      ON v.user_id = c.user_id
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
"""


QUERIES["stream_session_flush"] = stream_session_flush
# identical semantics to the batch twin events_sessionize_gap
# (operators/eventwindows.py) — one SQL, two execution strategies
ORACLES["stream_session_flush"] = """
    WITH g AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)) > 1800
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
"""


def stream_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_ewma_smooth via windows.ewma_by_user,
    registered r12 with _EWMA_SQL as its oracle (the batch twin's —
    one SQL, two execution strategies). Replays the
    events table through the file source in time-ordered micro-batches
    — the same chunk-mtime protocol as stream_session_flush, minus the
    watermark sentinels (NoTimeout emits every event's smoothed value
    in the batch that carries it, so nothing waits on state expiry)."""
    from adcirctime2cogs_spark.functions.numeric import r4
    from adcirctime2cogs_spark.streaming.windows import (
        ewma_by_user,
        materialize_and_drop_sink,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    tmp = tempfile.mkdtemp(prefix="stream_ewma_")
    try:
        src = os.path.join(tmp, "src")
        # chunk on the FULL (ts, event_id) batch-twin ordering, not ts
        # alone: two same-user events with EQUAL timestamps straddling
        # a chunk boundary would otherwise arrive in undefined relative
        # order (the sessionizer's gap semantics tolerate that; an
        # order-sensitive per-event fold does not)
        (
            events.repartitionByRange(_N_CHUNKS, "ts", "event_id")
            .sortWithinPartitions("ts", "event_id")
            .write.mode("overwrite")
            .parquet(src)
        )
        files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        base = 1_000_000_000
        for i, f in enumerate(files):
            os.utime(os.path.join(src, f), (base + i, base + i))
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sink = f"stream_ewma_{uuid.uuid4().hex[:12]}"
        q = (
            ewma_by_user(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .start()
        )
        drain_and_stop(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = materialize_and_drop_sink(spark, sink)
    return out.select(
        "event_id",
        "user_id",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "value",
        r4(F.col("ewma")).alias("ewma"),
    )


# oracle: the batch twin's SQL (operators/eventwindows._EWMA_SQL) — the
# streaming replay must land on the exact rows the one-pass window
# query produces, including the 4dp floor rounding
from adcirctime2cogs_spark.operators.eventwindows import _EWMA_SQL  # noqa: E402

QUERIES["stream_ewma_smooth"] = stream_ewma_smooth
ORACLES["stream_ewma_smooth"] = _EWMA_SQL


def stream_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of events_cusum_changepoint: the same one-sided
    CUSUM (Page 1954) as a STATEFUL per-type fold instead of a batch
    window — state per event_type is two BIGINTs (run_sum, run_min),
    constant bytes per key forever, the property that keeps the
    detector alive on an unbounded stream. Calibration (mu, sigma) is
    a batch pre-pass over the static table, quantized to the exact
    4dp integers the batch twin uses (in production: a frozen
    calibration epoch); the fold then runs in exact bigint units of
    1/_CUSUM_SCALE, so under the time-ordered replay protocol the
    flagged set and 4dp cusum values are BIT-IDENTICAL to the batch
    window query — one SQL oracle, two execution strategies.
    Registered r12 with _CUSUM_SQL (eventwindows.py) as its oracle."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState

    from adcirctime2cogs_spark.operators.eventwindows import (
        _CUSUM_SCALE,
        CUSUM_H_SIGMA,
    )
    from adcirctime2cogs_spark.streaming.windows import (
        materialize_and_drop_sink,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )

    def q4(col):
        return F.floor(col * 10000.0 + 0.5).cast("bigint")

    # a type with a single event has NULL stddev_samp: the batch twin
    # silently emits no flags for it (NULL comparisons), so the fold
    # must skip it rather than compute 2*mu4 + None (review r12)
    calib = {
        r["event_type"]: (r["mu4"], r["sd4"])
        for r in events.groupBy("event_type").agg(
            q4(F.avg("value")).alias("mu4"),
            q4(F.stddev_samp("value")).alias("sd4"),
        ).collect()
        if r["sd4"] is not None
    }
    h_mult = int(2 * CUSUM_H_SIGMA)  # 8 * sd4 at the 2e4 scale

    def update(key, pdfs, state: GroupState):
        if key[0] not in calib:  # un-calibratable type: never flags
            for _ in pdfs:
                pass
            return
        mu4, sd4 = calib[key[0]]
        run_sum, run_min = state.get if state.exists else (0, 0)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            if state.exists:
                state.update((run_sum, run_min))
            return
        pdf = pd.concat(frames).sort_values(["ts", "event_id"])
        out_id, out_ts, out_cusum = [], [], []
        drift = 2 * mu4 + sd4
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64").tolist()
        for eid, t_us, v in zip(
            pdf["event_id"].tolist(), ts_us, pdf["value"].tolist()
        ):
            vq = math.floor(v * _CUSUM_SCALE + 0.5)
            run_sum += vq - drift
            ci = run_sum - min(run_min, 0)
            if ci > h_mult * sd4:
                out_id.append(eid)
                out_ts.append(t_us)
                out_cusum.append(
                    math.floor(ci * 10000.0 / _CUSUM_SCALE + 0.5) / 10000
                )
            run_min = min(run_min, run_sum)
        state.update((run_sum, run_min))
        yield pd.DataFrame(
            {
                "event_id": pd.Series(out_id, dtype="int64"),
                "event_type": pd.Series(
                    [key[0]] * len(out_id), dtype="object"
                ),
                "ts_us": pd.Series(out_ts, dtype="int64"),
                "cusum": pd.Series(out_cusum, dtype="float64"),
            }
        )

    tmp = tempfile.mkdtemp(prefix="stream_cusum_")
    try:
        src = os.path.join(tmp, "src")
        # full (ts, event_id) chunk ordering — the fold is
        # order-sensitive, same protocol as stream_ewma_smooth
        (
            events.repartitionByRange(_N_CHUNKS, "ts", "event_id")
            .sortWithinPartitions("ts", "event_id")
            .write.mode("overwrite")
            .parquet(src)
        )
        files = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        base = 1_000_000_000
        for i, f in enumerate(files):
            os.utime(os.path.join(src, f), (base + i, base + i))
        stream = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        sink = f"stream_cusum_{uuid.uuid4().hex[:12]}"
        q = (
            stream.groupBy("event_type")
            .applyInPandasWithState(
                update,
                outputStructType=(
                    "event_id long, event_type string, ts_us long, "
                    "cusum double"
                ),
                stateStructType="run_sum long, run_min long",
                outputMode="update",
                timeoutConf="NoTimeout",
            )
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(sink)
            .start()
        )
        drain_and_stop(q)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    out = materialize_and_drop_sink(spark, sink)
    return out.select(
        "event_id",
        "event_type",
        F.timestamp_micros(F.col("ts_us")).alias("ts"),
        "cusum",
    )


QUERIES["stream_cusum_changepoint"] = stream_cusum_changepoint
# oracle: the batch twin's SQL (operators/eventwindows._CUSUM_SQL)
from adcirctime2cogs_spark.operators.eventwindows import _CUSUM_SQL  # noqa: E402

ORACLES["stream_cusum_changepoint"] = _CUSUM_SQL
