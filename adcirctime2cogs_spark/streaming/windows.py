"""Structured Streaming jobs over the events table (SURVEY §2B
streaming row): watermarked tumbling/sliding/session windows, streaming
dedup-within-watermark, and a stateful custom operator via
applyInPandasWithState.

Each job is the streaming form of a batch twin in
operators/eventwindows.py; tests/test_streaming.py replays the events
parquet through readStream (file source, maxFilesPerTrigger) into a
memory sink and asserts the final state equals the batch result — the
standard way to pin incremental == batch semantics.

At scale the file source swaps for Kafka and the memory sink for a
parquet/foreachBatch sink; watermarks bound the state store exactly the
same way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState

from adcirctime2cogs_spark.functions.numeric import r4
from adcirctime2cogs_spark.tables import TABLE_SCHEMAS, events_read_plan


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet — same ts-encoding
    contract as the batch loader, via the SHARED tables.events_read_plan
    (one decode implementation, so batch and stream can't drift)."""
    schema, decode = events_read_plan(sf_dir)
    return decode(
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )


def tumbling_counts(events: DataFrame) -> DataFrame:
    """5-min tumbling count/sum with a 10-min watermark: state for a
    window is dropped once the watermark passes its end."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), r4(F.sum("value")).alias("total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_counts(events: DataFrame) -> DataFrame:
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
        )
    )


def session_counts(events: DataFrame) -> DataFrame:
    """Session windows (30-min gap) — merging-window state per user."""
    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            "n",
        )
    )


def dedup_within_watermark(events: DataFrame) -> DataFrame:
    """Streaming dedup on (user_id, event_type) bounded by the
    watermark (state expires instead of growing forever)."""
    return events.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )


def running_value_by_user(events: DataFrame) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): running
    event-count and value-sum per user, emitted on every trigger —
    the arbitrary-state shape session/feature stores run on."""

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf="NoTimeout",
    )


def session_flush_on_timeout(
    events: DataFrame, gap_minutes: int = 30, split_on_gap: bool = False
) -> DataFrame:
    """Stateful session store with EVENT-TIME state expiry
    (applyInPandasWithState + EventTimeTimeout): per-user running
    session state (count, first/last event time) is flushed as ONE
    final record when the watermark passes the user's last event +
    gap — the state-TTL half of the stateful-operator story that
    running_value_by_user (NoTimeout, emit-on-every-trigger) doesn't
    show. State is removed on flush, so an inactive key costs nothing
    forever after — the property that keeps per-key state bounded on
    an unbounded key space (the failure mode that kills stateful
    streams at 100 TB is keys that never expire).

    With ``split_on_gap=True`` the operator is an EXACT gap
    sessionizer for per-user time-ordered arrival: incoming events are
    also split on intra-batch gaps (> gap), and a batch whose first
    event gaps away from the retained state closes that session
    immediately instead of waiting for the timeout — so the emitted
    sessions equal the batch twin ``events_sessionize_gap`` (see
    streaming/parity.py, which oracle-checks exactly that). The
    default (False) keeps the pure-TTL semantics: one record per key
    per expiry, nothing emitted while the key stays live.

    Timestamps ride through state as int64 epoch-micros (GroupState
    tuples are plain rows; micros round-trip exactly)."""
    gap_ms = gap_minutes * 60 * 1000
    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "first_us": [first_us],
                    "last_us": [last_us],
                }
            )
            return
        n, first_us, last_us = state.get if state.exists else (0, None, None)
        parts = [
            pdf["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            for pdf in pdfs
            if len(pdf)
        ]
        if not parts:
            if n:
                state.update((n, first_us, last_us))
                state.setTimeoutTimestamp(last_us // 1000 + gap_ms)
            return
        us = np.sort(np.concatenate(parts))
        if split_on_gap:
            segs = np.split(us, np.flatnonzero(np.diff(us) > gap_us) + 1)
        else:
            segs = [us]
        sessions = [(len(s), int(s[0]), int(s[-1])) for s in segs]
        if n:  # merge or close the session carried in state
            c0, f0, l0 = sessions[0]
            if split_on_gap and f0 < last_us:
                # exactness of the carry-merge depends on per-key
                # time-ordered arrival (the replay protocol): an
                # out-of-order batch that reaches BEHIND the carried
                # session could silently merge across a >gap hole or
                # mis-extend the session — fail loudly instead
                raise ValueError(
                    f"out-of-order arrival for key {key}: batch min "
                    f"{f0} < carried last {last_us}; split_on_gap "
                    "sessionization requires per-key time-ordered "
                    "replay (see streaming/parity.py protocol)"
                )
            if split_on_gap and f0 - last_us > gap_us:
                sessions.insert(0, (n, first_us, last_us))
            else:
                sessions[0] = (n + c0, min(first_us, f0), max(last_us, l0))
        *closed, (n, first_us, last_us) = sessions
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "n_events": [c for c, _, _ in closed],
                    "first_us": [f for _, f, _ in closed],
                    "last_us": [last for _, _, last in closed],
                }
            )
        state.update((n, first_us, last_us))
        # flush when the event-time watermark passes last + gap
        state.setTimeoutTimestamp(last_us // 1000 + gap_ms)

    return (
        events.withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=(
                "user_id long, n_events long, first_us long, last_us long"
            ),
            stateStructType="n long, first_us long, last_us long",
            outputMode="append",
            timeoutConf="EventTimeTimeout",
        )
    )


def enrich_with_users(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: each incoming event picks up its customer's
    market segment from a static dimension table. The static side is
    broadcast per micro-batch (no stream state at all — unlike a
    stream-stream join there is no watermark bookkeeping), which is the
    standard enrichment shape for a Kafka event feed against a
    slowly-changing dimension at any scale."""
    dim = F.broadcast(customers.select("c_custkey", "c_mktsegment"))
    return events.join(
        dim, events.user_id == dim.c_custkey, "left"
    ).select("event_id", "user_id", "event_type", "value", "c_mktsegment")


def clicks_after_views(views: DataFrame, clicks: DataFrame) -> DataFrame:
    """Stream-stream interval join: every click a user makes within 30
    minutes after one of their views, matched on user_id with the
    event-time range condition. Both sides carry watermarks so the join
    state store evicts: a buffered view can be dropped once the click
    watermark passes view_ts + 30 min — without the range condition the
    state would grow forever, which is the failure mode that kills
    stream-stream joins at scale."""
    v = (
        views.filter(F.col("event_type") == "view")
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
    )
    c = (
        clicks.filter(F.col("event_type") == "click")
        .withWatermark("ts", "10 minutes")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
        )
    )
    joined = v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") > F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return joined.select(
        "view_id",
        "click_id",
        F.col("v_user").alias("user_id"),
        F.date_format("view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts_s"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts_s"),
    )


def drain_and_stop(q) -> None:
    """processAllAvailable + stop with the stop GUARANTEED: a task
    failure inside the stream raises from processAllAvailable, and
    without a finally the StreamingQuery keeps running in the
    background — its memory sink pinned in driver memory, its source
    directory possibly about to be rmtree'd by the caller's cleanup
    (review r10). The ONE drain policy for every run_* helper and
    parity stream."""
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def run_to_parquet_batches(
    df: DataFrame, out_dir: str, checkpoint_dir: str, mode: str = "update"
) -> int:
    """foreachBatch sink: each micro-batch lands as its own parquet
    subdirectory (out_dir/batch=N) through the full batch writer —
    arbitrary sinks (upserts, JDBC, COG files) hang off the same hook.
    Returns the number of micro-batches processed. Checkpointing makes
    the stream resumable; at scale this is the streaming half of a
    lambda-free ingest (stream writes the same partitioned layout the
    batch regrid reads)."""
    n_batches = 0

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        n_batches += 1
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (
        df.writeStream.outputMode(mode)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )
    drain_and_stop(q)
    return n_batches


def run_to_memory(df: DataFrame, name: str, mode: str | None = None) -> DataFrame:
    """Drive a streaming DataFrame to completion into a memory sink and
    return the materialized table. Default mode: complete for windowed
    aggregations, append otherwise; stateful update-mode operators pass
    mode='update' explicitly."""
    if mode is None:
        # match the logical Aggregate NODE (start-of-line operator
        # name), not a bare substring — a column aliased
        # "AggregateScore" must not force complete mode, and stateful
        # FlatMapGroupsWithState plans (no Aggregate node) need their
        # callers to pass mode='update' explicitly
        import re as _re

        plan = df._jdf.queryExecution().analyzed().toString()
        # node prefix chars: tree-drawing [:+- ], streaming marker ~,
        # unresolved marker '
        is_agg = _re.search(r"^[:+\- ]*~?'?Aggregate ", plan, _re.M) is not None
        mode = "complete" if is_agg else "append"
    q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    drain_and_stop(q)
    return materialize_and_drop_sink(df.sparkSession, name)


def materialize_and_drop_sink(spark: SparkSession, name: str) -> DataFrame:
    """Materialize a memory sink's rows locally, then DROP the sink:
    each memory sink pins a full result copy in driver memory for the
    session's lifetime, so a long-lived session running sweeps/bench
    loops would accumulate one leaked copy per invocation. The ONE
    implementation of this policy — parity queries that manage their
    own sinks share it rather than re-implementing the sequence."""
    tbl = spark.table(name)
    local = spark.createDataFrame(tbl.collect(), schema=tbl.schema)
    spark.catalog.dropTempView(name)
    return local


def run_continuous_rollup(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = None,
    compact_target_bytes: int = 4 * 1024 * 1024,
) -> int:
    """Continuous aggregate (hypertable-style materialized rollup):
    maintain the tumbling-window counts as a PARTITIONED PARQUET TABLE,
    incrementally — update-mode re-emissions overwrite exactly the
    (window, event_type) partitions they carry (dynamic partition
    overwrite keyed by BOTH group columns: update mode re-emits only
    the changed groups of a window, so partitioning by the window
    alone would wipe that window's untouched sibling event_types on
    every partial re-emission), and a late event rewrites one
    partition, not the table.

    This is the lambda-free serving layer: readers see the same layout
    a batch rollup would write, while the stream keeps it current.
    Returns the number of micro-batches processed.

    With `compact_every`, the sink also runs the table-maintenance
    loop a real lakehouse needs, through a snapshot-isolated
    sinks/compact.VersionedTable: EVERY mutation — each batch's
    dynamic-partition overwrite and every N-th batch's small-file
    compaction — publishes a new immutable version (unchanged files
    hardlinked, `out_dir/current` symlink atomically re-pointed), so
    a reader that pinned `VersionedTable.snapshot()` scans one
    consistent version no matter how many appends/compactions land
    mid-query. Without `compact_every` the sink writes a plain
    parquet directory as before."""
    agg = tumbling_counts(events).withColumn(
        "win_key",
        F.regexp_replace(F.col("win_start"), "[-: ]", ""),
    )
    n_batches = 0
    vt = None
    if compact_every:
        from adcirctime2cogs_spark.sinks.compact import VersionedTable

        vt = VersionedTable(out_dir)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        # isEmpty() and the partition overwrite both evaluate the
        # aggregated micro-batch — persist so the trigger computes it
        # once, the same guard regrid_stream's sink carries
        # (review r10)
        batch_df.persist()
        try:
            if batch_df.isEmpty():
                return
            n_batches += 1

            def overwrite(table_dir: str) -> None:
                (
                    batch_df.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("win_key", "event_type")
                    .parquet(table_dir)
                )

            if vt is None:
                overwrite(out_dir)
                return
            vt.mutate(overwrite)
            if n_batches % compact_every == 0:
                vt.compact(
                    batch_df.sparkSession,
                    target_file_bytes=compact_target_bytes,
                    partition_cols=("win_key", "event_type"),
                )
        finally:
            batch_df.unpersist()

    q = (
        agg.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )
    drain_and_stop(q)
    return n_batches


def ewma_by_user(events: DataFrame, decay: float | None = None,
                 lags: int | None = None) -> DataFrame:
    """Per-EVENT stateful emission (applyInPandasWithState, NoTimeout):
    the streaming twin of operators/eventwindows.py::events_ewma_smooth.
    State per user is a bounded ring of the last lags-1 values —
    constant bytes per key regardless of stream length, the property
    that keeps an unbounded-key stateful stream alive at 100 TB.

    Exactness contract (pinned by tests/test_streaming.py): under
    per-user time-ordered arrival (the replay protocol) the emitted
    EWMA is BIT-IDENTICAL to the batch window twin — both evaluate
    coalesce(lag_j)*decay^j left-to-right newest-first in IEEE double
    (decay powers are exact binary fractions; adding a leading 0.0 and
    scaling by 2^-j are exact), so the 4dp rounding downstream can't
    straddle engines. Arrival-order ties inside a micro-batch are
    resolved by the same (ts, event_id) total order the batch twin
    sorts on."""
    from adcirctime2cogs_spark.operators.eventwindows import (
        EWMA_DECAY,
        EWMA_LAGS,
    )

    d = EWMA_DECAY if decay is None else decay
    k = EWMA_LAGS if lags is None else lags

    def update(key, pdfs, state: GroupState):
        hist = list(state.get[0]) if state.exists else []
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            if hist:
                state.update((hist,))
            return
        pdf = pd.concat(frames).sort_values(["ts", "event_id"])
        ewmas = []
        for v in pdf["value"].tolist():
            hist.append(float(v))
            if len(hist) > k:
                del hist[0]
            num = 0.0
            den = 0.0
            for j in range(len(hist)):
                w = d ** j
                num = num + hist[-1 - j] * w
                den = den + w
            ewmas.append(num / den)
        state.update((hist[-(k - 1):],))
        yield pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": key[0],
                "ts_us": pdf["ts"]
                .astype("datetime64[us]")
                .astype("int64")
                .to_numpy(),
                "value": pdf["value"].to_numpy(),
                "ewma": ewmas,
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "event_id long, user_id long, ts_us long, "
            "value double, ewma double"
        ),
        stateStructType="hist array<double>",
        outputMode="update",
        timeoutConf="NoTimeout",
    )
