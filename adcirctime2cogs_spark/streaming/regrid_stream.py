"""Streaming regrid: the domain flagship on Structured Streaming.

The reference is strictly batch — it reruns the whole pipeline per
forecast snapshot (run/adcircTime2cogs.py:266 CLI, one invocation per
advisory). Here the SAME weights ⋈ timeseries → sum(w·v) plan
(plans/regrid.py) runs continuously: model output lands as parquet
drops of (ts, node_id, value) rows, and each micro-batch regrids the
new timesteps incrementally.

Scale shape — identical to the batch plan, minus the per-run fixed
cost:

- the barycentric weights table is STATIC (the mesh doesn't change
  mid-storm); it broadcasts to the stream side, so the stream never
  shuffles on node_id;
- the per-(ts, cell) aggregation is keyed on the watermarked event
  time, so state for a timestep is dropped as soon as the watermark
  passes it — state size is O(cells × in-flight timesteps), not
  O(history);
- the sink sees one append per completed timestep: exactly the
  per-timestep COG cadence of the reference, but pipelined instead of
  batch-sequential.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adcirctime2cogs_spark.plans.regrid import explode_weights

TS_STREAM_SCHEMA = "ts timestamp, node_id long, value double"


def read_timeseries_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over (ts, node_id, value) parquet drops — the
    layout netcdf_to_parquet writes, consumed as it lands."""
    reader = spark.readStream.schema(TS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def regrid_stream(
    weights: DataFrame, ts_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Continuous regrid: watermarked stream-static broadcast join +
    per-(ts, cell) aggregation, null-propagating dry nodes exactly like
    the batch plan (a cell is null unless all 3 node contributions are
    present and non-null at that ts)."""
    flat = F.broadcast(explode_weights(weights))
    joined = ts_stream.withWatermark("ts", watermark).join(flat, "node_id")
    return (
        joined.groupBy("ts", "cell_id", "grid_row", "grid_col")
        .agg(
            F.sum(F.col("w") * F.col("value")).alias("_sum"),
            F.count("value").alias("_nvals"),
            F.count("*").alias("_nw"),
        )
        .select(
            "ts",
            "cell_id",
            "grid_row",
            "grid_col",
            F.when(F.col("_nvals") == F.col("_nw"), F.col("_sum")).alias("value"),
        )
    )


def run_regrid_to_cogs(
    regridded: DataFrame, spec, out_dir: str, checkpoint_dir: str
) -> int:
    """Continuous COG production: drive the streaming regrid with a
    foreachBatch hook that pushes each micro-batch's COMPLETED
    timesteps (append mode — emitted exactly once, when the watermark
    passes them) through the batch COG sink. Returns the number of
    non-empty micro-batches.

    This closes the reference's whole dataflow as one always-on job:
    NetCDF drop → regrid → per-timestep COG, checkpointed and
    exactly-once, where the reference re-runs a batch CLI per advisory
    (run/adcircTime2cogs.py:266)."""
    from pyspark.sql import functions as F

    from adcirctime2cogs_spark.sinks.cog import write_cogs

    n_batches = 0

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        nonlocal n_batches
        rows = batch_df.withColumn(
            "ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
        )
        if rows.isEmpty():
            return
        n_batches += 1
        write_cogs(rows, spec, out_dir).collect()

    q = (
        regridded.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_batch)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return n_batches
