"""Training-shard export sink: the layout a 100 TB dataset-prep
pipeline hands to the training loader.

Reference parity: the reference's only bulk sink is one file per
timestep (run/adcircTime2cogs.py:200-206 writes per-ts GeoTIFFs); this
is the same "bounded, evenly-sized output units" contract applied to
training data — Hive-partitioned by split (and optionally language),
shards bounded by maxRecordsPerFile, rows within a shard laid out in a
deterministic hash order so a re-run produces byte-stable shard
contents.

Why each knob matters at scale:
- `partitionBy(split[, lang])`: the loader opens only the split it
  trains on — partition pruning at the consumer.
- `repartition(n_shards, shard_key)`: one task per output shard, so
  shard sizes are governed by the hash, not by upstream partitioning
  skew; no 10 GB straggler files.
- `sortWithinPartitions`: deterministic row order inside a shard ->
  reproducible batches AND tighter parquet row-group min/max stats on
  the sort key for scan-time skipping.
- `maxRecordsPerFile`: a hard cap so one hot partition cannot emit an
  unsplittable file.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    split_col: str = "split",
    order_col: str = "doc_id",
    n_shards: int = 8,
    max_records_per_file: int = 100_000,
    extra_partition_cols: tuple[str, ...] = (),
) -> dict[str, int]:
    """Write df as Hive-partitioned, size-bounded, deterministically
    ordered parquet shards. Returns {relative partition dir: n files}.
    """
    part_cols = [split_col, *extra_partition_cols]
    shard = F.pmod(F.xxhash64(F.col(order_col)), F.lit(n_shards))
    (
        df.withColumn("shard", shard)
        # range-partition on the shard id: repartition(n, "shard")
        # murmur-hashes the already-bucketed value, and murmur3(i) % n
        # over i in [0, n) is NOT a bijection — partitions collide
        # (2-3 shard groups in one task, others empty), exactly the
        # straggler skew the n_shards knob exists to prevent. Range
        # partitioning with one narrow range per distinct value keeps
        # task <-> shard ~1:1.
        .repartitionByRange(n_shards, "shard")
        .sortWithinPartitions(*part_cols, order_col)
        .drop("shard")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*part_cols)
        .parquet(out_dir)
    )
    layout: dict[str, int] = {}
    for root, _dirs, files in os.walk(out_dir):
        pq = [f for f in files if f.endswith(".parquet")]
        if pq:
            layout[os.path.relpath(root, out_dir)] = len(pq)
    return layout
