"""Small-file compaction — the table-maintenance operator every
long-lived lake needs (OPTIMIZE / rewriteDataFiles in Delta/Iceberg
terms), expressed with plain Spark + atomic directory swap.

Why it exists here: this engine's own sinks create the problem shape —
streaming ingest lands one parquet file per micro-batch
(streaming/windows.py run_to_parquet_batches), the continuous rollup
overwrites tiny per-window partitions, and a ts-partitioned timeseries
accretes one small file per timestep. At 100 TB, scan cost is
dominated by file-open overhead and tiny row groups long before bytes
matter: compaction rewrites a directory into ~target-sized files so
downstream scans plan few, large, stats-rich splits.

Design:
- target file count is computed from the ACTUAL on-disk bytes
  (driver-side listing — metadata only), not row counts, so column
  width changes don't skew sizing;
- rows are re-laid-out with repartition(n) (hash, even sizes) or
  repartitionByRange(sort_cols) when a sort is requested — sorted
  compaction restores per-file min/max stats so range predicates skip
  whole files (the Z-order/time-sort story in functions/spatial.py);
- the rewrite lands in a sibling temp dir and publishes via two
  atomic renames (old -> backup, new -> table). Readers therefore
  never observe a HALF-compacted table; they can, however, hit a
  brief table-absent window between the renames, and a crash inside
  that window leaves the data intact under the `.pre-compact-*`
  backup name (recover by renaming it back). True in-place directory
  exchange needs filesystem RENAME_EXCHANGE or a metastore pointer
  swap (what Delta/Iceberg commit logs provide) — out of scope for a
  plain-directory table;
- partitioned layouts keep their partition columns (Hive dirs are
  re-created by partitionBy), with maxRecordsPerFile bounding any hot
  partition.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CompactionStats:
    files_before: int
    files_after: int
    bytes_total: int
    rows: int


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        out.extend(
            os.path.join(dirpath, f)
            for f in filenames
            if f.endswith(".parquet")
        )
    return out


def compact_parquet(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_cols: tuple[str, ...] = (),
    sort_cols: tuple[str, ...] = (),
) -> CompactionStats:
    """Rewrite `table_dir` into ~target-sized parquet files, atomically.

    Returns before/after stats. Row count AND an order-independent
    content hash (sum of per-row xxhash64 over all columns) are
    verified to survive the rewrite before the swap — a compaction
    that loses rows or corrupts values must fail loudly and leave the
    original table untouched.
    """
    files = _parquet_files(table_dir)
    bytes_total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_total // target_file_bytes))  # ceil

    # order-independent content fingerprint: count + sum of per-row
    # xxhash64 over ALL columns (decimal(38,0) so ~1e19 hash values
    # never overflow the sum). A rewrite that preserves cardinality
    # but corrupts values (codec bug, truncated column) changes the
    # sum and is caught before the swap.
    def _probe(d: DataFrame) -> tuple[int, int]:
        row = d.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(*d.columns).cast("decimal(38,0)")).alias("h"),
        ).first()
        return int(row.n), int(row.h) if row.h is not None else 0

    df = spark.read.parquet(table_dir)
    rows_before, hash_before = _probe(df)
    # bound rows per file from observed density so one hot partition
    # can't emit an unsplittable giant even in partitioned mode
    rows_per_file = max(1, rows_before // n_out) if rows_before else 1

    if sort_cols:
        laid_out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    elif partition_cols:
        laid_out = df.repartition(n_out, *partition_cols)
    else:
        laid_out = df.repartition(n_out)

    tmp = f"{table_dir.rstrip('/')}.compact-{uuid.uuid4().hex[:8]}"
    writer = laid_out.write.mode("overwrite").option(
        "maxRecordsPerFile", rows_per_file * 2
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)

    rows_after, hash_after = _probe(spark.read.parquet(tmp))
    if rows_after != rows_before or hash_after != hash_before:
        shutil.rmtree(tmp, ignore_errors=True)
        raise RuntimeError(
            f"compaction mismatch: rows {rows_before} -> {rows_after}, "
            f"content hash {hash_before} -> {hash_after}; "
            f"original left untouched at {table_dir}"
        )
    old = f"{table_dir.rstrip('/')}.pre-compact-{uuid.uuid4().hex[:8]}"
    os.replace(table_dir, old)
    try:
        os.replace(tmp, table_dir)
    except OSError:
        os.replace(old, table_dir)  # restore — the swap never happened
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(old, ignore_errors=True)
    return CompactionStats(
        files_before=len(files),
        files_after=len(_parquet_files(table_dir)),
        bytes_total=bytes_total,
        rows=rows_after,
    )
