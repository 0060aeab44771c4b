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


def _content_probe(d: DataFrame) -> tuple[int, int]:
    """Order-independent content fingerprint: row count + sum of
    per-row xxhash64 (decimal(38,0) so ~1e19 hash values never
    overflow the sum). Columns are hashed in SORTED NAME ORDER and
    cast to string so the probe survives the schema drift a re-layout
    legitimately introduces — writing partitionBy moves the partition
    columns to the end of the read-back schema and re-infers their
    type (string '2024-01-01' comes back as date). A rewrite that
    preserves cardinality but corrupts values still changes the sum
    and is caught before the swap/publish."""
    cols = [F.col(c).cast("string") for c in sorted(d.columns)]
    row = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h"),
    ).first()
    return int(row.n), int(row.h) if row.h is not None else 0


def _compact_into(
    spark: SparkSession,
    src: str,
    out: str,
    target_file_bytes: int,
    partition_cols: tuple[str, ...],
    sort_cols: tuple[str, ...],
    unchanged_msg: str,
) -> tuple[int, int, int]:
    """The ONE plan-layout + write + verify step both compaction
    surfaces share (review r10: it existed twice, nearly verbatim):
    size the output file count from src's observed bytes, lay out by
    range-sort / partition-hash / round-robin, write to `out` with a
    density-derived maxRecordsPerFile bound (so one hot partition
    can't emit an unsplittable giant even in partitioned mode), then
    verify that row count AND the order-independent content hash
    survived — a rewrite that loses rows or corrupts values raises
    (with `unchanged_msg` naming what stays untouched) BEFORE any
    swap/publish. Returns (rows, bytes_total, n_files_before)."""
    files = _parquet_files(src)
    bytes_total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, -(-bytes_total // target_file_bytes))  # ceil

    df = spark.read.parquet(src)
    rows_before, hash_before = _content_probe(df)
    rows_per_file = max(1, rows_before // n_out) if rows_before else 1

    if sort_cols:
        laid_out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    elif partition_cols:
        laid_out = df.repartition(n_out, *partition_cols)
    else:
        laid_out = df.repartition(n_out)

    writer = laid_out.write.mode("overwrite").option(
        "maxRecordsPerFile", rows_per_file * 2
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(out)

    rows_after, hash_after = _content_probe(spark.read.parquet(out))
    if rows_after != rows_before or hash_after != hash_before:
        raise RuntimeError(
            f"compaction mismatch: rows {rows_before} -> {rows_after}, "
            f"content hash {hash_before} -> {hash_after}; {unchanged_msg}"
        )
    return rows_before, bytes_total, len(files)


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
    tmp = f"{table_dir.rstrip('/')}.compact-{uuid.uuid4().hex[:8]}"
    try:
        rows_after, bytes_total, n_files = _compact_into(
            spark, table_dir, tmp, target_file_bytes,
            partition_cols, sort_cols,
            unchanged_msg=f"original left untouched at {table_dir}",
        )
    except RuntimeError:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
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
        files_before=n_files,
        files_after=len(_parquet_files(table_dir)),
        bytes_total=bytes_total,
        rows=rows_after,
    )


class VersionedTable:
    """Copy-on-write versioned parquet table with snapshot-isolated
    readers — the plain-filesystem rendition of a table format's
    manifest/snapshot mechanism, for tables a streaming sink keeps
    mutating while queries run.

    Layout: `root/vNNNNNNNN` immutable version directories plus a
    `root/current` symlink naming the live one. EVERY mutation —
    per-batch dynamic-partition overwrite or compaction — builds the
    next version in a staging directory (unchanged files HARDLINKED
    from the live version: metadata-only, no data copied; parquet
    files are never edited in place, so sharing blocks is safe) and
    publishes it by atomically re-pointing the symlink. Published
    versions are never touched again.

    Readers pin a snapshot with `snapshot()` (the resolved real path)
    so their planned file list survives any number of later publishes
    until garbage collection; GC keeps the newest `keep` versions, so
    the isolation grace window is `keep - 1` publishes — size it to
    the longest query (a cluster deployment would add lease files or
    reference counts; on an object store the same design is a
    manifest, not a symlink). Scanning through `current` itself is
    only safe for queries that finish before the next publish — the
    streaming tests pin snapshots, matching how Iceberg/Delta readers
    pin a snapshot id.

    Directory-swap compaction (`compact_parquet`) has neither
    property: its two-step os.replace leaves a window where the table
    path is missing and deletes the old files immediately. Streaming
    sinks that interleave compaction with appends use this class.
    """

    def __init__(self, root: str, keep: int = 4):
        self.root = root
        self.keep = max(2, keep)
        self.current = os.path.join(root, "current")
        os.makedirs(root, exist_ok=True)
        if not os.path.lexists(self.current):
            os.makedirs(os.path.join(root, "v00000001"), exist_ok=True)
            self._flip("v00000001")

    # ---- read side --------------------------------------------------
    def snapshot(self) -> str:
        """Immutable path of the live version — what readers plan
        against. Survives later publishes for `keep - 1` cycles."""
        return os.path.realpath(self.current)

    def version(self) -> int:
        return int(os.path.basename(self.snapshot())[1:])

    # ---- publish machinery ------------------------------------------
    def _flip(self, version_name: str) -> None:
        tmp = os.path.join(self.root, f".current-{uuid.uuid4().hex[:8]}")
        os.symlink(version_name, tmp)
        os.replace(tmp, self.current)  # atomic publish

    def _gc(self) -> None:
        versions = sorted(
            int(n[1:]) for n in os.listdir(self.root)
            if n.startswith("v") and n[1:].isdigit()
        )
        for v in versions[: -self.keep]:
            shutil.rmtree(os.path.join(self.root, f"v{v:08d}"),
                          ignore_errors=True)

    def _publish(self, build) -> str:
        """build(staging_dir, live_snapshot_dir) populates the next
        version; on success it is renamed into place and published."""
        src = self.snapshot()
        nxt_name = f"v{self.version() + 1:08d}"
        staging = os.path.join(self.root, f".staging-{uuid.uuid4().hex[:8]}")
        os.makedirs(staging)
        try:
            build(staging, src)
        except BaseException:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        os.replace(staging, os.path.join(self.root, nxt_name))
        self._flip(nxt_name)
        self._gc()
        return nxt_name

    @staticmethod
    def _link_tree(src: str, dst: str) -> None:
        """Hardlink every file of src into dst (dirs recreated):
        metadata-only copy-on-write base for the next version."""
        for dirpath, _dirnames, filenames in os.walk(src):
            rel = os.path.relpath(dirpath, src)
            target = dst if rel == "." else os.path.join(dst, rel)
            os.makedirs(target, exist_ok=True)
            for f in filenames:
                try:
                    os.link(os.path.join(dirpath, f), os.path.join(target, f))
                except OSError:
                    shutil.copy2(os.path.join(dirpath, f),
                                 os.path.join(target, f))

    # ---- mutations --------------------------------------------------
    def mutate(self, write_fn) -> str:
        """Publish a new version produced by `write_fn(table_dir)` run
        against a hardlinked copy of the live version — e.g. a
        dynamic-partition-overwrite batch write. The live version is
        never touched, so pinned readers keep a consistent scan."""

        def build(staging: str, src: str) -> None:
            self._link_tree(src, staging)
            write_fn(staging)

        return self._publish(build)

    def compact(
        self,
        spark: SparkSession,
        target_file_bytes: int = 128 * 1024 * 1024,
        partition_cols: tuple[str, ...] = (),
        sort_cols: tuple[str, ...] = (),
    ) -> CompactionStats:
        """Compact the live version into the next one and publish it.
        The shared _compact_into step does the layout + write +
        content-verification gate exactly like compact_parquet."""
        src = self.snapshot()
        stats: dict = {}

        def build(staging: str, _src: str) -> None:
            out = os.path.join(staging, "data")
            rows, bytes_total, n_files = _compact_into(
                spark, src, out, target_file_bytes,
                partition_cols, sort_cols,
                unchanged_msg=f"{self.current} unchanged",
            )
            stats.update(rows=rows, bytes_total=bytes_total,
                         n_files=n_files)
            # hoist the verified write up to the version root
            for name in os.listdir(out):
                os.replace(os.path.join(out, name),
                           os.path.join(staging, name))
            os.rmdir(out)

        self._publish(build)
        return CompactionStats(
            files_before=stats["n_files"],
            files_after=len(_parquet_files(self.snapshot())),
            bytes_total=stats["bytes_total"],
            rows=stats["rows"],
        )
