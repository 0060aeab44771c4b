"""Streaming corpus ingestion with a cross-batch exact-dedup gate —
the front door of a continuously growing training corpus: document
drops (parquet files landing in a directory) stream in, each
micro-batch is filtered against EVERY previously accepted document's
content hash (not just this batch's), survivors append to the corpus
and their hashes to the ledger, duplicates land in a reject log with
the id they duplicated.

Why foreachBatch and not dropDuplicates: streaming dropDuplicates
bounds its state by the watermark — content duplicates in a corpus
arrive arbitrarily late (a re-crawl weeks later), so the dedup state
must be DURABLE and unbounded-in-time but tiny-per-doc: one
(xxhash64, doc_id) row per accepted document, the same ledger shape
dedup.dedup_incremental_exact reads. foreachBatch gives the batch-
exact semantics (each micro-batch joins the ledger as a static table,
then appends to it), and Spark's checkpoint gives effectively-once
processing of each drop. The standard multi-sink foreachBatch caveat
applies: a crash BETWEEN the corpus append and the ledger append
replays the batch with a partial ledger, so a production deployment
either writes the three tables transactionally (one table-format
commit) or makes the appends idempotent on (batch_id, doc_id); the
ledger-join semantics themselves need no change.

Scale shape (100 TB corpus front door): the per-batch work is one
hash projection over the batch plus one join against the hash ledger
keyed on the 8-byte hash — at 10B docs the ledger is ~160 GB of
(hash, id) pairs, a routine shuffle-join side; nothing ever re-reads
accepted document TEXT. Within-batch duplicates resolve by min
doc_id, matching dedup_exact's keep-lowest convention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")


def start_ingest_with_dedup(spark: SparkSession, drop_dir: str,
                            out_dir: str, checkpoint_dir: str,
                            trigger_once: bool = True):
    """Start the ingestion stream: parquet drops under `drop_dir` ->
    accepted docs at out_dir/corpus.parquet, the hash ledger at
    out_dir/hashes.parquet, rejects at out_dir/rejects.parquet.
    Returns the StreamingQuery (trigger availableNow by default so
    tests and batch-style backfills drain and stop)."""
    os.makedirs(out_dir, exist_ok=True)
    corpus = os.path.join(out_dir, "corpus.parquet")
    ledger = os.path.join(out_dir, "hashes.parquet")
    rejects = os.path.join(out_dir, "rejects.parquet")

    def process(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        hashed = batch.select(
            "*", F.xxhash64("text").alias("h")
        ).persist()
        try:
            if os.path.exists(ledger):
                seen = s.read.parquet(ledger)
            else:
                seen = s.createDataFrame([], "h long, doc_id long")
            # within-batch keep-lowest, then the cross-batch ledger
            w_first = hashed.groupBy("h").agg(
                F.min("doc_id").alias("batch_first")
            )
            joined = (
                hashed.join(w_first, "h")
                .join(
                    seen.select("h", F.col("doc_id").alias("dup_of")),
                    "h", "left",
                )
            )
            accepted = joined.filter(
                F.col("dup_of").isNull()
                & (F.col("doc_id") == F.col("batch_first"))
            )
            rejected = joined.filter(
                F.col("dup_of").isNotNull()
                | (F.col("doc_id") != F.col("batch_first"))
            ).select(
                "doc_id",
                F.coalesce("dup_of", "batch_first").alias("dup_of"),
            )
            cols = [c for c in batch.columns]
            accepted.select(*cols).write.mode("append").parquet(corpus)
            accepted.select("h", "doc_id").write.mode("append").parquet(
                ledger
            )
            rejected.write.mode("append").parquet(rejects)
        finally:
            hashed.unpersist()

    stream = (
        spark.readStream.schema(DOCS_SCHEMA).parquet(drop_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()
