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
(md5-of-normalized-text, doc_id) row per accepted document — the
identical exact-duplicate definition the oracle-pinned dedup_exact
and dedup_incremental_exact use (review r11: a raw-text xxhash64 both
missed whitespace/case-variant duplicates the batch path groups AND,
at 64 bits, silently merges unrelated docs near ~5e9 documents by
birthday collision). foreachBatch gives the batch-
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
keyed on the 32-char md5 — at 10B docs the ledger is ~400 GB of
(hash, id) pairs, a routine shuffle-join side; nothing ever re-reads
accepted document TEXT. Within-batch duplicates resolve by min
doc_id, matching dedup_exact's keep-lowest convention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adcirctime2cogs_spark.functions.text import normalized_text

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
        from pyspark.sql import Window as W

        s = batch.sparkSession
        # explicit schema: a ledger directory that exists but holds no
        # data files yet (crash between the corpus and ledger appends,
        # or a dir created by a dead run) must read as EMPTY — schema
        # inference would raise on every checkpoint replay and wedge
        # the stream permanently (review r10)
        if os.path.exists(ledger):
            seen = s.read.schema("h string, doc_id long").parquet(ledger)
        else:
            seen = s.createDataFrame([], "h string, doc_id long")
        # within-batch keep-lowest via row_number, NOT a min-doc_id
        # join: two physical copies of the SAME (h, doc_id) — a drop
        # file re-uploaded under a new name into one batch — both
        # matched the old doc_id == min(doc_id) test and both appended
        # (review r10); rank keeps exactly one row per content hash.
        wh = W.partitionBy("h").orderBy("doc_id")
        joined = (
            batch.select(
                "*", F.md5(normalized_text(F.col("text"))).alias("h")
            )
            .withColumn("rn", F.row_number().over(wh))
            .withColumn("batch_first", F.first("doc_id").over(wh))
            .join(
                seen.select("h", F.col("doc_id").alias("dup_of")),
                "h", "left",
            )
            # ONE ledger join per batch — the dominant per-trigger
            # cost at corpus scale; corpus, ledger, and reject writes
            # all reuse this materialization (review r10: it was
            # recomputed once per sink)
            .persist()
        )
        try:
            accepted = joined.filter(
                F.col("dup_of").isNull() & (F.col("rn") == 1)
            )
            rejected = joined.filter(
                F.col("dup_of").isNotNull() | (F.col("rn") != 1)
            ).select(
                "doc_id",
                F.coalesce("dup_of", "batch_first").alias("dup_of"),
            )
            cols = [c for c in batch.columns]
            # the LEDGER append must come LAST: `joined` is a cached
            # plan over the ledger path, and Spark's post-write
            # refreshByPath re-caches such plans against the NEW file
            # listing — a write ordered after the ledger append would
            # re-evaluate against a ledger containing this batch's own
            # hashes and self-reject every accepted doc (review r10,
            # caught by test_ingest_with_cross_batch_dedup)
            accepted.select(*cols).write.mode("append").parquet(corpus)
            rejected.write.mode("append").parquet(rejects)
            accepted.select("h", "doc_id").write.mode("append").parquet(
                ledger
            )
        finally:
            joined.unpersist()

    stream = (
        spark.readStream.schema(DOCS_SCHEMA).parquet(drop_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        stream = stream.trigger(availableNow=True)
    return stream.start()
