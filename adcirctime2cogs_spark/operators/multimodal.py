"""Multimodal-column operators (north-star scope): image/audio/video as
opaque BinaryType columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes behind the real Spark plumbing (binary columns,
Arrow-batched mapInPandas, explicit result schemas, per-batch
iteration) — swap `_fake_decode` for PIL/ffmpeg and nothing else
changes. documents.text doubles as the binary payload
(encode('utf-8')), exactly how a real pipeline would carry raw bytes
alongside metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from adcirctime2cogs_spark.tables import load_table

QUERIES = {}
ORACLES = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def binary_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the payload as a real BinaryType column."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.col("source").alias("media_source"),
    )


@_register(
    "mm_binary_meta",
    """
    SELECT doc_id,
           octet_length(CAST(text AS BLOB)) AS n_bytes,
           md5(text)                        AS digest,
           ascii(substr(text, 1, 1))        AS first_byte
    FROM documents
    """,
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over a binary column: byte length, content digest,
    first byte — the projection a multimodal catalog scan serves without
    ever decoding payloads."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.encode("text", "utf-8")
    # payload and text come from the SAME row — a join back to
    # documents to recover text would re-scan and shuffle for a
    # projection that is row-local
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.md5(payload).alias("digest"),
        F.ascii(F.substring("text", 1, 1)).alias("first_byte"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder: derives (width,
    height, channels) from the payload bytes. Replace with PIL's
    Image.open in a codec-equipped image; the Spark plumbing is real.
    """
    n = len(payload)
    return (64 + n % 512, 64 + (n * 7) % 512, 3 if n % 2 == 0 else 1)


@_register("mm_image_decode")  # mapInPandas kernel: rows-only check
def mm_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Decode' each binary payload to image metadata via Arrow-batched
    mapInPandas — the per-partition batch shape a real decoder runs in
    (one Python worker per partition, zero driver involvement)."""
    b = binary_docs(spark, sf_dir)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": meta.map(lambda m: m[0]),
                    "height": meta.map(lambda m: m[1]),
                    "channels": meta.map(lambda m: m[2]),
                }
            )

    return b.mapInPandas(
        decode, schema="doc_id long, width int, height int, channels int"
    )


@_register("mm_frame_sample")  # mapInPandas kernel: rows-only check
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Video' frame sampling: split each payload into fixed-size chunks
    and emit every k-th chunk as a frame row (one->many inside
    mapInPandas — the UDTF shape). Real pipelines swap the chunker for
    ffmpeg keyframe extraction; partitioning/batching is identical."""
    b = binary_docs(spark, sf_dir)
    chunk, stride = 64, 2

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [
                    payload[i : i + chunk]
                    for i in range(0, len(payload), chunk)
                ][::stride]
                out_ids.extend([doc_id] * len(frames))
                out_idx.extend(range(len(frames)))
                out_frames.extend(frames)
            yield pd.DataFrame(
                {"doc_id": out_ids, "frame_idx": out_idx, "frame": out_frames}
            )

    return b.mapInPandas(
        sample, schema="doc_id long, frame_idx int, frame binary"
    )


@_register("mm_resize")  # mapInPandas kernel: rows-only check
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'Resize' each image to fit a 224x224 box, aspect preserved:
    decode dims from the payload, compute the integer target box, and
    emit a proportionally downsampled payload (byte striding as the
    stand-in for pixel resampling). Same binary-in/binary-out
    mapInPandas contract a PIL/cv2 resize kernel would use."""
    b = binary_docs(spark, sf_dir)
    box = 224

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ows, ohs, payloads = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _ = _fake_decode(payload)
                scale = min(box / w, box / h, 1.0)
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                stride = max(1, (w * h) // max(1, ow * oh))
                ids.append(doc_id)
                ows.append(ow)
                ohs.append(oh)
                payloads.append(payload[::stride])
            yield pd.DataFrame(
                {"doc_id": ids, "out_w": ows, "out_h": ohs, "resized": payloads}
            )

    return b.mapInPandas(
        resize, schema="doc_id long, out_w int, out_h int, resized binary"
    )


@_register("mm_feature_extract")  # mapInPandas kernel: rows-only check
def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction stub: payload -> fixed 8-dim float vector
    (byte-histogram projection). The schema/batch contract of an
    embedding-model UDF without the model."""
    b = binary_docs(spark, sf_dir)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(
                lambda p: [
                    float(sum(byte for byte in p[i::8]) % 1000) / 1000.0
                    for i in range(8)
                ]
            )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return b.mapInPandas(extract, schema="doc_id long, features array<float>")
