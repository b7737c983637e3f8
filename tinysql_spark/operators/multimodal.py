"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode step is a
clearly-marked stub (deterministic fake features) behind
``mapInPandas`` — the Spark-side plumbing (schema, batching, Arrow
transfer, partitioning) is real and tested. On a real cluster the
stub body is replaced by the actual codec call; nothing else changes.

The testdata has no binary table, so payloads are derived
deterministically from `documents.text` (UTF-8 bytes) — the plumbing
is identical for real image/audio bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .registry import register


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach an opaque binary payload column (stand-in for image/audio
    bytes) plus typed metadata, the schema a multimodal table uses."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
    )


@register(
    "m01_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           upper(hex(encode(substr(text, 1, 4)))) AS header_hex,
           md5(text) AS payload_md5
    FROM documents
    """,
    doc="Binary-column metadata extraction (size, magic-bytes header, "
    "content hash) — all JVM-side; the pattern used to partition and "
    "dedup raw media shards before decode.",
)
def m01_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    payload = with_payload(docs)
    return payload.select(
        "doc_id",
        F.octet_length("payload").alias("payload_bytes"),
        F.upper(F.hex(F.substring("payload", 1, 4))).alias("header_hex"),
        F.md5("payload").alias("payload_md5"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """STUB for the real codec (image decode / audio resample).

    Deterministic fake: 4 coarse byte-histogram features, computed
    vectorized (numpy bincount over the raw buffer — never a Python
    per-byte loop, so the stub's cost profile matches what the Arrow
    plumbing around it is demonstrating). Replace with e.g.
    PIL/torchaudio in a real deployment; keep the signature.
    """
    import numpy as np

    if payload is None:
        return []
    if len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    counts = np.bincount(np.frombuffer(payload, dtype=np.uint8) >> 6, minlength=4)
    return (counts / len(payload)).tolist()


def decode_features(payloads: DataFrame) -> DataFrame:
    """mapInPandas decode: Arrow-batched, per-partition, no shuffle.

    Each batch arrives as a pandas DataFrame; the UDF emits the typed
    feature schema. This is the (b)-tier custom-operator pattern from
    the build rules: built-ins can't decode media, so the Python hop
    is vectorized over Arrow batches.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(lambda b: 0 if b is None else len(b)),
                    "feature": pdf["payload"].map(_fake_decode),
                }
            )

    return payloads.mapInPandas(run, schema=_DECODE_SCHEMA)


_FRAME_HEX = 64  # 32 payload bytes per frame, as hex chars
_FRAME_EVERY = 4


@register(
    "m03_frame_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents
    ), f AS (
      SELECT doc_id, hx,
             unnest(range(0, CAST(floor(length(hx) / {_FRAME_HEX}) AS BIGINT))) AS frame_idx
      FROM h
    )
    SELECT doc_id, frame_idx,
           md5(substr(hx, CAST(frame_idx * {_FRAME_HEX} + 1 AS BIGINT), {_FRAME_HEX})) AS frame_md5
    FROM f
    WHERE frame_idx % {_FRAME_EVERY} = 0
    """,
    doc="Frame sampling over a binary stream: window the payload into "
    "fixed-size frames (here 32-byte windows over the hex encoding), "
    "keep every 4th, fingerprint each — explode + substring, all "
    "JVM-side, no shuffle; the video-decode analog keeps this exact "
    "plan shape with the codec swapped in at the substring step.",
)
def m03_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hx = F.upper(F.hex(F.encode("text", "UTF-8")))
    framed = (
        docs.select("doc_id", hx.alias("hx"))
        .filter(F.length("hx") >= _FRAME_HEX)
        .select(
            "doc_id",
            "hx",
            F.explode(
                F.sequence(F.lit(0), (F.floor(F.length("hx") / _FRAME_HEX) - 1).cast("long"))
            ).alias("frame_idx"),
        )
        .filter(F.col("frame_idx") % _FRAME_EVERY == 0)
    )
    return framed.select(
        "doc_id",
        "frame_idx",
        F.md5(
            F.encode(
                F.substring(F.col("hx"), F.col("frame_idx") * _FRAME_HEX + 1, _FRAME_HEX),
                "UTF-8",
            )
        ).alias("frame_md5"),
    )


@register(
    "m02_multimodal_decode",
    oracle=None,  # python decode stub — rows-only check
    doc="mapInPandas decode pipeline over binary payloads (stubbed "
    "codec, real Arrow/batch/schema plumbing) + downstream agg.",
)
def m02_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    feats = decode_features(with_payload(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        F.round(F.element_at("feature", 1), 4).alias("f0"),
        F.size("feature").alias("feature_dim"),
    )


_CHUNK_BYTES = 100


@register(
    "m04_payload_chunks",
    late=True,
    oracle=f"""
    WITH h AS (
      SELECT doc_id, upper(hex(encode(text))) AS hx FROM documents
    ), c AS (
      SELECT doc_id, hx,
             unnest(generate_series(1, greatest((length(hx) + {2 * _CHUNK_BYTES} - 1)
                                                // {2 * _CHUNK_BYTES}, 1))) AS chunk_idx
      FROM h
    )
    SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(length(substring(hx, (chunk_idx - 1) * {2 * _CHUNK_BYTES} + 1,
                                 {2 * _CHUNK_BYTES})) // 2 AS BIGINT) AS chunk_bytes,
           md5(substring(hx, (chunk_idx - 1) * {2 * _CHUNK_BYTES} + 1,
                         {2 * _CHUNK_BYTES})) AS chunk_md5
    FROM c
    """,
    doc=f"Binary payload chunking into {_CHUNK_BYTES}-byte parts with "
    "per-chunk checksums — the multi-part upload / content-addressed "
    "manifest step a multimodal ingest pipeline runs before shipping "
    "media to object storage (and the unit for chunk-level dedup of "
    "large media). Chunking is an explode over index ranges + "
    "substring: map-only, zero shuffles, row count multiplies by "
    "size/chunk — linear at any corpus size. Chunks are addressed over "
    "the hex encoding so the checksum is engine-portable (md5 of the "
    "same text both sides).",
)
def m04_payload_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hx = F.upper(F.hex(F.encode("text", "UTF-8")))
    step = 2 * _CHUNK_BYTES
    h = docs.select("doc_id", hx.alias("hx"))
    n_chunks = F.greatest(
        F.ceil(F.length("hx") / F.lit(step)).cast("long"), F.lit(1)
    )
    c = h.select(
        "doc_id",
        "hx",
        F.explode(F.sequence(F.lit(1), n_chunks)).alias("chunk_idx"),
    )
    part = F.expr(f"substring(hx, (chunk_idx - 1) * {step} + 1, {step})")
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        (F.length(part) / 2).cast("long").alias("chunk_bytes"),
        F.md5(part).alias("chunk_md5"),
    )
