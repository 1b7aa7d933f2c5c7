"""Multimodal (binary) column plumbing.

Images/audio/video are carried as opaque ``binary`` columns plus a
typed metadata struct. The Spark-side plumbing — schema, partitioning,
Arrow-batched UDF signatures, batch shapes — is real and tested; the
actual media decode is STUBBED (the codec libraries are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless the
deterministic fake decoder is requested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from spark_sql_server_spark.operators.registry import query
from spark_sql_server_spark.session import load_table

#: Metadata carried alongside every media blob.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),  # image/audio/video
        T.StructField("format", T.StringType(), True),  # png/wav/mp4/...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("size_bytes", T.LongType(), False),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("size_bytes", T.LongType(), False),
        T.StructField("byte_mean", T.DoubleType(), False),
        T.StructField("byte_min", T.IntegerType(), False),
        T.StructField("byte_max", T.IntegerType(), False),
        T.StructField("head_hex", T.StringType(), False),
    ]
)


def make_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table: documents' text bytes standing in for
    encoded media blobs, with a populated metadata struct.

    This is the canonical layout for multimodal data at scale: one
    parquet column of raw bytes (dictionary-encoding disabled by size),
    fixed-width metadata columns for pruning, and partition-friendly
    ids. Filters on metadata prune row groups without touching blobs.
    """
    docs = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake-rgb8").alias("format"),
        F.lit(64).cast("int").alias("width"),
        F.lit(64).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(blob).cast("long").alias("size_bytes"),
    )
    return docs.select("doc_id", blob.alias("media"), meta.alias("meta"))


def decode_image(blob: bytes, fmt: str, *, fake: bool = False) -> list[int]:
    """Decode an encoded image to pixels.

    STUB: real codecs (Pillow/ffmpeg) are not available in this
    container. With ``fake=True`` returns a deterministic fake "decode"
    (the raw bytes) so the pipeline shape can be tested end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs not bundled; pass fake=True for the deterministic stub"
        )
    return list(blob)


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-blob byte statistics (the deterministic
    stand-in for a real feature extractor). Arrow-batched — each pandas
    DataFrame is one batch, never one row."""
    for pdf in batches:
        feats = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            data = decode_image(bytes(blob), "fake-rgb8", fake=True)
            n = len(data)
            feats.append(
                {
                    "doc_id": int(doc_id),
                    "size_bytes": n,
                    "byte_mean": float(sum(data)) / n if n else 0.0,
                    "byte_min": min(data) if n else 0,
                    "byte_max": max(data) if n else 0,
                    "head_hex": bytes(blob)[:4].hex(),
                }
            )
        yield pd.DataFrame(feats, columns=[f.name for f in FEATURE_SCHEMA.fields])


# The media blobs are the documents' UTF-8 bytes and the corpus is pure
# ASCII (asserted in tests), so DuckDB can reproduce every byte stat
# from the text: per-char codes == bytes. byte_mean is a SINGLE IEEE
# division of two exact integers (sum ≤ n·255 ≪ 2^53) — identical in
# Python and DuckDB with no rounding step, so it is hash-safe without
# the micro-space treatment.
_MM_ORACLE = """
    WITH b AS (
      SELECT doc_id, text,
             [ascii(text[i]) FOR i IN range(1, len(text) + 1)] AS codes
      FROM documents
    )
    SELECT doc_id,
           CAST(len(codes) AS BIGINT) AS size_bytes,
           CAST(list_sum(codes) AS DOUBLE) / len(codes) AS byte_mean,
           CAST(list_min(codes) AS INT) AS byte_min,
           CAST(list_max(codes) AS INT) AS byte_max,
           lower(hex(encode(substring(text, 1, 4)))) AS head_hex
    FROM b
    ORDER BY doc_id
"""


@query(
    "m_media_features",
    oracle=_MM_ORACLE,
    covers="north-star multimodal: binary column + mapInPandas feature extraction",
)
def m_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched
    mapInPandas.

    Scale: mapInPandas streams Arrow batches through one Python worker
    per core with no shuffle; blob columns never pass through the
    driver. The decode itself is the stub — the plumbing (schema,
    batching, binary transport) is the real deliverable. The byte-stat
    projection is DuckDB-oracle-certified (the fake decoder is the raw
    bytes, and the ASCII corpus makes char codes == bytes).
    """
    media = make_media_table(spark, sf_dir)
    return media.mapInPandas(extract_features, schema=FEATURE_SCHEMA).orderBy("doc_id")


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), False),
        T.StructField("frame_bytes", T.LongType(), False),
        T.StructField("frame_head_hex", T.StringType(), False),
    ]
)

_FRAME_SIZE = 64
_FRAME_STRIDE = 4  # keep every 4th frame


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: treat each blob as a sequence of fixed-size
    frames and keep every _FRAME_STRIDE-th one — the video frame-
    sampling plumbing with a deterministic fake decoder (real codecs
    are stubbed, see decode_image)."""
    for pdf in batches:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            data = bytes(blob)
            n_frames = max(len(data) // _FRAME_SIZE, 1)
            for idx in range(0, n_frames, _FRAME_STRIDE):
                frame = data[idx * _FRAME_SIZE : (idx + 1) * _FRAME_SIZE]
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "frame_idx": idx,
                        "frame": frame,
                        "frame_bytes": len(frame),
                        "frame_head_hex": frame[:4].hex(),
                    }
                )
        yield pd.DataFrame(rows, columns=[f.name for f in _FRAME_SCHEMA.fields])


def frame_sample_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full frame-sampling output INCLUDING the binary ``frame``
    payload — the column downstream decode stages consume. Pytest
    byte-compares it against Python slicing; the registered operator
    certifies the byte-stat projection (binary payloads don't hash
    comparably across engines)."""
    media = make_media_table(spark, sf_dir)
    return media.mapInPandas(sample_frames, schema=_FRAME_SCHEMA).orderBy(
        "doc_id", "frame_idx"
    )


_FRAME_ORACLE = f"""
    WITH f AS (
      SELECT doc_id, text,
             unnest(range(0, greatest(len(text) // {_FRAME_SIZE}, 1),
                          {_FRAME_STRIDE})) AS frame_idx
      FROM documents
    )
    SELECT doc_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(length(substring(text, CAST(frame_idx * {_FRAME_SIZE} + 1 AS INT),
                                 {_FRAME_SIZE})) AS BIGINT) AS frame_bytes,
           lower(hex(encode(substring(text, CAST(frame_idx * {_FRAME_SIZE} + 1 AS INT),
                                      4)))) AS frame_head_hex
    FROM f
    ORDER BY doc_id, frame_idx
"""


@query(
    "m_frame_sample",
    oracle=_FRAME_ORACLE,
    covers="north-star multimodal: strided frame sampling over binary media",
)
def m_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided frame sampling: blobs fan out to frames inside the Arrow
    batch (no shuffle, no driver transit); at scale the sampled frames
    feed straight into a feature-extraction stage on the same worker.

    The certified output is the byte-stat projection (idx, length, head
    hex — all reproducible from the ASCII text by the DuckDB oracle);
    the binary frames themselves come from :func:`frame_sample_full`
    and are byte-compared in pytest."""
    return frame_sample_full(spark, sf_dir).select(
        "doc_id", "frame_idx", "frame_bytes", "frame_head_hex"
    )


@query(
    "m_media_meta",
    oracle="""
    SELECT 'image' AS media_type, COUNT(*) AS n_blobs,
           CAST(SUM(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_bytes,
           CAST(MIN(length(text)) AS BIGINT) AS min_bytes,
           CAST(MAX(length(text)) AS BIGINT) AS max_bytes
    FROM documents
    """,
    covers="north-star multimodal: metadata-only scan (blob column pruned)",
)
def m_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over the metadata struct only — the parquet reader
    prunes the blob column entirely (check ReadSchema in the plan),
    which is the point of the blob+metadata layout at 100 TB."""
    media = make_media_table(spark, sf_dir)
    return media.groupBy(F.col("meta.media_type").alias("media_type")).agg(
        F.count("*").alias("n_blobs"),
        F.sum("meta.size_bytes").alias("total_bytes"),
        F.min("meta.size_bytes").alias("min_bytes"),
        F.max("meta.size_bytes").alias("max_bytes"),
    )
