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


# ---------------------------------------------------------------------------
# m_thumbnail — real downsampling math over the blob column
# ---------------------------------------------------------------------------

_THUMB_W = 16  # interpret each blob as 16-px-wide grayscale rows
_POLY_MOD = 1_000_000_007

THUMB_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("out_w", T.IntegerType(), False),
        T.StructField("out_h", T.IntegerType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("phash", T.LongType(), False),
        T.StructField("thumb", T.BinaryType(), False),
    ]
)


def pool_thumbnails(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: 2×2 average-pool each blob viewed as a
    ``_THUMB_W``-wide uint8 grid — REAL downsampling arithmetic (the
    step a production pipeline runs after its codec decode; only the
    codec is stubbed in this container). Integer floor means keep every
    emitted byte exact, so the whole thumbnail is content-hashable
    cross-engine via the portable polynomial hash."""
    import numpy as np

    for pdf in batches:
        out = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            data = bytes(blob)
            h2 = (len(data) // _THUMB_W) // 2
            if h2 < 1:
                continue
            arr = (
                np.frombuffer(data[: _THUMB_W * 2 * h2], np.uint8)
                .reshape(2 * h2, _THUMB_W)
                .astype(np.int64)
            )
            pooled = (
                arr[0::2, 0::2] + arr[0::2, 1::2] + arr[1::2, 0::2] + arr[1::2, 1::2]
            ) // 4
            flat = pooled.flatten()
            acc = 0
            for v in flat.tolist():
                acc = (acc * 31 + v) % _POLY_MOD
            out.append(
                {
                    "doc_id": int(doc_id),
                    "out_w": _THUMB_W // 2,
                    "out_h": h2,
                    "n_px": int(flat.size),
                    "px_sum": int(flat.sum()),
                    "phash": acc,
                    "thumb": flat.astype(np.uint8).tobytes(),
                }
            )
        yield pd.DataFrame(out, columns=[f.name for f in THUMB_SCHEMA.fields])


def thumbnail_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnails incl. the binary payload (pytest byte-compares this
    against the pure-numpy mirror; the certified query drops it)."""
    media = make_media_table(spark, sf_dir)
    return media.filter(F.col("meta.size_bytes") >= 2 * _THUMB_W).mapInPandas(
        pool_thumbnails, THUMB_SCHEMA
    )


# The pooled grid is reproducible in DuckDB from the ASCII text (char
# codes == blob bytes — pinned by the corpus-is-ascii guard test):
# nested list comprehension builds the same floor-mean grid, and the
# portable polynomial hash certifies the thumbnail CONTENT, not just
# its stats. All-integer arithmetic — no rounding rule needed.
_THUMB_ORACLE = f"""
    WITH b AS (
      SELECT doc_id, [ascii(text[i]) FOR i IN range(1, len(text) + 1)] AS codes
      FROM documents WHERE len(text) >= {2 * _THUMB_W}
    ),
    d AS (
      SELECT doc_id, codes, CAST(len(codes) // {_THUMB_W} AS INT) AS h FROM b
    ),
    p AS (
      SELECT doc_id,
             CAST({_THUMB_W // 2} AS INT) AS out_w,
             CAST(h // 2 AS INT) AS out_h,
             flatten([[
               (codes[(2*r-2)*{_THUMB_W} + (2*cc-1)]
                + codes[(2*r-2)*{_THUMB_W} + 2*cc]
                + codes[(2*r-1)*{_THUMB_W} + (2*cc-1)]
                + codes[(2*r-1)*{_THUMB_W} + 2*cc]) // 4
               FOR cc IN range(1, {_THUMB_W // 2} + 1)]
               FOR r IN range(1, h//2 + 1)]) AS pool
      FROM d WHERE h >= 2
    )
    SELECT doc_id, out_w, out_h,
           CAST(len(pool) AS BIGINT) AS n_px,
           CAST(list_sum(pool) AS BIGINT) AS px_sum,
           list_reduce(list_prepend(CAST(0 AS BIGINT), pool),
                       (acc, x) -> (acc * 31 + x) % {_POLY_MOD}) AS phash
    FROM p
    ORDER BY doc_id
"""


@query(
    "m_thumbnail",
    oracle=_THUMB_ORACLE,
    covers="north-star multimodal: 2x2 average-pool thumbnail over the blob "
    "column (Arrow-batched mapInPandas; thumbnail content certified via "
    "portable polynomial hash)",
)
def m_thumbnail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-blob thumbnail manifest: output dims, pixel count/sum, and a
    content hash of the pooled bytes (the DuckDB oracle recomputes the
    identical floor-mean grid, so the hash certifies every output
    pixel). Map-only over Arrow batches — no shuffle at any scale; the
    binary payload itself rides on :func:`thumbnail_full` and is
    byte-compared against a numpy mirror in pytest."""
    return (
        thumbnail_full(spark, sf_dir)
        .select("doc_id", "out_w", "out_h", "n_px", "px_sum", "phash")
        .orderBy("doc_id")
    )
