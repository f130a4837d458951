"""Multimodal column operators (north-star scope, BASELINE.json): treat
image/audio/video payloads as opaque ``binary`` columns with typed metadata,
and run decode / feature-extraction / frame-sampling as Arrow-batched Pandas
UDFs (``mapInPandas``) — the Spark-side plumbing (schema, partitioning, UDF
signature, batch shape) is real and tested; the actual media decode is
STUBBED (no image/audio libraries in this container) behind
``decode_media``, which raises ``NotImplementedError`` unless the
deterministic fake codec is requested.

Scale notes: payloads stay in executor-side Arrow batches end-to-end — no
driver collect anywhere; ``mapInPandas`` streams record batches, so one
task never holds more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
payloads in memory. Repartition upstream by a key that spreads payload
sizes (here doc_id) to avoid size skew.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FRAME_BYTES = 32  # fake "video" frame stride

#: metadata struct carried next to every payload column
MEDIA_META_FIELDS = [
    StructField("format", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", IntegerType()),
]


def decode_media(payload: bytes, fmt: str) -> bytes:
    """Decode a media payload to raw bytes.

    STUB: real codecs (PIL/libav/soundfile) are not available in this
    container. The deterministic ``fake-rgb8`` codec passes bytes through;
    any real format raises until a codec library is added.
    """
    if fmt == "fake-rgb8":
        return payload
    raise NotImplementedError(
        f"No codec for format {fmt!r}: media decode requires an image/audio "
        "library (e.g. pillow/av) not present in this environment. "
        "Register one here; the surrounding Spark plumbing is complete."
    )


def attach_media(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary payload + metadata struct per document —
    a deterministic stand-in for real image bytes (md5-seeded, so stable
    across runs/engines). Downstream operators depend only on the
    (payload: binary, media: struct) contract, not on how the bytes were
    made.

    NULL-text documents are dropped up front: a NULL payload would crash
    the Arrow kernel's ``np.frombuffer`` while the relational oracle
    silently drops the row (every aggregate joins on non-null bytes) —
    filtering here makes both engines agree by construction."""
    docs = docs.filter(F.col("text").isNotNull())
    payload = F.encode(F.repeat(F.md5("text"), 8), "utf-8").cast(BinaryType())
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.struct(
            F.lit("fake-rgb8").alias("format"),
            F.lit(16).alias("width"),
            F.lit(16).alias("height"),
            F.length(payload).cast("int").alias("n_bytes"),
        ).alias("media"),
    )


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_histogram", ArrayType(LongType())),
    ]
)


def image_features(media_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: byte mean and
    a 16-bin byte histogram per payload. ``mapInPandas`` keeps the batch
    loop in pandas/numpy (vectorized per batch); the decode step goes
    through the stubbed codec layer."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            fmts = [m["format"] for m in pdf["media"]]
            raw = [
                np.frombuffer(decode_media(p, f), dtype=np.uint8)
                for p, f in zip(pdf["payload"], fmts)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": [len(r) for r in raw],
                    "byte_mean": [float(r.mean()) if len(r) else 0.0 for r in raw],
                    "byte_histogram": [
                        np.bincount(r // 16, minlength=16).astype("int64").tolist()
                        for r in raw
                    ],
                }
            )

    return media_df.mapInPandas(_extract, IMAGE_FEATURES_SCHEMA)


def frame_sample(media_df: DataFrame, stride: int = FRAME_BYTES) -> DataFrame:
    """Treat the payload as a frame container and sample fixed-stride
    frames — pure expressions (binary substring), one output row per frame
    with a per-frame content hash. The explode distributes frames across
    partitions for downstream per-frame work."""
    n_frames = F.floor(F.length("payload") / stride).cast("int")
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(F.col("payload"), i * stride + 1, stride),
    )
    return (
        media_df.select(
            "doc_id",
            F.posexplode(frames).alias("frame_idx", "frame_bytes"),
        )
        .withColumn("frame_md5", F.md5("frame_bytes"))
        .select("doc_id", "frame_idx", "frame_md5")
    )


def mm_image_features(spark, sf_dir: str) -> DataFrame:
    """queries() entry: documents → fake payloads → Arrow-batched feature
    extraction. The array-typed ``byte_histogram`` is serialized to a CSV
    string here (and only here): the driver's pandas canonicalizer cannot
    sort numpy arrays (round-4/5 `TypeError: unhashable type` with zero
    verification), and a deterministic string also makes the whole result
    oracle-checkable. ``image_features()`` keeps the array-typed schema as
    the library API."""
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    feats = image_features(attach_media(docs))
    return feats.select(
        "doc_id",
        "n_bytes",
        "byte_mean",
        F.concat_ws(",", F.col("byte_histogram").cast("array<string>")).alias(
            "byte_histogram_csv"
        ),
    )


def mm_frame_sample(spark, sf_dir: str) -> DataFrame:
    """queries() entry (rows-only): per-frame sampling + hashing."""
    from ..sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    return frame_sample(attach_media(docs))


QUERIES = {
    "mm_image_features": mm_image_features,
    "mm_frame_sample": mm_frame_sample,
}
#: Both entries are oracle-checked: the fake payload is ASCII (md5 hex × 8),
#: so binary substring + md5 (frame sampling) and per-byte mean/histogram
#: (feature extraction) are byte-identical between Spark and DuckDB. The
#: mm_image_features oracle recomputes the Arrow kernel's numpy
#: bincount/mean relationally — n_bytes and the byte sum are exact integers
#: in float64, and /256 (a power of two) is exact, so byte_mean matches
#: bit-for-bit with no rounding contract needed.
ORACLE: dict[str, str] = {
    "mm_image_features": """
        WITH p AS (
            SELECT doc_id, repeat(md5(text), 8) AS payload FROM documents
        ),
        bytes AS (
            SELECT p.doc_id,
                   ascii(substring(p.payload, CAST(t.i + 1 AS INTEGER), 1)) AS b
            FROM p, unnest(range(len(p.payload))) AS t(i)
        ),
        stats AS (
            SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_bytes,
                   AVG(CAST(b AS DOUBLE)) AS byte_mean
            FROM bytes GROUP BY doc_id
        ),
        counts AS (
            SELECT doc_id, b // 16 AS bin, COUNT(*) AS c
            FROM bytes GROUP BY doc_id, bin
        ),
        grid AS (
            SELECT p.doc_id, r.bin FROM p, (SELECT unnest(range(16)) AS bin) r
        ),
        hist AS (
            SELECT grid.doc_id,
                   string_agg(CAST(COALESCE(counts.c, 0) AS VARCHAR), ','
                              ORDER BY grid.bin) AS byte_histogram_csv
            FROM grid
            LEFT JOIN counts
              ON grid.doc_id = counts.doc_id AND grid.bin = counts.bin
            GROUP BY grid.doc_id
        )
        SELECT s.doc_id, s.n_bytes, s.byte_mean, h.byte_histogram_csv
        FROM stats s JOIN hist h USING (doc_id)
    """,
    "mm_frame_sample": f"""
        WITH p AS (
            SELECT doc_id, repeat(md5(text), 8) AS payload FROM documents
        ),
        f AS (
            SELECT doc_id,
                   unnest(range(len(payload) // {FRAME_BYTES})) AS frame_idx,
                   payload
            FROM p
        )
        SELECT doc_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               md5(substring(payload, CAST(frame_idx * {FRAME_BYTES} + 1 AS INTEGER), {FRAME_BYTES}))
                 AS frame_md5
        FROM f
    """,
}
