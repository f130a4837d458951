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

import struct
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


# ---------------------------------------------------------------------------
# REAL container-header parsing (no codec needed): WAV / PNG / JPEG headers
# are plain struct-packed bytes, so "what is this payload" metadata — the
# first pass every multimodal ingest pipeline runs — works today with the
# stdlib, while pixel/sample DECODE stays behind the decode_media gate.

#: output schema of media_headers
HEADER_FIELDS = StructType(
    [
        StructField("container", StringType()),  # wav | png | jpeg | NULL
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def parse_media_header(payload: bytes | None) -> tuple:
    """Parse a WAV/PNG/JPEG container header from raw bytes — pure
    stdlib struct reads, no media library. Returns the HEADER_FIELDS
    tuple; an unrecognized / truncated / corrupt payload yields
    (None, ..., n_bytes) rather than raising: at corpus scale damaged
    payloads are data, not errors (route on ``container IS NULL``).
    Header fields that overflow int32 (fuzzed/corrupt u32 values with a
    valid magic) are ALSO damage — returned as the NULL row, never an
    Arrow range error."""

    def i32(v):
        return v if v is not None and 0 <= v < 2**31 else None

    n = len(payload) if payload is not None else None
    none_row = (None, None, None, None, None, None, n)
    if not payload or n < 12:
        return none_row
    try:
        # --- WAV: RIFF <size> WAVE, then fmt / data chunks
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            pos, channels, rate, byte_rate, data_size = 12, None, None, None, None
            while pos + 8 <= n:
                cid, csize = payload[pos : pos + 4], struct.unpack(
                    "<I", payload[pos + 4 : pos + 8]
                )[0]
                body = payload[pos + 8 : pos + 8 + csize]
                if cid == b"fmt " and len(body) >= 16:
                    _, channels, rate, byte_rate = struct.unpack(
                        "<HHII", body[:12]
                    )
                elif cid == b"data":
                    data_size = csize
                pos += 8 + csize + (csize & 1)  # chunks are word-aligned
            if i32(rate):
                dur = (
                    int(data_size * 1000 // byte_rate)
                    if data_size is not None and byte_rate
                    else None
                )
                return ("wav", None, None, i32(channels), i32(rate), dur, n)
            return none_row
        # --- PNG: signature + IHDR is always the first chunk
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            if n >= 24 and payload[12:16] == b"IHDR":
                w, h = struct.unpack(">II", payload[16:24])
                if i32(w) is None or i32(h) is None:
                    return none_row  # u32 overflow = corrupt, not data
                return ("png", w, h, None, None, None, n)
            return none_row
        # --- JPEG: scan markers to the first SOF (C0–CF minus C4/C8/CC)
        if payload[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= n:
                if payload[pos] != 0xFF:
                    break
                # ISO 10918-1 B.1.1.2: any number of 0xFF fill bytes may
                # pad before a marker — skip them, don't parse them
                while pos + 1 < n and payload[pos + 1] == 0xFF:
                    pos += 1
                if pos + 4 > n:
                    break
                marker = payload[pos + 1]
                if marker == 0xD9:  # EOI before any SOF: no dimensions
                    break
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seg = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
                if (
                    0xC0 <= marker <= 0xCF
                    and marker not in (0xC4, 0xC8, 0xCC)
                    and pos + 9 <= n
                ):
                    h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
                    return ("jpeg", w, h, None, None, None, n)
                pos += 2 + seg
            return none_row
    except (struct.error, IndexError):
        return none_row
    return none_row


def media_headers(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Container metadata for every payload: (doc_id, container, width,
    height, channels, sample_rate, duration_ms, n_bytes) via one
    Arrow-batched ``mapInPandas`` pass — payloads never leave executor
    batches, exactly like image_features. Damaged payloads surface as
    ``container IS NULL`` rows (quarantine-routable), never task
    failures."""
    out_schema = StructType(
        [StructField("doc_id", LongType())] + list(HEADER_FIELDS.fields)
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_media_header(p) for p in pdf[payload_col]]
            cols = list(zip(*parsed)) if parsed else [[]] * 7
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "container": cols[0],
                    "width": cols[1],
                    "height": cols[2],
                    "channels": cols[3],
                    "sample_rate": cols[4],
                    "duration_ms": cols[5],
                    "n_bytes": cols[6],
                }
            )

    return df.select("doc_id", payload_col).mapInPandas(_parse, out_schema)
