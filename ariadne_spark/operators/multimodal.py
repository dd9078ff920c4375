"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing — schemas, batch shapes, UDF signatures,
partition sizing — is real and tested. The codec layer (actual
image/audio decoding) is stubbed: the decode libraries aren't in this
container, so ``decode_media`` routes to either a clearly-marked
``NotImplementedError`` or the deterministic fake codec used by
tests/oracles (``codec='fake'``), which "decodes" by parsing a tiny
fake header out of the bytes. Swapping in PIL/ffmpeg later is a
drop-in replacement of ``_decode_fake`` — no plan changes.

Scale notes: media bytes never pass through Python row-at-a-time —
``mapInPandas`` streams Arrow record batches; metadata-only
transformations (routing, filtering, size accounting) stay pure-JVM
on the metadata struct without touching the blob column (parquet
column pruning keeps blobs unread on disk).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|jpg|wav|mp4|fake
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("byte_len", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def pack_fake_media(
    df: DataFrame, payload_col: str, media_type: str = "image"
) -> DataFrame:
    """Deterministically wrap a string/binary payload into a fake
    media blob: 16-byte header (magic, width, height) + payload.
    Gives tests/oracles real binary columns without codec libs."""
    payload = F.encode(F.col(payload_col).cast("string"), "utf-8")
    w = (F.crc32(payload) % 1920).cast("int")
    h = (F.crc32(F.reverse(F.col(payload_col).cast("string"))) % 1080).cast("int")
    header = F.concat(
        F.encode(F.lit("FAKE"), "utf-8"),
        F.lpad(w.cast("string"), 6, "0").cast("binary"),
        F.lpad(h.cast("string"), 6, "0").cast("binary"),
    )
    blob = F.concat(header, payload)
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit("fake").alias("format"),
        w.alias("width"),
        h.alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(blob).cast("long").alias("byte_len"),
    )
    return df.withColumn("media", blob).withColumn("media_meta", meta)


def _decode_fake(blob: bytes) -> dict:
    if blob is None or len(blob) < 16 or blob[:4] != b"FAKE":
        return {"content_hash": None, "mean_byte": None, "feature": None}
    payload = blob[16:]
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    mean = float(arr.mean()) if len(arr) else 0.0
    # 8-dim "feature": byte-histogram over 8 bins, L1-normalized
    hist = np.histogram(arr, bins=8, range=(0, 256))[0].astype("float64")
    total = hist.sum() or 1.0
    return {
        "content_hash": hashlib.md5(payload).hexdigest(),
        "mean_byte": round(mean, 6),
        "feature": [float(x) for x in (hist / total).round(6)],
    }


def decode_media(
    df: DataFrame,
    blob_col: str = "media",
    codec: str = "fake",
    batch_cols: list[str] | None = None,
) -> DataFrame:
    """Feature-extract media blobs with ``mapInPandas`` (Arrow
    batches). ``codec='fake'`` uses the deterministic test codec;
    real codecs raise until their libraries are provisioned."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: real image/audio decoding needs PIL/ffmpeg, "
            "not available in this environment — use codec='fake'"
        )
    from .. import context

    context.ship_package(df.sparkSession)
    keep = batch_cols or [c for c in df.columns if c != blob_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep] + list(FEATURE_SCHEMA.fields)
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = pdf[blob_col].map(_decode_fake)
            res = pdf[keep].copy()
            res["content_hash"] = [f["content_hash"] for f in feats]
            res["mean_byte"] = [f["mean_byte"] for f in feats]
            res["feature"] = [f["feature"] for f in feats]
            yield res

    return df.mapInPandas(run, out_schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: image resize — plumbing only. Updates metadata (the part
    a planner needs) and marks the blob untouched; the pixel work
    needs PIL and is NotImplemented behind codec='real'."""
    meta = F.col("media_meta")
    new_meta = F.struct(
        meta.getField("media_type").alias("media_type"),
        meta.getField("format").alias("format"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        meta.getField("duration_ms").alias("duration_ms"),
        meta.getField("byte_len").alias("byte_len"),
    )
    return df.withColumn("media_meta", new_meta)


def frame_sample_stub(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB: video frame sampling — emits planned frame timestamps
    from metadata (duration_ms) without decoding; one row per frame.
    Rows with NULL duration produce no frames (explode of a NULL
    array), matching what a SQL generate_series oracle yields."""
    dur = F.col("media_meta").getField("duration_ms")
    frames = F.when(
        dur.isNotNull(), F.sequence(F.lit(0), dur, F.lit(every_ms))
    )
    return df.withColumn("frame_ts_ms", F.explode(frames))
