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
        T.StructField("decoded_width", T.IntegerType()),
        T.StructField("decoded_height", T.IntegerType()),
    ]
)

_NO_DECODE = {
    "content_hash": None,
    "mean_byte": None,
    "feature": None,
    "decoded_width": None,
    "decoded_height": None,
}


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


def _pixel_features(pixels, w: int, h: int) -> dict:
    """Shared feature extraction over decoded pixel bytes (uint8)."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8).reshape(-1)
    mean = float(arr.mean()) if len(arr) else 0.0
    # 8-dim "feature": byte-histogram over 8 bins, L1-normalized
    hist = np.histogram(arr, bins=8, range=(0, 256))[0].astype("float64")
    total = hist.sum() or 1.0
    return {
        "content_hash": hashlib.md5(arr.tobytes()).hexdigest(),
        "mean_byte": round(mean, 6),
        "feature": [float(x) for x in (hist / total).round(6)],
        "decoded_width": w,
        "decoded_height": h,
    }


def _decode_fake(blob: bytes) -> dict:
    if blob is None or len(blob) < 16 or blob[:4] != b"FAKE":
        return dict(_NO_DECODE)
    w, h = int(blob[4:10]), int(blob[10:16])
    return _pixel_features(memoryview(blob)[16:], w, h)


def _decode_ppm(blob: bytes) -> dict:
    """REAL codec: binary PPM (P6), pure numpy — no PIL needed.
    Header: ``P6 <ws> width <ws> height <ws> maxval \\n``, then
    width*height*3 raw bytes ('#' comment lines allowed)."""
    if blob is None or not bytes(blob[:2]) == b"P6":
        return dict(_NO_DECODE)
    data = bytes(blob)
    pos, fields = 2, []
    while len(fields) < 3 and pos < len(data):
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            return dict(_NO_DECODE)
        fields.append(data[start:pos])
    if len(fields) < 3:
        return dict(_NO_DECODE)
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return dict(_NO_DECODE)
    pos += 1  # single whitespace after maxval
    n = w * h * 3
    if maxval != 255 or w <= 0 or h <= 0 or len(data) - pos < n:
        return dict(_NO_DECODE)
    return _pixel_features(memoryview(data)[pos : pos + n], w, h)


def _decode_bmp(blob: bytes) -> dict:
    """REAL codec: uncompressed 24-bpp Windows BMP (BITMAPINFOHEADER),
    pure numpy. Rows are bottom-up and padded to 4 bytes; pixels are
    emitted top-down as RGB (BMP stores BGR)."""
    import struct

    import numpy as np

    if blob is None or bytes(blob[:2]) != b"BM" or len(blob) < 54:
        return dict(_NO_DECODE)
    data = bytes(blob)
    pix_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        return dict(_NO_DECODE)
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    if w <= 0 or h <= 0 or len(data) - pix_off < row_bytes * h:
        return dict(_NO_DECODE)
    raw = np.frombuffer(
        data, dtype=np.uint8, count=row_bytes * h, offset=pix_off
    ).reshape(h, row_bytes)
    bgr = raw[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        bgr = bgr[::-1]
    rgb = bgr[:, :, ::-1]
    return _pixel_features(np.ascontiguousarray(rgb), w, h)


_CODECS = {"fake": _decode_fake, "ppm": _decode_ppm, "bmp": _decode_bmp}


def decode_media(
    df: DataFrame,
    blob_col: str = "media",
    codec: str = "fake",
    batch_cols: list[str] | None = None,
) -> DataFrame:
    """Feature-extract media blobs with ``mapInPandas`` (Arrow
    batches). Real pure-numpy codecs: ``'ppm'`` (binary P6) and
    ``'bmp'`` (uncompressed 24-bpp); ``'fake'`` is the deterministic
    test codec. Codecs needing external libraries (jpg/png via PIL,
    audio/video via ffmpeg) raise until provisioned."""
    decode = _CODECS.get(codec)
    if decode is None:
        raise NotImplementedError(
            f"codec {codec!r}: needs PIL/ffmpeg, not available in this "
            f"environment — use one of {sorted(_CODECS)}"
        )
    from .. import context

    context.ship_package(df.sparkSession)
    keep = batch_cols or [c for c in df.columns if c != blob_col]
    out_schema = T.StructType(
        [df.schema[c] for c in keep] + list(FEATURE_SCHEMA.fields)
    )

    def run(batches: Iterator) -> Iterator:
        for pdf in batches:
            feats = pdf[blob_col].map(decode)
            res = pdf[keep].copy()
            for field in FEATURE_SCHEMA.fieldNames():
                res[field] = [f[field] for f in feats]
            yield res

    return df.mapInPandas(run, out_schema)


def pack_synthetic_ppm(df: DataFrame, id_col: str) -> DataFrame:
    """Real binary-PPM (P6) blobs with closed-form pixels: for row id
    ``k``, width = 4 + k%13, height = 3 + k%7, and pixel byte ``i`` is
    ``(k*7 + i) % 256``. Decodable by the real ``'ppm'`` codec AND
    reproducible in plain SQL — which makes the real-codec path
    oracle-checkable without shipping image fixtures."""
    from .. import context

    context.ship_package(df.sparkSession)

    def pack(ids) -> "pd.Series":
        import numpy as np
        import pandas as pd

        out = []
        for k in ids:
            if k is None:
                out.append(None)
                continue
            k = int(k)
            w, h = 4 + k % 13, 3 + k % 7
            px = ((k * 7 + np.arange(w * h * 3)) % 256).astype(np.uint8)
            out.append(f"P6\n{w} {h}\n255\n".encode() + px.tobytes())
        return pd.Series(out)

    import pandas as pd

    pack.__annotations__ = {"ids": pd.Series, "return": pd.Series}
    return df.withColumn(
        "media", F.pandas_udf(pack, T.BinaryType())(F.col(id_col))
    )


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
