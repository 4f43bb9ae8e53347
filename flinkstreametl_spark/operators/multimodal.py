"""[EXT] Multimodal column plumbing: image/audio/video as opaque
`binary` columns with typed metadata (north-star requirement).

The container has no image/audio codecs, so the decode step is STUBBED:
`decode_image_batch` raises NotImplementedError unless a deterministic
fake decoder is injected. Everything Spark-side — schemas, partitioning,
Arrow batch shape, mapInPandas signatures — is real and tested
(tests/test_multimodal.py).

Design for 100 TB of media:
- blobs stay in executor space end-to-end (mapInPandas iterator of Arrow
  batches); nothing is collected to the driver;
- metadata (format/width/height/duration) lives in plain columns so
  filters prune *before* any decode;
- `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory —
  decode cost per batch is rows x decode, blob bytes dominate, so keep
  batches small for media tables.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),      # opaque encoded bytes
    T.StructField("media_type", T.StringType(), True),   # image | audio | video
    T.StructField("format", T.StringType(), True),       # png/jpeg/wav/mp4/...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("digest", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.DoubleType()), True),
])


def media_metadata(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Cheap metadata over the blob without decoding: byte length + md5
    digest — all JVM builtins, no Python."""
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.md5(F.col(payload_col)).alias("digest"),
    )


def decode_image_batch(payloads: pd.Series) -> pd.DataFrame:
    """STUB — real decoder needs an image codec (PIL/opencv), absent in
    this container. Raises; inject a fake via `extract_features(decoder=...)`
    for tests."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this environment; "
        "pass decoder= a callable(payload bytes) -> (width, height, pixels)"
    )


def fake_decoder(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decode used by tests: 'pixels' derived from the
    byte histogram — stable shape (4 floats), no codec needed."""
    if payload is None:
        return (0, 0, [0.0, 0.0, 0.0, 0.0])
    n = len(payload)
    s = sum(payload)
    return (n % 64, n // 64, [float(n), float(s % 251), float(payload[0] if n else 0), float(payload[-1] if n else 0)])


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], tuple[int, int, list[float]]] | None = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode + feature-extract via mapInPandas: Arrow-batched, executor-
    side, preserves partitioning. With decoder=None the real (stubbed)
    decoder raises — callers inject fake_decoder in tests."""
    import hashlib

    dec = decoder

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else None
                if dec is None:
                    decode_image_batch(pd.Series([raw]))  # raises NotImplementedError
                _w, _h, feat = dec(raw)
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_bytes": len(raw) if raw is not None else 0,
                        "digest": hashlib.md5(raw).hexdigest() if raw is not None else None,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(op, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def fake_resizer(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic fake resize for tests: truncate/tile the byte
    payload to w*h bytes — stands in for a real codec's re-encode."""
    if payload is None or not w or not h:
        return b""
    need = w * h
    reps = -(-need // max(1, len(payload)))
    return (payload * reps)[:need]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    id_col: str = "media_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing via mapInPandas: Arrow-batched blob-in/blob-out,
    never touching the driver. The real resize needs a codec (absent
    here) — with resizer=None this raises at execution, exactly like
    the decode stub; tests inject fake_resizer. At 100 TB the only
    things that matter are preserved here: iterator-of-batches (bounded
    memory), metadata columns updated relationally, and the payload
    staying a single binary cell per row."""
    res = resizer

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if res is None:
                decode_image_batch(pdf[payload_col])  # raises NotImplementedError
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": width,
                    "height": height,
                    "payload": [
                        res(bytes(p) if p is not None else None, width, height) for p in pdf[payload_col]
                    ],
                }
            )
            yield out[[f.name for f in RESIZED_SCHEMA.fields]]

    return df.select(id_col, payload_col).mapInPandas(op, schema=RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_ms: int = 1000, id_col: str = "media_id") -> DataFrame:
    """Frame-sampling plumbing for video rows: emit (media_id, frame_ts_ms)
    per sampled frame from duration metadata — a pure-relational explode;
    the frame *decode* would plug into extract_features."""
    return df.filter(F.col("media_type") == "video").select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))).alias("frame_ts_ms"),
    )
