"""Multimodal columns: image/audio/video as opaque ``binary`` + typed metadata.

The Spark-side plumbing (schemas, batch shapes, partition-aware mapInPandas
kernels) is real and tested; the actual codec work is STUBBED behind
``decode_fn`` hooks because no image/audio libraries exist in this container —
a deployment passes e.g. a PIL/torchaudio-backed callable and nothing else
changes.  The deterministic fake decoder lets tests pin the dataflow.
"""

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("mime", T.StringType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
    T.StructField("decode_error", T.StringType(), True),
])


def deterministic_fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Stand-in for a real decode→embed kernel: a seeded projection of the
    byte content (deterministic, content-sensitive, unit-norm)."""
    if payload is None:
        raise ValueError("null payload")
    digest = hashlib.sha256(bytes(payload)).digest()
    raw = np.frombuffer(
        (digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype="<i4"
    ).astype(np.float64)
    norm = np.linalg.norm(raw)
    return (raw / norm if norm else raw).astype(np.float32)


def make_feature_extractor(decode_fn=None, dim: int = 16):
    """mapInPandas kernel: binary payload → feature vector.

    ``decode_fn(payload_bytes) -> np.ndarray`` — pass the real codec here.
    Default raises NotImplementedError for real media kinds unless the
    deterministic fake is requested (clearly-marked stub).
    """
    decode = decode_fn or (lambda payload: deterministic_fake_decode(payload, dim))

    def extract(batches):
        for pdf in batches:
            out = []
            for media_id, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                n_bytes = len(payload) if payload is not None else None
                try:
                    feature = decode(payload)
                    out.append((media_id, kind, n_bytes,
                                [float(x) for x in feature], None))
                except Exception as exc:  # noqa: BLE001 — error rows, not raises
                    out.append((media_id, kind, n_bytes, None, repr(exc)))
            frame = pd.DataFrame(
                out, columns=["media_id", "kind", "n_bytes", "feature",
                              "decode_error"],
            )
            # nullable Int64 so None rows don't become NaN-in-float64
            frame["n_bytes"] = frame["n_bytes"].astype("Int64")
            yield frame

    return extract


def extract_media_features(media: DataFrame, decode_fn=None,
                           dim: int = 16) -> DataFrame:
    """Partition-preserving feature extraction (no shuffle; Arrow batches)."""
    kernel = make_feature_extractor(decode_fn, dim)
    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("resize_error", T.StringType()),
])


def resize_media(media: DataFrame, target_w: int, target_h: int,
                 resize_fn=None) -> DataFrame:
    """Image resize plumbing: partition-preserving mapInPandas over the
    binary column, metadata updated to the target box.  ``resize_fn(payload,
    w, h, target_w, target_h) -> bytes`` is the real-codec hook (PIL etc.,
    absent in this container); the default stand-in downsamples the byte
    stream proportionally to the pixel-count ratio — deterministic, so the
    batch shape / schema / error-row contract is fully testable."""
    def _fake_resize(payload, w, h, tw, th):
        if payload is None:
            raise ValueError("null payload")
        if not w or not h:
            raise ValueError("source dimensions unknown")
        ratio = max(int((w * h) / max(tw * th, 1)), 1)
        return bytes(payload[::ratio])

    fn = resize_fn or _fake_resize

    def kernel(batches):
        for pdf in batches:
            rows = []
            for media_id, kind, payload, w, h in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"],
                pdf["width"], pdf["height"],
            ):
                try:
                    w_i = None if pd.isna(w) else int(w)
                    h_i = None if pd.isna(h) else int(h)
                    resized = fn(payload, w_i, h_i, target_w, target_h)
                    rows.append((media_id, kind, resized,
                                 target_w, target_h, None))
                except Exception as exc:  # noqa: BLE001 — error rows
                    rows.append((media_id, kind, None, None, None, repr(exc)))
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "width", "height",
                "resize_error"])

    return media.select("media_id", "kind", "payload", "width", "height") \
                .mapInPandas(kernel, schema=RESIZED_SCHEMA)


def frame_sample_stub(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: REAL implementations decode keyframes; here the
    plumbing contract (explode into (media_id, frame_ts_ms, payload slice))
    is exercised with byte-range slices as stand-in frames."""
    def sample(batches):
        for pdf in batches:
            rows = []
            for media_id, payload, duration in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                if payload is None or pd.isna(duration):
                    continue
                n_frames = max(int(duration // every_ms), 1)
                chunk = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    rows.append((media_id, i * every_ms,
                                 bytes(payload[i * chunk:(i + 1) * chunk])))
            yield pd.DataFrame(rows, columns=["media_id", "frame_ts_ms",
                                              "frame_payload"])

    schema = T.StructType([
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame_payload", T.BinaryType()),
    ])
    return media.select("media_id", "payload", "duration_ms").mapInPandas(
        sample, schema=schema)
