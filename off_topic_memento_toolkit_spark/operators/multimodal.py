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


# ---------------------------------------------------------------------------
# Real codecs (pure stdlib/numpy — no image/audio libraries needed): the
# decode_fn hook is exercised by at least one NON-fake path.  Uncompressed
# 24-bpp BMP (BITMAPINFOHEADER, the format every tool can emit) and 16-bit
# PCM WAV (stdlib ``wave``).

def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bpp bottom-up BMP → (height, width, 3) uint8 RGB.

    Format per the published BMP layout: 14-byte file header ('BM', pixel
    offset at byte 10) + BITMAPINFOHEADER (width/height int32 at 18/22,
    bpp uint16 at 28, compression uint32 at 30 == BI_RGB), rows stored
    bottom-up as BGR triples padded to 4-byte boundaries."""
    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, "
                         f"compression={compression})")
    top_down = height < 0
    height = abs(height)
    # adversarial-header guards: negative/zero width, zero height, or a
    # pixel array the payload cannot possibly hold
    if width <= 0 or height == 0 or width * height > len(payload):
        raise ValueError(f"implausible BMP dimensions {width}x{height} "
                         f"for {len(payload)} bytes")
    row_stride = (width * 3 + 3) & ~3
    need = pixel_offset + row_stride * height
    if len(payload) < need:
        raise ValueError("truncated BMP pixel array")
    rows = np.frombuffer(payload, dtype=np.uint8, count=row_stride * height,
                         offset=pixel_offset).reshape(height, row_stride)
    bgr = rows[:, : width * 3].reshape(height, width, 3)
    if not top_down:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()  # BGR -> RGB


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB → uncompressed 24-bpp bottom-up BMP
    (test-fixture writer; round-trips with :func:`decode_bmp`)."""
    arr = np.asarray(rgb, dtype=np.uint8)
    height, width = arr.shape[:2]
    row_stride = (width * 3 + 3) & ~3
    pixel_bytes = row_stride * height
    header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      pixel_bytes, 2835, 2835, 0, 0)
    body = np.zeros((height, row_stride), dtype=np.uint8)
    body[:, : width * 3] = arr[::-1, :, ::-1].reshape(height, width * 3)
    return header + dib + body.tobytes()


def decode_wav(payload: bytes):
    """16-bit PCM WAV → (sample_rate, float64 mono samples in [-1, 1]);
    stdlib ``wave`` does the RIFF parsing."""
    import io
    import wave

    with wave.open(io.BytesIO(bytes(payload))) as wav:
        if wav.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        frames = wav.readframes(wav.getnframes())
        rate = wav.getframerate()
        channels = wav.getnchannels()
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return rate, samples


def bmp_feature_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """REAL image decode→embed path for the decode_fn hook: BMP → grayscale
    → mean-pooled grid of ``dim`` cells → unit-norm float32 vector.
    Deterministic, content-sensitive, resolution-independent."""
    rgb = decode_bmp(payload)
    gray = rgb.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    side = int(np.sqrt(dim))
    cols = max(dim // side, 1)
    ys = np.linspace(0, h, side + 1).astype(int)
    xs = np.linspace(0, w, cols + 1).astype(int)
    cells = [gray[ys[i]:max(ys[i + 1], ys[i] + 1),
                  xs[j]:max(xs[j + 1], xs[j] + 1)].mean()
             for i in range(side) for j in range(cols)]
    vec = np.asarray(cells[:dim] + [0.0] * (dim - len(cells)))
    norm = np.linalg.norm(vec)
    return (vec / norm if norm else vec).astype(np.float32)


def wav_feature_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """REAL audio decode→embed path: WAV → per-window RMS energy over
    ``dim`` equal windows → unit-norm float32 vector."""
    _, samples = decode_wav(payload)
    if samples.size == 0:
        raise ValueError("empty audio stream")
    edges = np.linspace(0, samples.size, dim + 1).astype(int)
    rms = np.asarray([
        np.sqrt(np.mean(np.square(samples[a:max(b, a + 1)])))
        for a, b in zip(edges[:-1], edges[1:])
    ])
    norm = np.linalg.norm(rms)
    return (rms / norm if norm else rms).astype(np.float32)


def bmp_resize(payload: bytes, w, h, target_w: int, target_h: int) -> bytes:
    """REAL resize_fn for the resize_media hook: BMP → nearest-neighbor
    sample to (target_w, target_h) → BMP re-encode."""
    rgb = decode_bmp(payload)
    src_h, src_w = rgb.shape[:2]
    ys = np.minimum(np.arange(target_h) * src_h // target_h, src_h - 1)
    xs = np.minimum(np.arange(target_w) * src_w // target_w, src_w - 1)
    return encode_bmp(rgb[ys][:, xs])


def synthesize_bmp_media(docs: DataFrame, id_col: str = "doc_id",
                         width: int = 16, height: int = 16,
                         corrupt_every: int | None = None) -> DataFrame:
    """Deterministic BMP media table from an id column — the fixture
    generator for tests/benchmarks (no external data): pixels are a seeded
    sha256 expansion of the id (content-sensitive, reproducible across
    executors), encoded through the REAL :func:`encode_bmp` codec.
    ``corrupt_every``: every id divisible by it (except 0) gets a truncated
    payload, exercising the decode-error row path downstream.
    Partition-preserving mapInPandas — no shuffle."""
    def gen(batches):
        need = width * height * 3
        for pdf in batches:
            rows = []
            for raw_id in pdf[id_col]:
                n = int(raw_id)
                digest = hashlib.sha256(f"bmp-{n}".encode()).digest()
                buf = (digest * (need // len(digest) + 1))[:need]
                arr = np.frombuffer(buf, dtype=np.uint8) \
                    .reshape(height, width, 3)
                payload = encode_bmp(arr)
                if corrupt_every and n and n % corrupt_every == 0:
                    payload = payload[:20]  # truncated header → decode error
                rows.append((str(n), "image", payload, "image/bmp",
                             width, height))
            frame = pd.DataFrame(rows, columns=[
                "media_id", "kind", "payload", "mime", "width", "height"])
            frame["duration_ms"] = pd.array([None] * len(rows),
                                            dtype="Int64")
            yield frame

    return docs.select(id_col).mapInPandas(gen, MEDIA_SCHEMA)


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
