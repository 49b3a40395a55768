"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with Arrow-batched processing plumbing.

Design for 100 TB of mixed media:

- media rows are ``struct(media_id, kind, bytes binary, meta struct)`` —
  bytes stay opaque to Catalyst (no accidental row-expansion), metadata is
  columnar and prunable;
- decode / feature-extract run as ``mapInPandas`` over Arrow batches, so the
  Python boundary is crossed once per batch, not per row, and peak memory is
  bounded by (batch size × largest blob);
- partitioning guidance: repartition by a size-balanced key before heavy
  decode so one executor doesn't get all the 4K videos.

Decoding: PPM (P6) / PGM (P5) decode REAL pixels with zero dependencies
beyond numpy (``decode_ppm`` — the formats are headers + raw bytes, ~40
lines of stdlib), and ``decode_image`` uses it as the default codec, so
the full decode → featurize path runs distributed on actual images in
this container.  WAV (RIFF PCM16) decodes REAL audio the same way
(``decode_wav`` — stdlib ``wave`` + numpy) with
``extract_audio_features`` computing the standard cheap quality screens
(RMS, zero-crossing rate, duration) over Arrow batches.  Other formats
(JPEG/PNG/MP3/…) still require an injected ``codec`` callable (e.g.
PIL/ffmpeg-based) — that remains the only stub boundary, opt-in rather
than the default path.  ``fake_image_features`` (raw byte statistics)
stays available for plumbing tests that don't care about pixel
semantics.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("bytes", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_s", DoubleType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("byte_len", LongType(), True),
        StructField("feat_mean", DoubleType(), True),
        StructField("feat_std", DoubleType(), True),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text table (test/dev fabric): bytes =
    UTF-8 encoding of the text.  Schema and partition behavior are exactly
    what a real media lake sees; only the payload is synthetic."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("bytes"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(F.col(text_col)).cast("long").alias("width"),
        F.lit(1).cast("long").alias("height"),
        F.lit(None).cast("double").alias("duration_s"),
    )


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile — never touches the blob column, so Catalyst
    prunes ``bytes`` out of the scan entirely (check ReadSchema)."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("bytes")).alias("total_bytes"),
        F.avg(F.octet_length("bytes")).alias("avg_bytes"),
    )


def encode_ppm(arr) -> bytes:
    """Encode a uint8 numpy array as binary PPM (HxWx3 -> P6) or PGM
    (HxW -> P5) — the inverse of :func:`decode_ppm`, used by the test
    fabric to plant REAL decodable images in the media table."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
    elif a.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected HxWx3 or HxW uint8 array, got shape {a.shape}")
    h, w = a.shape[0], a.shape[1]
    return b"%s\n%d %d\n255\n" % (magic, w, h) + a.tobytes()


def _decode_one_ppm(blob: bytes, pos: int):
    """Decode the single P6/P5 image starting at byte ``pos``; returns
    (array, position after its pixel data) — the unit the whole-blob and
    multi-frame stream decoders share."""
    import numpy as np

    magic = bytes(blob[pos : pos + 2])
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM blob (P6/P5 magic missing)")
    pos += 2
    # header scan: 3 ASCII ints separated by whitespace, '#' comments to
    # end-of-line; ONE whitespace byte after maxval, then raw samples
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":
            while pos < len(blob) and blob[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(blob[start:pos]))
    pos += 1  # the single whitespace byte after maxval
    width, height, maxval = fields
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval} (only 1-byte samples)")
    channels = 3 if magic == b"P6" else 1
    n = width * height * channels
    raw = blob[pos : pos + n]
    if len(raw) != n:
        raise ValueError(f"truncated pixel data: expected {n} bytes, got {len(raw)}")
    a = np.frombuffer(raw, dtype=np.uint8)
    return (
        a.reshape(height, width, 3) if channels == 3 else a.reshape(height, width),
        pos + n,
    )


def decode_ppm(blob: bytes):
    """Decode a binary PPM (P6, RGB) or PGM (P5, grayscale) blob into a
    uint8 numpy array (HxWx3 / HxW) — a REAL image decode with no codec
    library: the netpbm binary formats are an ASCII header (magic, width,
    height, maxval, ``#`` comments allowed) followed by raw samples.
    Only maxval <= 255 (1 byte/sample) is supported; 2-byte maxvals raise."""
    if not isinstance(blob, (bytes, bytearray)):
        raise ValueError("not a binary PPM/PGM blob (P6/P5 magic missing)")
    arr, _ = _decode_one_ppm(bytes(blob), 0)
    return arr


def decode_ppm_stream(blob: bytes) -> list:
    """Decode a MULTI-IMAGE netpbm stream (concatenated P6/P5 images —
    the format's own multi-frame convention) into a list of frames.
    This is the engine's honest 'video': real bytes, real per-frame
    decode, no codec library; swap for an ffmpeg-backed codec in
    deployment, the downstream frame-sampling path is identical."""
    b = bytes(blob)
    frames, pos = [], 0
    while pos < len(b):
        arr, pos = _decode_one_ppm(b, pos)
        frames.append(arr)
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
    if not frames:
        raise ValueError("empty netpbm stream")
    return frames


def encode_ppm_stream(frames) -> bytes:
    """Concatenate frames into a multi-image netpbm stream — the inverse
    of :func:`decode_ppm_stream`."""
    if not frames:
        raise ValueError("frames must be non-empty")
    return b"".join(encode_ppm(f) for f in frames)


def decode_image(blob: bytes, codec: Callable[[bytes], object] | None = None) -> object:
    """Decode one image blob.  PPM/PGM (P6/P5) decode natively via
    :func:`decode_ppm` — real pixels, no codec library.  Every other
    format needs an injected ``codec`` (e.g. PIL.Image.open wrapped);
    that injection point is the one remaining environment stub, and it
    is opt-in rather than the default path since r11."""
    if codec is not None:
        return codec(blob)
    if isinstance(blob, (bytes, bytearray)) and blob[:2] in (b"P6", b"P5"):
        return decode_ppm(blob)
    raise NotImplementedError(
        "no codec for this format in this environment (native support: "
        "PPM/PGM); pass codec= (e.g. PIL-based) for JPEG/PNG/..."
    )


def extract_features(
    df: DataFrame,
    kernel: Callable[[bytes], tuple[float, float]] | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Feature extraction over Arrow batches via ``mapInPandas``.

    ``kernel(bytes) -> (mean, std)`` is the pluggable decode+featurize step;
    default is ``fake_image_features`` (deterministic byte statistics) so
    the full distributed path runs without media libraries.
    """
    kern = kernel or fake_image_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [kern(b) if b is not None else (None, None) for b in pdf["bytes"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [len(b) if b is not None else None for b in pdf["bytes"]],
                    "feat_mean": [f[0] for f in feats],
                    "feat_std": [f[1] for f in feats],
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def image_pixel_features(blob: bytes) -> tuple[float, float]:
    """Real decode + featurize kernel: PPM/PGM pixels -> (mean, std) over
    the decoded sample values — the default ``extract_features`` kernel
    for media tables carrying netpbm blobs.  Swap for an embed model in
    deployment; the signature is the contract."""
    import numpy as np

    px = decode_ppm(blob).astype(np.float64)
    return (float(px.mean()), float(px.std()))


def attach_ppm_images(
    df: DataFrame, id_col: str = "doc_id", base_width: int = 16, base_height: int = 12
) -> DataFrame:
    """Media-table fabric with REAL decodable payloads: one deterministic
    PPM (P6) image per row, pixels a pure function of the id (a gradient
    ramp offset by the id), sizes varying with the id so batches are
    ragged like a real lake.  Generation runs distributed in
    ``mapInPandas`` (numpy per Arrow batch), so partitioning/batching
    behavior matches production ingest — only the payload is synthetic."""
    import numpy as np

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, widths, heights = [], [], []
            for mid in pdf["media_id"]:
                w = base_width + int(mid) % 8
                h = base_height + int(mid) % 5
                yy, xx = np.mgrid[0:h, 0:w]
                px = np.stack(
                    [
                        (xx * 3 + yy * 7 + int(mid)) % 256,
                        (xx * 5 + yy * 11 + 2 * int(mid)) % 256,
                        (xx * 13 + yy * 17 + 3 * int(mid)) % 256,
                    ],
                    axis=-1,
                ).astype(np.uint8)
                blobs.append(encode_ppm(px))
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "image",
                    "bytes": blobs,
                    "mime": "image/x-portable-pixmap",
                    "width": pd.Series(widths, dtype="int64"),
                    "height": pd.Series(heights, dtype="int64"),
                    "duration_s": pd.Series([None] * len(blobs), dtype="float64"),
                }
            )

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("byte_len", LongType(), True),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_s", DoubleType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_cross_rate", DoubleType(), True),
    ]
)


def encode_wav(samples, sample_rate: int = 8000) -> bytes:
    """Encode int16 PCM samples ([n] mono or [n, ch]) as a WAV blob — the
    inverse of :func:`decode_wav`, stdlib ``wave`` only; used by the test
    fabric to plant REAL decodable audio."""
    import io
    import wave

    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    n_ch = 1 if a.ndim == 1 else a.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(a.tobytes())
    return buf.getvalue()


def decode_wav(blob: bytes):
    """Decode a WAV (RIFF PCM, 16-bit) blob into (samples, sample_rate) —
    a REAL audio decode with no codec library: stdlib ``wave`` parses the
    RIFF container, numpy views the PCM frames.  Mono comes back [n],
    multi-channel [n, ch]; non-PCM16 (compressed / 8- or 24-bit) raises."""
    import io
    import wave

    import numpy as np

    if not isinstance(blob, (bytes, bytearray)) or blob[:4] != b"RIFF":
        raise ValueError("not a WAV blob (RIFF magic missing)")
    with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
        if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
            raise ValueError(
                f"only uncompressed 16-bit PCM supported, got "
                f"{w.getsampwidth()*8}-bit {w.getcomptype()}"
            )
        n_ch, rate = w.getnchannels(), w.getframerate()
        raw = w.readframes(w.getnframes())
    a = np.frombuffer(raw, dtype=np.int16)
    return (a if n_ch == 1 else a.reshape(-1, n_ch)), rate


def extract_audio_features(df: DataFrame) -> DataFrame:
    """Audio feature extraction over Arrow batches: WAV blobs ->
    (sample_rate, n_samples, duration_s, RMS, zero-crossing rate) — the
    standard cheap audio-quality screens (silence/clipping/noise
    heuristics build on exactly these).  Same ``mapInPandas`` shape as
    :func:`extract_features`; swap the kernel for an embedding model in
    deployment."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "byte_len", "sample_rate", "n_samples",
                "duration_s", "rms", "zero_cross_rate",
            )}
            for mid, blob in zip(pdf["media_id"], pdf["bytes"]):
                rows["media_id"].append(mid)
                if blob is None:
                    for k in list(rows)[1:]:
                        rows[k].append(None)
                    continue
                samples, rate = decode_wav(blob)
                mono = samples if samples.ndim == 1 else samples.mean(axis=1)
                x = mono.astype(np.float64) / 32768.0
                n = len(x)
                rows["byte_len"].append(len(blob))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_s"].append(n / rate if rate else None)
                rows["rms"].append(float(np.sqrt((x**2).mean())) if n else None)
                rows["zero_cross_rate"].append(
                    float((np.diff(np.signbit(x)) != 0).mean()) if n > 1 else None
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def attach_wav_audio(
    df: DataFrame, id_col: str = "doc_id", sample_rate: int = 8000
) -> DataFrame:
    """Media-table fabric with REAL decodable audio: one deterministic WAV
    per row — a sine at an id-derived frequency with id-derived length —
    generated distributed in ``mapInPandas`` (only the payload is
    synthetic, the partition/batch behavior is production-shaped)."""
    import numpy as np

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, durs = [], []
            for mid in pdf["media_id"]:
                n = sample_rate // 10 + int(mid) % 256  # ~0.1 s, ragged
                freq = 100.0 + (int(mid) % 40) * 25.0
                t = np.arange(n, dtype=np.float64) / sample_rate
                x = (np.sin(2 * np.pi * freq * t) * 12000).astype(np.int16)
                blobs.append(encode_wav(x, sample_rate))
                durs.append(n / sample_rate)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "audio",
                    "bytes": blobs,
                    "mime": "audio/wav",
                    "width": pd.Series([None] * len(blobs), dtype="Int64"),
                    "height": pd.Series([None] * len(blobs), dtype="Int64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                }
            )

    return ids.mapInPandas(gen, MEDIA_SCHEMA)


def fake_image_features(blob: bytes) -> tuple[float, float]:
    """Deterministic stand-in featurizer: byte-value mean/std.  Replace with
    a real decode+embed kernel in deployment; signature stays identical."""
    import numpy as np

    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return (0.0, 0.0)
    return (float(arr.mean()), float(arr.std()))


def frame_sample_plan(df: DataFrame, every_n_seconds: float = 1.0) -> DataFrame:
    """Video frame-sampling *plan*: computes per-media frame timestamps to
    extract (metadata math, fully columnar); :func:`extract_frames` joins
    this plan with the blob table and decodes the selected frames."""
    n_frames = F.floor(F.coalesce(F.col("duration_s"), F.lit(0.0)) / F.lit(every_n_seconds)).cast("long")
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0).cast("long"), n_frames)).alias("_i"))
        .select("media_id", (F.col("_i") * F.lit(every_n_seconds)).alias("frame_ts"))
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_ts", DoubleType(), False),
        StructField("frame_index", LongType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("feat_mean", DoubleType(), True),
        StructField("feat_std", DoubleType(), True),
    ]
)


def extract_frames(
    media: DataFrame, every_n_seconds: float = 1.0
) -> DataFrame:
    """EXECUTE the frame-sampling plan on real netpbm-stream video blobs:
    join :func:`frame_sample_plan` with the blob table on media_id, decode
    each video's stream ONCE per Arrow batch (cached per media within the
    batch), map every planned timestamp to its frame
    (``index = floor(ts/duration · n_frames)``, clamped — frames are
    treated as evenly spaced across the clip), and emit per-frame features.

    Scale shape: the join is keyed on media_id (a video's plan rows
    co-locate with its blob); decode cost is paid once per (video, batch)
    and the stream parse is a linear byte scan.  Real video codecs slot in
    by overriding the stream decode — the plan/join/batch plumbing is
    codec-agnostic."""
    import numpy as np

    plan = frame_sample_plan(media, every_n_seconds)
    joined = plan.join(
        media.select("media_id", "bytes", "duration_s"), "media_id"
    ).select("media_id", "frame_ts", "bytes", "duration_s")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cache: dict = {}
            rows = {k: [] for k in (
                "media_id", "frame_ts", "frame_index", "width", "height",
                "feat_mean", "feat_std",
            )}
            for mid, ts, blob, dur in zip(
                pdf["media_id"], pdf["frame_ts"], pdf["bytes"], pdf["duration_s"]
            ):
                rows["media_id"].append(mid)
                rows["frame_ts"].append(ts)
                if blob is None or dur is None or dur <= 0:
                    for k in ("frame_index", "width", "height", "feat_mean", "feat_std"):
                        rows[k].append(None)
                    continue
                if mid not in cache:
                    cache[mid] = decode_ppm_stream(blob)
                frames = cache[mid]
                idx = min(len(frames) - 1, max(0, int(ts / dur * len(frames))))
                px = frames[idx].astype(np.float64)
                rows["frame_index"].append(idx)
                rows["height"].append(px.shape[0])
                rows["width"].append(px.shape[1])
                rows["feat_mean"].append(float(px.mean()))
                rows["feat_std"].append(float(px.std()))
            yield pd.DataFrame(rows)

    return joined.mapInPandas(run, FRAME_SCHEMA)


def attach_ppm_video(
    df: DataFrame,
    id_col: str = "doc_id",
    fps: float = 4.0,
    base_width: int = 12,
    base_height: int = 8,
) -> DataFrame:
    """Media-table fabric with REAL decodable video: one deterministic
    netpbm stream per row — frame count and pixel ramps derived from the
    id, each frame visibly distinct (the frame index shifts the ramp), so
    frame-extraction tests can prove WHICH frame was decoded.  Generated
    distributed in ``mapInPandas``."""
    import numpy as np

    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs, durs = [], []
            for mid in pdf["media_id"]:
                n_frames = 4 + int(mid) % 5
                w = base_width + int(mid) % 4
                h = base_height + int(mid) % 3
                yy, xx = np.mgrid[0:h, 0:w]
                frames = [
                    np.stack(
                        [
                            (xx * 3 + yy * 7 + int(mid) + 31 * f) % 256,
                            (xx * 5 + yy * 11 + 2 * int(mid) + 57 * f) % 256,
                            (xx * 13 + yy * 17 + 3 * int(mid) + 89 * f) % 256,
                        ],
                        axis=-1,
                    ).astype(np.uint8)
                    for f in range(n_frames)
                ]
                blobs.append(encode_ppm_stream(frames))
                durs.append(n_frames / fps)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": "video",
                    "bytes": blobs,
                    "mime": "video/x-netpbm-stream",
                    "width": pd.Series([None] * len(blobs), dtype="Int64"),
                    "height": pd.Series([None] * len(blobs), dtype="Int64"),
                    "duration_s": pd.Series(durs, dtype="float64"),
                }
            )

    return ids.mapInPandas(gen, MEDIA_SCHEMA)
