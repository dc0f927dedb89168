"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The Spark-side plumbing (schemas, partition sizing, UDF signatures, batch
shapes) is real and tested. Codecs: AUDIO and IMAGE have REAL decoders for
one public format each — a pure-numpy RIFF/WAVE PCM parser (``_decode_wav``:
8/16/32-bit int and float32 PCM, any channel count, -> FEATURE_DIM
spectral-band log-energy features via rfft), a netpbm PPM/PGM parser
(``_decode_ppm``: binary P5/P6, maxval <= 65535, -> geometry + luminance
histogram features), a Windows BMP parser (``_decode_bmp``:
BITMAPINFOHEADER BI_RGB 24/32-bit, bottom-up or top-down, same feature
layout as PPM so formats are cross-comparable), and VIDEO an uncompressed
AVI parser (``_decode_avi``: RIFF 'AVI ', 24-bit DIB frames ->
geometry/duration/motion temporal features) — all four kinds honest
end-to-end on real bytes; compressed codecs (PNG/JPEG/H.264/...) remain
DISCLOSED STUBS (``_fake_decode`` —
the sandbox image has no codec libraries; swap in PIL/ffmpeg in
production). The batch
contract is the part that matters at 100 TB: media bytes never pass through
Python row-at-a-time, only as Arrow buffers, and per-batch bytes are bounded
at execution time by the session's
``spark.sql.execution.arrow.maxBytesPerBatch`` (see extract_media_features).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n: int = 1000, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded pseudo-random bytes.

    Stands in for an ingested corpus so the plumbing is testable end-to-end.
    """
    df = spark.range(0, n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.abs(F.xxhash64("id", F.lit(seed))) % 3 + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.repeat(F.substring(F.md5(F.concat(F.col("id").cast("string"), F.lit(seed))), 1, 16), 4)).alias(
            "payload"
        ),
        F.lit("application/octet-stream").alias("mime"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 1920 + 16).cast("int").alias("width"),
        (F.abs(F.xxhash64("id", F.lit(2))) % 1080 + 16).cast("int").alias("height"),
        (F.abs(F.xxhash64("id", F.lit(3))) % 60000).cast("int").alias("duration_ms"),
    )
    return df


def make_wav_bytes(
    freq_hz: float = 440.0,
    duration_s: float = 0.25,
    rate: int = 8000,
    amplitude: float = 0.5,
    channels: int = 1,
    bits: int = 16,
) -> bytes:
    """Synthesize a REAL RIFF/WAVE PCM file (sine tone) — deterministic
    fixture bytes for the honest end-to-end audio path. Standard WAV layout:
    RIFF header, 'fmt ' chunk (PCM), 'data' chunk."""
    import struct

    n = int(rate * duration_s)
    t = np.arange(n, dtype="float64") / rate
    mono = amplitude * np.sin(2.0 * np.pi * freq_hz * t)
    frames = np.repeat(mono[:, None], channels, axis=1)
    if bits == 16:
        data = (frames * 32767.0).astype("<i2").tobytes()
        audio_format, sample_bytes = 1, 2
    elif bits == 8:
        data = ((frames * 127.0) + 128.0).astype("u1").tobytes()
        audio_format, sample_bytes = 1, 1
    elif bits == 32:
        data = frames.astype("<f4").tobytes()
        audio_format, sample_bytes = 3, 4  # IEEE float
    else:
        raise ValueError(f"bits must be 8, 16 or 32, got {bits}")
    byte_rate = rate * channels * sample_bytes
    block_align = channels * sample_bytes
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, audio_format, channels, rate, byte_rate, block_align, bits
    )
    data_hdr = struct.pack("<4sI", b"data", len(data))
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data_hdr) + len(data), b"WAVE")
    return riff + fmt + data_hdr + data


def _decode_wav(payload: bytes) -> np.ndarray | None:
    """Pure-numpy RIFF/WAVE PCM parser -> FEATURE_DIM features, or None when
    the payload is not parseable WAV (caller falls back to the stub).

    Supports the standard public format (8-bit unsigned / 16- and 32-bit
    signed integer PCM, 32-bit IEEE float; any channel count — downmixed to
    mono). Features: [duration_s, rms, zero-crossing rate, peak] +
    (FEATURE_DIM - 4) log-energy bands of the rfft magnitude spectrum —
    real, deterministic signal features from real bytes.
    """
    import struct

    try:
        if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
            return None
        pos, fmt, data = 12, None, None
        while pos + 8 <= len(payload):
            cid, csize = struct.unpack_from("<4sI", payload, pos)
            body = payload[pos + 8 : pos + 8 + csize]
            if cid == b"fmt " and csize >= 16:
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + csize + (csize & 1)  # chunks are word-aligned
        if fmt is None or data is None:
            return None
        audio_format, channels, rate, _, _, bits = fmt
        if channels < 1 or rate <= 0:
            return None
        if audio_format == 1 and bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype("float64") / 32768.0
        elif audio_format == 1 and bits == 8:
            x = (np.frombuffer(data, dtype="u1").astype("float64") - 128.0) / 128.0
        elif audio_format == 1 and bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype("float64") / 2147483648.0
        elif audio_format == 3 and bits == 32:
            x = np.frombuffer(data, dtype="<f4").astype("float64")
        else:
            return None
        if channels > 1:
            x = x[: len(x) - (len(x) % channels)].reshape(-1, channels).mean(axis=1)
        if len(x) == 0:
            return np.zeros(FEATURE_DIM, dtype="float32")
        duration = len(x) / rate
        rms = float(np.sqrt(np.mean(x * x)))
        zcr = float(np.mean(np.abs(np.diff(np.signbit(x).astype("int8"))))) if len(x) > 1 else 0.0
        peak = float(np.max(np.abs(x)))
        spec = np.abs(np.fft.rfft(x))
        n_bands = FEATURE_DIM - 4
        bands = np.array_split(spec, n_bands)
        band_e = np.array([np.log1p(float(np.sum(b * b))) for b in bands], dtype="float64")
        return np.concatenate([[duration, rms, zcr, peak], band_e]).astype("float32")
    except (struct.error, ValueError):
        return None


def make_ppm_bytes(width: int = 32, height: int = 24, maxval: int = 255) -> bytes:
    """Synthesize a REAL binary PPM (P6) image — a deterministic horizontal
    R gradient x vertical G gradient with constant B — fixture bytes for the
    honest end-to-end image path."""
    x = np.linspace(0, maxval, width, dtype="float64")
    y = np.linspace(0, maxval, height, dtype="float64")
    r = np.tile(x, (height, 1))
    g = np.tile(y[:, None], (1, width))
    b = np.full((height, width), maxval // 2, dtype="float64")
    rgb = np.stack([r, g, b], axis=-1)
    dt = ">u2" if maxval > 255 else "u1"
    header = f"P6\n{width} {height}\n{maxval}\n".encode()
    return header + rgb.astype(dt).tobytes()


def _decode_ppm(payload: bytes) -> np.ndarray | None:
    """Pure-numpy netpbm parser (binary P6 RGB / P5 grayscale, with comment
    handling) -> FEATURE_DIM features, or None when the payload is not
    parseable netpbm (caller falls back to the stub).

    Features: [width, height, aspect, mean luminance] + (FEATURE_DIM - 4)
    bins of the normalized luminance histogram — real geometry and signal
    statistics from real bytes.
    """
    try:
        if payload is None or len(payload) < 10 or payload[:2] not in (b"P5", b"P6"):
            return None
        kind = payload[:2]
        # netpbm header: three whitespace-separated ints, '#' comments to EOL
        pos, fields = 2, []
        while len(fields) < 3:
            if pos >= len(payload):
                return None
            c = payload[pos : pos + 1]
            if c == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
            elif c.isspace():
                pos += 1
            elif c.isdigit():
                j = pos
                while j < len(payload) and payload[j : j + 1].isdigit():
                    j += 1
                fields.append(int(payload[pos:j]))
                pos = j
            else:
                return None
        pos += 1  # single whitespace after maxval precedes the raster
        w, h, maxval = fields
        if not (0 < w and 0 < h and 0 < maxval <= 65535):
            return None
        ch = 3 if kind == b"P6" else 1
        dt = np.dtype(">u2") if maxval > 255 else np.dtype("u1")
        need = w * h * ch * dt.itemsize
        raster = payload[pos : pos + need]
        if len(raster) < need:
            return None
        px = np.frombuffer(raster, dtype=dt).astype("float64").reshape(h, w, ch) / maxval
        lum = px @ [0.299, 0.587, 0.114] if ch == 3 else px[:, :, 0]
        n_bins = FEATURE_DIM - 4
        hist, _ = np.histogram(lum, bins=n_bins, range=(0.0, 1.0))
        hist = hist / lum.size
        head = [float(w), float(h), w / h, float(lum.mean())]
        return np.concatenate([head, hist]).astype("float32")
    except ValueError:
        return None


def make_bmp_bytes(width: int = 32, height: int = 24, top_down: bool = False, bits: int = 24) -> bytes:
    """Synthesize a REAL uncompressed Windows BMP (BITMAPINFOHEADER, BI_RGB,
    24-bit BGR or 32-bit BGRA) — the same deterministic R/G gradient fixture
    as :func:`make_ppm_bytes`, so cross-format decoder parity is testable."""
    import struct

    x = np.linspace(0, 255, width, dtype="float64")
    y = np.linspace(0, 255, height, dtype="float64")
    r = np.tile(x, (height, 1))
    g = np.tile(y[:, None], (1, width))
    b = np.full((height, width), 127, dtype="float64")
    if bits == 24:
        px = np.stack([b, g, r], axis=-1).astype("u1")  # BGR order
    elif bits == 32:
        a = np.full((height, width), 255, dtype="float64")
        px = np.stack([b, g, r, a], axis=-1).astype("u1")  # BGRA
    else:
        raise ValueError(f"bits must be 24 or 32, got {bits}")
    row_bytes = width * (bits // 8)
    pad = (-row_bytes) % 4
    rows = px if top_down else px[::-1]  # BMP default raster is bottom-up
    raster = b"".join(bytes(rows[i]) + b"\x00" * pad for i in range(height))
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, (-height if top_down else height), 1, bits, 0,
        len(raster), 2835, 2835, 0, 0,
    )
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + len(raster), 0, 0, off)
    return hdr + info + raster


def _decode_bmp(payload: bytes) -> np.ndarray | None:
    """Pure-numpy Windows BMP parser (BITMAPINFOHEADER-or-later, BI_RGB
    uncompressed, 24-bit BGR / 32-bit BGRA, bottom-up or top-down raster,
    4-byte row padding) -> the SAME feature layout as :func:`_decode_ppm`
    ([w, h, aspect, mean luminance] + luminance histogram), or None when
    the payload is not parseable BMP (caller falls back to the stub)."""
    import struct

    try:
        if payload is None or len(payload) < 54 or payload[:2] != b"BM":
            return None
        data_off = struct.unpack_from("<I", payload, 10)[0]
        hdr_size = struct.unpack_from("<I", payload, 14)[0]
        if hdr_size < 40:  # BITMAPCOREHEADER not supported
            return None
        w, h_raw = struct.unpack_from("<ii", payload, 18)
        planes, bits = struct.unpack_from("<HH", payload, 26)
        compression = struct.unpack_from("<I", payload, 30)[0]
        if planes != 1 or compression != 0 or bits not in (24, 32) or w <= 0 or h_raw == 0:
            return None
        top_down = h_raw < 0
        h = -h_raw if top_down else h_raw
        ch = bits // 8
        row_bytes = w * ch
        stride = row_bytes + ((-row_bytes) % 4)
        need = stride * h
        raster = payload[data_off : data_off + need]
        if len(raster) < need:
            return None
        rows = np.frombuffer(raster, dtype="u1").reshape(h, stride)[:, :row_bytes]
        px = rows.reshape(h, w, ch).astype("float64") / 255.0
        if not top_down:
            px = px[::-1]
        # BGR(A) channel order -> luminance
        lum = px[:, :, 2] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 0] * 0.114
        n_bins = FEATURE_DIM - 4
        hist, _ = np.histogram(lum, bins=n_bins, range=(0.0, 1.0))
        hist = hist / lum.size
        head = [float(w), float(h), w / h, float(lum.mean())]
        return np.concatenate([head, hist]).astype("float32")
    except (struct.error, ValueError):
        return None


def make_avi_bytes(
    width: int = 24, height: int = 16, n_frames: int = 8, fps: int = 10
) -> bytes:
    """Synthesize a REAL uncompressed AVI (RIFF 'AVI ', 'hdrl' with
    avih/strh/strf, 'movi' with one '00db' DIB chunk per frame) — a
    deterministic moving horizontal gradient, so frame count, duration and
    inter-frame motion are physically known for the decoder test."""
    import struct

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(fourcc: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", fourcc + data)

    frames = []
    x = np.arange(width, dtype="float64")
    row_bytes = width * 3
    pad = (-row_bytes) % 4
    for f in range(n_frames):
        # gradient shifts right one pixel per frame -> constant known motion
        lum = ((x + f) % width) / max(width - 1, 1) * 255.0
        row = np.repeat(lum[:, None], 3, axis=1).astype("u1")  # gray: B=G=R
        img = np.tile(row[None, :, :], (height, 1, 1))
        raster = b"".join(bytes(img[i]) + b"\x00" * pad for i in range(height - 1, -1, -1))
        frames.append(chunk(b"00db", raster))
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec, 0, 0, 0, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n_frames, 0, 0, 0, 0, 0, width, height,
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(frames[0]) - 8, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _decode_avi(payload: bytes) -> np.ndarray | None:
    """Pure-numpy AVI parser (RIFF 'AVI ', uncompressed 24-bit DIB '00db'/
    '00dc' frames, bottom-up rasters) -> FEATURE_DIM features, or None when
    the payload is not parseable uncompressed AVI (caller falls back to the
    stub).

    Features: [width, height, n_frames, duration_s, mean luminance,
    motion (mean abs inter-frame luminance delta)] + (FEATURE_DIM - 6)
    bins of the per-frame mean-luminance histogram — real temporal
    statistics from real bytes.
    """
    import struct

    try:
        if payload is None or len(payload) < 24 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            return None
        usec_per_frame = n_total = w = h = None
        bits = compression = None
        frames: list[bytes] = []

        def walk(buf: bytes, pos: int, end: int) -> None:
            nonlocal usec_per_frame, n_total, w, h, bits, compression
            while pos + 8 <= end:
                fourcc = buf[pos : pos + 4]
                size = struct.unpack_from("<I", buf, pos + 4)[0]
                body_start = pos + 8
                body_end = min(body_start + size, end)
                if fourcc == b"LIST":
                    walk(buf, body_start + 4, body_end)
                elif fourcc == b"avih" and size >= 40:
                    vals = struct.unpack_from("<10I", buf, body_start)
                    usec_per_frame, n_total, w, h = vals[0], vals[4], vals[8], vals[9]
                elif fourcc == b"strf" and size >= 40:
                    bits = struct.unpack_from("<H", buf, body_start + 14)[0]
                    compression = struct.unpack_from("<I", buf, body_start + 16)[0]
                elif fourcc[2:] in (b"db", b"dc") and size > 0:
                    frames.append(buf[body_start:body_end])
                pos = body_start + size + (size % 2)

        walk(payload, 12, len(payload))
        if not frames or not w or not h or bits != 24 or compression not in (0, None):
            return None
        row_bytes = w * 3
        stride = row_bytes + ((-row_bytes) % 4)
        need = stride * h
        lums = []
        for fr in frames:
            if len(fr) < need:
                return None
            rows = np.frombuffer(fr[:need], dtype="u1").reshape(h, stride)[:, :row_bytes]
            px = rows.reshape(h, w, 3).astype("float64") / 255.0
            lum = px[::-1, :, 2] * 0.299 + px[::-1, :, 1] * 0.587 + px[::-1, :, 0] * 0.114
            lums.append(lum)
        stack = np.stack(lums)  # (frames, h, w)
        n = len(lums)
        duration = n * (usec_per_frame or 0) / 1e6
        motion = float(np.mean(np.abs(np.diff(stack, axis=0)))) if n > 1 else 0.0
        per_frame = stack.mean(axis=(1, 2))
        n_bins = FEATURE_DIM - 6
        hist, _ = np.histogram(per_frame, bins=n_bins, range=(0.0, 1.0))
        hist = hist / max(n, 1)
        head = [float(w), float(h), float(n), duration, float(stack.mean()), motion]
        return np.concatenate([head, hist]).astype("float32")
    except (struct.error, ValueError):
        return None


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: derives a FEATURE_DIM
    float vector from the payload bytes. Replace with a real codec call
    (``raise NotImplementedError`` path below guards misuse)."""
    if payload is None:
        return np.zeros(FEATURE_DIM, dtype="float32")
    arr = np.frombuffer(payload, dtype=np.uint8)
    reps = int(np.ceil(FEATURE_DIM / max(len(arr), 1)))
    vec = np.tile(arr, reps)[:FEATURE_DIM].astype("float32")
    return vec / 255.0


def decode_stub(payload: bytes, kind: str) -> np.ndarray:
    """Dispatch: audio WAV and image PPM/PGM payloads get the REAL
    decoders; anything else falls through to the disclosed deterministic
    stand-in."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    if kind == "audio":
        real = _decode_wav(payload)
        if real is not None:
            return real
    elif kind == "image":
        real = _decode_ppm(payload)
        if real is None:
            real = _decode_bmp(payload)
        if real is not None:
            return real
    elif kind == "video":
        real = _decode_avi(payload)
        if real is not None:
            return real
    return _fake_decode(payload)


def extract_media_features(
    media: DataFrame,
    emit_batch_rows: bool = False,
) -> DataFrame:
    """media table → (media_id, kind, feature: array<float>, n_bytes).

    Arrow-batched ``mapInPandas``: each pandas batch carries the payload
    column as raw bytes; the decode runs vectorized per batch and the kernel
    streams batch-by-batch, never holding a whole partition.

    Memory contract (execution-time, round-1 fix): the bytes a worker
    materializes per batch are bounded by the SESSION conf
    ``spark.sql.execution.arrow.maxBytesPerBatch`` (Spark 4 default 64 MB),
    which the JVM-side ArrowWriter enforces when the plan EXECUTES — unlike a
    records-per-batch conf toggled around this (lazy) transformation, which
    would be restored before any task runs and so never take effect. Size the
    session conf to the worker budget at session build time; do not mutate it
    around individual queries.

    ``emit_batch_rows=True`` appends a ``batch_rows`` column recording the
    size of the Arrow batch each row arrived in — observability for tests
    that pin the batch-bound contract.
    """
    fields = [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.IntegerType(), True),
    ]
    if emit_batch_rows:
        fields.append(T.StructField("batch_rows", T.IntegerType(), False))
    out_schema = T.StructType(fields)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:  # stream batch-by-batch: never holds the partition
            feats = [decode_stub(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": [f.tolist() for f in feats],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )
            if emit_batch_rows:
                out["batch_rows"] = len(pdf)
            yield out

    return media.mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms) —
    the explode is pure column algebra; actual frame extraction is the
    decode stub's job downstream."""
    n_frames = F.least(
        F.ceil(F.col("duration_ms") / F.lit(every_ms)).cast("int"), F.lit(max_frames)
    )
    return (
        media.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))))
        .select(
            "media_id",
            "frame_idx",
            (F.col("frame_idx") * every_ms).alias("frame_ts_ms"),
            "payload",
        )
    )
