"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched pandas functions over ``mapInPandas``. Three decoder
tiers:

- ``decoder='ppm'`` — a REAL codec, dependency-free: binary PPM (P6) /
  PGM (P5) parsed and re-encoded with numpy (header parse including
  comments, pixel decode, nearest-neighbor resize). Proves the decode
  path end to end on an actual image format.
- ``decoder='jpeg'`` — a REAL compressed codec, dependency-free:
  baseline JPEG (SOF0, canonical Huffman, dequant + IDCT, YCbCr)
  implemented in pure numpy (my_weather_spark.llm.jpeg). Grayscale and
  4:4:4 color; progressive/subsampled files raise NotImplementedError
  naming the feature.
- ``decoder='fake'`` — deterministic synthetic decode so batch
  shape/schema/partitioning are exercised on arbitrary payload bytes.
- ``decoder='real'`` — the Pillow/ffmpeg call site for the remaining
  compressed formats (mp3/h264), which are NOT available in this
  environment: raises NotImplementedError at the exact line the codec
  call belongs.

Scale notes (100 TB): payloads stay in executor memory only for the
duration of one Arrow batch (bounded by
spark.sql.execution.arrow.maxRecordsPerBatch); decode is a narrow map
— no shuffle; downstream feature columns are small, so write
feature tables separately from payload tables and join on asset_id
(payload tables are scanned only by the decode pass).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata for an opaque media payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, byte_len int, sha1 string, mean_intensity double, "
    "width int, height int"
)


# ---------------------------------------------------------------------------
# PPM/PGM (netpbm binary) codec — pure numpy, no external library.
# P6 = RGB (3 channels), P5 = grayscale (1 channel), maxval <= 255.

def encode_ppm(arr) -> bytes:
    """(h, w) uint8 -> P5 bytes; (h, w, 3) uint8 -> P6 bytes."""
    import numpy as np

    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        magic = b"P5"
        h, w = a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic = b"P6"
        h, w = a.shape[:2]
    else:
        raise ValueError(f"unsupported array shape {a.shape}")
    return magic + b"\n%d %d\n255\n" % (w, h) + a.tobytes()


def _parse_netpbm(b: bytes, pos: int):
    """Parse one P5/P6 image starting at ``pos``; returns
    (uint8 array, end offset) — the offset enables streaming several
    concatenated frames out of one payload (the raw-video container).
    """
    import numpy as np

    if b[pos : pos + 2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM payload")
    channels = 3 if b[pos : pos + 2] == b"P6" else 1
    # header = magic + 3 ints (w, h, maxval) separated by whitespace,
    # with optional '#...' comments; one whitespace byte ends it
    pos, fields = pos + 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated netpbm header")
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if not (0 < maxval <= 255):
        raise ValueError(f"unsupported maxval {maxval}")
    n = w * h * channels
    data = np.frombuffer(b, dtype=np.uint8, count=n, offset=pos)
    if data.size < n:
        raise ValueError("truncated pixel data")
    arr = data.reshape((h, w, 3) if channels == 3 else (h, w))
    return arr, pos + n


def decode_ppm(b: bytes):
    """P5/P6 bytes -> uint8 array (h, w) or (h, w, 3). Handles
    whitespace runs and ``#`` comments in the header per the netpbm
    spec; raises ValueError on anything else (the caller decides
    whether a corrupt payload fails the batch or is filtered first).
    """
    arr, _ = _parse_netpbm(bytes(b), 0)
    return arr


def split_ppm_frames(b: bytes):
    """Concatenated-P6/P5 payload (the raw ``video/x-ppm-seq``
    container) -> list of frame arrays."""
    b = bytes(b)
    frames, pos = [], 0
    while pos < len(b):
        arr, pos = _parse_netpbm(b, pos)
        frames.append(arr)
    if not frames:
        raise ValueError("empty frame sequence")
    return frames


def _nearest_resize(a, target_w: int, target_h: int):
    """Nearest-neighbor resize via numpy index arrays (the pixel-center
    mapping OpenCV/Pillow-NEAREST use: src = floor((i + 0.5) * s/t))."""
    import numpy as np

    h, w = a.shape[:2]
    rows = np.minimum(((np.arange(target_h) + 0.5) * h / target_h).astype(np.int64), h - 1)
    cols = np.minimum(((np.arange(target_w) + 0.5) * w / target_w).astype(np.int64), w - 1)
    return a[rows][:, cols]


def media_ppm_from_documents(docs: DataFrame, width: int = 16, height: int = 16) -> DataFrame:
    """Media table whose payloads are REAL P6 images: each document's
    utf-8 bytes tiled to exactly width*height*3 pixel bytes under a
    valid netpbm header — deterministic, decodable by any PPM reader."""
    out_len = width * height * 3
    header = f"P6\n{width} {height}\n255\n".encode()
    # tile the text to >= out_len CHARS (rpad guards empty text), then
    # truncate the utf-8 BYTES to exactly out_len — chars <= bytes, so
    # out_len chars always yield enough bytes (substring slices binary)
    reps = F.greatest(
        (F.lit(out_len) / F.greatest(F.length("text"), F.lit(1))).cast("int") + 1,
        F.lit(1),
    )
    body = F.substring(
        F.encode(F.rpad(F.repeat(F.col("text"), reps), out_len, "x"), "utf-8"),
        1,
        out_len,
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.concat(F.lit(header), body).alias("payload"),
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
            F.lit("image/x-portable-pixmap").alias("codec"),
        ).alias("meta"),
    )


def media_jpeg_from_documents(
    docs: DataFrame, width: int = 16, height: int = 16, quality: int = 50
) -> DataFrame:
    """Media table whose payloads are REAL baseline JPEGs: one uniform
    grayscale image per document, gray value (n_chars*7 + doc_id*13)
    % 256 — deterministic, decodable by any JPEG reader, and (because
    the image is uniform and quality 50 puts q00 = 16, a multiple
    of 8) the decoded intensity is exactly floor(Q*16/8 + 0.5) + 128
    with Q = floor(8*(v-128)/16 + 0.5), clamped — an identity a SQL
    oracle replays without running Huffman or the IDCT (see
    my_weather_spark.llm.jpeg's rounding contract)."""

    def _jpegify(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        from my_weather_spark.llm.jpeg import encode_jpeg

        # synthesis-side memo: only 256 distinct gray values exist, so
        # encode each once per task. This caches test-data CONSTRUCTION
        # only — the decode under test still runs per row.
        memo: dict[int, bytes] = {}

        def enc(v: int) -> bytes:
            b = memo.get(v)
            if b is None:
                b = memo[v] = encode_jpeg(
                    np.full((height, width), v, dtype=np.uint8), quality
                )
            return b

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": [enc(int(v)) for v in pdf["_v"]],
                }
            )

    base = docs.select(
        F.col("doc_id").alias("asset_id"),
        ((F.col("n_chars") * 7 + F.col("doc_id") * 13) % 256).alias("_v"),
    )
    enc = base.mapInPandas(_jpegify, schema="asset_id long, payload binary")
    return enc.select(
        "asset_id",
        F.lit("image").alias("media_type"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(1).alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
            F.lit("image/jpeg").alias("codec"),
        ).alias("meta"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents table: the
    text bytes stand in for an encoded payload (deterministic)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("double").alias("duration_s"),
            F.lit("fake/raw").alias("codec"),
        ).alias("meta"),
    )


def decode_image_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode payloads -> per-asset image features via mapInPandas.

    ``ppm``: REAL decode (netpbm P5/P6, pure numpy) — mean intensity
    over actual pixels, width/height read from the payload header.
    ``jpeg``: REAL decode of baseline JPEG (full entropy + IDCT path,
    my_weather_spark.llm.jpeg) — same feature columns.
    ``fake``: deterministic pseudo-decode (sha1 + byte statistics) so
    batch shape/schema are exercised without a codec library.
    ``real``: the Pillow/libjpeg call site — NotImplementedError here.
    """
    if decoder not in ("ppm", "jpeg", "fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image decode requires Pillow/libjpeg — not available "
                    "in this environment; plug the codec call here"
                )
            payloads = pdf["payload"]
            # NULL payloads (never-fetched assets) yield NULL-feature
            # rows instead of crashing the whole Arrow batch — the same
            # contract in every tier (see resize_images' fake tier).
            if decoder in ("ppm", "jpeg"):
                if decoder == "jpeg":
                    from my_weather_spark.llm.jpeg import decode_jpeg as _dec
                else:
                    _dec = decode_ppm
                decoded = [None if b is None else _dec(b) for b in payloads]
                out = pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "byte_len": [
                            None if b is None else len(b) for b in payloads
                        ],
                        "sha1": [
                            None
                            if b is None
                            else hashlib.sha1(bytes(b)).hexdigest()
                            for b in payloads
                        ],
                        # full precision — Python round() is banker's,
                        # which disagrees with SQL HALF_UP on ties;
                        # callers round JVM-side (F.round) if needed
                        "mean_intensity": [
                            None if a is None else float(np.mean(a))
                            for a in decoded
                        ],
                        "width": [
                            None if a is None else a.shape[1] for a in decoded
                        ],
                        "height": [
                            None if a is None else a.shape[0] for a in decoded
                        ],
                    }
                )
                yield out
                continue
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "byte_len": [None if b is None else len(b) for b in payloads],
                    "sha1": [
                        None if b is None else hashlib.sha1(bytes(b)).hexdigest()
                        for b in payloads
                    ],
                    # fake "mean pixel": mean byte value of the payload
                    "mean_intensity": [
                        None
                        if b is None
                        else (round(sum(b) / len(b), 6) if len(b) else 0.0)
                        for b in payloads
                    ],
                    "width": pdf["meta"].map(lambda m: m["width"]).astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                }
            )
            yield out

    return df.select("asset_id", "payload", "meta").mapInPandas(
        _decode, schema=IMAGE_FEATURES_SCHEMA
    )


def frame_sample_manifest(
    df: DataFrame, every_n_seconds: float = 1.0
) -> DataFrame:
    """Video frame-sampling plan: one row per (asset_id, frame_ts).
    The decode of each frame is the stubbed step; the manifest (what a
    distributed frame-extraction pass fans out over) is real."""
    n_frames = F.greatest(
        F.ceil(F.coalesce(F.col("meta.duration_s"), F.lit(1.0)) / every_n_seconds),
        F.lit(1),
    ).cast("int")
    return df.where(F.col("media_type") == "video").select(
        "asset_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).withColumn("frame_ts_s", F.col("frame_idx") * every_n_seconds)


def media_videos_from_documents(docs: DataFrame) -> DataFrame:
    """Synthetic video table from documents: deterministic duration
    derived from n_chars (1..30 s) so manifest math has a SQL oracle."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit(640).alias("width"),
            F.lit(360).alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            ((F.col("n_chars") % 30) + 1).cast("double").alias("duration_s"),
            F.lit("fake/v0").alias("codec"),
        ).alias("meta"),
    )


def resize_images(
    df: DataFrame, target_w: int, target_h: int, decoder: str = "fake"
) -> DataFrame:
    """Resize pass: payload -> resized payload + updated meta, as an
    Arrow-batched narrow map (mapInPandas, no shuffle).

    ``ppm``: REAL resize — decode netpbm, numpy nearest-neighbor
    remap, re-encode; the output payload is a valid image at the
    target size.
    ``jpeg``: REAL resize through the baseline JPEG codec — decode,
    nearest-neighbor remap, re-encode (quality 50); lossy like any
    real JPEG round trip.
    ``fake``: deterministic pseudo-resize — the output payload is the
    input bytes tiled/truncated to exactly ``target_w*target_h`` bytes
    (one byte per output pixel), so output size, schema, and
    determinism are all testable without a codec.
    ``real``: the Pillow resample call site — NotImplementedError.
    """
    if decoder not in ("ppm", "jpeg", "fake", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    out_len = int(target_w) * int(target_h)

    def _resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image resize requires Pillow — not available in "
                    "this environment; plug the resample call here"
                )
            if decoder in ("ppm", "jpeg"):
                if decoder == "jpeg":
                    from my_weather_spark.llm.jpeg import (
                        decode_jpeg as _dec,
                        encode_jpeg as _enc,
                    )
                else:
                    _dec, _enc = decode_ppm, encode_ppm
                # NULL payloads stay NULL (a real resize of nothing is
                # nothing); size fields NULL alongside so consumers can
                # distinguish "resized to WxH" from "never fetched".
                yield pd.DataFrame(
                    {
                        "asset_id": pdf["asset_id"],
                        "payload": [
                            None
                            if b is None
                            else _enc(
                                _nearest_resize(
                                    _dec(b), int(target_w), int(target_h)
                                )
                            )
                            for b in pdf["payload"]
                        ],
                        "width": [
                            None if b is None else int(target_w)
                            for b in pdf["payload"]
                        ],
                        "height": [
                            None if b is None else int(target_h)
                            for b in pdf["payload"]
                        ],
                    }
                )
                continue

            def _fake_resize(b):
                # NULL payloads (never-fetched assets) resize to a zero
                # image rather than crashing the batch.
                b = (bytes(b) if b is not None else b"") or b"\x00"
                reps = -(-out_len // len(b))  # ceil
                return (b * reps)[:out_len]

            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "payload": pdf["payload"].map(_fake_resize),
                    "width": target_w,
                    "height": target_h,
                }
            )

    # Like the sibling manifests, operate on this op's media type only
    # (an audio row's NULL-width meta has no business in a resize pass).
    df = df.where(F.col("media_type") == "image")
    resized = df.select("asset_id", "payload").mapInPandas(
        _resize, schema="asset_id long, payload binary, width int, height int"
    )
    # Rejoin the untouched metadata and overwrite the size fields —
    # the join key is the asset id, both sides partition by it.
    meta_side = df.select("asset_id", "media_type", "meta")
    return resized.join(meta_side, "asset_id").select(
        "asset_id",
        "media_type",
        "payload",
        F.struct(
            F.col("width"),
            F.col("height"),
            F.col("meta.n_channels").alias("n_channels"),
            F.col("meta.sample_rate").alias("sample_rate"),
            F.col("meta.duration_s").alias("duration_s"),
            F.col("meta.codec").alias("codec"),
        ).alias("meta"),
    )


def audio_chunk_manifest(
    df: DataFrame, chunk_s: float = 30.0, target_rate: int = 16000
) -> DataFrame:
    """Audio resample/chunk plan: one row per (asset_id, chunk_idx)
    with the sample range a distributed resample pass would read.
    The codec step (actual PCM resample) is the stubbed part; the
    manifest math — chunk boundaries in source-rate samples and the
    output sample count at ``target_rate`` — is real and exact."""
    dur = F.coalesce(F.col("meta.duration_s"), F.lit(0.0))
    rate = F.coalesce(F.col("meta.sample_rate"), F.lit(target_rate))
    n_chunks = F.greatest(F.ceil(dur / chunk_s), F.lit(1)).cast("int")
    base = df.where(F.col("media_type") == "audio").select(
        "asset_id",
        rate.alias("src_rate"),
        dur.alias("duration_s"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start_s = F.col("chunk_idx") * F.lit(chunk_s)
    end_s = F.least(start_s + F.lit(chunk_s), F.col("duration_s"))
    # round() before the long cast: durations like 30.29 are not
    # binary-exact (30.28999...), and a bare cast TRUNCATES the
    # 4639.9999... product to 4639 instead of 4640 samples.
    return base.select(
        "asset_id",
        "chunk_idx",
        F.round(start_s * F.col("src_rate")).cast("long").alias("src_start_sample"),
        F.round(end_s * F.col("src_rate")).cast("long").alias("src_end_sample"),
        F.round((end_s - start_s) * F.lit(target_rate)).cast("long").alias("out_samples"),
    )


# ---------------------------------------------------------------------------
# WAV (RIFF PCM16) codec — pure numpy, no external library. The audio
# twin of the netpbm tier: real container parse + real resample math,
# with compressed codecs (mp3/opus) stubbed exactly like JPEG above.

def encode_wav(samples, sample_rate: int) -> bytes:
    """int16 array (n,) mono or (n, ch) -> canonical 44-byte-header
    RIFF/WAVE PCM16 bytes."""
    import numpy as np
    import struct

    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.tobytes()  # interleaved little-endian (numpy C-order)
    byte_rate = sample_rate * ch * 2
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVEfmt ",
            struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16),
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def decode_wav(b: bytes):
    """RIFF/WAVE PCM16 bytes -> (sample_rate, int16 array (n, ch)).
    Walks the chunk list (extra chunks like LIST are skipped), PCM16
    only; raises ValueError on anything else."""
    import numpy as np
    import struct

    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (size,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        body = b[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, ch, rate = struct.unpack("<HHI", body[:8])
            (bits,) = struct.unpack("<H", body[14:16])
            if fmt != 1:
                raise ValueError(f"unsupported WAV format code {fmt} (PCM only)")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("missing fmt or data chunk")
    if bits != 16:
        raise ValueError(f"unsupported bit depth {bits} (PCM16 only)")
    a = np.frombuffer(data, dtype="<i2")
    if ch > 1:
        a = a[: len(a) - (len(a) % ch)].reshape(-1, ch)
    else:
        a = a[:, None]
    return int(rate), a


def resample_pcm(samples, src_rate: int, dst_rate: int):
    """Linear-interpolation resample of int16 PCM (n, ch) — the real
    resample arithmetic (np.interp per channel at the output sample
    times), not a stub."""
    import numpy as np

    a = np.asarray(samples)
    if src_rate == dst_rate or a.shape[0] == 0:
        return a.astype(np.int16)
    n_out = max(1, int(round(a.shape[0] * dst_rate / src_rate)))
    t_out = np.arange(n_out) * (src_rate / dst_rate)
    t_src = np.arange(a.shape[0])
    out = np.stack(
        [np.interp(t_out, t_src, a[:, c]) for c in range(a.shape[1])], axis=1
    )
    return np.clip(np.round(out), -32768, 32767).astype(np.int16)


def media_wav_from_documents(
    docs: DataFrame, sample_rate: int = 1000
) -> DataFrame:
    """Audio table whose payloads are REAL mono PCM16 WAVs:
    deterministic samples derived from the document text (utf-8 bytes
    tiled and centered to int16), duration (n_chars % 5) + 1 seconds —
    decodable by any WAV reader."""
    dur = (F.col("n_chars") % 5 + 1).cast("int")
    n_samples = dur * sample_rate
    # byte b -> int16 (b - 128) * 256: JVM-side sample synthesis, then
    # the 44-byte header is prepended per-row in one select
    txt = F.when(F.length("text") == 0, F.lit("x")).otherwise(F.col("text"))
    reps = F.greatest(
        (n_samples / F.greatest(F.length("text"), F.lit(1))).cast("int") + 1,
        F.lit(1),
    )
    tiled = F.substring(F.encode(F.repeat(txt, reps), "utf-8"), 1, n_samples)

    def _wavify(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            payloads = []
            for raw, n in zip(pdf["_tiled"], pdf["_n"]):
                u = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.int16)
                u = np.pad(u, (0, max(0, int(n) - len(u))))[: int(n)]
                payloads.append(encode_wav((u - 128) * 256, sample_rate))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads, "_n": pdf["_n"]}
            )

    base = docs.select(
        F.col("doc_id").alias("asset_id"),
        tiled.alias("_tiled"),
        n_samples.cast("long").alias("_n"),
    )
    wav = base.mapInPandas(
        _wavify, schema="asset_id long, payload binary, _n long"
    )
    return wav.select(
        "asset_id",
        F.lit("audio").alias("media_type"),
        "payload",
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(1).alias("n_channels"),
            F.lit(sample_rate).alias("sample_rate"),
            (F.col("_n") / sample_rate).cast("double").alias("duration_s"),
            F.lit("audio/wav;codec=pcm16").alias("codec"),
        ).alias("meta"),
    )


AUDIO_FEATURES_SCHEMA = (
    "asset_id long, sample_rate int, n_samples long, n_channels int, "
    "duration_s double, rms double, peak int"
)


def decode_audio_features(df: DataFrame, decoder: str = "wav") -> DataFrame:
    """Decode audio payloads -> per-asset features via mapInPandas.

    ``wav``: REAL decode (RIFF PCM16, pure numpy) — rate/duration read
    from the container, RMS/peak over actual samples.
    ``real``: the libsndfile/ffmpeg call site for compressed codecs —
    NotImplementedError here.
    """
    if decoder not in ("wav", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def _decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "compressed audio decode requires libsndfile/ffmpeg — not "
                    "available in this environment; plug the codec call here"
                )
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                if payload is None:
                    # never-fetched asset: NULL-feature row, not a
                    # batch-wide TypeError (same contract as the
                    # image tiers)
                    rows.append(
                        {
                            "asset_id": aid,
                            "sample_rate": None,
                            "n_samples": None,
                            "n_channels": None,
                            "duration_s": None,
                            "rms": None,
                            "peak": None,
                        }
                    )
                    continue
                rate, a = decode_wav(payload)
                x = a.astype(np.float64)
                # full precision (no Python round — banker's rounding
                # flips ties vs SQL HALF_UP; callers F.round if needed).
                # x*x sums are integer-exact in float64 (< 2^53), so
                # rms is bit-reproducible across engines.
                rows.append(
                    {
                        "asset_id": aid,
                        "sample_rate": rate,
                        "n_samples": a.shape[0],
                        "n_channels": a.shape[1],
                        "duration_s": a.shape[0] / rate,
                        "rms": float(np.sqrt(np.mean(x * x))) if a.size else 0.0,
                        "peak": int(np.max(np.abs(x))) if a.size else 0,
                    }
                )
            yield pd.DataFrame(rows)

    return df.where(F.col("media_type") == "audio").select(
        "asset_id", "payload"
    ).mapInPandas(_decode, schema=AUDIO_FEATURES_SCHEMA)


def resample_audio(
    df: DataFrame, target_rate: int, decoder: str = "wav"
) -> DataFrame:
    """Resample pass: WAV payload -> WAV payload at ``target_rate`` as
    an Arrow-batched narrow map (no shuffle) — real linear-interp
    resample for PCM16, the compressed-codec call site stubbed."""
    if decoder not in ("wav", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def _resample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "compressed audio resample requires ffmpeg — not available "
                    "in this environment; plug the codec call here"
                )
            payloads = []
            for b in pdf["payload"]:
                if b is None:
                    # NULL payload resamples to NULL (see decode tiers)
                    payloads.append(None)
                    continue
                rate, a = decode_wav(b)
                payloads.append(
                    encode_wav(resample_pcm(a, rate, target_rate), target_rate)
                )
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads}
            )

    resampled = df.where(F.col("media_type") == "audio").select(
        "asset_id", "payload"
    ).mapInPandas(_resample, schema="asset_id long, payload binary")
    meta_side = df.where(F.col("media_type") == "audio").select(
        "asset_id", "media_type", "meta"
    )
    return resampled.join(meta_side, "asset_id").select(
        "asset_id",
        "media_type",
        "payload",
        F.struct(
            F.col("meta.width").alias("width"),
            F.col("meta.height").alias("height"),
            F.col("meta.n_channels").alias("n_channels"),
            F.lit(target_rate).alias("sample_rate"),
            F.col("meta.duration_s").alias("duration_s"),
            F.col("meta.codec").alias("codec"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# Raw video container: concatenated P6 frames ("video/x-ppm-seq") —
# the video twin of the netpbm/WAV tiers. Frame extraction against it
# is REAL (per-frame parse + pixel features); compressed video keeps
# the ffmpeg stub in decoder='real'.

def media_ppm_video_from_documents(
    docs: DataFrame, width: int = 8, height: int = 8, fps: int = 2
) -> DataFrame:
    """Video table whose payloads are REAL frame sequences:
    (n_chars % 8) + 2 concatenated P6 frames per document, each frame's
    pixels tiled from the text bytes at a per-frame offset (so frames
    differ deterministically)."""

    def _build(batches):
        import numpy as np
        import pandas as pd

        px = width * height * 3
        for pdf in batches:
            payloads, durs = [], []
            for text in pdf["text"]:
                raw = (text or "x").encode("utf-8") or b"x"
                n_frames = (len(text or "") % 8) + 2
                u = np.frombuffer(raw, dtype=np.uint8)
                tiled = np.tile(u, -(-(px + n_frames) // len(u)) + 1)
                frames = [
                    encode_ppm(tiled[i : i + px].reshape(height, width, 3))
                    for i in range(n_frames)
                ]
                payloads.append(b"".join(frames))
                durs.append(n_frames / fps)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"],
                    "payload": payloads,
                    "duration_s": durs,
                }
            )

    built = docs.select("doc_id", "text").mapInPandas(
        _build, schema="asset_id long, payload binary, duration_s double"
    )
    return built.select(
        "asset_id",
        F.lit("video").alias("media_type"),
        "payload",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.lit(3).alias("n_channels"),
            F.lit(fps).alias("sample_rate"),  # frames/s for raw video
            F.col("duration_s").alias("duration_s"),
            F.lit("video/x-ppm-seq").alias("codec"),
        ).alias("meta"),
    )


FRAME_FEATURES_SCHEMA = (
    "asset_id long, frame_idx int, frame_ts_s double, width int, "
    "height int, mean_intensity double"
)


def extract_frame_features(
    df: DataFrame, every_n_seconds: float = 1.0, decoder: str = "ppmv"
) -> DataFrame:
    """Sample frames per the frame_sample_manifest plan and decode the
    SAMPLED frames to pixel features — the distributed frame-extraction
    pass the manifest exists for.

    Scale shape: the manifest's rows collapse to ONE row per asset
    (collect_list of sampled indices — bounded by duration/every_n),
    join the payload table once on asset_id, decode each payload once
    in a narrow Arrow map, and emit one row per sampled frame. The
    payload is never replicated per frame and never shuffles twice.

    ``ppmv``: REAL extraction from the concatenated-P6 container.
    ``real``: the ffmpeg/pyav call site — NotImplementedError.
    """
    if decoder not in ("ppmv", "real"):
        raise ValueError(f"unknown decoder {decoder!r}")
    manifest = frame_sample_manifest(df, every_n_seconds)
    wanted = manifest.groupBy("asset_id").agg(
        F.collect_list(F.struct("frame_idx", "frame_ts_s")).alias("_frames")
    )
    vids = df.where(F.col("media_type") == "video").select(
        "asset_id", "payload", F.col("meta.sample_rate").alias("_fps")
    )
    joined = vids.join(wanted, "asset_id")

    def _extract(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "compressed video frame extraction requires ffmpeg/pyav — "
                    "not available in this environment; plug the codec here"
                )
            rows = []
            for aid, payload, fps, frames in zip(
                pdf["asset_id"], pdf["payload"], pdf["_fps"], pdf["_frames"]
            ):
                if payload is None:
                    # never-fetched asset: one NULL-feature row per
                    # sampled frame keeps the manifest contract (one
                    # row per planned frame) without crashing the batch
                    for fr in frames:
                        rows.append(
                            {
                                "asset_id": aid,
                                "frame_idx": int(fr["frame_idx"]),
                                "frame_ts_s": float(fr["frame_ts_s"]),
                                "width": None,
                                "height": None,
                                "mean_intensity": None,
                            }
                        )
                    continue
                arrs = split_ppm_frames(payload)
                for fr in frames:
                    # sampled timestamp -> source frame at the
                    # container's frame rate, clamped to the last frame
                    src = min(int(float(fr["frame_ts_s"]) * fps), len(arrs) - 1)
                    a = arrs[src]
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_idx": int(fr["frame_idx"]),
                            "frame_ts_s": float(fr["frame_ts_s"]),
                            "width": a.shape[1],
                            "height": a.shape[0],
                            "mean_intensity": round(float(np.mean(a)), 6),
                        }
                    )
            yield pd.DataFrame(rows, columns=[
                "asset_id", "frame_idx", "frame_ts_s", "width", "height",
                "mean_intensity",
            ])

    return joined.mapInPandas(_extract, schema=FRAME_FEATURES_SCHEMA)
