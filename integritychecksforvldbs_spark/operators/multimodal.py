"""Multimodal (image/audio/video) column plumbing.

Media travel through the engine as **opaque binary columns with typed
metadata** — the schema a 100 TB multimodal training-data lake uses:

    media_id BIGINT, modality STRING, payload BINARY,
    meta STRUCT<width INT, height INT, sample_rate INT,
                n_frames INT, format STRING>

Spark-side mechanics are real and tested: Arrow-batched
``mapInPandas`` for decode/feature-extract (the one place Python may
touch payload bytes), metadata-only operators as pure JVM expressions
(frame sampling, byte stats), and stable output schemas.

**Decoding**: P6/PPM and PNG images AND RIFF/WAV PCM audio decode for
REAL (pure numpy + stdlib zlib/wave — header parse, CRC verification,
filter reconstruction, pixel/sample arrays, channel/luminance or
RMS/zero-crossing statistics; corruption raises ValueError).  Other
image formats decode through PIL when it is importable; without it —
and for compressed audio / video, which need torchaudio/pyav —
``decode=\"real\"`` raises a documented ``ValueError``, which IS the
API contract for an unavailable decoder.
``decode=\"fake\"`` (the default) derives deterministic pseudo-
features from payload bytes so the full pipeline is exercisable on
arbitrary payloads.  Swapping in a fuller decoder changes ONE
function (``_decode_payload``) — partitioning, batch shapes, schemas,
and the UDF signature are production-shaped.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

MODALITIES = ("image", "audio", "video")


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the ``documents``
    fixture: payload = utf-8 bytes of the text, modality round-robins
    by id, metadata synthesized from byte length.  Stands in for a
    real ingest (S3 blobs / tar shards) with identical schema."""
    n = F.expr("octet_length(CAST(text AS BINARY))")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(F.array(*[F.lit(m) for m in MODALITIES]), (F.col("doc_id") % 3 + 1).cast("int")).alias(
            "modality"
        ),
        F.col("text").cast("binary").alias("payload"),
        F.struct(
            (n % 640 + 16).cast("int").alias("width"),
            (n % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (n % 100 + 1).cast("int").alias("n_frames"),
            F.lit("fake/v1").alias("format"),
        ).alias("meta"),
    )


# ---------------------------------------------------------------------------
# byte-level stats (no decode — pure JVM, oracle-checkable)
# ---------------------------------------------------------------------------

def binary_stats(media: DataFrame) -> DataFrame:
    """Per-blob integrity stats: byte length + md5 — the CHECKALLOC
    analogue for opaque payload columns."""
    return media.select(
        "media_id",
        "modality",
        F.expr("CAST(octet_length(payload) AS BIGINT)").alias("n_bytes"),
        F.md5("payload").alias("payload_md5"),
    )


def binary_stats_oracle(table: str = "documents") -> str:
    """Oracle over documents (payload := encode(text))."""
    return f"""
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  md5(text) AS payload_md5
FROM {table}
"""


# ---------------------------------------------------------------------------
# decode + feature extraction (Arrow-batched mapInPandas)
# ---------------------------------------------------------------------------

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def encode_ppm(pixels) -> bytes:
    """Serialize an (h, w, 3) uint8 array as a binary PPM (P6) payload
    — the self-contained image format the real decode path handles
    without any media library.  Test/fixture utility."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_ppm(payload: bytes):
    """Pure-numpy P6/PPM decoder: returns (width, height, pixels) with
    pixels an (h, w, 3) uint8 array.  Handles comment lines and any
    header whitespace per the netpbm spec; raises ValueError on
    malformed or truncated payloads (the corruption the blob-integrity
    kernel wants surfaced, not masked)."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 ppm payload")
    # header tokens: magic, width, height, maxval; '#' starts a comment
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        if i >= len(payload):
            raise ValueError("truncated ppm header")
        ch = payload[i : i + 1]
        if ch == b"#":
            i = payload.index(b"\n", i) + 1
        elif ch.isspace():
            i += 1
        else:
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            tokens.append(payload[i:j])
            i = j
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    i += 1  # the single whitespace after maxval
    raw = payload[i : i + w * h * 3]
    if len(raw) != w * h * 3:
        raise ValueError(
            f"truncated ppm body: {len(raw)} bytes for {w}x{h}x3"
        )
    return w, h, np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(pixels) -> bytes:
    """Serialize an (h, w, 3) uint8 array as an 8-bit RGB PNG
    (filter 0 scanlines, zlib-compressed, CRC-stamped chunks) — pure
    stdlib.  Test/fixture utility, the PNG twin of :func:`encode_ppm`."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    h, w, c = a.shape
    assert c == 3

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)  # 8-bit RGB
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """Pure-stdlib PNG decoder: returns (width, height, pixels) with
    pixels an (h, w, 3) uint8 RGB array.

    Supports the formats a training-data lake actually stores at rest:
    8-bit gray / RGB / palette / gray+alpha / RGBA, non-interlaced
    (alpha is dropped, gray and palette expand to RGB).  Every chunk
    CRC is verified and structural damage raises ValueError — exactly
    the corruption surface the blob-integrity kernels want raised, not
    masked.  16-bit depth and Adam7 interlace raise ValueError with
    the unsupported feature named."""
    import struct
    import zlib

    import numpy as np

    if not payload.startswith(PNG_SIG):
        raise ValueError("not a png payload")
    pos, ihdr, idat, plte = len(PNG_SIG), None, [], None
    saw_iend = False
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        crc_bytes = payload[pos + 8 + length : pos + 12 + length]
        if len(data) != length or len(crc_bytes) != 4:
            raise ValueError("truncated png chunk")
        (crc,) = struct.unpack(">I", crc_bytes)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"png chunk crc mismatch in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if not saw_iend:
        # a clipped tail passes every per-chunk CRC — only the missing
        # terminator betrays it (truncation is exactly what the blob-
        # integrity kernels exist to catch)
        raise ValueError("truncated png chunk stream: missing IEND")
    if ihdr is None or not idat:
        raise ValueError("png missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported png bit depth {depth}")
    if interlace != 0:
        raise ValueError("unsupported png interlacing (Adam7)")
    if comp != 0 or filt != 0:
        raise ValueError("nonstandard png compression/filter method")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"unsupported png color type {ctype}")
    if ctype == 3 and plte is None:
        raise ValueError("palette png missing PLTE")
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt png pixel stream: {exc}") from exc
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"png pixel stream is {len(raw)} bytes, want {h * (stride + 1)}"
        )
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + int(prev[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown png filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    px = out.reshape(h, w, channels)
    if ctype == 2:
        rgb = px
    elif ctype == 6:
        rgb = px[:, :, :3]
    elif ctype == 0:
        rgb = np.repeat(px, 3, axis=2)
    elif ctype == 4:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    else:  # palette
        if int(px.max()) >= len(plte):
            raise ValueError("png palette index out of range")
        rgb = plte[px[:, :, 0]]
    return w, h, np.ascontiguousarray(rgb)


def encode_wav(samples, sample_rate: int = 16000) -> bytes:
    """Serialize int16 mono samples as a RIFF/WAVE PCM payload via
    stdlib ``wave`` — the self-contained audio format the real decode
    path handles without torchaudio.  Test/fixture utility."""
    import io
    import wave

    import numpy as np

    a = np.asarray(samples, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(a.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes):
    """Stdlib WAV/PCM decoder: returns (sample_rate, samples) with
    samples a float64 array in [-1, 1] (multi-channel input is
    down-mixed by mean).  8/16/32-bit integer PCM; raises ValueError
    on malformed, truncated, or compressed payloads — corruption
    surfaces, never masks."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch = wf.getnchannels()
            width = wf.getsampwidth()
            sr = wf.getframerate()
            n = wf.getnframes()
            raw = wf.readframes(n)
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"malformed wav payload: {exc}") from exc
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(width)
    if dtype is None:
        raise ValueError(f"unsupported wav sample width {width}")
    if len(raw) < n * nch * width:
        raise ValueError(
            f"truncated wav body: {len(raw)} bytes for "
            f"{n} frames x {nch} ch x {width} B"
        )
    a = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if width == 1:
        a = (a - 128.0) / 128.0  # 8-bit PCM is unsigned
    else:
        a = a / float(2 ** (8 * width - 1))
    if nch > 1:
        a = a.reshape(-1, nch).mean(axis=1)
    return sr, a


def _audio_features(sr: int, samples, feature_dim: int):
    """Audio features from decoded PCM: duration, RMS, zero-crossing
    rate, peak, and a 12-slice energy profile — 16 floats,
    deterministic, decoder-agnostic (same samples → same features
    regardless of container; test-pinned)."""
    import numpy as np

    a = np.asarray(samples, dtype=np.float64)
    if a.size == 0:
        return [0.0] * feature_dim
    zc = float(np.mean(np.abs(np.diff(np.signbit(a).astype(np.int8)))))
    n_slices = 12
    bounds = np.linspace(0, a.size, n_slices + 1).astype(np.int64)
    profile = [
        float(np.sqrt(np.mean(a[s:e] ** 2))) if e > s else 0.0
        for s, e in zip(bounds[:-1], bounds[1:])
    ]
    feats = [
        min(a.size / sr / 3600.0, 1.0) if sr else 0.0,  # duration vs 1h
        float(np.sqrt(np.mean(a ** 2))),
        zc,
        float(np.max(np.abs(a))),
    ] + profile
    return feats[:feature_dim] + [0.0] * max(0, feature_dim - len(feats))


def _image_features(w: int, h: int, px, feature_dim: int):
    """Image features from decoded RGB pixels: normalized dimensions,
    per-channel means, luminance std, and a 10-bin luminance
    histogram — 16 floats, deterministic, decoder-agnostic (the same
    pixels give the same features whether they arrived as PPM or
    PNG; test-pinned)."""
    import numpy as np

    f = px.astype(np.float64)
    lum = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    hist, _ = np.histogram(lum, bins=10, range=(0.0, 255.0001))
    feats = [
        min(w / 4096.0, 1.0),
        min(h / 4096.0, 1.0),
        float(f[:, :, 0].mean()) / 255.0,
        float(f[:, :, 1].mean()) / 255.0,
        float(f[:, :, 2].mean()) / 255.0,
        float(lum.std()) / 255.0,
    ] + (hist / lum.size).tolist()
    return feats[:feature_dim] + [0.0] * max(0, feature_dim - len(feats))


def _ppm_features(payload: bytes, feature_dim: int):
    """Features from a P6 payload (kept as the named entry point the
    round-4/5 tests pin)."""
    return _image_features(*decode_ppm(payload), feature_dim)


def _decode_payload(payload: bytes, modality: str, decode: str):
    """Decode boundary — the ONE function a fuller decoder replaces.

    ``decode='real'`` decodes P6/PPM and PNG images and RIFF/WAV PCM
    audio with the pure-stdlib decoders above (no media library
    needed); any other format decodes through PIL when it is
    importable, and otherwise raises ``ValueError`` — that raise IS
    the documented contract of ``decode='real'`` on a format without
    an available decoder (compressed audio / video need
    torchaudio/pyav regardless).  ``decode='fake'`` (the
    default) produces a deterministic pseudo-decode from the bytes so
    the full pipeline is exercisable on arbitrary payloads."""
    if decode == "real":
        if payload.startswith(b"P6"):
            return ("image", decode_ppm(payload))
        if payload.startswith(PNG_SIG):
            return ("image", decode_png(payload))
        if payload.startswith(b"RIFF") and payload[8:12] == b"WAVE":
            return ("audio", decode_wav(payload))
        try:
            from PIL import Image
        except ImportError as exc:
            raise ValueError(
                "decode='real' has no decoder for this payload format: "
                "P6/PPM, PNG, and WAV decode natively; anything else "
                "needs PIL (images) or torchaudio/pyav (compressed "
                "audio/video), none of which are installed — use "
                "decode='fake' or install a decoder"
            ) from exc
        import io

        import numpy as np

        try:
            img = Image.open(io.BytesIO(payload)).convert("RGB")
        except Exception as exc:
            # PIL raises UnidentifiedImageError (an OSError) on
            # non-image payloads; the decode='real' contract is ONE
            # exception type for "no decoder for this format"
            raise ValueError(
                "decode='real' has no decoder for this payload format: "
                f"PIL could not identify it ({exc})"
            ) from exc
        px = np.asarray(img, dtype=np.uint8)
        return ("image", (img.width, img.height, px))
    # deterministic fake: 16 bytes of md5 as the "decoded signal"
    return hashlib.md5(payload or b"").digest()


def extract_features(
    media: DataFrame, decode: str = "fake", feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """Feature vector per blob via Arrow-batched ``mapInPandas``.

    The UDF sees an iterator of pandas batches (one Spark task per
    input partition — payload bytes never pass through the driver) and
    yields frames conforming to FEATURES_SCHEMA.  Fake features are
    the md5-digest bytes scaled to [0,1] — deterministic, so results
    are invariant to partitioning/batch size (tested).
    """

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                sig = _decode_payload(
                    bytes(payload) if payload is not None else b"", modality, decode
                )
                if isinstance(sig, tuple) and sig[0] == "image":
                    w, h, px = sig[1]
                    feats.append(
                        [float(x) for x in _image_features(w, h, px, feature_dim)]
                    )
                elif isinstance(sig, tuple) and sig[0] == "audio":
                    sr, samples = sig[1]
                    feats.append(
                        [float(x)
                         for x in _audio_features(sr, samples, feature_dim)]
                    )
                else:
                    raw = (sig * ((feature_dim // len(sig)) + 1))[:feature_dim]
                    feats.append([float(b) / 255.0 for b in raw])
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": [
                        len(bytes(p)) if p is not None else 0 for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)


def features_gate(
    media: DataFrame, decode: str = "fake", feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """Scalar-only projection of :func:`extract_features` for the
    correctness gate: the float feature vector is re-encoded as the
    comma-joined integer byte string it was derived from (exact — no
    float formatting in the compared output).  The mapInPandas path is
    still fully exercised; only the final projection changes."""
    feats = extract_features(media, decode=decode, feature_dim=feature_dim)
    return feats.select(
        "media_id",
        "modality",
        "n_bytes",
        F.expr(
            "concat_ws(',', transform(feature, x -> CAST(round(x * 255) AS INT)))"
        ).alias("feature_bytes"),
    )


def features_oracle(table: str = "documents", feature_dim: int = FEATURE_DIM) -> str:
    """DuckDB oracle for the fake-decode feature pipeline: feature byte
    i is md5-digest byte ``i % 16`` of the payload (the digest repeats
    when feature_dim > 16), i.e. hex pair ``(i % 16)`` of md5(text)."""
    byte_exprs = ", ".join(
        f"CAST('0x' || substr(md5(text), {2 * (i % 16) + 1}, 2) AS BIGINT)"
        for i in range(feature_dim)
    )
    return f"""
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
  concat_ws(',', {byte_exprs}) AS feature_bytes
FROM {table}
"""


# ---------------------------------------------------------------------------
# frame sampling (metadata-only — pure JVM)
# ---------------------------------------------------------------------------

def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan for video rows: one output row per kept
    frame index (0, n, 2n, …) — pure metadata expansion; the actual
    frame decode would happen downstream at the stub boundary.
    JVM-side ``sequence``/``explode``; no payload bytes move."""
    return (
        media.filter(F.col("modality") == "video")
        .select(
            "media_id",
            F.explode(
                F.expr(f"sequence(0, meta.n_frames - 1, {every_n})")
            ).alias("frame_idx"),
        )
        .withColumn("frame_idx", F.col("frame_idx").cast("long"))
    )


def sample_frames_oracle(table: str = "documents", every_n: int = 10) -> str:
    """Oracle mirroring media_from_documents' synthesized metadata."""
    return f"""
SELECT doc_id AS media_id,
       unnest(range(0, CAST(octet_length(encode(text)) % 100 + 1 AS BIGINT), {every_n})) AS frame_idx
FROM {table}
WHERE CAST(doc_id % 3 AS INT) = 2
"""
