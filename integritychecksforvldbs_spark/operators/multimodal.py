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

**Decoding**: P6/PPM images decode for REAL (pure numpy — header
parse, pixel array, channel/luminance statistics; corruption raises).
Other formats need media libraries this container doesn't have, so
``decode=\"fake\"`` (the default) derives deterministic pseudo-
features from payload bytes and ``decode=\"real\"`` raises
``NotImplementedError`` for them unless PIL is importable.  Swapping
in a fuller decoder changes ONE function (``_decode_payload``) —
partitioning, batch shapes, schemas, and the UDF signature are
production-shaped.
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


def _ppm_features(payload: bytes, feature_dim: int):
    """Real image features from a decoded P6 payload: normalized
    dimensions, per-channel means, luminance std, and a 10-bin
    luminance histogram — 16 floats, deterministic."""
    import numpy as np

    w, h, px = decode_ppm(payload)
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


def _decode_payload(payload: bytes, modality: str, decode: str):
    """Decode boundary.  ``decode='real'`` decodes P6/PPM images with
    the pure-numpy decoder above (no media library needed); other
    formats still need PIL/torchaudio/pyav — not in this container —
    and raise ``NotImplementedError``.  ``decode='fake'`` produces a
    deterministic pseudo-decode from the bytes so the full pipeline
    is exercisable on arbitrary payloads."""
    if decode == "real":
        if payload.startswith(b"P6"):
            return ("ppm", payload)
        try:
            from PIL import Image  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real decoding beyond P6/PPM requires PIL/torchaudio/"
                "pyav, which are not installed in this environment; "
                "use decode='fake', P6 payloads, or install a decoder"
            ) from exc
        raise NotImplementedError("real decode path not implemented yet")
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
                if isinstance(sig, tuple) and sig[0] == "ppm":
                    feats.append(
                        [float(x) for x in _ppm_features(sig[1], feature_dim)]
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
