"""Multimodal plumbing: schema stability, partitioning invariance of
the mapInPandas path, stub boundary behavior, frame-sampling plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from integritychecksforvldbs_spark.operators import multimodal as MM
from integritychecksforvldbs_spark.sources.loader import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, f"{SF_DIR}/documents.parquet")
    return MM.media_from_documents(docs).cache()


def test_media_schema(media):
    # structural equality (nullability flags differ between derived
    # and declared schemas and don't matter for the contract)
    assert media.schema.simpleString() == MM.MEDIA_SCHEMA.simpleString()
    mods = {r["modality"] for r in media.select("modality").distinct().collect()}
    assert mods == set(MM.MODALITIES)


def test_payload_roundtrip(media, spark):
    docs = load_table(spark, f"{SF_DIR}/documents.parquet")
    joined = media.join(docs, media.media_id == docs.doc_id).select(
        "media_id", "payload", "text"
    )
    bad = joined.filter(
        F.col("payload").cast("string") != F.col("text")
    ).count()
    assert bad == 0


def test_extract_features_schema_and_values(media):
    out = MM.extract_features(media)
    assert out.schema.simpleString() == MM.FEATURES_SCHEMA.simpleString()
    rows = out.orderBy("media_id").limit(3).collect()
    for r in rows:
        assert len(r["feature"]) == MM.FEATURE_DIM
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_extract_features_partitioning_invariant(media):
    """Fake decode is per-row deterministic → results must not depend
    on partition layout or Arrow batch size."""
    a = {
        r["media_id"]: tuple(r["feature"])
        for r in MM.extract_features(media.repartition(1)).collect()
    }
    b = {
        r["media_id"]: tuple(r["feature"])
        for r in MM.extract_features(media.repartition(13)).collect()
    }
    assert a == b


def test_fake_features_match_python(media):
    row = media.filter(F.col("media_id") == 0).collect()[0]
    got = (
        MM.extract_features(media.filter(F.col("media_id") == 0))
        .collect()[0]["feature"]
    )
    sig = hashlib.md5(bytes(row["payload"])).digest()
    expect = [float(b) / 255.0 for b in sig[: MM.FEATURE_DIM]]
    assert [round(x, 6) for x in got] == [round(x, 6) for x in expect]


def test_real_decode_raises_without_libs(media):
    """decode='real' on a format with no available decoder raises the
    DOCUMENTED ValueError naming the contract (the media fixture's
    payloads are utf-8 text — neither P6 nor PNG)."""
    with pytest.raises(Exception) as exc_info:
        MM.extract_features(media.limit(1), decode="real").collect()
    assert "no decoder for this payload format" in str(exc_info.value)


def test_sample_frames_counts(media):
    out = MM.sample_frames(media, every_n=10)
    # only video rows contribute
    videos = media.filter(F.col("modality") == "video")
    expect = sum(
        (r["meta"]["n_frames"] + 9) // 10 for r in videos.select("meta").collect()
    )
    assert out.count() == expect
    # every frame_idx is a multiple of 10 and within bounds
    joined = out.join(videos, "media_id")
    assert joined.filter("frame_idx % 10 != 0").count() == 0
    assert joined.filter("frame_idx >= meta.n_frames").count() == 0


def test_binary_stats_md5(media, spark):
    docs = load_table(spark, f"{SF_DIR}/documents.parquet")
    got = MM.binary_stats(media).filter(F.col("media_id") == 1).collect()[0]
    txt = docs.filter("doc_id = 1").collect()[0]["text"]
    assert got["payload_md5"] == hashlib.md5(txt.encode()).hexdigest()
    assert got["n_bytes"] == len(txt.encode())


# ---------------------------------------------------------------------------
# real P6/PPM decode path (pure numpy, no media library)
# ---------------------------------------------------------------------------


def test_ppm_roundtrip_and_header_variants():
    import numpy as np

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = MM.encode_ppm(px)
    w, h, back = MM.decode_ppm(payload)
    assert (w, h) == (3, 2)
    assert (back == px).all()
    # comments and arbitrary whitespace in the header are legal netpbm
    commented = b"P6\n# a comment\n 3\t2 # trailing\n255\n" + px.tobytes()
    w2, h2, back2 = MM.decode_ppm(commented)
    assert (w2, h2) == (3, 2) and (back2 == px).all()


def test_ppm_corruption_raises():
    import numpy as np

    import pytest as _pytest

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = MM.encode_ppm(px)
    with _pytest.raises(ValueError, match="truncated ppm body"):
        MM.decode_ppm(payload[:-5])
    with _pytest.raises(ValueError, match="not a P6"):
        MM.decode_ppm(b"JFIF....")
    with _pytest.raises(ValueError, match="unsupported maxval"):
        MM.decode_ppm(b"P6\n2 2\n65535\n" + b"\0" * 24)


def test_real_decode_features_on_ppm(spark):
    """decode='real' extracts true image statistics from P6 payloads
    distributed through the Arrow mapInPandas path."""
    import numpy as np

    red = np.zeros((8, 8, 3), dtype=np.uint8)
    red[:, :, 0] = 255
    grey = np.full((4, 16, 3), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (1, "image", bytearray(MM.encode_ppm(red)), (8, 8, None, None, "ppm")),
            (2, "image", bytearray(MM.encode_ppm(grey)), (16, 4, None, None, "ppm")),
        ],
        MM.MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in MM.extract_features(media, decode="real").collect()}
    f1 = out[1]["feature"]
    # red image: mean_r=1.0, mean_g=mean_b=0
    assert abs(f1[2] - 1.0) < 1e-6 and f1[3] == 0.0 and f1[4] == 0.0
    f2 = out[2]["feature"]
    # uniform grey: all channel means 128/255, zero luminance std
    assert abs(f2[2] - 128 / 255) < 1e-6
    assert f2[5] == 0.0
    # dims normalized
    assert abs(f1[0] - 8 / 4096) < 1e-9 and abs(f2[0] - 16 / 4096) < 1e-9


def test_real_decode_undecodable_format_raises(spark):
    media = spark.createDataFrame(
        [(1, "audio", bytearray(b"RIFF...."), (None, None, 44100, None, "wav"))],
        MM.MEDIA_SCHEMA,
    )
    import pytest as _pytest

    with _pytest.raises(Exception) as exc_info:  # ValueError inside the UDF
        MM.extract_features(media, decode="real").collect()
    assert "no decoder for this payload format" in str(exc_info.value)


# ---------------------------------------------------------------------------
# real PNG decode path (pure stdlib zlib, no media library)
# ---------------------------------------------------------------------------


def _gradient(h, w):
    import numpy as np

    return (
        np.arange(h * w * 3, dtype=np.int64).reshape(h, w, 3) * 7 % 256
    ).astype(np.uint8)


def test_png_roundtrip():
    px = _gradient(5, 9)
    w, h, back = MM.decode_png(MM.encode_png(px))
    assert (w, h) == (9, 5)
    import numpy as np

    assert np.array_equal(back, px)


def test_png_and_ppm_same_pixels_same_features():
    """The feature extractor is decoder-agnostic: identical pixels via
    PNG and PPM produce identical features."""
    px = _gradient(6, 4)
    f_ppm = MM._ppm_features(MM.encode_ppm(px), MM.FEATURE_DIM)
    f_png = MM._image_features(*MM.decode_png(MM.encode_png(px)), MM.FEATURE_DIM)
    assert f_ppm == f_png


def test_png_all_filter_types_decode():
    """Hand-built scanlines exercise filters 1–4 (our encoder only
    emits 0): decoded values must match the spec's reconstruction."""
    import struct
    import zlib

    import numpy as np

    w, h = 3, 5
    # raw filtered stream: one filter byte per row + w*3 bytes
    rows = [
        (0, bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])),
        (1, bytes([5, 5, 5, 10, 10, 10, 10, 10, 10])),  # Sub
        (2, bytes([1, 1, 1, 2, 2, 2, 3, 3, 3])),  # Up
        (3, bytes([4, 4, 4, 4, 4, 4, 4, 4, 4])),  # Average
        (4, bytes([9, 9, 9, 1, 1, 1, 2, 2, 2])),  # Paeth
    ]
    raw = b"".join(bytes([f]) + d for f, d in rows)

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    payload = (
        MM.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    _, _, px = MM.decode_png(payload)
    # reference reconstruction (independent straightforward impl)
    out = np.zeros((h, w * 3), dtype=np.int32)
    prev = np.zeros(w * 3, dtype=np.int32)
    for y, (f, d) in enumerate(rows):
        line = np.frombuffer(d, dtype=np.uint8).astype(np.int32)
        cur = line.copy()
        for i in range(w * 3):
            a = cur[i - 3] if i >= 3 else 0
            b = prev[i]
            c = prev[i - 3] if i >= 3 else 0
            if f == 1:
                cur[i] = (cur[i] + a) & 0xFF
            elif f == 2:
                cur[i] = (cur[i] + b) & 0xFF
            elif f == 3:
                cur[i] = (cur[i] + ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        out[y] = cur
        prev = cur
    assert np.array_equal(px.reshape(h, w * 3), out.astype(np.uint8))


def test_png_grayscale_palette_alpha_expand_to_rgb():
    import struct
    import zlib

    import numpy as np

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    # 2x1 grayscale
    g = (
        MM.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x07\xff"))
        + chunk(b"IEND", b"")
    )
    _, _, px = MM.decode_png(g)
    assert px.tolist() == [[[7, 7, 7], [255, 255, 255]]]
    # 2x1 palette
    p = (
        MM.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", bytes([1, 2, 3, 9, 8, 7]))
        + chunk(b"IDAT", zlib.compress(b"\x00\x01\x00"))
        + chunk(b"IEND", b"")
    )
    _, _, px = MM.decode_png(p)
    assert px.tolist() == [[[9, 8, 7], [1, 2, 3]]]
    # 1x1 RGBA: alpha dropped
    r = (
        MM.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00\x10\x20\x30\x80"))
        + chunk(b"IEND", b"")
    )
    _, _, px = MM.decode_png(r)
    assert px.tolist() == [[[16, 32, 48]]]


def test_png_corruption_raises():
    px = _gradient(4, 4)
    payload = MM.encode_png(px)
    with pytest.raises(ValueError, match="crc mismatch"):
        # flip a byte inside IDAT (past sig+IHDR chunk = 8+25 bytes)
        bad = bytearray(payload)
        bad[45] ^= 0xFF
        MM.decode_png(bytes(bad))
    with pytest.raises(ValueError, match="truncated png"):
        MM.decode_png(payload[:-6])  # clipped IEND
    with pytest.raises(ValueError, match="truncated png"):
        MM.decode_png(payload[:-20])  # torn mid-chunk
    with pytest.raises(ValueError, match="not a png"):
        MM.decode_png(b"JFIF....")
    import struct
    import zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    deep = (
        MM.PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"\x00" + b"\x00" * 6))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        MM.decode_png(deep)


def test_real_decode_features_on_png(spark):
    """decode='real' extracts true image statistics from PNG payloads
    end-to-end through the Arrow mapInPandas path."""
    import numpy as np

    grey = np.full((16, 16, 3), 128, dtype=np.uint8)
    media = spark.createDataFrame(
        [
            (
                1,
                "image",
                bytearray(MM.encode_png(grey)),
                (16, 16, None, None, "png"),
            )
        ],
        MM.MEDIA_SCHEMA,
    )
    row = MM.extract_features(media, decode="real").collect()[0]
    f = row["feature"]
    assert abs(f[2] - 128 / 255) < 1e-6  # channel mean
    assert f[5] == 0.0  # zero luminance std on a uniform image


def test_wav_roundtrip_and_downmix():
    import numpy as np

    sr = 8000
    t = np.arange(sr)  # 1 second
    sine = (np.sin(2 * np.pi * 440 * t / sr) * 20000).astype(np.int16)
    got_sr, samples = MM.decode_wav(MM.encode_wav(sine, sr))
    assert got_sr == sr
    assert samples.shape == (sr,)
    assert np.allclose(samples, sine / 32768.0, atol=1e-9)
    # stereo payload down-mixes by mean
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        inter = np.empty(2 * sr, dtype=np.int16)
        inter[0::2] = sine
        inter[1::2] = -sine
        wf.writeframes(inter.tobytes())
    _, mixed = MM.decode_wav(buf.getvalue())
    assert np.allclose(mixed, 0.0, atol=1e-4)


def test_wav_corruption_raises():
    import numpy as np
    import pytest

    good = MM.encode_wav(np.zeros(100, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        MM.decode_wav(good[:30])  # truncated header
    with pytest.raises(ValueError):
        MM.decode_wav(b"RIFF1234WAVEgarbage")


def test_real_decode_features_on_wav(spark):
    """decode='real' extracts true audio statistics from WAV payloads
    end-to-end through the Arrow mapInPandas path."""
    import numpy as np

    sr = 8000
    t = np.arange(sr // 2)  # half a second
    amp = 16384  # half full-scale
    sine = (np.sin(2 * np.pi * 100 * t / sr) * amp).astype(np.int16)
    media = spark.createDataFrame(
        [
            (
                1,
                "audio",
                bytearray(MM.encode_wav(sine, sr)),
                (None, None, sr, len(sine), "wav"),
            )
        ],
        MM.MEDIA_SCHEMA,
    )
    row = MM.extract_features(media, decode="real").collect()[0]
    f = row["feature"]
    # RMS of a half-scale sine is 0.5/sqrt(2)
    assert abs(f[1] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(f[3] - 0.5) < 1e-3  # peak
    assert f[1] > 0 and all(x > 0 for x in f[4:16])  # energy profile
