"""Multimodal column plumbing: schema contract, Arrow batch shape,
frame-sampling fan-out, stubbed decode behavior."""

import os

import pytest
from pyspark.sql import functions as F

from age_spark.pipeline.multimodal import (
    FEATURE_DIM,
    attach_fake_audio,
    attach_fake_media,
    extract_features,
    frame_sample_plan,
    resize_plan,
)

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)


def test_media_schema_contract(docs):
    m = attach_fake_media(docs)
    f = {x.name: x.dataType.simpleString() for x in m.schema["media"].dataType.fields}
    assert f["content"] == "binary"
    assert "mime" in f["meta"] and "sample_rate" in f["meta"]


def test_extract_features_shape_and_determinism(docs):
    out = extract_features(attach_fake_media(docs))
    rows = out.select("doc_id", "features").collect()
    assert all(len(r.features) == FEATURE_DIM for r in rows)
    rows2 = extract_features(attach_fake_media(docs)).select("doc_id", "features").collect()
    assert {r.doc_id: tuple(r.features) for r in rows} == {
        r.doc_id: tuple(r.features) for r in rows2
    }


def test_unsupported_format_raises(docs):
    # fake media content is raw utf-8 text, not a decodable image
    out = extract_features(attach_fake_media(docs), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|image|PPM"):
        out.collect()


def test_ppm_p6_roundtrip():
    from age_spark.pipeline.multimodal import decode_image, encode_ppm

    rgb = bytes(range(2 * 3 * 3))  # 2x3 image
    w, h, out = decode_image(encode_ppm(2, 3, rgb))
    assert (w, h, out) == (2, 3, rgb)


def test_ppm_p3_with_comments():
    from age_spark.pipeline.multimodal import decode_image

    p3 = b"P3\n# a comment\n2 1 # dims\n255\n255 0 0  0 255 0\n"
    w, h, rgb = decode_image(p3)
    assert (w, h) == (2, 1)
    assert rgb == bytes([255, 0, 0, 0, 255, 0])


def test_bmp_24bit_decode():
    import struct

    from age_spark.pipeline.multimodal import decode_image

    # 2x2 bottom-up 24-bit BMP: rows padded to 4 bytes (2*3=6 -> 8)
    # pixel layout (BGR): bottom row first
    bottom = bytes([10, 20, 30, 40, 50, 60]) + b"\x00\x00"  # (30,20,10), (60,50,40)
    top = bytes([70, 80, 90, 100, 110, 120]) + b"\x00\x00"  # (90,80,70), (120,110,100)
    raster = bottom + top
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    w, h, rgb = decode_image(header + dib + raster)
    assert (w, h) == (2, 2)
    # top-down RGB: top row first
    assert rgb == bytes([90, 80, 70, 120, 110, 100, 30, 20, 10, 60, 50, 40])


def test_real_decode_features_end_to_end(docs):
    from age_spark.pipeline.multimodal import attach_generated_ppm

    media = attach_generated_ppm(docs)
    out = extract_features(media, fake=False)
    rows = out.select("doc_id", "features").collect()
    assert len(rows) == 20
    for r in rows:
        assert len(r.features) == FEATURE_DIM
        assert all(0.0 <= f <= 1.0 for f in r.features)
        # the luminance histogram (dims 3..) sums to ~1
        assert abs(sum(r.features[3:]) - 1.0) < 1e-3
    # deterministic across runs
    rows2 = extract_features(attach_generated_ppm(docs), fake=False).select(
        "doc_id", "features"
    ).collect()
    assert {r.doc_id: tuple(r.features) for r in rows} == {
        r.doc_id: tuple(r.features) for r in rows2
    }


def test_real_resize_resamples_pixels(docs):
    from age_spark.pipeline.multimodal import attach_generated_ppm, decode_image

    media = attach_generated_ppm(docs, width=8, height=8)
    resized = resize_plan(media, width=4, height=2, fake=False)
    row = resized.select("media").first().media
    assert row.meta.width == 4 and row.meta.height == 2
    w, h, rgb = decode_image(row.content)
    assert (w, h) == (4, 2) and len(rgb) == 4 * 2 * 3


def test_resize_updates_meta_only(docs):
    m = attach_fake_media(docs)
    r = resize_plan(m, width=100, height=50)
    row = r.select("media.meta.width", "media.meta.height", "media.content").first()
    assert row.width == 100 and row.height == 50 and row.content is not None


def test_audio_contract(docs):
    a = attach_fake_audio(docs)
    row = a.select("media.meta.mime", "media.meta.sample_rate").first()
    assert row.mime == "audio/fake" and row.sample_rate == 16000


def test_frame_sample_plan_fanout(spark, docs):
    m = attach_fake_media(docs).withColumn(
        "media",
        F.struct(
            F.col("media.content").alias("content"),
            F.struct(
                F.col("media.meta.mime").alias("mime"),
                F.col("media.meta.width").alias("width"),
                F.col("media.meta.height").alias("height"),
                F.lit(25).alias("n_frames"),
                F.col("media.meta.sample_rate").alias("sample_rate"),
            ).alias("meta"),
        ),
    )
    out = frame_sample_plan(m, every_n=10)
    per_doc = out.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()
    assert all(r.n == 3 for r in per_doc)  # frames 0, 10, 20


def test_png_decode_roundtrip():
    """Pure-Python PNG decode: craft PNGs with each filter type (the raw
    stream carries the FILTERED bytes; the decoder must reconstruct the
    original RGB), plus grey and RGBA channel normalization."""
    import struct
    import zlib

    from age_spark.pipeline.multimodal import decode_image

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload)) + typ + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    def make_png(w, h, color_type, raw_rows):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        body = zlib.compress(b"".join(raw_rows))
        return (
            b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", body) + chunk(b"IEND", b"")
        )

    # 2x2 RGB, all four filters against a known original
    orig = [bytes([10, 20, 30, 40, 50, 60]), bytes([70, 80, 90, 15, 25, 35])]

    def filt(ft, line, prev, nch=3):
        out = bytearray([ft])
        for i, v in enumerate(line):
            a = line[i - nch] if i >= nch else 0
            b = prev[i]
            c = prev[i - nch] if i >= nch else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((v - pred) & 0xFF)
        return bytes(out)

    for ft in (0, 1, 2, 3, 4):
        rows = [filt(ft, orig[0], bytes(6)), filt(ft, orig[1], orig[0])]
        w, h, rgb = decode_image(make_png(2, 2, 2, rows))
        assert (w, h) == (2, 2)
        assert rgb == orig[0] + orig[1], f"filter {ft} mismatch"

    # greyscale -> RGB triplication
    grows = [bytes([0, 7, 200]), bytes([0, 31, 255])]
    w, h, rgb = decode_image(make_png(2, 2, 0, grows))
    assert rgb == bytes([7, 7, 7, 200, 200, 200, 31, 31, 31, 255, 255, 255])

    # RGBA -> alpha dropped
    arows = [bytes([0, 1, 2, 3, 9, 4, 5, 6, 9])]
    w, h, rgb = decode_image(make_png(2, 1, 6, arows))
    assert rgb == bytes([1, 2, 3, 4, 5, 6])


def test_jpeg_decodes_through_spark_kernel(spark):
    """Real baseline-JPEG bytes through the Arrow-batched decode kernel:
    extract_features(fake=False) must decode pipeline/jpeg.py formats
    inside mapInPandas, not just in driver-side unit tests."""
    import numpy as np

    from test_jpeg import encode_baseline

    img = np.zeros((8, 16, 3), dtype=np.uint8)
    img[:, :8, 0] = 180
    img[:, 8:, 2] = 180
    blob = encode_baseline(img, subsample=False, q=4)
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, text string"
    ).withColumn(
        "media",
        F.struct(
            F.lit(bytearray(blob)).alias("content"),
            F.struct(
                F.lit("image/jpeg").alias("mime"),
                F.lit(16).alias("width"),
                F.lit(8).alias("height"),
                F.lit(1).alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"),
            ).alias("meta"),
        ),
    )
    out = extract_features(df, fake=False).select("doc_id", "features").collect()
    assert len(out) == 2
    assert all(len(r.features) == FEATURE_DIM for r in out)
    # both rows share the same image -> identical features
    assert tuple(out[0].features) == tuple(out[1].features)


def test_wav_roundtrip_and_sine_features():
    """PCM16 encode -> decode is lossless; features of a known sine match
    closed forms (RMS = A/sqrt(2), ZCR = 2f/sr)."""
    import math

    from age_spark.pipeline.multimodal import (
        _audio_feature_values, decode_wav, encode_wav,
    )

    sr = 8000
    sine = [int(16384 * math.sin(2 * math.pi * 440 * t / sr)) for t in range(800)]
    sr2, nch, out = decode_wav(encode_wav(sr, sine))
    assert (sr2, nch) == (8000, 1) and out == sine
    dur, rms, zcr, peak, mean = _audio_feature_values(sr2, out)
    assert dur == 0.1
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01
    assert abs(zcr - 2 * 440 / sr) < 0.01
    assert peak == 0.5 and abs(mean) < 0.001


def test_wav_8bit_and_chunk_walk():
    """8-bit unsigned PCM centers/widens; unknown chunks are skipped; a
    non-RIFF blob raises honestly."""
    import struct

    import pytest

    from age_spark.pipeline.multimodal import decode_wav

    data8 = bytes([128, 255, 0, 128])
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd size pads
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 24 + len(junk) + 12) + b"WAVE" + junk
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 4000, 4000, 1, 8)
        + b"data" + struct.pack("<I", 4) + data8
    )
    assert decode_wav(blob) == (4000, 1, [0, 32512, -32768, 0])
    with pytest.raises(NotImplementedError):
        decode_wav(b"OggS0000")


def test_generated_wav_features_spark(spark):
    """JVM-generated WAV blobs decode through the Arrow kernel: duration
    pins the sample count, values are deterministic across runs."""
    from pyspark.sql import functions as F

    from age_spark.pipeline.multimodal import attach_generated_wav, audio_features

    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["id", "text"])
    out = audio_features(attach_generated_wav(df)).select("id", "audio_features")
    rows = {r["id"]: tuple(r["audio_features"]) for r in out.collect()}
    assert all(v[0] == 256 / 8000 for v in rows.values())
    rows2 = {r["id"]: tuple(r["audio_features"]) for r in out.collect()}
    assert rows == rows2


def test_y4m_roundtrip_and_chroma():
    """C444 encode -> decode is lossless; C420 plane sizes honored; an
    unsupported chroma raises honestly."""
    import pytest

    from age_spark.pipeline.multimodal import decode_y4m, encode_y4m

    frames = [
        bytes([i % 256 for i in range(192)]),
        bytes([255 - (i % 256) for i in range(192)]),
    ]
    assert decode_y4m(encode_y4m(8, 8, frames)) == (8, 8, 25, frames)
    f420 = bytes(16 + 2 * 4)
    blob420 = b"YUV4MPEG2 W4 H4 F30:1 C420jpeg\n" + b"FRAME\n" + f420 + b"FRAME\n" + f420
    w, h, fps, fr = decode_y4m(blob420)
    assert (w, h, fps, len(fr)) == (4, 4, 30, 2)
    with pytest.raises(NotImplementedError):
        decode_y4m(b"YUV4MPEG2 W2 H2 C411\nFRAME\n" + bytes(12))


def test_video_frame_features_spark(spark):
    """The kernel decodes AND fans out: every 2nd of 4 generated frames
    emits a row with luma stats; the explode happens inside the Arrow
    batch (one mapInPandas, no join back)."""
    from age_spark.pipeline.multimodal import attach_generated_y4m, video_frame_features

    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["id", "text"])
    out = video_frame_features(attach_generated_y4m(df), every_n=2)
    rows = sorted(
        (r["id"], r["frame_index"]) for r in out.select("id", "frame_index").collect()
    )
    assert rows == [(1, 0), (1, 2), (2, 0), (2, 2)]
    stats = out.select("y_mean", "y_std").collect()
    assert all(0.0 <= r["y_mean"] <= 1.0 and 0.0 <= r["y_std"] <= 0.6 for r in stats)
