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


def test_real_decode_raises(docs):
    out = extract_features(attach_fake_media(docs), fake=False)
    with pytest.raises(Exception, match="NotImplementedError|image"):
        out.collect()


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
