"""Multimodal plumbing: binary columns, mapInPandas decode, frame plan."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from featherstore_spark.functions.multimodal import (
    decode_media,
    documents_as_media,
    frame_sample_plan,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return documents_as_media(docs).cache()


def test_media_schema_and_payload(media, spark):
    row = media.where(F.col("media_id") == 0).collect()[0]
    doc0 = spark.read.parquet(f"{SF_DIR}/documents.parquet").where(F.col("doc_id") == 0).collect()[0]
    assert bytes(row["payload"]) == doc0["text"].encode("utf-8")


def test_decode_media_real_stats(media, spark):
    decoded = decode_media(media, decoder="fake").cache()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    joined = decoded.join(docs, decoded["media_id"] == docs["doc_id"]).toPandas()
    assert (joined["byte_len"] == joined["n_chars"]).all()  # ascii corpus
    # md5 is the real payload hash
    sample = joined.iloc[0]
    assert sample["payload_md5"] == hashlib.md5(sample["text"].encode()).hexdigest()
    assert joined["mean_byte"].between(1, 255).all()
    assert joined["width"].between(1, 1920).all()
    assert joined["channels"].between(1, 3).all()


def test_decode_is_deterministic(media):
    a = decode_media(media, decoder="fake").orderBy("media_id").toPandas()
    b = decode_media(media, decoder="fake").orderBy("media_id").toPandas()
    assert (a["payload_md5"] == b["payload_md5"]).all()
    assert (a["width"] == b["width"]).all()


def test_pil_decoder_is_honest_stub(media):
    with pytest.raises(NotImplementedError, match="PIL"):
        decode_media(media, decoder="pil")


def test_frame_sample_plan_shape(media):
    plan = frame_sample_plan(media, every_n=30)
    pdf = plan.toPandas()
    assert (pdf["frame_idx"] % 30 == 0).all()
    assert pdf.groupby("media_id").size().min() >= 1
