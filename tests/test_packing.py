"""Concat-and-chunk sequence packing (corpus → fixed-size training windows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featherstore_spark.operators.packing import pack_sequences

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_pack_layout_is_contiguous_per_stream(documents):
    """The defining concat-and-chunk invariant: within a stream, doc
    start positions (bin_id*capacity + bin_offset) are exactly the
    prefix sums of the laid-out sizes — no gap, no overlap."""
    cap = 1000
    out = pack_sequences(documents, "n_chars", cap, "doc_id", n_streams=4).select(
        "doc_id", "n_chars", "stream", "bin_id", "bin_offset", "n_bins"
    ).collect()
    by_stream: dict[int, list] = {}
    for r in out:
        by_stream.setdefault(r["stream"], []).append(r)
    assert len(out) == documents.count()
    assert set(by_stream) <= set(range(4))
    for rows in by_stream.values():
        rows.sort(key=lambda r: (r["bin_id"], r["bin_offset"]))
        cum = 0
        for r in rows:
            assert r["bin_id"] * cap + r["bin_offset"] == cum, r
            assert 0 <= r["bin_offset"] < cap
            start_bin, end_bin = cum // cap, (cum + max(r["n_chars"], 1) - 1) // cap
            assert r["n_bins"] == end_bin - start_bin + 1
            cum += r["n_chars"]


def test_pack_deterministic(documents):
    a = pack_sequences(documents, "n_chars", 512, "doc_id").orderBy("doc_id").collect()
    b = pack_sequences(documents, "n_chars", 512, "doc_id").orderBy("doc_id").collect()
    assert a == b


def test_pack_zero_size_items_occupy_one_bin_slot(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 5), (3, 0)], "doc_id long, n long"
    )
    out = pack_sequences(df, "n", 4, "doc_id", n_streams=1).collect()
    assert all(r["n_bins"] == 1 for r in out if r["n"] == 0)


def test_pack_rejects_bad_rows_lazily(spark):
    df = spark.createDataFrame([(1, 10), (2, -3)], "doc_id long, n long")
    with pytest.raises(Exception, match="pack_sequences"):
        pack_sequences(df, "n", 4, "doc_id").collect()
    df2 = spark.createDataFrame([(None, 10)], "doc_id string, n long")
    with pytest.raises(Exception, match="pack_sequences"):
        pack_sequences(df2, "n", 4, "doc_id").collect()


def test_pack_parameter_validation(documents):
    with pytest.raises(ValueError, match="capacity"):
        pack_sequences(documents, "n_chars", 0, "doc_id")
    with pytest.raises(ValueError, match="n_streams"):
        pack_sequences(documents, "n_chars", 10, "doc_id", n_streams=0)
