"""tokenize_ids (functions/text.py) + temperature_resample
(operators/sampling.py) — vocab/OOV goldens and mixing-share math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featherstore_spark.functions.text import tokenize_ids
from featherstore_spark.operators.sampling import temperature_resample


def test_tokenize_golden_vocab_and_oov(spark):
    """Vocab ids follow (count DESC, token ASC); OOV encodes as V."""
    df = spark.createDataFrame(
        [(1, "aa bb aa cc!"), (2, "aa zz")], "doc_id: long, text: string"
    )
    # counts: aa=3, bb=1, cc=1, !=1, zz=1 -> vocab_size=3 keeps
    # aa(0), then ties at count 1 break by token ASC: '!'(1), bb(2);
    # cc and zz are OOV (id 3)
    out = {r["doc_id"]: r for r in tokenize_ids(df, vocab_size=3).collect()}
    assert list(out[1]["token_ids"]) == [0, 2, 0, 3, 1]
    assert out[1]["n_tokens"] == 5
    assert out[1]["oov_frac"] == pytest.approx(round(1 / 5, 6), abs=0)
    assert list(out[2]["token_ids"]) == [0, 3]


def test_tokenize_empty_and_null_docs(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, ""), (3, None)], "doc_id: long, text: string"
    )
    out = {r["doc_id"]: r for r in tokenize_ids(df, vocab_size=8).collect()}
    for d in (2, 3):
        assert list(out[d]["token_ids"]) == []
        assert out[d]["n_tokens"] == 0 and out[d]["oov_frac"] == 0.0


def test_temperature_flattens_shares(spark):
    """T=2 on a 90/10 corpus: the rare domain's share must rise toward
    p^0.5 normalization (0.25) while total size stays ~N."""
    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = temperature_resample(df, "lang", temperature=2.0).groupBy("lang").count()
    got = {r["lang"]: r["count"] for r in out.collect()}
    total = sum(got.values())
    assert abs(total - 1000) < 50                      # expected-size preserving
    share_small = got["small"] / total
    # p=0.1 -> p^0.5 share = sqrt(.1)/(sqrt(.9)+sqrt(.1)) ~ 0.25
    assert 0.2 < share_small < 0.3
    assert got["small"] > 100                          # genuinely upsampled


def test_temperature_one_is_near_identity(spark):
    rows = [(i, "a") for i in range(300)] + [(500 + i, "b") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    n = temperature_resample(df, "lang", temperature=1.0).count()
    assert abs(n - 400) <= 2


def test_temperature_deterministic_under_partitioning(spark):
    rows = [(i, ["x", "y", "z"][i % 3]) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    a = sorted(map(tuple, temperature_resample(df.repartition(7), "lang", 3.0).collect()))
    b = sorted(map(tuple, temperature_resample(df.coalesce(1), "lang", 3.0).collect()))
    assert a == b


def test_temperature_rejects_bad_t(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id: long, lang: string")
    with pytest.raises(ValueError, match="temperature"):
        temperature_resample(df, "lang", temperature=0.0)


def test_temperature_null_domains_drop(spark):
    """NULL domains carry no computable share: their rows drop (the
    _u60 null-key discipline) and non-null shares are unaffected."""
    rows = [(1, "a"), (2, None), (3, "a"), (4, "b")]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    out = temperature_resample(df, "lang", temperature=1.0)
    assert sorted({r["doc_id"] for r in out.collect()}) == [1, 3, 4]
    all_null = spark.createDataFrame([(1, None)], "doc_id: long, lang: string")
    assert temperature_resample(all_null, "lang", 2.0).count() == 0
