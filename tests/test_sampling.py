"""Deterministic hash-sampling operators (data mixing + dataset splits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featherstore_spark.operators.sampling import (
    hash_sample,
    split_assign,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_hash_sample_rate_and_determinism(documents):
    n = documents.count()
    kept = hash_sample(documents, 0.5, "doc_id")
    k = kept.count()
    # md5 is uniform: binomial(n, 0.5) stays within 5 sigma comfortably
    assert abs(k / n - 0.5) < 0.15, k
    ids1 = sorted(r["doc_id"] for r in kept.select("doc_id").collect())
    ids2 = sorted(r["doc_id"] for r in hash_sample(documents, 0.5, "doc_id").select("doc_id").collect())
    assert ids1 == ids2  # a pure function of (key, seed)


def test_hash_sample_monotone_in_rate(documents):
    """Raising the rate only ADDS rows (same coin, higher threshold) —
    the property that makes incremental corpus scaling reproducible."""
    small = {r["doc_id"] for r in hash_sample(documents, 0.2, "doc_id").select("doc_id").collect()}
    big = {r["doc_id"] for r in hash_sample(documents, 0.6, "doc_id").select("doc_id").collect()}
    assert small <= big


def test_hash_sample_edge_rates(documents):
    n = documents.count()
    assert hash_sample(documents, 0.0, "doc_id").count() == 0
    assert hash_sample(documents, 1.0, "doc_id").count() == n
    with pytest.raises(ValueError, match="rate"):
        hash_sample(documents, 1.5, "doc_id")


def test_stratified_rates_per_stratum(documents):
    rates = {"en": 0.8, "de": 0.2}
    out = stratified_sample(documents, rates, "doc_id", "lang")
    got = {r["lang"]: r["c"] for r in out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    base = {r["lang"]: r["c"] for r in documents.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert set(got) <= {"en", "de"}  # default_rate=0 drops other strata
    for lang, rate in rates.items():
        assert abs(got.get(lang, 0) / base[lang] - rate) < 0.2, (lang, got, base)


def test_stratified_shares_the_coin_across_strata(documents):
    """Changing one stratum's rate must not reshuffle another's sample."""
    a = stratified_sample(documents, {"en": 0.5, "de": 0.5}, "doc_id", "lang")
    b = stratified_sample(documents, {"en": 0.5, "de": 0.1}, "doc_id", "lang")
    en_a = {r["doc_id"] for r in a.where(F.col("lang") == "en").select("doc_id").collect()}
    en_b = {r["doc_id"] for r in b.where(F.col("lang") == "en").select("doc_id").collect()}
    assert en_a == en_b


def test_split_assign_partitions_completely(documents):
    out = split_assign(documents, "doc_id", (0.8, 0.1, 0.1), ("train", "val", "test"), seed=7)
    n = documents.count()
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == n  # total partition, no row lost or doubled
    assert set(counts) == {"train", "val", "test"}
    assert abs(counts["train"] / n - 0.8) < 0.1


def test_split_assign_stable_under_key_growth(spark, documents):
    """A doc keeps its split when the corpus doubles — hash-range splits
    cannot leak val docs into train across corpus versions."""
    out1 = {r["doc_id"]: r["split"] for r in split_assign(documents, "doc_id", seed=7).select("doc_id", "split").collect()}
    grown = documents.unionByName(
        documents.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    )
    out2 = {r["doc_id"]: r["split"] for r in split_assign(grown, "doc_id", seed=7).select("doc_id", "split").collect()}
    assert all(out2[k] == v for k, v in out1.items())


def test_split_assign_validation(documents):
    with pytest.raises(ValueError, match="equal length"):
        split_assign(documents, "doc_id", (0.5, 0.5), ("a", "b", "c"))
    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(documents, "doc_id", (0.5, 0.2), ("a", "b"))


def test_null_key_semantics_match_sql_twin(spark):
    """A NULL key yields a NULL coin: samples drop the row, split_assign
    falls to the last split -- the same outcome as the SQL twin's
    NULL-propagating `key || ':' || seed` concatenation."""
    df = spark.createDataFrame(
        [(1, "en"), (None, "en"), (2, "de")], "doc_id long, lang string"
    )
    kept = hash_sample(df, 1.0, "doc_id").select("doc_id").collect()
    assert sorted(r["doc_id"] for r in kept) == [1, 2]  # null key dropped
    strat = stratified_sample(df, {"en": 1.0, "de": 1.0}, "doc_id", "lang")
    assert sorted(r["doc_id"] for r in strat.select("doc_id").collect()) == [1, 2]
    splits = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id").collect()}
    assert splits[None] == "test"  # CASE falls through, row never lost
