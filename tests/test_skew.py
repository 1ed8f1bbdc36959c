"""Skew stress (SURVEY §5.2 item 5): one conversation holds ~50% of all
turns; results stay correct and the bucketed path actually splits the
mega-conversation across many independent groups."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from featherstore_spark.datagen import generate_spine, generate_transcripts
from featherstore_spark.functions.time import epoch_us
from featherstore_spark.operators.asof import asof_join
from featherstore_spark.operators.windows import turn_features


@pytest.fixture(scope="module")
def skewed(spark):
    t = generate_transcripts(spark, n_convs=60, mean_turns=60, seed=3, skew=True).cache()
    t.count()
    return t


def test_mega_conversation_dominates(skewed):
    counts = skewed.groupBy("conv_id").count()
    top = counts.orderBy(F.desc("count")).first()
    total = skewed.count()
    assert top["count"] >= 0.4 * total


def test_bucketed_splits_mega_conversation(skewed):
    """The time-bucket axis must break the mega conversation into many
    groups — that is the whole anti-skew mechanism."""
    width_us = 3600 * 1_000_000  # 1h buckets (the corpus spans ~a day)
    mega = skewed.groupBy("conv_id").count().orderBy(F.desc("count")).first()["conv_id"]
    n_buckets = (
        skewed.where(F.col("conv_id") == mega)
        .select(F.floor(epoch_us("ts") / F.lit(width_us)).alias("b"))
        .distinct()
        .count()
    )
    assert n_buckets > 10, f"mega conversation only spans {n_buckets} time buckets"


def test_skewed_asof_fine_buckets_agree(spark, skewed):
    """With 1h buckets the mega conversation genuinely splits (>10 groups)
    AND results still match the window strategy across bucket borders."""
    feats = turn_features(skewed).select("conv_id", "ts", "turn_idx", "text_len")
    spine = generate_spine(skewed, seed=3)
    a = (
        asof_join(spine, feats, tiebreaks=("turn_idx",), strategy="window")
        .toPandas().sort_values(["conv_id", "ts", "f_ts"], na_position="first", kind="mergesort").reset_index(drop=True)
    )
    b = (
        asof_join(spine, feats, tiebreaks=("turn_idx",), strategy="bucketed", bucket="1 hour")
        .toPandas().sort_values(["conv_id", "ts", "f_ts"], na_position="first", kind="mergesort").reset_index(drop=True)
    )
    assert a["f_ts"].equals(b["f_ts"])


def test_skewed_asof_strategies_agree(spark, skewed):
    feats = turn_features(skewed).select("conv_id", "ts", "turn_idx", "text_len")
    spine = generate_spine(skewed, seed=3)
    outs = {}
    for st in ("window", "bucketed"):
        outs[st] = (
            asof_join(spine, feats, tiebreaks=("turn_idx",), strategy=st, bucket="6 hours")
            .toPandas()
            .sort_values(["conv_id", "ts", "f_ts"], na_position="first", kind="mergesort")
            .reset_index(drop=True)
        )
    a, b = outs["window"], outs["bucketed"]
    assert len(a) == len(b) > 0
    assert a["f_ts"].equals(b["f_ts"])
    pd.testing.assert_series_equal(
        a["f_turn_idx"].astype("float64"), b["f_turn_idx"].astype("float64"), check_names=False
    )
