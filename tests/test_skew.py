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


def test_auto_bucket_sizes_from_density_and_matches_fixed(spark, skewed):
    """VERDICT r2 order #7: bucket='auto' measures the hottest entity-day
    density and picks a finer-than-default width for the mega-conversation
    corpus; the result hash-matches a fixed-bucket run."""
    from featherstore_spark.operators.asof import auto_bucket_width_us

    feats = turn_features(skewed).select("conv_id", "ts", "turn_idx", "text_len")
    spine = generate_spine(skewed, seed=3)

    # the mega conversation packs thousands of turns into ~a day: with a
    # tight group budget the chosen width must drop below the 1-day default
    width = auto_bucket_width_us(feats, target_rows=200)
    assert width < 86_400_000_000, f"auto kept {width} µs despite mega-conv density"

    auto = (
        asof_join(spine, feats, tiebreaks=("turn_idx",), strategy="bucketed",
                  bucket="auto", target_rows=200)
        .toPandas().sort_values(["conv_id", "ts", "f_ts"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )
    fixed = (
        asof_join(spine, feats, tiebreaks=("turn_idx",), strategy="bucketed", bucket="6 hours")
        .toPandas().sort_values(["conv_id", "ts", "f_ts"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )
    assert auto["f_ts"].equals(fixed["f_ts"])
    pd.testing.assert_series_equal(
        auto["f_turn_idx"].astype("float64"), fixed["f_turn_idx"].astype("float64"),
        check_names=False,
    )


def test_auto_bucket_grid_selection_logic(spark):
    """Pure sizing logic: denser corpus -> finer grid step; empty -> 1 day."""
    import datetime

    from featherstore_spark.operators.asof import AUTO_BUCKET_GRID_US, auto_bucket_width_us

    base = datetime.datetime(2025, 1, 1)
    # 2880 rows for one entity inside one day -> 2 rows/minute
    rows = [("c0", base + datetime.timedelta(seconds=30 * i)) for i in range(2880)]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp")
    # budget 120 rows -> need width <= 1 hour (2880/day * 1h = 120)
    assert auto_bucket_width_us(df, target_rows=120) == 3_600_000_000
    # huge budget -> coarsest grid entry
    assert auto_bucket_width_us(df, target_rows=10**9) == AUTO_BUCKET_GRID_US[-1]
    # empty input -> 1 day default
    empty = df.where("1=0")
    assert auto_bucket_width_us(empty) == 86_400_000_000
