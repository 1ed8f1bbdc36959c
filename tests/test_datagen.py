"""Generator invariants (FIXTURES.md §1): determinism, schema, monotone ts."""

from __future__ import annotations

from pyspark.sql import functions as F

from featherstore_spark.datagen import generate_transcripts
from featherstore_spark.schema import TRANSCRIPT_SCHEMA, validate_transcripts


def test_schema_matches_contract(transcripts):
    validate_transcripts(transcripts)
    assert [f.name for f in transcripts.schema.fields] == [f.name for f in TRANSCRIPT_SCHEMA.fields]


def test_primary_key_unique(transcripts):
    n = transcripts.count()
    assert transcripts.select("conv_id", "turn_idx").distinct().count() == n


def test_ts_non_decreasing_within_conv(transcripts_pd):
    for _, g in transcripts_pd.sort_values(["conv_id", "turn_idx"]).groupby("conv_id"):
        assert g["ts"].is_monotonic_increasing  # non-strict: ties allowed


def test_deterministic_across_parallelism(spark, transcripts_pd):
    again = (
        generate_transcripts(spark, n_convs=20, mean_turns=20, seed=42, n_partitions=7)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    base = transcripts_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    # per-turn text byte-equality under stable ordering (north-rule invariant)
    assert (base["text"] == again["text"]).all()
    assert (base["ts"] == again["ts"]).all()
    assert (base["role"] == again["role"]).all()


def test_ties_exist_at_scale(spark):
    from pyspark.sql import Window

    df = generate_transcripts(spark, n_convs=200, mean_turns=30, seed=42)
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    ties = (
        df.withColumn("prev_ts", F.lag("ts").over(w))
        .where(F.col("ts") == F.col("prev_ts"))
        .count()
    )
    assert ties > 0


def test_skew_variant(spark):
    df = generate_transcripts(spark, n_convs=50, mean_turns=40, seed=42, skew=True)
    counts = df.groupBy("conv_id").count().toPandas().sort_values("count", ascending=False)
    assert counts.iloc[0]["count"] >= 0.4 * counts["count"].sum()
