"""Window transforms + sessionization vs pandas oracles, incl. boundary
semantics (gap exactly at threshold, single-turn convs, tied ts)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import functions as F

from featherstore_spark.datagen import generate_transcripts
from featherstore_spark.operators.sessionize import session_aggregates, sessionize
from featherstore_spark.operators.windows import (
    role_transitions,
    rolling_features,
    tumbling_aggregates,
    turn_features,
)
from featherstore_spark.oracle import sessionize_pd


def test_turn_features_lag_lead(transcripts, transcripts_pd):
    got = turn_features(transcripts).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp = transcripts_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    g = exp.groupby("conv_id")
    assert (got["prev_role"].fillna("~") == g["role"].shift(1).fillna("~")).all()
    assert (got["next_role"].fillna("~") == g["role"].shift(-1).fillna("~")).all()
    exp_gap = g["ts"].diff().dt.total_seconds()
    assert ((got["gap_s"] - exp_gap).abs().fillna(0) < 1e-9).all()
    assert (got["cum_turns"] == g.cumcount() + 1).all()


def test_rolling_features_oracle(transcripts, transcripts_pd):
    got = (
        rolling_features(transcripts, trailing="10 minutes")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pdf = transcripts_pd.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    exp_counts = []
    for _, g in pdf.groupby("conv_id", sort=True):
        ts = g["ts"].to_numpy()
        for t in ts:
            lo = t - pd.Timedelta(minutes=10)
            exp_counts.append(((ts >= lo) & (ts <= t)).sum())
    # got is sorted by (conv_id, turn_idx) == oracle iteration order
    assert (got["w_turns"].to_numpy() == exp_counts).all()


def test_tumbling_counts_cover_all_rows(transcripts):
    total = transcripts.count()
    agg = tumbling_aggregates(transcripts, width="5 minutes")
    assert agg.agg(F.sum("n_turns")).collect()[0][0] == total


def test_role_transitions_sum(transcripts):
    per_conv = transcripts.groupBy("conv_id").count().toPandas()
    expected = int((per_conv["count"] - 1).sum())
    got = role_transitions(transcripts).agg(F.sum("n")).collect()[0][0]
    assert got == expected


def test_sessionize_matches_pandas_oracle(spark):
    t = generate_transcripts(spark, n_convs=40, mean_turns=25, seed=11, session_gap_heavy=True)
    got = (
        sessionize(t, gap="30 minutes")
        .select("conv_id", "turn_idx", "session_id")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    exp = sessionize_pd(t.toPandas(), gap_s=30 * 60).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (got["session_id"].to_numpy() == exp["session_id"].to_numpy()).all()


def test_gap_exactly_at_threshold_stays_in_session(spark):
    base = datetime(2026, 1, 1)
    rows = [
        ("c", 0, "user", "a", None, base),
        ("c", 1, "assistant", "b", None, base + timedelta(minutes=30)),          # == gap: same session
        ("c", 2, "user", "c", None, base + timedelta(minutes=60, microseconds=1)),  # > gap: new session
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    out = sessionize(df, gap="30 minutes").orderBy("turn_idx").toPandas()
    assert list(out["session_id"]) == [0, 0, 1]


def test_single_turn_conversation(spark):
    df = spark.createDataFrame(
        [("c", 0, "user", "hi", None, datetime(2026, 1, 1))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    out = session_aggregates(df).toPandas()
    assert len(out) == 1 and out["n_turns"].iloc[0] == 1 and out["duration_s"].iloc[0] == 0.0


def test_session_aggregates_consistency(spark):
    t = generate_transcripts(spark, n_convs=30, mean_turns=20, seed=13, session_gap_heavy=True)
    agg = session_aggregates(t, gap="30 minutes")
    assert agg.agg(F.sum("n_turns")).collect()[0][0] == t.count()
    assert agg.where(F.col("session_end") < F.col("session_start")).count() == 0
