"""Pipeline-level tests: feature-vector allclose vs oracle at spine points,
plan-shape assertions (scale posture, SURVEY.md §7.4)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from featherstore_spark.datagen import generate_spine
from featherstore_spark.operators.windows import rolling_features, turn_features
from featherstore_spark.operators.sessionize import sessionize
from featherstore_spark.oracle import asof_join_pd, sessionize_pd
from featherstore_spark.plans.materialize import FEATURE_COLS, build_feature_log, materialize


def test_feature_log_has_all_features(transcripts):
    log = build_feature_log(transcripts)
    for c in FEATURE_COLS:
        assert c in log.columns, c
    assert log.count() == transcripts.count()


def test_materialize_at_spine_allclose_vs_oracle(spark, transcripts):
    spine = generate_spine(transcripts, seed=42)
    got = (
        materialize(transcripts, spine=spine, asof_strategy="window")
        .toPandas()
        .sort_values(["conv_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    feats_pd = build_feature_log(transcripts).select(
        "conv_id", "ts", "turn_idx", *FEATURE_COLS
    ).toPandas()
    exp = (
        asof_join_pd(spine.toPandas(), feats_pd, on="conv_id", ts="ts", tiebreaks=("turn_idx",))
        .sort_values(["conv_id", "ts"], kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp) and len(got) > 0
    for c in ["f_gap_s", "f_text_len", "f_cum_turns", "f_w_tool_rate", "f_session_id"]:
        g = got[c].astype("float64").to_numpy()
        e = exp[c].astype("float64").to_numpy()
        assert np.allclose(g, e, equal_nan=True), c


def test_per_turn_text_byte_equality(transcripts):
    """North-rule invariant: materialized per-turn text is byte-equal to the
    input under stable (conv_id, turn_idx) ordering."""
    log = build_feature_log(transcripts)
    a = transcripts.orderBy("conv_id", "turn_idx").select("text").toPandas()["text"]
    b = log.orderBy("conv_id", "turn_idx").select("text").toPandas()["text"]
    assert (a.to_numpy() == b.to_numpy()).all()


def test_single_shuffle_for_per_turn_stage(spark):
    """All conv_id windows (lag/lead, rolling, sessionize) must share ONE
    exchange — a second Exchange on the same key would double the shuffle
    volume at 10^12 rows.  (Built from a parquet read: a cached fixture
    embeds its own exchanges in the InMemoryRelation's stored plan text and
    would miscount.)"""
    import tempfile

    from featherstore_spark.datagen import generate_transcripts

    with tempfile.TemporaryDirectory() as d:
        generate_transcripts(spark, n_convs=20, mean_turns=10).write.parquet(f"{d}/t")
        log = build_feature_log(spark.read.parquet(f"{d}/t"))
        plan = log._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange hashpartitioning(conv_id")
        assert n_exchanges == 1, f"expected 1 conv_id exchange, got {n_exchanges}:\n{plan[:2000]}"


def test_no_cartesian_products(transcripts):
    spine = generate_spine(transcripts, seed=42)
    for strategy in ("window", "bucketed"):
        out = materialize(transcripts, spine=spine, asof_strategy=strategy)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
