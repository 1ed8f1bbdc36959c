"""Property-based differential tests (hypothesis): random tiny corpora
through the Spark as-of strategies must equal the pandas oracle, for any
combination of ties, duplicates, empty sides, and boundary timestamps."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from featherstore_spark.operators.asof import asof_join
from featherstore_spark.oracle import asof_join_pd

BASE = datetime(2026, 1, 1)

# timestamps on a coarse grid to force plenty of exact ties and
# boundary-equality cases
ts_strategy = st.integers(min_value=0, max_value=20).map(
    lambda m: BASE + timedelta(minutes=5 * m)
)
entity_strategy = st.sampled_from(["a", "b", "c"])

feature_rows = st.lists(
    st.tuples(entity_strategy, ts_strategy, st.integers(0, 50), st.floats(-100, 100, allow_nan=False)),
    min_size=0, max_size=25,
)
spine_rows = st.lists(st.tuples(entity_strategy, ts_strategy), min_size=1, max_size=15)


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@settings(
    max_examples=12,  # each example runs 2 Spark jobs; keep CI-sized
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(feats=feature_rows, spine=spine_rows, strategy=st.sampled_from(["window", "cogroup", "bucketed"]))
def test_asof_equals_oracle_on_random_inputs(sparkref, feats, spine, strategy):
    spark = sparkref
    fdf = spark.createDataFrame(
        feats, "conv_id string, ts timestamp, turn_idx int, v double"
    ) if feats else spark.createDataFrame([], "conv_id string, ts timestamp, turn_idx int, v double")
    sdf = spark.createDataFrame(spine, "conv_id string, ts timestamp")

    got = (
        asof_join(sdf, fdf, tiebreaks=("turn_idx",), strategy=strategy, bucket="1 hour")
        .toPandas()
        .sort_values(["conv_id", "ts", "f_ts", "f_turn_idx"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )
    exp = (
        asof_join_pd(
            pd.DataFrame(spine, columns=["conv_id", "ts"]),
            pd.DataFrame(feats, columns=["conv_id", "ts", "turn_idx", "v"])
            if feats else pd.DataFrame(columns=["conv_id", "ts", "turn_idx", "v"]),
            tiebreaks=("turn_idx",),
        )
        .sort_values(["conv_id", "ts", "f_ts", "f_turn_idx"], na_position="first", kind="mergesort")
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["conv_id"] == exp["conv_id"]).all()
    got_v = got["f_v"].astype("float64")
    exp_v = exp["f_v"].astype("float64")
    pd.testing.assert_series_equal(got_v, exp_v, check_names=False, atol=1e-12)
    got_tb = got["f_turn_idx"].astype("float64")
    exp_tb = exp["f_turn_idx"].astype("float64")
    pd.testing.assert_series_equal(got_tb, exp_tb, check_names=False)
