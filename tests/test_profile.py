"""Table profiler (plans/profile.py).

The claims under test: (1) every stat matches a hand-computed reference
on a crafted table with NULLs; (2) the plan avoids the count-distinct
Expand blow-up; (3) empty tables profile cleanly (zero counts, NULL
stats, no crash); (4) unsupported dtypes degrade to counts-only;
(5) the Spark/DuckDB timestamp rendering parity the module relies on
actually holds (regression-pinned, not assumed)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from featherstore_spark.plans.profile import profile_table


def _crafted(spark):
    rows = [
        (1, "alpha", dt.datetime(2024, 1, 1, 0, 0, 0, 500), 1.25),
        (2, "beta", dt.datetime(2024, 1, 2, 12, 30, 45, 123456), -3.5),
        (None, None, None, None),
        (2, "alpha", dt.datetime(2024, 1, 2, 12, 30, 45, 123456), 0.0),
    ]
    return spark.createDataFrame(
        rows, "i: long, s: string, t: timestamp, d: double"
    )


def test_profile_matches_hand_reference(spark):
    out = {r["col_name"]: r for r in profile_table(_crafted(spark), k=8).collect()}
    i = out["i"]
    assert (i["n_rows"], i["n_null"], i["n_distinct_est"]) == (4, 1, 2.0)
    assert (i["min_s"], i["max_s"]) == ("1", "2")
    assert i["avg_num"] == round(5 / 3, 6)
    s = out["s"]
    assert (s["n_null"], s["n_distinct_est"], s["min_s"], s["max_s"], s["avg_num"]) == (
        1, 2.0, "alpha", "beta", None,
    )
    t = out["t"]
    assert t["min_s"] == "2024-01-01 00:00:00.000500"
    assert t["max_s"] == "2024-01-02 12:30:45.123456"
    assert t["n_distinct_est"] == 2.0
    d = out["d"]
    # floats: rendered range only — mean and distinct are NULL by design
    assert (d["min_s"], d["max_s"]) == ("-3.500000", "1.250000")
    assert d["n_distinct_est"] is None and d["avg_num"] is None


def test_profile_plan_has_no_expand(spark):
    df = profile_table(_crafted(spark), k=8)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # the count-distinct blow-up this avoids


def test_profile_empty_table(spark):
    empty = spark.createDataFrame([], "i: long, s: string")
    out = {r["col_name"]: r for r in profile_table(empty).collect()}
    assert set(out) == {"i", "s"}
    for r in out.values():
        assert (r["n_rows"], r["n_null"]) == (0, 0)
        assert r["min_s"] is None and r["max_s"] is None
        assert r["n_distinct_est"] is None and r["avg_num"] is None


def test_profile_nested_column_counts_only(spark):
    df = spark.createDataFrame([(1, [1, 2]), (2, None)], "i: long, a: array<int>")
    a = {r["col_name"]: r for r in profile_table(df).collect()}["a"]
    assert (a["n_rows"], a["n_null"]) == (2, 1)
    assert a["min_s"] is None and a["max_s"] is None and a["n_distinct_est"] is None


def test_ts_format_parity_with_duckdb(spark):
    """Pin the exact micros rendering both engines must share."""
    import duckdb

    from featherstore_spark.plans.profile import TS_FMT_DUCK, TS_FMT_SPARK

    stamps = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 1, 23, 59, 59, 1),
        dt.datetime(2024, 6, 30, 12, 0, 0, 999999),
        dt.datetime(2024, 2, 29, 6, 7, 8, 90000),
    ]
    df = spark.createDataFrame([(s,) for s in stamps], "t: timestamp")
    got = [r[0] for r in df.select(F.date_format("t", TS_FMT_SPARK)).collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT strftime(TIMESTAMP '{s.isoformat(sep=' ')}', '{TS_FMT_DUCK}')"
        ).fetchone()[0]
        for s in stamps
    ]
    assert got == want


def test_profile_all_null_columns_render_sql_null(spark):
    """All-NULL float must yield SQL NULL min/max (format_string('%.6f',
    NULL) would print the literal string 'null'), and all-NULL hashed
    columns NULL n_distinct_est on BOTH engines (the DuckDB twin's
    zero-row aggregate used to yield 0.0)."""
    import duckdb
    import pandas as pd

    df = spark.createDataFrame(
        pd.DataFrame({"d": [None, None], "s": [None, None], "i": [1, 2]}).astype(
            {"d": "float64", "i": "int64", "s": "object"}
        ),
        "d double, s string, i long",
    )
    out = {r["col_name"]: r for r in profile_table(df, k=8).collect()}
    assert out["d"]["min_s"] is None and out["d"]["max_s"] is None
    assert out["s"]["n_distinct_est"] is None
    # DuckDB side of the distinct rule: zero qualifying rows -> NULL
    got = duckdb.connect().execute(
        "SELECT CASE WHEN COUNT(*) = 0 THEN NULL::DOUBLE "
        "WHEN COUNT(*) < 8 THEN COUNT(*)::DOUBLE ELSE 1.0 END "
        "FROM (SELECT 1 AS hv WHERE false)"
    ).fetchone()[0]
    assert got is None


def test_profile_unknown_requested_column_raises(spark):
    import pytest

    with pytest.raises(ValueError, match="not in schema"):
        profile_table(_crafted(spark), cols=["i", "nope"])
