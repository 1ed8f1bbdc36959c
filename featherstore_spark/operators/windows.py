"""Windowed transforms (SURVEY.md §2.4 A1-A5, §2.5 W1-W3).

The reference has no aggregation operator at all (no GROUP BY anywhere; the
closest is COUNT(*) existence probes, /root/reference/pkg/storage/duckdb/
duckdb.go:190-196).  The north rule requires lag/lead turn features,
tumbling/sliding window aggregates, and role-transition histograms — all
pure built-in functions here, so every transform stays inside whole-stage
codegen and distributes by the grouping key.

Scale notes: one shuffle per distinct partitioning; ``turn_features`` and
``rolling_features`` share the (conv_id) shuffle; tumbling aggregates
partial-aggregate map-side before shuffling (Catalyst default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featherstore_spark.functions.time import epoch_us, interval_to_us

ROLE_ORDER = ("user", "assistant", "system", "tool")


def turn_features(
    df: DataFrame,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
    ts_col: str = "ts",
) -> DataFrame:
    """W2 lag/lead per turn: previous/next role, inter-turn gap, text
    length, cumulative turn count, tool flag.  Ordering is the dense
    ``turn_idx`` ordinal — deterministic even on tied timestamps (C2)."""
    w = Window.partitionBy(entity_col).orderBy(order_col)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        df.withColumn("prev_role", F.lag("role", 1).over(w))
        .withColumn("next_role", F.lead("role", 1).over(w))
        .withColumn("prev_ts", F.lag(ts_col, 1).over(w))
        .withColumn(
            "gap_s",
            F.when(
                F.col("prev_ts").isNotNull(),
                (epoch_us(ts_col) - epoch_us("prev_ts")) / 1e6,
            ),
        )
        .withColumn(
            "text_len",
            F.length(F.coalesce(F.col("text"), F.lit(""))).cast("long")
            if "text" in df.columns
            else F.col("text_len"),  # narrow pipelines precompute it and drop text
        )
        .withColumn("is_tool_call", F.col("tool").isNotNull().cast("int"))
        .withColumn("cum_turns", F.count(F.lit(1)).over(wcum))
        .withColumn("cum_tool_calls", F.sum("is_tool_call").over(wcum))
        .drop("prev_ts")
    )


def rolling_features(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    trailing: str = "10 minutes",
    tiebreak_col: str = "turn_idx",
) -> DataFrame:
    """W3 trailing-range window per turn: turn count + tool-call rate in the
    trailing interval ending at (and including) the current turn.  The
    frame is a rangeBetween on microsecond epoch — exact µs semantics, no
    second-truncation."""
    width = interval_to_us(trailing)
    # ordering on a materialized column (not the epoch expression inline):
    # an expression ordering gets a fresh projected attribute per window
    # call, splitting into two Window operators with two Sorts; a shared
    # column keeps both aggregates in ONE operator with one Sort.
    tool_flag = F.col("tool").isNotNull().cast("int")
    w = Window.partitionBy(entity_col).orderBy("__ord_us").rangeBetween(-width, 0)
    return (
        df.withColumn("__ord_us", epoch_us(ts_col))
        .withColumn("w_turns", F.count(F.lit(1)).over(w))
        .withColumn("w_tool_calls", F.sum(tool_flag).over(w))
        .withColumn("w_tool_rate", (F.col("w_tool_calls") / F.col("w_turns")).cast("double"))
        .drop("__ord_us")
    )


def tumbling_aggregates(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    width: str = "5 minutes",
) -> DataFrame:
    """A1 fixed windows per entity: turn counts, tool-call rate, distinct
    roles, text volume.  ``F.window`` aligns to the epoch — identical
    bucketing to DuckDB/PostgreSQL ``time_bucket`` (oracle-checkable)."""
    from featherstore_spark.functions.text import balance_small_input

    # the window assignment + partial aggregation happen map-side in the
    # scan stage; rebalance small single-split inputs so they parallelize
    # (estimate-gated no-op at scale)
    df = balance_small_input(df)
    win = F.window(F.col(ts_col), width)
    return (
        df.groupBy(F.col(entity_col), win.start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
            F.round(F.avg(F.col("tool").isNotNull().cast("int")), 6).alias("tool_rate"),
            F.countDistinct("role").alias("n_roles"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("text_chars"),
        )
    )


def sliding_aggregates(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    width: str = "10 minutes",
    slide: str = "2 minutes",
) -> DataFrame:
    """A2 overlapping windows: each row lands in width/slide windows via
    ``F.window(ts, width, slide)`` — Spark expands rows into their windows
    map-side, then partial-aggregates, so the shuffle carries aggregates
    not raw rows."""
    from featherstore_spark.functions.text import balance_small_input

    # each row expands into width/slide windows BEFORE the partial
    # aggregate — all map-side scan-stage work; rebalance small
    # single-split inputs so it parallelizes (estimate-gated no-op at
    # scale)
    df = balance_small_input(df)
    win = F.window(F.col(ts_col), width, slide)
    return (
        df.groupBy(F.col(entity_col), win.start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
        )
    )


def role_transitions(
    df: DataFrame,
    entity_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """A3 role-transition bigram histogram: counts of (prev_role -> role)
    per conversation, exploded to rows (maps hash unstably across engines;
    rows are oracle-checkable)."""
    w = Window.partitionBy(entity_col).orderBy(order_col)
    return (
        df.withColumn("prev_role", F.lag("role", 1).over(w))
        .where(F.col("prev_role").isNotNull())
        .groupBy(entity_col, F.concat_ws("->", "prev_role", "role").alias("transition"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
