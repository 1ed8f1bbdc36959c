"""Gap-based sessionization (SURVEY.md §2.5 W4, §2.4 A4).

No reference counterpart (featherstore has no session concept); required
by the north rule.  A new session starts when the gap from the previous
turn exceeds ``gap`` — STRICTLY greater, so a gap of exactly the threshold
stays in the same session (boundary semantics pinned by test).

Implementation is the classic two-window flag+cumsum — both windows share
the same (entity, order) sort so Spark plans a single shuffle + sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featherstore_spark.functions.time import epoch_us, interval_to_us as _interval_to_us


def sessionize(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str | tuple[str, ...] = "turn_idx",
    gap: str = "30 minutes",
) -> DataFrame:
    """Adds ``session_id`` (0-based per entity, ordered by order_col —
    a single column or a tuple, e.g. ("ts", "event_id") for logs without a
    dense ordinal)."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    gap_us = _interval_to_us(gap)
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    new_flag = (
        epoch_us(F.col(ts_col)) - epoch_us(F.lag(ts_col, 1).over(w)) > gap_us
    ).cast("int")
    return df.withColumn(
        "session_id",
        F.sum(F.coalesce(new_flag, F.lit(0))).over(wcum).cast("long"),
    )


def session_aggregates(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str | tuple[str, ...] = "turn_idx",
    gap: str = "30 minutes",
) -> DataFrame:
    """A4 per-session rollup: length, duration, tool density, role mix."""
    with_sessions = sessionize(df, entity_col, ts_col, order_col, gap=gap)
    return with_sessions.groupBy(entity_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        ((epoch_us(F.max(ts_col)) - epoch_us(F.min(ts_col))) / 1e6).alias("duration_s"),
        F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
        F.countDistinct("role").alias("n_roles"),
    )
