"""Structured Streaming counterparts of the batch windowed operators.

The reference has no streaming (request-driven batch ingestion only,
/root/reference/pkg/flight/server.go:352-408; SURVEY §2.9).  The batch
operators in this engine were deliberately designed on watermark-
compatible primitives, so their streaming twins are one-liners:

- A1 tumbling aggregates  -> window() + watermark
- W4 gap sessionization   -> session_window(ts, gap) + watermark
- ingest validation       -> same schema contract on readStream

Late data: rows older than the watermark relative to max event time are
dropped from aggregates — the streaming analogue of the backfill path
(late rows in batch go through checkpoint-resumed re-materialization of
their partitions instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from featherstore_spark.schema import TRANSCRIPT_SCHEMA


def read_transcript_stream(spark: SparkSession, path: str, max_files: int = 64) -> DataFrame:
    """File-source transcript stream with the declared schema (schema
    enforcement at the ingest boundary, as batch validate_transcripts)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


def streaming_tumbling_aggregates(
    stream: DataFrame,
    width: str = "5 minutes",
    watermark: str = "30 minutes",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of windows.tumbling_aggregates (same output names)."""
    win = F.window(F.col(ts_col), width)
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(entity_col), win.start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
            F.round(F.avg(F.col("tool").isNotNull().cast("int")), 6).alias("tool_rate"),
            # exact distinct is unsupported on streaming aggregates
            F.approx_count_distinct("role").alias("n_roles_approx"),
            F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("text_chars"),
        )
    )


def streaming_sessions(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of sessionize.session_aggregates using the native
    ``session_window`` (gap-merged windows; same gap semantics: a row at
    exactly gap distance extends the session)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(entity_col), F.session_window(F.col(ts_col), gap))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.sum(F.col("tool").isNotNull().cast("int")).alias("n_tool_calls"),
            F.approx_count_distinct("role").alias("n_roles_approx"),
        )
        .select(
            entity_col,
            F.col("session_window.start").alias("session_start"),
            "n_turns",
            "n_tool_calls",
            "n_roles_approx",
        )
    )


def streaming_cumulative_features(
    stream: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Custom STATEFUL streaming operator via ``applyInPandasWithState``:
    per-conversation running counters (cum_turns, cum_tool_calls — the
    same cumulative features batch ``turn_features`` computes with an
    unbounded-preceding window) maintained in per-key GroupState across
    micro-batches.

    This is the pattern for operators Spark's windowed streaming
    aggregates cannot express (running per-row state emitted per input
    row).  State per key is three longs — O(active conversations) in the
    state store, not O(turns).

    Ordering contract, ENFORCED not assumed: rows within a micro-batch
    are sorted by turn_idx before accumulating, and the state carries the
    highest turn_idx already consumed per conversation — a later micro-
    batch delivering an earlier-or-equal turn (out-of-order arrival,
    replayed turn) raises immediately instead of silently producing wrong
    cumulative counters.  Out-of-order backfills go through the batch
    checkpoint path instead (plans/checkpoint.py), which recomputes whole
    buckets and cannot double-count.
    """
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField(entity_col, T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField(ts_col, T.TimestampType()),
            T.StructField("cum_turns", T.LongType()),
            T.StructField("cum_tool_calls", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("cum_turns", T.LongType()),
            T.StructField("cum_tool_calls", T.LongType()),
            T.StructField("max_turn_idx", T.LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        import numpy as np

        turns, tools, max_seen = state.get if state.exists else (0, 0, -1)
        # reset_index after the sort: DataFrame construction aligns Series
        # by index, so sorted Series + positional arrays would interleave
        pdf = (
            pd.concat(list(pdfs), ignore_index=True)
            .sort_values("turn_idx")
            .reset_index(drop=True)
        )
        if len(pdf) == 0:  # pragma: no cover - NoTimeout never calls with empty
            return
        # fail LOUDLY on out-of-order arrival across micro-batches (and on
        # a replayed/duplicated turn): silent wrong counters are the worst
        # failure mode of running state
        first = int(pdf["turn_idx"].iloc[0])
        if first <= max_seen:
            raise ValueError(
                f"out-of-order arrival for {key}: turn_idx {first} after "
                f"already-consumed turn_idx {max_seen}; replay/backfill must go "
                "through the batch checkpoint path (plans/checkpoint.py)"
            )
        is_tool = pdf["tool"].notna().astype("int64")
        out = pd.DataFrame(
            {
                entity_col: pdf[entity_col],
                "turn_idx": pdf["turn_idx"],
                ts_col: pdf[ts_col],
                "cum_turns": turns + np.arange(1, len(pdf) + 1, dtype="int64"),
                "cum_tool_calls": tools + is_tool.cumsum(),
            }
        )
        state.update(
            (turns + len(pdf), tools + int(is_tool.sum()), int(pdf["turn_idx"].iloc[-1]))
        )
        yield out

    return stream.groupBy(entity_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_stream_to_table(out_df: DataFrame, target_dir: str, checkpoint_dir: str):
    """availableNow trigger: process the whole backlog then stop — the
    streaming analogue of a batch backfill, restartable from the stream
    checkpoint (exactly-once sink via idempotent file commits)."""
    return (
        out_df.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
