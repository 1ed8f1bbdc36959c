"""Latest-per-entity retrieval (reference ``GetFeatures``).

The reference computes this two divergent ways:
- DuckDB: ``ROW_NUMBER() OVER (PARTITION BY entity_id ORDER BY timestamp
  DESC)`` keep rn=1 (/root/reference/pkg/storage/duckdb/duckdb.go:617-625)
- Parquet: newest-file-first scan, first match per entity wins
  (/root/reference/pkg/storage/parquet/parquet.go:370-412)

Those disagree when one file holds several rows per entity (SURVEY C1) and
neither breaks timestamp ties deterministically (C2).  This engine defines
latest = max(ts) with a caller-supplied tie-break column (``turn_idx`` /
``event_id``) — deterministic and storage-independent.

Scale notes: the window dedup shuffles once on the entity key; Spark plans
it as a per-partition top-1 (no full sort materialization). The optional
``entity_ids`` filter becomes either an IN-list pushed to the parquet scan
(small lists) or a broadcast left-semi join (large spines) — the Spark
equivalents of reference P1/P2 (duckdb.go:608-615, parquet.go:642-676).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Below this many ids we inline an IN-list (pushed down to the scan);
# above it we broadcast-semi-join, like reference J4 at scale.
_IN_LIST_MAX = 1_000


def filter_entities(
    df: DataFrame,
    entity_ids: Sequence[str] | DataFrame | None,
    entity_col: str = "conv_id",
) -> DataFrame:
    """Reference P1/P2 semi-join of a requested entity set against the log."""
    if entity_ids is None:
        return df
    if isinstance(entity_ids, DataFrame):
        spine = entity_ids.select(entity_col).distinct()
        return df.join(F.broadcast(spine), entity_col, "left_semi")
    ids = list(entity_ids)
    if len(ids) <= _IN_LIST_MAX:
        return df.where(F.col(entity_col).isin(ids))
    spark = df.sparkSession
    # spine inherits the entity column's ACTUAL dtype — a hardcoded string
    # schema would make the semi-join long==string, forcing an implicit
    # cast that blocks pushdown (and risks coercion error on big ids)
    spine_schema = T.StructType([df.schema[entity_col]])
    spine = spark.createDataFrame([(i,) for i in ids], spine_schema)
    return df.join(F.broadcast(spine), entity_col, "left_semi")


def latest_per_entity(
    df: DataFrame,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_cols: Sequence[str] = ("turn_idx",),
    entity_ids: Sequence[str] | DataFrame | None = None,
    as_of: object | None = None,
) -> DataFrame:
    """One row per entity: the latest by (ts DESC, tiebreaks DESC).

    ``as_of`` (optional timestamp/str) restricts to rows with ts <= as_of —
    point-in-time retrieval at a single cutoff, the degenerate as-of join.
    """
    out = filter_entities(df, entity_ids, entity_col)
    if as_of is not None:
        out = out.where(F.col(ts_col) <= F.lit(as_of))
    # deliberately NOT rebalanced (r6): the rn=1 window already runs as a
    # WindowGroupLimit partial top-1, and an extra round-robin exchange of
    # the full-width rows measured SLOWER (1.4 s -> 2.4 s at sf1.0) than
    # the single-split partial sort it parallelizes
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols if c in df.columns]
    w = Window.partitionBy(entity_col).orderBy(*order)
    return out.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def history(
    df: DataFrame,
    entity_id: str,
    start,
    end,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Reference ``GetFeatureHistory`` (duckdb.go:683-689): one entity,
    inclusive-inclusive time range (SURVEY C3), newest first.  Partition
    pruning on event time replaces the reference's file-name pruning —
    which used *ingestion* time and silently missed late rows (C4).
    ``tiebreak_cols`` order equal-timestamp rows descending — the same C2
    determinism fix latest_per_entity applies (the reference's ORDER BY
    timestamp DESC alone leaves tie order engine-dependent)."""
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreak_cols]
    return (
        df.where(F.col(entity_col) == entity_id)
        .where(F.col(ts_col).between(F.lit(start), F.lit(end)))
        .orderBy(*order)
    )
