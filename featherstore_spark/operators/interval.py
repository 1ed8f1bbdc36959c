"""Interval (range) join: points into [start, end] windows, equi-join
shaped.

The reference has no two-table join at all (SURVEY §2.3 — its 'join' is
the implicit as-of retrieval); Spark expresses a range join naturally as
a non-equi condition, but Catalyst plans that as BroadcastNestedLoopJoin
(small side) or CartesianProduct — both scale-killers.  This operator is
the 100 TB shape: quantize time into fixed-width buckets, EXPLODE each
interval over the buckets it covers, map each point to its single
bucket, equi-join on (keys…, bucket), then apply the exact range filter.
Each (interval, bucket) copy is unique and a point lives in exactly one
bucket, so no post-join dedup is needed — every qualifying (point,
interval) pair appears exactly once.

Cost model: the interval side inflates by ~(mean_length / width + 1)
copies; the join is a plain shuffled equi-join (AQE-skew-splittable,
co-partitionable with the rest of a pipeline on the same keys).  Width
picks the trade: too narrow inflates intervals, too wide degrades the
join into per-bucket mini cross products.  ``width='auto'`` samples the
p95 interval length and uses it (clamped to [1 s, 7 d]) — the same
estimate-gated adaptivity as asof.py's auto bucket width.  A hard
``max_span_buckets`` guard fails loudly on pathological intervals
(an open-ended interval exploding to millions of copies is a bug in the
caller's data, not a reason to OOM the cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featherstore_spark.functions.time import epoch_us, interval_to_us


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str | None,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    width: str | int = "auto",
    how: str = "inner",
    max_span_buckets: int = 100_000,
) -> DataFrame:
    """Join every point row to every interval row (same ``on`` keys)
    with ``start <= point_ts <= end`` (closed ends, NULL-safe: NULL
    bounds never match).  ``how`` is 'inner' or 'left' (left keeps
    unmatched points with NULL interval columns).

    Returns all point columns plus all interval columns (caller aliases
    collisions away beforehand; overlapping names raise).
    """
    keys = [on] if isinstance(on, str) else list(on or [])
    dup = set(points.columns) & set(intervals.columns) - set(keys)
    if dup:
        raise ValueError(
            f"interval_join: ambiguous columns {sorted(dup)} on both sides — "
            "alias them before joining (silent _1/_2 suffixes hide bugs)"
        )
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join: how={how!r} (expected 'inner' or 'left')")

    if width == "auto":
        stats = intervals.select(
            F.percentile_approx(
                epoch_us(end_col) - epoch_us(start_col), F.lit(0.95), F.lit(1000)
            ).alias("p95")
        ).collect()[0]
        w_us = int(min(max(stats["p95"] or 1_000_000, 1_000_000), 7 * 86_400_000_000))
    elif isinstance(width, str):
        w_us = interval_to_us(width)
    else:
        w_us = int(width)

    s_us, e_us = epoch_us(start_col), epoch_us(end_col)
    span = F.floor(e_us / w_us) - F.floor(s_us / w_us)
    iv = (
        intervals.where(s_us.isNotNull() & e_us.isNotNull() & (s_us <= e_us))
        .withColumn(
            "__bucket",
            F.explode(
                F.sequence(
                    F.floor(s_us / w_us),
                    F.when(
                        span <= max_span_buckets, F.floor(e_us / w_us)
                    ).otherwise(
                        F.raise_error(
                            F.concat(
                                F.lit(
                                    f"interval_join: interval spans more than "
                                    f"{max_span_buckets} buckets of {w_us} us — "
                                    "widen `width` or fix the interval data"
                                )
                            )
                        ).cast("long")
                    ),
                )
            ),
        )
    )
    pt = points.withColumn("__bucket", F.floor(epoch_us(point_ts) / w_us)).alias("__p")
    iv = iv.alias("__i")
    cond = F.col("__p.__bucket") == F.col("__i.__bucket")
    for k in keys:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    p_ts = epoch_us(F.col(f"__p.{point_ts}"))
    cond = (
        cond
        & (p_ts >= epoch_us(F.col(f"__i.{start_col}")))
        & (p_ts <= epoch_us(F.col(f"__i.{end_col}")))
    )
    # the range predicate lives IN the join condition, so 'left' keeps
    # unmatched points natively (equi keys drive the shuffle; the range
    # part is evaluated post-match within each bucket)
    out_cols = [F.col(f"__p.{c}") for c in points.columns] + [
        F.col(f"__i.{c}") for c in intervals.columns if c not in keys
    ]
    return pt.join(iv, cond, how).select(*out_cols)
