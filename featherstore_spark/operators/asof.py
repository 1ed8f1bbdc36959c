"""Point-in-time as-of join (SURVEY.md §2.3 J3).

The reference's only "join" is latest-per-entity at t=now
(/root/reference/pkg/storage/duckdb/duckdb.go:617-625); this module
generalizes it: for every spine row (conv_id, ts) find the latest feature
row with ``feature.ts <= spine.ts`` (inclusive, SURVEY C3), breaking equal
timestamps by caller-supplied columns DESC (deterministic, fixes C2).

Three strategies, all shuffle exactly once on the entity key:

- ``window`` (union-marker): union spine+features, one window pass with
  ``last(feature_struct, ignorenulls)`` over
  ``rowsBetween(unboundedPreceding, current)``.  Pure DataFrame — whole-
  stage codegen, no Python.  Default; correct everywhere; its weakness is a
  single window partition per entity (a mega-conversation = one task).
- ``cogroup``: ``spine.cogroup(features).applyInPandas`` with
  ``pandas.merge_asof`` per entity.  Arrow-vectorized, zero per-row Python.
- ``bucketed``: the skew-safe scale path — both sides bucketed by fixed
  time ranges, per-(entity, bucket) merge_asof, with each bucket's
  boundary row carried forward via a cheap bucket-granularity union-marker
  window so as-of stays correct across bucket edges (SURVEY §7.4).  A
  mega-conversation splits into (time-range) many independent tasks.

Leakage guarantee: every strategy only ever reads feature rows with
``ts <= spine.ts`` — enforced structurally (window frame ends at the
current row; merge_asof direction='backward') — tested adversarially with
poisoned future values (tests/test_leakage.py).
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featherstore_spark.functions.time import epoch_us, interval_to_us as _interval_to_us

DEFAULT_PREFIX = "f_"


def _value_cols(features: DataFrame, on: str, ts: str, tiebreaks: Sequence[str]) -> list[str]:
    skip = {on, ts}
    return [c for c in features.columns if c not in skip]


def _output_schema(spine: DataFrame, features: DataFrame, on: str, ts: str, prefix: str, val_cols: list[str]) -> T.StructType:
    fields = list(spine.schema.fields)
    ftypes = {f.name: f.dataType for f in features.schema.fields}
    fields.append(T.StructField(prefix + ts, ftypes[ts], True))
    for c in val_cols:
        fields.append(T.StructField(prefix + c, ftypes[c], True))
    return T.StructType(fields)


#: Candidate bucket widths for ``bucket="auto"`` (µs), finest → coarsest.
#: A fixed grid keeps the choice deterministic and cache-friendly: the
#: same corpus stats always select the same width.
AUTO_BUCKET_GRID_US = (
    60_000_000,  # 1 minute
    300_000_000,  # 5 minutes
    900_000_000,  # 15 minutes
    3_600_000_000,  # 1 hour
    21_600_000_000,  # 6 hours
    86_400_000_000,  # 1 day
    604_800_000_000,  # 7 days
)
_DAY_US = 86_400_000_000
#: Above this optimizer size estimate the auto-width stats pass samples.
_AUTO_SAMPLE_BYTES = 4 << 30


def auto_bucket_width_us(
    features: DataFrame,
    on: str = "conv_id",
    ts: str = "ts",
    target_rows: int = 50_000,
    sample_fraction: float | None = None,
) -> int:
    """Data-driven as-of bucket width: the COARSEST grid width whose
    hottest per-(entity, bucket) pandas group stays under ``target_rows``.

    The binding constraint of the bucketed strategy is the single densest
    entity's rows inside one time bucket (a mega-conversation shares one
    salt, so its bucket rows land in ONE merge_asof frame).  Statistic:
    max per-(entity, day) row count — one map-side-combinable aggregation
    whose shuffle carries only (entity x day) partial counts, or a sampled
    estimate via ``sample_fraction`` (scaled back up; sampling UNDER-
    estimates the max, so sampled runs keep a 2x safety margin).

    ``sample_fraction=None`` auto-samples when the input's optimizer size
    estimate exceeds ~4 GiB (driver-side plan stat, zero jobs): at corpus
    scale the stats pass reads a bounded sample instead of every row.
    Callers that already know the width should pass it straight to
    ``asof_join(bucket=<µs>)`` — no stats job runs at all (and the
    checkpoint CLI caches the resolved width in the manifest).
    """
    if sample_fraction is None:
        # Catalyst's sizeInBytes estimate for the plan: free to read, and
        # only the ORDER of magnitude matters for choosing to sample.
        # Plans without real stats (LogicalRDD, some local relations)
        # report the defaultSizeInBytes sentinel (~Long.MaxValue) — treat
        # anything implausibly huge as unknown and do NOT sample: the
        # scale case (parquet/Iceberg scans) always carries a real size.
        est = int(features._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        if _AUTO_SAMPLE_BYTES < est < (1 << 60):
            sample_fraction = max(0.01, min(1.0, _AUTO_SAMPLE_BYTES / est))
    df = features.sample(fraction=sample_fraction, seed=42) if sample_fraction else features
    hot = (
        df.groupBy(F.col(on), F.floor(epoch_us(ts) / F.lit(_DAY_US)).alias("__d"))
        .count()
        .agg(F.max("count"))
        .first()[0]
    )
    if not hot:  # empty input: any width works, pick 1 day
        return _DAY_US
    hot = int(hot / sample_fraction * 2) if sample_fraction else int(hot)
    density_per_us = hot / _DAY_US  # rows/µs of the hottest entity-day
    for width in reversed(AUTO_BUCKET_GRID_US):
        if density_per_us * width <= target_rows:
            return width
    return AUTO_BUCKET_GRID_US[0]


def asof_join(
    spine: DataFrame,
    features: DataFrame,
    on: str = "conv_id",
    ts: str = "ts",
    tiebreaks: Sequence[str] = (),
    prefix: str = DEFAULT_PREFIX,
    strategy: str = "window",
    bucket: str | int = "1 day",
    n_salts: int = 32,
    target_rows: int = 50_000,
    tolerance: str | int | None = None,
) -> DataFrame:
    """Enrich every spine row with the latest preceding feature row.

    Output = spine columns + ``{prefix}{ts}`` (matched feature timestamp,
    null when no feature precedes the spine point) + ``{prefix}{col}`` for
    every feature value column.  ``n_salts`` bounds the pandas group count
    for the cogroup strategies (groups = salts, or time-buckets x salts).

    ``bucket`` (bucketed strategy): an interval string, a width in µs, or
    ``"auto"`` — sized from the corpus's hottest entity-day density so the
    largest pandas group stays under ``target_rows`` (SURVEY §7.4's two
    knobs, now data-driven).

    ``tolerance`` (feature TTL): an interval string or µs width; a match
    older than ``spine.ts − tolerance`` is nulled out (INCLUSIVE at the
    boundary: staleness == tolerance still matches, like pandas
    merge_asof).  Expired features serving as fresh is the online-store
    staleness bug; the filter is one post-match codegen projection —
    the latest match older than the TTL proves no in-window feature
    exists, so no strategy needs a second scan.
    """
    tiebreaks = [c for c in tiebreaks if c in features.columns]
    val_cols = _value_cols(features, on, ts, tiebreaks)
    if strategy == "bucketed" and bucket == "auto":
        bucket = auto_bucket_width_us(features, on, ts, target_rows)
    if strategy == "window":
        out = _asof_window(spine, features, on, ts, tiebreaks, prefix, val_cols)
    elif strategy == "cogroup":
        out = _asof_cogroup(spine, features, on, ts, tiebreaks, prefix, val_cols, bucket=None, n_salts=n_salts)
    elif strategy == "bucketed":
        out = _asof_cogroup(spine, features, on, ts, tiebreaks, prefix, val_cols, bucket=bucket, n_salts=n_salts)
    else:
        raise ValueError(f"unknown as-of strategy {strategy!r}")
    if tolerance is None:
        return out
    tol_us = _interval_to_us(tolerance) if isinstance(tolerance, str) else int(tolerance)
    if tol_us < 0:
        raise ValueError(f"tolerance must be non-negative, got {tolerance!r}")
    fresh = epoch_us(prefix + ts) >= epoch_us(ts) - F.lit(tol_us)
    return out.select(
        *spine.columns,
        *[
            F.when(fresh, F.col(prefix + c)).otherwise(F.lit(None)).alias(prefix + c)
            for c in [ts, *val_cols]
        ],
    )


# ---------------------------------------------------------------- window --

def _asof_window(spine, features, on, ts, tiebreaks, prefix, val_cols):
    # Feature payload rides in one struct so last(..., ignorenulls) picks a
    # whole ROW atomically — a null VALUE inside a later feature row must
    # still shadow earlier rows.
    feat_struct = F.struct(F.col(ts).alias(ts), *[F.col(c).alias(c) for c in val_cols])
    spine_cols = spine.columns
    spine_extra = [c for c in spine_cols if c not in (on, ts)]

    f_side = features.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("__is_spine"),
        *[F.col(c).alias(f"__tb_{c}") for c in tiebreaks],
        feat_struct.alias("__feat"),
        *[F.lit(None).cast(spine.schema[c].dataType).alias(c) for c in spine_extra],
    )
    s_side = spine.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("__is_spine"),
        *[F.lit(None).cast(features.schema[c].dataType).alias(f"__tb_{c}") for c in tiebreaks],
        F.lit(None).cast(f_side.schema["__feat"].dataType).alias("__feat"),
        *spine_extra,
    )
    unioned = f_side.unionByName(s_side)

    # Ordering: (ts, is_spine, tiebreaks): at equal ts all feature rows sort
    # BEFORE the spine row (inclusive as-of), and among equal-ts features
    # the max-tiebreak row is last — exactly the row last() returns.
    order = [F.col(ts).asc(), F.col("__is_spine").asc()] + [F.col(f"__tb_{c}").asc_nulls_first() for c in tiebreaks]
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    matched = unioned.withColumn("__m", F.last("__feat", ignorenulls=True).over(w)).where(F.col("__is_spine") == 1)

    return matched.select(
        *spine_cols,
        F.col(f"__m.{ts}").alias(prefix + ts),
        *[F.col(f"__m.{c}").alias(prefix + c) for c in val_cols],
    )


# ----------------------------------------------------- cogroup / bucketed --

def _asof_cogroup(spine, features, on, ts, tiebreaks, prefix, val_cols, bucket, n_salts=32):
    out_schema = _output_schema(spine, features, on, ts, prefix, val_cols)
    spine_cols = spine.columns
    out_cols = [f.name for f in out_schema.fields]
    f_cols = [prefix + ts] + [prefix + c for c in val_cols]
    sort_right = [ts] + list(tiebreaks)

    # Grouping design: the pandas-group key is NEVER the raw entity — a
    # per-entity group pays ~2-4 ms of Arrow->pandas frame construction,
    # which at millions of entities dwarfs the actual merge.  Instead the
    # group key is a bounded salt (hash(entity) % n_salts, optionally x a
    # time bucket), so group count is O(parallelism), each group holds many
    # entities, and ONE vectorized ``merge_asof(by=entity)`` call handles
    # them all.
    salt = F.pmod(F.xxhash64(F.col(on)), F.lit(n_salts))

    # Spine and features often share lineage (e.g. two filters of one
    # table).  Cogroup then dedups right-side attributes whose expression
    # ids also appear on the left, silently dropping columns — so the right
    # side is re-aliased to fresh names (fresh expr ids) and renamed back
    # inside the pandas merge.
    _r = "__r_"

    def _realias(df):
        # every non-key column gets a fresh alias (fresh expr id) — the
        # entity column included, since only __g is a grouping key
        return df.select(
            *([F.col("__g")] if "__g" in df.columns else []),
            *[F.col(c).alias(_r + c) for c in df.columns if c != "__g"],
        )

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        right = right.rename(columns={c: c[len(_r):] for c in right.columns if c.startswith(_r)})
        left = left[spine_cols]
        if len(left) == 0:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        if len(right) == 0:
            out = left.copy()
            for c in f_cols:
                out[c] = None
            return out[out_cols]
        # Global (ts, tiebreaks) sort: merge_asof needs the on-key sorted;
        # within each entity the relative (ts, tiebreak) order makes the
        # LAST matching row the max-tiebreak one.  na_position='first'
        # mirrors asc_nulls_first in the window strategy.
        right = right.sort_values(sort_right, kind="mergesort", na_position="first")
        payload = right[[on, ts] + val_cols].rename(
            columns={c: prefix + c for c in [ts] + val_cols}
        )
        payload[ts] = right[ts].to_numpy()
        order = left[ts].to_numpy().argsort(kind="stable")
        merged = pd.merge_asof(
            left.iloc[order], payload, on=ts, by=on,
            direction="backward", allow_exact_matches=True,
        )
        return merged[out_cols]

    if bucket is None:
        sb = spine.withColumn("__g", salt)
        fb = _realias(features.withColumn("__g", salt))
        grouped = sb.groupBy("__g").cogroup(fb.groupBy("__g"))
        return grouped.applyInPandas(merge, schema=out_schema)

    width_us = bucket if isinstance(bucket, int) else _interval_to_us(bucket)
    b_of = lambda c: F.floor(epoch_us(c) / F.lit(width_us))  # noqa: E731

    fb = features.withColumn("__b", b_of(ts))
    sb = spine.withColumn("__b", b_of(ts))

    # Boundary carry (bucket-granularity union-marker): for every spine
    # bucket, the single latest feature row from any STRICTLY earlier
    # bucket.  Rows here are one-per-(entity,bucket) — tiny — so the window
    # over `on` cannot skew even when raw data does.
    last_order = [F.col(ts).desc()] + [F.col(c).desc() for c in tiebreaks]
    wlast = Window.partitionBy(on, "__b").orderBy(*last_order)
    feat_struct = F.struct(F.col(ts).alias(ts), *[F.col(c).alias(c) for c in val_cols])
    boundary = (
        fb.withColumn("__rn", F.row_number().over(wlast))
        .where(F.col("__rn") == 1)
        .select(on, "__b", F.lit(1).alias("__is_boundary"), feat_struct.alias("__feat"))
    )
    probes = sb.select(on, "__b").distinct().select(
        on, "__b", F.lit(0).alias("__is_boundary"),
        F.lit(None).cast(boundary.schema["__feat"].dataType).alias("__feat"),
    )
    wcarry = (
        Window.partitionBy(on)
        .orderBy(F.col("__b").asc(), F.col("__is_boundary").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        boundary.unionByName(probes)
        .withColumn("__c", F.last("__feat", ignorenulls=True).over(wcarry))
        .where((F.col("__is_boundary") == 0) & F.col("__c").isNotNull())
        .select(
            F.col(on),
            F.col("__b"),
            F.col(f"__c.{ts}").alias(ts),
            *[F.col(f"__c.{c}").alias(c) for c in val_cols],
            *[F.lit(None).cast(features.schema[c].dataType).alias(c) for c in tiebreaks if c not in val_cols],
        )
    )
    # carried rows join the in-bucket features; tiebreak nulls sort first so
    # a real in-bucket row at the same ts still wins.
    fb_aug = fb.select(on, "__b", ts, *val_cols, *[c for c in tiebreaks if c not in val_cols]) \
        .unionByName(carried.select(on, "__b", ts, *val_cols, *[c for c in tiebreaks if c not in val_cols]))

    # Combined group key: time bucket x entity salt — the time axis splits
    # mega-entities (skew), the salt axis bounds group count; entities
    # inside a group are handled by merge_asof(by=entity) in one call.
    g_expr = (F.col("__b") * n_salts + F.pmod(F.xxhash64(F.col(on)), F.lit(n_salts))).cast("long")
    sb_g = sb.withColumn("__g", g_expr).drop("__b")
    fb_g = _realias(fb_aug.withColumn("__g", g_expr).drop("__b"))
    grouped = sb_g.groupBy("__g").cogroup(fb_g.groupBy("__g"))
    return grouped.applyInPandas(merge, schema=out_schema)
