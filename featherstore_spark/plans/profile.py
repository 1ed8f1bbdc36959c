"""One-pass table profiler — the "data card" a training-data pipeline
publishes next to every dataset drop (row counts, null rates, distinct
cardinalities, ranges, means per column).

Scale shape: TWO linear passes, both map-combinable, regardless of
table width —
- basic stats are ONE ``df.agg`` over every profiled column (count/min/
  max/sum partials combine map-side; the output is a single wide row,
  exploded to per-column rows in-plan, so the shuffle carries one row);
- distinct cardinalities come from ONE Arrow-batched ``mapInPandas``
  pass emitting a bounded KMV partial per (column, batch) — O(width×k)
  longs through the merge, never the values (operators/sketch.py
  rationale: deterministic, mergeable, value-checkable, unlike HLL).

NO per-column jobs, no ``count(distinct x, y, z)`` Expand blow-up (that
multiplies scan rows by the distinct-column count), no collect beyond
the final O(width) result.

Cross-engine value-checkability dictates the stat rendering rules:
- int min/max cast to string (identical text in Spark/DuckDB), mean =
  round(sum/count, 6) — exact int sum, one double division;
- timestamp min/max via the micros format both engines print
  identically (date_format 'yyyy-MM-dd HH:mm:ss.SSSSSS' ==
  strftime '%Y-%m-%d %H:%M:%S.%f' — parity-tested);
- float/double min/max via C-style printf '%.6f' (same text both
  engines); their mean and distinct count are NULL by design — a float
  sum is summation-order dependent and float→string casts differ
  between engines, so neither can be value-checked (use
  sketch.histogram_quantiles for checkable numeric distributions);
- string min/max truncate to 64 chars AFTER the min/max (data-card
  display, bounded row size).

Reference scope: featherstore exposes no profiling; this is part of the
training-data tier (SURVEY §2 '+' families).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featherstore_spark.operators.sketch import kmv_estimate, kmv_merge_agg

_INT_TYPES = {"tinyint", "smallint", "int", "bigint"}
_FLOAT_TYPES = {"float", "double"}

#: the timestamp rendering both engines print identically (parity-tested
#: in tests/test_profile.py): Spark date_format pattern / DuckDB strftime.
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def _profile_kmv_gen(cols: list[str], k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = []
            for c in cols:
                vals = pdf[c].dropna()
                if vals.empty:
                    continue
                # dedup BEFORE hashing: the sketch only keeps distinct
                # hashes, so md5 per occurrence is pure waste on
                # low-cardinality columns (event_type etc.)
                hs = {
                    int(hashlib.md5(str(s).encode("utf-8")).hexdigest()[:15], 16)
                    for s in vals.unique()
                }
                rows.append((c, sorted(hs)[:k]))
            if rows:
                yield pd.DataFrame(rows, columns=["col_name", "partial"])

    return gen


def _hash_key(field) -> Column | None:
    """JVM-side string rendering hashed for distinct counting — one cast
    rule per dtype, chosen for cross-engine text identity; None marks a
    dtype whose rendering is not engine-stable (floats, nested)."""
    t = field.dataType.simpleString()
    c = F.col(field.name)
    if t in _INT_TYPES or t == "string" or t == "boolean" or t == "date":
        return c.cast("string")
    if t.startswith("timestamp"):
        return F.date_format(c, TS_FMT_SPARK)
    return None


def profile_table(df: DataFrame, cols: list[str] | None = None, k: int = 128) -> DataFrame:
    """Profile ``cols`` (default: all) of ``df`` into one row per column:
    (col_name, dtype, n_rows, n_null, n_distinct_est, min_s, max_s,
    avg_num).  See the module docstring for the per-dtype rules and the
    two-pass scale shape."""
    from featherstore_spark.functions.text import balance_small_input

    fields = [f for f in df.schema.fields if cols is None or f.name in cols]
    if not fields:
        raise ValueError("no columns to profile")
    # both passes (the wide agg and the KMV mapInPandas) do their real
    # work map-side in the scan stage; a small single-row-group file
    # would serialize them through one task (estimate-gated no-op at
    # scale — guide §2.5 input skew)
    df = balance_small_input(df)
    if cols is not None:
        missing = set(cols) - {f.name for f in fields}
        if missing:
            # a silently-dropped typo would ship a data card missing a
            # column it was asked to profile
            raise ValueError(f"columns not in schema: {sorted(missing)}")

    aggs = [F.count(F.lit(1)).alias("__n")]
    null_str = F.lit(None).cast("string")
    null_dbl = F.lit(None).cast("double")
    per_col: list[dict] = []
    for i, f in enumerate(fields):
        t = f.dataType.simpleString()
        c = F.col(f.name)
        aggs.append(F.count(c).alias(f"nn_{i}"))
        spec = {"name": f.name, "dtype": t, "i": i, "avg": False}
        if t in _INT_TYPES:
            aggs += [
                F.min(c).cast("string").alias(f"mn_{i}"),
                F.max(c).cast("string").alias(f"mx_{i}"),
                F.sum(c).alias(f"sm_{i}"),
            ]
            spec["avg"] = True
        elif t in _FLOAT_TYPES:
            # format_string('%.6f', NULL) prints the literal string
            # 'null' (Java Formatter), unlike every other dtype's
            # cast/date_format and unlike DuckDB's printf — guard so an
            # all-NULL column yields SQL NULL on both engines
            aggs += [
                F.when(F.min(c).isNotNull(), F.format_string("%.6f", F.min(c)))
                .alias(f"mn_{i}"),
                F.when(F.max(c).isNotNull(), F.format_string("%.6f", F.max(c)))
                .alias(f"mx_{i}"),
            ]
        elif t.startswith("timestamp"):
            aggs += [
                F.date_format(F.min(c), TS_FMT_SPARK).alias(f"mn_{i}"),
                F.date_format(F.max(c), TS_FMT_SPARK).alias(f"mx_{i}"),
            ]
        elif t in ("string", "date", "boolean"):
            aggs += [
                F.substring(F.min(c).cast("string"), 1, 64).alias(f"mn_{i}"),
                F.substring(F.max(c).cast("string"), 1, 64).alias(f"mx_{i}"),
            ]
        else:  # nested/binary: counts only
            spec["no_minmax"] = True
        per_col.append(spec)

    one = df.agg(*aggs)
    structs = []
    for spec in per_col:
        i = spec["i"]
        mn = null_str if spec.get("no_minmax") else F.col(f"mn_{i}")
        mx = null_str if spec.get("no_minmax") else F.col(f"mx_{i}")
        avg = (
            F.when(
                F.col(f"nn_{i}") > 0,
                F.round(F.col(f"sm_{i}") / F.col(f"nn_{i}"), 6),
            ).otherwise(null_dbl)
            if spec["avg"]
            else null_dbl
        )
        structs.append(
            F.struct(
                F.lit(spec["name"]).alias("col_name"),
                F.lit(spec["dtype"]).alias("dtype"),
                F.col("__n").cast("long").alias("n_rows"),
                (F.col("__n") - F.col(f"nn_{i}")).cast("long").alias("n_null"),
                mn.alias("min_s"),
                mx.alias("max_s"),
                avg.cast("double").alias("avg_num"),
            )
        )
    basic = one.select(F.explode(F.array(*structs)).alias("s")).select("s.*")

    hash_cols = [(f.name, _hash_key(f)) for f in fields]
    hash_cols = [(n, h) for n, h in hash_cols if h is not None]
    if hash_cols:
        hdf = df.select(*[h.alias(n) for n, h in hash_cols])
        partials = hdf.mapInPandas(
            _profile_kmv_gen([n for n, _ in hash_cols], k),
            schema="col_name string, partial array<long>",
        )
        dist = (
            partials.groupBy("col_name")
            .agg(kmv_merge_agg("partial", k))
            .select("col_name", kmv_estimate("sketch", k).alias("n_distinct_est"))
        )
        basic = basic.join(dist, "col_name", "left")
    else:
        basic = basic.withColumn("n_distinct_est", null_dbl)
    return basic.select(
        "col_name", "dtype", "n_rows", "n_null", "n_distinct_est",
        "min_s", "max_s", "avg_num",
    )
