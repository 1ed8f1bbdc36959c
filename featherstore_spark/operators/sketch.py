"""KMV (k-minimum-values) distinct-count sketch — deterministic,
mergeable, value-checkable.

Why not HyperLogLog: Spark's ``approx_count_distinct`` and DuckDB's
``approx_count_distinct`` use different HLL implementations, so an HLL
estimate can never be value-verified across engines — it would be the
repo's only rows-only query.  KMV gives the same O(k) space / mergeable
/ one-pass properties with a DETERMINISTIC definition: the k smallest
distinct ``md5_long60`` hashes.  That set is order- and partitioning-
independent, so the estimate is bit-identical in Spark, DuckDB and pure
python (Bar-Yossef et al. 2002: est = (k-1) / U(k), U(k) = k-th
smallest normalized hash).

Scale shape: one Arrow-batched ``mapInPandas`` pass emits per-batch
partial sketches (≤ k longs per key per batch — Python is unavoidable
here because Spark has no bounded-state k-smallest-distinct aggregate,
and an unbounded ``collect_set`` per key is exactly the OOM this sketch
exists to avoid); the merge is a map-combinable groupBy whose rows are
bounded arrays, so the shuffle carries O(batches × k) longs per key,
never the raw values.  Merging sketches of disjoint corpora == the
sketch of their union (tested), which is what makes the cascade /
incremental-refresh story work."""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featherstore_spark.functions.hashing import md5_long60

TWO_60 = float(1 << 60)


def _kmv_partials_gen(keys: list[str], k: int):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            vals = pdf["__v"].dropna()
            hs = vals.map(
                lambda s: int(hashlib.md5(str(s).encode("utf-8")).hexdigest()[:15], 16)
            )
            tmp = pdf.loc[hs.index, keys].copy()
            tmp["__h"] = hs
            rows = []
            for kv, grp in tmp.groupby(keys, dropna=False, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                sk = sorted(set(grp["__h"]))[:k]
                rows.append((*kv, sk))
            yield pd.DataFrame(rows, columns=[*keys, "partial"])

    return gen


def kmv_sketch(
    df: DataFrame, keys: list[str] | str, col: str, k: int = 256
) -> DataFrame:
    """Per-``keys`` KMV sketch of distinct ``col`` values (NULLs are
    excluded — NULL is not a value, matching COUNT(DISTINCT)).  Returns
    (keys…, sketch: array<long>) with the k smallest distinct hashes,
    ascending."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    src = df.select(*keys, F.col(col).cast("string").alias("__v"))
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema if f.name != "__v")
    partials = src.mapInPandas(
        _kmv_partials_gen(keys, k), schema=f"{schema}, partial array<long>"
    )
    return partials.groupBy(*keys).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("partial")))), 1, k
        ).alias("sketch")
    )


def kmv_merge(sketches: DataFrame, keys: list[str] | str, k: int = 256) -> DataFrame:
    """Merge sketches (same schema as kmv_sketch output) across rows of
    the same keys — union the hash sets, keep the k smallest."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return sketches.groupBy(*keys).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("sketch")))), 1, k
        ).alias("sketch")
    )


def kmv_estimate(sketch_col, k: int = 256):
    """Distinct-count estimate from a sketch column: exact size when the
    sketch is unsaturated (< k values seen — it IS the distinct set),
    else (k-1) * 2^60 / h_k.  Pure integer inputs into one double
    division, rounded to 6 — bit-identical across engines."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    m = F.size(c)
    return F.when(m < k, m.cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * F.lit(TWO_60) / F.element_at(c, k), 6)
    )


def kmv_distinct(
    df: DataFrame, keys: list[str] | str, col: str, k: int = 256
) -> DataFrame:
    """(keys…, sketch_size, est_distinct) — the end-to-end sketch +
    estimator."""
    keys_l = [keys] if isinstance(keys, str) else list(keys)
    sk = kmv_sketch(df, keys_l, col, k)
    return sk.select(
        *keys_l,
        F.size("sketch").cast("long").alias("sketch_size"),
        kmv_estimate("sketch", k).alias("est_distinct"),
    )


def kmv_estimate_py(hashes: list[int], k: int) -> float:
    """Pure-python reference estimator (for goldens/tests)."""
    sk = sorted(set(hashes))[:k]
    if len(sk) < k:
        return float(len(sk))
    return round((k - 1) * TWO_60 / sk[k - 1], 6)


# Cross-engine twin note: md5_long60(col) in SQL is
# hashing.sql_md5_long60('col::VARCHAR'); the Spark-side pandas hash is
# hashlib.md5(str(value)) over the STRING CAST of the column, so casts
# must agree (the operator casts to string in the JVM before the UDF —
# one cast rule, Spark's).
_ = md5_long60  # re-exported convention anchor
