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


def kmv_merge_agg(col: str, k: int):
    """The ONE merge rule every KMV path uses (batch build, cross-shard
    merge, streaming window agg): union the partial hash arrays, keep
    the k smallest distinct — kept in a single helper so the three
    paths can never silently diverge."""
    return F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list(col)))), 1, k
    ).alias("sketch")


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
    return partials.groupBy(*keys).agg(kmv_merge_agg("partial", k))


def kmv_merge(sketches: DataFrame, keys: list[str] | str, k: int = 256) -> DataFrame:
    """Merge sketches (same schema as kmv_sketch output) across rows of
    the same keys — union the hash sets, keep the k smallest."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    return sketches.groupBy(*keys).agg(kmv_merge_agg("sketch", k))


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


# --------------------------------------------------------------------------
# Histogram quantile sketch (deterministic KLL/t-digest stand-in)
# --------------------------------------------------------------------------

def histogram_quantiles(
    df: DataFrame,
    keys: list[str] | str,
    col: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    bins: int = 128,
) -> DataFrame:
    """Per-``keys`` quantile estimates from a fixed-bin histogram — the
    deterministic, mergeable stand-in for KLL/t-digest (both are
    randomized/order-dependent, so neither can be value-checked across
    engines; ``percentile_approx`` likewise).  Fixed GLOBAL bin edges
    make shard histograms mergeable by plain bin-count addition, and
    every step is IEEE-identical in Spark and DuckDB, so the estimate
    itself is hash-verifiable.

    Algorithm: one exact (min, max, n) pre-pass fixes global edges
    [lo, hi] and width w = (hi-lo)/bins; each value lands in
    min(floor((x-lo)/w), bins-1); a map-combinable groupBy(keys, bin)
    counts; per key a window cumsum over <= bins rows finds, for each
    q, the first bin whose cumulative count reaches ceil(q * n_key);
    the estimate is that bin's UPPER edge (error <= one bin width,
    tested).  NULLs are excluded.  State: O(bins) per key end to end.

    Returns (keys…, n, q<NN> …) with estimates rounded to 6."""
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    stats = df.where(F.col(col).isNotNull()).agg(
        F.min(col).alias("lo"), F.max(col).alias("hi")
    ).collect()[0]
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:
        out = df.select(*keys).limit(0).withColumn("n", F.lit(0).cast("long"))
        for q in qs:
            out = out.withColumn(_qname(q), F.lit(None).cast("double"))
        return out
    lo, hi = float(lo), float(hi)
    w = (hi - lo) / bins
    x = F.col(col).cast("double")
    if w == 0.0:
        bin_expr = F.lit(0)
    else:
        bin_expr = F.least(
            F.floor((x - F.lit(lo)) / F.lit(w)).cast("int"), F.lit(bins - 1)
        )
    cnts = (
        df.where(F.col(col).isNotNull())
        .groupBy(*keys, bin_expr.alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wspec = Window.partitionBy(*keys).orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy(*keys)
    cum = cnts.withColumn("cum", F.sum("c").over(wspec)).withColumn(
        "n", F.sum("c").over(wall)
    )
    aggs = [F.max("n").alias("n")]
    for q in qs:
        hit = F.when(F.col("cum") >= F.ceil(F.lit(float(q)) * F.col("n")), F.col("b"))
        aggs.append(F.min(hit).alias(f"__b_{_qname(q)}"))
    out = cum.groupBy(*keys).agg(*aggs)
    for q in qs:
        b = F.col(f"__b_{_qname(q)}")
        est = F.lit(lo) + (b + 1) * F.lit(w) if w != 0.0 else F.lit(lo)
        out = out.withColumn(_qname(q), F.round(est.cast("double"), 6)).drop(
            f"__b_{_qname(q)}"
        )
    return out


def _qname(q: float) -> str:
    return "q" + str(q).replace("0.", "").ljust(2, "0")
