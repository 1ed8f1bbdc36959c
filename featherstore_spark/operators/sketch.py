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
            tmp = pdf.loc[vals.index, keys].copy()
            tmp["__v"] = vals
            # dedup (keys, value) BEFORE hashing: the sketch keeps only
            # distinct hashes per key, so md5 per occurrence is pure
            # waste on repeated values (the common case for entity ids)
            tmp = tmp.drop_duplicates()
            tmp["__h"] = tmp["__v"].map(
                lambda s: int(hashlib.md5(str(s).encode("utf-8")).hexdigest()[:15], 16)
            )
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
    from featherstore_spark.functions.text import balance_small_input

    keys = [keys] if isinstance(keys, str) else list(keys)
    # the per-value python md5 runs map-side in the scan stage; rebalance
    # small single-split inputs so it parallelizes (estimate-gated no-op
    # at scale)
    src = balance_small_input(df).select(*keys, F.col(col).cast("string").alias("__v"))
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


# --------------------------------------------------------------------------
# Bloom filter (deterministic, broadcastable membership pushdown)
# --------------------------------------------------------------------------
#
# Why not Spark's built-in BloomFilter / bloom_filter_agg: its hash
# (Murmur3-128 on the JVM) is not reproducible in DuckDB, so a built-in
# filter could only ever be rows-only-checked.  This one derives every
# bit position from md5_long60 (the repo's cross-engine primitive), so
# the filter words AND every probe verdict are bit-identical in Spark,
# DuckDB and pure python — value-checkable end to end.
#
# Layout: n_bits bits as n_bits/32 BIGINT words using only the LOW 32
# bits of each word — masks are 1L << (pos % 32), max shift 31, so no
# word is ever negative and no engine's signed-shift semantics are in
# play.  Position i of a key = md5_long60('bf:{seed}:{i}:' || key) %
# n_bits.  The filter has NO false negatives (a truly-present key always
# probes true), the standard (1 - e^(-kn/m))^k false-positive rate, and
# the build is a map-combinable bit_or aggregate — shards merge by OR.
#
# Scale role: the collected word array is n_bits/8 bytes (8 KiB at the
# 2^16 default) — small enough to inline as a broadcast literal, which
# turns membership testing into a PURE map-side expression: the probing
# table never shuffles at all.  That is the decontamination fast path
# (dedup.bloom_contamination_hits): benchmark fingerprints build the
# filter once; 100 TB of training fingerprints stream through a codegen
# filter with zero exchange.


def bloom_positions(key, n_bits: int = 1 << 16, n_hashes: int = 4, seed: int = 42):
    """array<long> of the ``n_hashes`` bit positions of ``key`` (NULL key
    -> NULL positions; callers filter)."""
    c = F.col(key) if isinstance(key, str) else key
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda i: F.pmod(
            md5_long60(
                F.concat(
                    F.lit(f"bf:{seed}:"), i.cast("string"), F.lit(":"), c.cast("string")
                )
            ),
            F.lit(n_bits),
        ),
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Build the filter as (word_idx int, word long) rows — ONE explode
    (n_hashes rows per key) into a map-combinable ``bit_or`` aggregate.
    Mergeable: the union filter of two shards is bit_or over their rows
    (``bloom_merge``).  Absent words are all-zero (densified by
    :func:`bloom_words`)."""
    pos = (
        df.where(F.col(key_col).isNotNull())
        .select(F.explode(bloom_positions(key_col, n_bits, n_hashes, seed)).alias("p"))
    )
    return (
        pos.select(
            F.floor(F.col("p") / 32).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("p") % 32).cast("int")
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_merge(filters: DataFrame) -> DataFrame:
    """OR-merge filter shards (rows from several :func:`bloom_build`
    outputs unioned together)."""
    return filters.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def bloom_words(filter_df: DataFrame, n_bits: int = 1 << 16) -> list[int]:
    """Collect a built filter to the dense driver-side word list
    (n_bits/32 longs, 8 KiB at the default) ready to inline as a
    broadcast literal into :func:`bloom_might_contain`."""
    by_idx = {r["word_idx"]: int(r["word"]) for r in filter_df.collect()}
    return [by_idx.get(i, 0) for i in range(n_bits // 32)]


def bloom_might_contain(
    key,
    words: list[int],
    n_bits: int = 1 << 16,
    n_hashes: int = 4,
    seed: int = 42,
):
    """Pure-expression membership probe against an inlined word list:
    true iff ALL n_hashes bits are set.  NULL key -> false.  The literal
    array folds once via from_json (the clustering.py constant-folding
    recipe), so probing is whole-stage-codegen work — no join, no
    shuffle, no Python."""
    import json

    if len(words) != n_bits // 32:
        raise ValueError(f"words must have n_bits/32 = {n_bits // 32} entries, got {len(words)}")
    c = F.col(key) if isinstance(key, str) else key
    warr = F.from_json(F.lit(json.dumps([int(x) for x in words])), "array<bigint>")
    hit = F.forall(
        bloom_positions(c, n_bits, n_hashes, seed),
        lambda p: F.element_at(warr, F.floor(p / 32).cast("int") + 1)
        .bitwiseAND(
            F.call_function("shiftleft", F.lit(1).cast("long"), (p % 32).cast("int"))
        )
        != 0,
    )
    return F.when(c.isNull(), F.lit(False)).otherwise(hit)


def bloom_might_contain_py(
    key, words: list[int], n_bits: int = 1 << 16, n_hashes: int = 4, seed: int = 42
) -> bool:
    """Pure-python reference probe (goldens/tests and driver-side use —
    e.g. the serving tier screening a point lookup before opening a
    dataset)."""
    if key is None:
        return False
    for i in range(n_hashes):
        h = int(
            hashlib.md5(f"bf:{seed}:{i}:{key}".encode("utf-8")).hexdigest()[:15], 16
        )
        p = h % n_bits
        if not (words[p // 32] >> (p % 32)) & 1:
            return False
    return True
