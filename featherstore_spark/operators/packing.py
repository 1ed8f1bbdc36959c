"""Sequence packing — the corpus-assembly step between cleaning/mixing
and the training loop: documents are laid head-to-tail into fixed-size
token windows ("concat-and-chunk", the standard GPT-style pretraining
batch construction).  No reference counterpart (featherstore serves
features); this completes the training-data tier: dedup → quality →
mix/split → PACK.

Scale shape: a single global greedy pack is inherently sequential, so the
corpus is first salted into ``n_streams`` hash-disjoint streams (the same
way production packers shard); within a stream the layout is ONE window
cumulative sum over a deterministic (coin, key) order.  Parallelism =
``n_streams`` — size it to the cluster, each stream's window partition
streams through one task with no driver involvement.  Everything is
codegen'd window arithmetic: no UDF, no collect, one shuffle (the window
partitioning), and the result is a pure function of (key, seed), so
re-runs and the DuckDB twin place every document at the identical
(stream, bin, offset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featherstore_spark.operators.sampling import _u60


def pack_sequences(
    df: DataFrame,
    size_col: str,
    capacity: int,
    key_col: str,
    n_streams: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Assign every item a (stream, bin, offset) under concat-and-chunk
    packing: items are concatenated in a deterministic hash order within
    their stream and cut into ``capacity``-sized bins; an item whose run
    crosses a cut spans ``n_bins`` windows (exactly how a pretraining
    document straddles packed-sequence boundaries).

    Adds columns: ``stream``, ``bin_id`` (bin where the item starts),
    ``bin_offset`` (start position within that bin), ``n_bins``
    (windows the item touches; 1 for an empty item).  Rows with NULL
    key or NULL/negative size are rejected loudly — silently mis-packed
    training windows are a corrupt-batch bug, not a recoverable row."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if n_streams <= 0:
        raise ValueError(f"n_streams must be positive, got {n_streams}")
    coin = _u60(key_col, seed)
    size = F.col(size_col).cast("long")
    # the validity check rides INSIDE the size expression (raise_error in
    # the otherwise-branch) so it costs zero extra jobs/scans — an eager
    # `bad.count()` probe would read the full corpus twice at scale
    ok = coin.isNotNull() & size.isNotNull() & (size >= 0)
    checked_size = F.when(ok, size).otherwise(
        F.raise_error(
            F.concat_ws(
                " ",
                F.lit(f"pack_sequences: NULL key / NULL or negative {size_col}"),
                F.lit("cannot be packed deterministically: key="),
                F.col(key_col).cast("string"),
                F.lit(f"{size_col}="),
                F.col(size_col).cast("string"),
            )
        )
    )
    marked = df.withColumn("__coin", coin).withColumn("__sz", checked_size)
    stream = F.pmod(F.col("__coin"), F.lit(n_streams)).cast("int")
    w = (
        Window.partitionBy("stream")
        .orderBy("__coin", key_col, "__sz")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum("__sz").over(w), F.lit(0))
    end_incl = cum_excl + F.greatest(F.col("__sz"), F.lit(1)) - 1
    return (
        marked.withColumn("stream", stream)
        .withColumn("bin_id", F.floor(cum_excl / capacity).cast("long"))
        .withColumn("bin_offset", F.pmod(cum_excl, F.lit(capacity)).cast("long"))
        .withColumn(
            "n_bins",
            (F.floor(end_incl / capacity) - F.floor(cum_excl / capacity) + 1).cast("long"),
        )
        .drop("__coin", "__sz")
    )
