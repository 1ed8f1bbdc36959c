"""Deterministic synthetic transcript corpus (FIXTURES.md §1-2).

Everything is derived from ``xxhash64(conv_id, turn_idx, seed)`` with
built-in column functions — zero Python in the data path, so generation
itself distributes across executors and scales to the bench tiers (tens of
millions of turns) without driver involvement.  The same (conv_id,
turn_idx, seed) always yields byte-identical rows regardless of
parallelism, which the per-turn text byte-equality invariant requires.

Shape matches BASELINE.json input_hint:
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
 ts:timestamp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_BASE_EPOCH_US = 1_767_225_600_000_000  # 2026-01-01 00:00:00 UTC in µs

_VOCAB = [
    "query", "plan", "shuffle", "join", "window", "feature", "vector",
    "spark", "arrow", "batch", "column", "table", "agg", "session", "tool",
    "turn", "data", "scan", "filter", "sort", "hash", "merge", "spine",
    "asof", "lag", "lead", "bucket", "salt", "skew", "text", "token", "row",
]


def _h(*cols, seed: int):
    """Deterministic 64-bit hash of the given columns + seed."""
    return F.xxhash64(*cols, F.lit(seed))


def _u01(*cols, seed: int):
    """Uniform (0,1) derived from the hash (strictly positive)."""
    return (F.pmod(_h(*cols, seed=seed), F.lit(1_000_000)) + 1) / 1_000_001.0


def generate_transcripts(
    spark: SparkSession,
    n_convs: int = 2_000,
    mean_turns: int = 30,
    seed: int = 42,
    skew: bool = False,
    mean_gap_s: float = 45.0,
    session_gap_heavy: bool = False,
    n_partitions: int | None = None,
) -> DataFrame:
    """Build the transcript table.

    - turns per conversation: 1 + hash-uniform in [0, 2*mean_turns) so the
      corpus includes single-turn conversations (session edge case).
    - ``skew=True``: conversation 0 holds ~50% of all turns, 10 warm
      conversations hold 25%, the tail is uniform (FIXTURES skew variant).
    - gaps: exponential-ish (inverse-CDF of hash-uniform), mean
      ``mean_gap_s``; ~0.1% of adjacent turns get gap=0 (timestamp ties,
      SURVEY C2 tie-break tests).  ``session_gap_heavy=True`` makes ~20% of
      gaps exceed 30 min, including gaps exactly at the threshold.
    """
    total_turns = n_convs * mean_turns
    convs = spark.range(n_convs).withColumnRenamed("id", "conv_nr")
    if skew:
        warm = min(10, max(1, n_convs - 1))
        tail = max(1, n_convs - 1 - warm)
        convs = convs.withColumn(
            "n_turns",
            F.when(F.col("conv_nr") == 0, F.lit(int(total_turns * 0.5)))
            .when(F.col("conv_nr") <= warm, F.lit(max(1, int(total_turns * 0.25 / warm))))
            .otherwise(F.greatest(F.lit(1), F.lit(int(total_turns * 0.25 / tail)))),
        )
    else:
        convs = convs.withColumn(
            "n_turns",
            1 + F.pmod(_h(F.col("conv_nr"), seed=seed + 1), F.lit(2 * mean_turns - 1)),
        )

    df = (
        convs.withColumn("conv_id", F.format_string("conv_%08d", F.col("conv_nr")))
        .withColumn("turn_idx", F.explode(F.sequence(F.lit(0), (F.col("n_turns") - 1).cast("int"))))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .drop("n_turns")
    )
    if n_partitions:
        df = df.repartition(n_partitions, "conv_id")

    h = _h(F.col("conv_id"), F.col("turn_idx"), seed=seed)
    u = _u01(F.col("conv_id"), F.col("turn_idx"), seed=seed + 2)

    # --- role: cyclic user/assistant; ~2% of first turns are 'system';
    # occasional 'tool' turn following the cycle (FIXTURES role rule).
    role = (
        F.when((F.col("turn_idx") == 0) & (F.pmod(h, F.lit(50)) == 0), F.lit("system"))
        .when(F.pmod(h, F.lit(23)) == 0, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 0, F.lit("user"))
        .otherwise(F.lit("assistant"))
    )
    df = df.withColumn("role", role)

    # --- tool: ~30% of assistant turns call one of 4 tools; null otherwise.
    tools = F.array(F.lit("search"), F.lit("code"), F.lit("browser"), F.lit("calc"))
    df = df.withColumn(
        "tool",
        F.when(
            (F.col("role") == "assistant") & (F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 3), F.lit(10)) < 3),
            F.element_at(tools, (F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 4), F.lit(4)) + 1).cast("int")),
        ).otherwise(F.lit(None).cast("string")),
    )

    # --- text: deterministic token soup; length ~ quadratic-stretched
    # hash-uniform in [10, 2000] chars.  Built by repeating an 8-word
    # phrase picked from the vocab and trimming to the target length.
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = [
        F.element_at(vocab, (F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 10 + i), F.lit(len(_VOCAB))) + 1).cast("int"))
        for i in range(8)
    ]
    phrase = F.concat_ws(" ", *words)
    target_len = (10 + F.pow(F.pmod(h, F.lit(1000)) / 1000.0, 2.0) * 1990).cast("int")
    df = df.withColumn(
        "text",
        F.rtrim(F.substring(F.repeat(F.concat(phrase, F.lit(" ")), 50), 1, 2000).substr(F.lit(1), target_len)),
    )

    # --- ts: base + per-conv offset + running sum of per-turn gaps.
    # Gap = inverse-CDF exponential of hash-uniform (mean mean_gap_s);
    # ties: ~1/997 of turns get gap 0 (C2);
    # session_gap_heavy: ~20% of gaps are >= 30 min (incl. exactly 30 min).
    gap_us = (-F.log(1.0 - u) * mean_gap_s * 1e6).cast("long")
    if session_gap_heavy:
        bump = F.pmod(_h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 5), F.lit(10))
        gap_us = (
            F.when(bump == 0, F.lit(30 * 60 * 1_000_000))  # exactly the threshold
            .when(bump == 1, F.lit(30 * 60 * 1_000_000) + (gap_us + 1))
            .otherwise(gap_us)
        )
    gap_us = F.when(F.pmod(h, F.lit(997)) == 0, F.lit(0)).otherwise(gap_us)
    gap_us = F.when(F.col("turn_idx") == 0, F.lit(0)).otherwise(gap_us)

    conv_offset_us = F.pmod(_h(F.col("conv_id"), seed=seed + 6), F.lit(86_400_000_000))
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(Window.unboundedPreceding, 0)
    df = df.withColumn(
        "ts",
        F.timestamp_micros(F.lit(_BASE_EPOCH_US) + conv_offset_us + F.sum(gap_us).over(w)),
    )

    return df.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def generate_spine(
    transcripts: DataFrame,
    seed: int = 42,
    unknown_frac: float = 0.01,
) -> DataFrame:
    """As-of join left side (FIXTURES.md §2): a mixture of
    - exact turn timestamps (inclusive-boundary tests),
    - midpoints between adjacent turns,
    - 1s before each conversation's first turn (no-match tests),
    - 1h after each conversation's last turn,
    - ~1% unknown conv_ids (null-match tests).
    """
    t = transcripts.select("conv_id", "turn_idx", "ts")
    h = _h(F.col("conv_id"), F.col("turn_idx"), seed=seed + 7)
    kind = F.pmod(h, F.lit(4))

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_ts = F.lag("ts").over(w)
    exact = t.where(kind == 0).select("conv_id", "ts")
    mid = (
        t.withColumn("prev_ts", prev_ts)
        .where((kind == 1) & F.col("prev_ts").isNotNull())
        .select(
            "conv_id",
            F.timestamp_micros(
                ((F.unix_micros("prev_ts") + F.unix_micros("ts")) / 2).cast("long")
            ).alias("ts"),
        )
    )
    bounds = t.groupBy("conv_id").agg(F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))
    before = bounds.select("conv_id", F.timestamp_micros(F.unix_micros("first_ts") - 1_000_000).alias("ts"))
    after = bounds.select("conv_id", F.timestamp_micros(F.unix_micros("last_ts") + 3_600_000_000).alias("ts"))
    unknown = (
        bounds.where(_u01(F.col("conv_id"), seed=seed + 8) < unknown_frac)
        .select(F.concat(F.lit("ghost_"), F.col("conv_id")).alias("conv_id"), F.col("first_ts").alias("ts"))
    )
    return exact.unionByName(mid).unionByName(before).unionByName(after).unionByName(unknown)
