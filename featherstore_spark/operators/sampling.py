"""Deterministic hash-based sampling — the data-mixing layer of a
training-corpus pipeline (source/domain reweighting, train/val/test
splits).  No reference counterpart (featherstore serves features; it does
not compose corpora) — this is part of the training-data operator tier
next to dedup and quality filtering.

Every decision is a pure function of (key, seed) via ``md5_long60``:
re-running at any parallelism, on any engine, keeps EXACTLY the same
rows — reproducible corpus builds, no RNG state, no per-partition seeds —
and the DuckDB twin recomputes the identical bits
(``('0x' || substring(md5(x), 1, 15))::BIGINT``).  At 100 TB each
operator is one codegen'd filter/projection over the scan: no shuffle,
no sampling service, pushdown-friendly.

Thresholds are integer literals computed ONCE in Python
(``rate × 2^60``), so engine and oracle compare against bit-identical
constants instead of racing float arithmetic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featherstore_spark.functions.hashing import md5_long60

_SCALE = 1 << 60  # md5_long60 is uniform on [0, 2^60)


def _u60(key_col: str, seed: int) -> Column:
    """Uniform [0, 2^60) hash of (key, seed) — the sampling coin.

    ``concat`` (NULL-propagating), NOT ``concat_ws`` (NULL-skipping): a
    NULL key must yield a NULL coin so samples DROP the row and
    ``split_assign`` falls through to the last split — exactly what the
    SQL twin's ``key || ':' || seed`` does.  With concat_ws a NULL key
    would hash the bare seed string and silently diverge from the
    oracle (and give every NULL-key row the same fate)."""
    return md5_long60(
        F.concat(F.col(key_col).cast("string"), F.lit(":"), F.lit(str(seed)))
    )


def _threshold(rate: float) -> int:
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"sampling rate must be in [0, 1], got {rate}")
    return int(rate * _SCALE)


def hash_sample(
    df: DataFrame, rate: float, key_col: str, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``.

    Unlike ``DataFrame.sample`` this is stable across runs, partitionings,
    and engines: a row's fate depends only on its key and the seed, so an
    incremental re-build samples supersets consistently and the DuckDB
    twin selects the identical rows."""
    return df.where(_u60(key_col, seed) < F.lit(_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str,
    strata_col: str,
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — domain/source mixing weights
    (e.g. upweight books, downweight boilerplate web).  ``rates`` maps
    stratum value → keep probability; unlisted strata use
    ``default_rate``.  One codegen'd CASE over the scan; the hash coin is
    shared across strata so changing one stratum's rate never reshuffles
    another's sample."""
    thresh: Column = F.lit(_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(_threshold(rate))
        ).otherwise(thresh)
    return df.where(_u60(key_col, seed) < thresh)


def split_assign(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, ...] = (0.98, 0.01, 0.01),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash range — the standard
    leakage-safe train/val/test partition (a key always lands in the
    same split, even across corpus versions, so validation documents can
    never migrate into training between builds)."""
    if len(weights) != len(names):
        raise ValueError("weights and names must have equal length")
    total = sum(weights)
    if not 0.999999 <= total <= 1.000001:
        raise ValueError(f"weights must sum to 1, got {total}")
    u = _u60(key_col, seed)
    cuts = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w
        cuts.append(_threshold(acc))
    # nest from the last cut inward so the FIRST matching cut wins:
    # when(u<c1, n1, when(u<c2, n2, ..., last)); the final split takes
    # the remainder — no float edge at the top end
    expr: Column = F.lit(names[-1])
    for name, cut in zip(names[:-1][::-1], cuts[::-1]):
        expr = F.when(u < F.lit(cut), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def temperature_resample(
    df: DataFrame,
    domain_col: str,
    temperature: float = 2.0,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-based domain mixing (the multilingual/data-mixing
    rule of Lample & Conneau 2019 §3.1, used by LLaMA-class corpus
    builds): resample so domain d's share moves from p_d to
    p_d^(1/T) / Z — T > 1 upsamples rare domains and downsamples
    dominant ones while preserving the expected corpus size.

    Deterministic realization (no RNG): the per-domain multiplier
    m_d = (p_d^(1/T)/Z) · N / n_d splits into floor(m_d) whole copies
    plus one extra copy iff the row's md5 coin falls under
    frac(m_d)·2^60 — an integer threshold, same coin family as
    hash_sample, so re-runs and engines agree row-for-row; m_d < 1
    downsamples by the same rule (0 or 1 copies).  Output = input
    columns + rep_idx (0-based copy index, so replicated rows stay
    distinguishable and downstream shuffles don't collapse them).

    Plan shape: one map-combinable domain count (collected — O(domains)
    driver state), then ONE projection with a broadcast domain->
    (base, threshold) join and an explode of sequence(0, reps-1) —
    no other shuffle at any scale.  The SQL twin recomputes the same
    counts, pow (same-host libm, the char-LM ln precedent) and integer
    thresholds."""
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    counts = df.groupBy(domain_col).count().collect()
    # NULL domains: no share can be computed for them, so they DROP —
    # the same null-key-drops-the-row discipline as _u60's coin (and
    # what the null-unsafe spec join below does naturally); they are
    # excluded from N so the non-null shares are unaffected
    counts = [r for r in counts if r[domain_col] is not None]
    n_total = sum(r["count"] for r in counts)
    if n_total == 0:
        return df.withColumn("rep_idx", F.lit(0)).limit(0)
    inv_t = 1.0 / float(temperature)
    # sum in deterministic domain order so the Python Z matches the
    # oracle's SUM to the last ulp modulo aggregation order (~1e-16)
    rows = sorted((r[domain_col], int(r["count"])) for r in counts)
    ws = {d: pow(n / n_total, inv_t) for d, n in rows}
    z = sum(ws[d] for d, _ in rows)
    spec = []
    for d, n in rows:
        m = ((ws[d] / z) * n_total) / n
        base = int(m)
        thr = int((m - base) * _SCALE)
        spec.append((d, base, thr))
    spark = df.sparkSession
    spec_df = spark.createDataFrame(
        spec, f"{domain_col}: string, __base: int, __thr: long"
    )
    coin = _u60_tagged(id_col, f"tmix:{seed}")
    reps = (F.col("__base") + F.when(coin < F.col("__thr"), 1).otherwise(0)).alias(
        "__reps"
    )
    with_reps = df.join(F.broadcast(spec_df), domain_col).select(*df.columns, reps)
    return (
        with_reps.withColumn(
            "rep_idx",
            F.explode(
                F.when(
                    F.col("__reps") >= 1,
                    F.sequence(F.lit(0), F.col("__reps") - 1),
                ).otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("__reps")
    )


def _u60_tagged(key_col: str, tag: str) -> Column:
    """Tagged sampling coin: md5_long60('tag:key') — a distinct coin
    family per operator so composed pipelines never reuse a coin."""
    return md5_long60(
        F.concat(F.lit(tag), F.lit(":"), F.col(key_col).cast("string"))
    )
