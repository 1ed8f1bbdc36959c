"""Deterministic distributed k-means + SemDeDup-style semantic dedup.

Why fixed-point: Lloyd's algorithm is centroid-mean → re-assign, and a
float mean is *summation-order dependent* — two engines (or two runs of
the same engine with different partitioning) can disagree in the last
ulp, flip one boundary assignment, and diverge completely by the next
iteration.  So the whole loop runs in integer space: embeddings are
quantized ONCE (``floor((x + offset) * scale)`` — the ``offset`` keeps
every value non-negative so truncating and flooring division coincide,
which is exactly where Python ``//``, Spark integer math and DuckDB
``//`` agree), distances are exact int64 sums, and centroid updates are
exact integer floor-divisions.  Every intermediate is bit-identical on
any cluster size AND recomputable in DuckDB SQL, so the driver
value-checks the full pipeline (CORRECTNESS gate), not just row counts.

Scale posture (100 TB):
- Seeding is md5-rank selection (smallest ``md5_long60(id)`` wins), the
  same deterministic no-RNG scheme as ``similarity.ivf_assign``
  (reference has no ANN/clustering tier; SURVEY §2 '+' families) —
  one top-k over (hash, id) pairs, k×dim ints to the driver.
- Each Lloyd iteration is ONE corpus scan: assignment is a broadcast of
  k×dim literal ints evaluated JVM-side (no Python, no join), and the
  centroid update is a map-side-combinable ``groupBy(cid)`` with
  dim+1 sum/count partials — the shuffle carries O(tasks × k) partial
  rows, never vectors.  Driver state is O(k × dim) ints per iteration.
- ``iters`` is a FIXED count (no convergence probe), so the job graph
  is static and the SQL twin can unroll it.  SemDeDup-quality clusters
  do not need convergence — 2-4 iterations over a coarse quantizer is
  the published recipe (Abbas et al. 2023, §3: k-means clusters are
  only a blocking structure for within-cluster pairwise cosine).
- ``semantic_dedup`` then self-joins WITHIN clusters only (equi-join on
  cid — shuffle-partitioned, AQE-skew-splittable), with a hot-cluster
  cap reusing the map-combinable guard from ``dedup._drop_hot_keys``;
  there is never a crossJoin and never a corpus broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featherstore_spark.functions.hashing import md5_long60
from featherstore_spark.operators.similarity import _cos

# Fixed-point parameters.  offset=1.0 maps any input in (-1, +inf) to a
# non-negative integer; scale=10^4 keeps 64-dim squared distances below
# 2^35 — exact in int64 AND in the oracle's float64 arithmetic.
Q_SCALE = 10_000
Q_OFFSET = 1.0


def quantize_vec(vec_col, dim: int, scale: int = Q_SCALE, offset: float = Q_OFFSET):
    """array<float> -> array<long>: ``floor((x + offset) * scale)``.

    The float->double cast, the add and the multiply are all IEEE-754
    double ops — bit-identical in Spark and DuckDB — and floor of a
    double is exact, so both engines quantize to the same ints.

    The fixed-point contract is ENFORCED, not assumed: vectors must
    have exactly ``dim`` non-null elements and every quantized value
    must be non-negative (inputs > -offset) — otherwise Python floor
    division and the oracle's truncating division diverge and the
    bit-exactness silently breaks.  Violations raise inside the job
    (the packing.py in-expression raise_error discipline)."""
    v = (F.col(vec_col) if isinstance(vec_col, str) else vec_col).cast("array<double>")
    q = F.transform(
        v, lambda x: F.floor((x + F.lit(float(offset))) * F.lit(float(scale))).cast("long")
    )
    # q_max bounds quantized values so every squared distance stays
    # exact in BOTH int64 and the oracle's float64: (2*q_max)^2 * dim
    # must be < 2^53; 2^20 leaves dist <= 2^48 at dim=64
    q_max = 1 << 20
    bad = (
        v.isNull()  # FIRST: a null array makes the later exists() NULL, not true
        | (F.size(v) != F.lit(int(dim)))
        | F.exists(v, lambda x: x.isNull() | F.isnan(x))
        | F.exists(q, lambda e: (e < 0) | (e > q_max))
    )
    err = F.raise_error(
        F.lit(
            f"kmeans quantize: every vector needs exactly {dim} non-null "
            f"finite elements in (-{offset}, {(q_max / scale) - offset:g}] "
            "(fixed-point cross-engine contract, clustering.py docstring) — "
            "got a null/short vector or a NaN/Inf/out-of-range element"
        )
    )
    return F.when(bad, err.cast("array<long>")).otherwise(q)


def _assign_expr(centroids: list[list[int]], qv_col: str = "qv", q2_col: str = "__q2"):
    """cluster id = argmin over centroids of exact squared distance,
    ties broken by centroid index ASC (struct array_min compares (d,c)
    lexicographically — engine-independent).

    dist_c = ||q||^2 - 2 q·c + ||c||^2, all exact int64: ||q||^2 is
    shared across centroids (computed once into ``q2_col`` by the
    caller), ||c||^2 is a host-side constant, and q·c expands to plain
    scalar literal arithmetic — identical integers to the naive
    per-element (x-y)^2 sum, so the oracle twin needs no change.

    Construction pitfalls measured at sf0.1, all fixed here: (1) a
    zip_with(array(lit…)) distance rebuilt the literal centroid array
    PER ROW — Catalyst does not constant-fold array CONSTRUCTORS
    through HOF lambdas, but it DOES fold ``from_json`` of a literal
    string, which yields a true constant array value; (2) expanding
    q·c to a k×dim-term scalar sum made every Lloyd round recompile a
    512-term whole-stage-codegen method (~2-3 s/round of janino, since
    new centroid literals defeat the codegen cache).  The HOF form over
    the folded constant matrix keeps the generated code tiny and
    centroid-independent: measured 0.7 s/round vs 2-3 s expanded vs
    6 s naive.  The whole argmin is ONE SQL string parsed once."""
    import json

    k = len(centroids)
    cmat = json.dumps([[int(v) for v in c] for c in centroids])
    c2s = json.dumps([sum(int(v) * int(v) for v in c) for c in centroids])
    return F.expr(
        f"array_min(transform(sequence(1, {k}), i -> struct("
        f"{q2_col} - 2L * aggregate(zip_with({qv_col}, "
        f"element_at(from_json('{cmat}', 'array<array<bigint>>'), i), "
        f"(x, y) -> x * y), 0L, (a, t) -> a + t) "
        f"+ element_at(from_json('{c2s}', 'array<bigint>'), i) AS d, "
        f"cast(i - 1 AS int) AS c))).c"
    )


def _with_q2(df: DataFrame) -> DataFrame:
    """Adds ``__q2`` = exact ||qv||^2 (int64) once per row so every
    centroid distance shares it."""
    return df.withColumn("__q2", F.expr("aggregate(qv, 0L, (acc, x) -> acc + x * x)"))


def _lloyd_centroids(
    qdf: DataFrame,
    k: int,
    iters: int,
    dim: int,
    seed_tag: str,
    id_col: str = "vec_id",
) -> list[list[int]]:
    """Shared fixed-point Lloyd loop over an already-quantized vector
    column ``qv``: md5-rank seeds (smallest ``md5_long60(seed_tag||id)``
    wins, id tie-break) then ``iters`` exact integer rounds.  Returns
    the final k×dim centroid matrix.  Used by whole-vector k-means AND
    the per-subspace product-quantization codebook fit (similarity.py),
    which passes SLICED qv columns with their own seed tags.

    Empty clusters keep their previous centroid (documented; the SQL
    twins mirror it with a LEFT JOIN + COALESCE)."""
    seed_rows = (
        qdf.select(
            F.col(id_col),
            "qv",
            md5_long60(F.concat(F.lit(seed_tag), F.col(id_col).cast("string"))).alias("h"),
        )
        .orderBy("h", id_col)
        .limit(k)
        .collect()
    )
    centroids = [list(r["qv"]) for r in seed_rows]
    if len(centroids) < k:
        raise ValueError(f"k={k} but corpus has only {len(centroids)} vectors")

    q2df = _with_q2(qdf.select(F.col(id_col), "qv"))
    sums = [F.sum(F.element_at("qv", i + 1)).alias(f"s{i}") for i in range(dim)]
    for _ in range(iters):
        assigned = q2df.withColumn("cluster_id", _assign_expr(centroids))
        stats = (
            assigned.groupBy("cluster_id")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        by_cid = {r["cluster_id"]: r for r in stats}
        centroids = [
            [int(by_cid[c][f"s{i}"]) // int(by_cid[c]["n"]) for i in range(dim)]
            if c in by_cid
            else centroids[c]  # empty cluster: keep previous centroid
            for c in range(k)
        ]
    return centroids


def kmeans_fit_assign(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    scale: int = Q_SCALE,
    offset: float = Q_OFFSET,
) -> tuple[DataFrame, list[list[int]]]:
    """Fixed-point Lloyd k-means: ``iters`` exact integer rounds from
    md5-rank seeds.  Returns (assignments, final_centroids) where
    assignments has (id_col, vec_col, qv, cluster_id) and centroids are
    the k quantized int vectors after the last update."""
    from featherstore_spark.functions.text import balance_small_input

    # small single-file corpora arrive as ONE split — rebalance so the
    # per-iteration jobs use full parallelism (no-op on big inputs,
    # estimate-gated exactly like the winnowing path)
    qdf = balance_small_input(df).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias(vec_col),
        quantize_vec(vec_col, dim, scale, offset).alias("qv"),
    )
    centroids = _lloyd_centroids(qdf, k, iters, dim, f"km:{seed}:", id_col)
    return (
        _with_q2(qdf).withColumn("cluster_id", _assign_expr(centroids)).drop("__q2"),
        centroids,
    )


def semantic_dedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    seed: int = 42,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): k-means clusters as blocking, then a
    doc is DROPPED iff some lower-id member of the SAME cluster has
    rounded cosine >= threshold with it (min-id representative — a
    deterministic one-pass rule, no transitive closure needed because the
    cluster already bounds the semantic neighborhood).

    Returns (id_col, cluster_id, keep) for every input vector.  The
    within-cluster self-join is an equi-join on cluster_id; with
    ``max_cluster_size`` set, boilerplate mega-clusters are capped by the
    map-combinable hot-key guard before the join (capped rows are KEPT —
    dropping data because it was merely popular is the wrong default)."""
    assigned, _ = kmeans_fit_assign(
        df, k=k, iters=iters, id_col=id_col, vec_col=vec_col, dim=dim, seed=seed
    )
    members = assigned.select(F.col(id_col).alias("mid"), F.col(vec_col).alias("mv"), "cluster_id")
    if max_cluster_size is not None:
        from featherstore_spark.operators.dedup import _drop_hot_keys

        members = _drop_hot_keys(members, ["cluster_id"], max_cluster_size)
    a = members.select(F.col("mid").alias("id_a"), F.col("mv").alias("va"), "cluster_id")
    b = members.select(F.col("mid").alias("id_b"), F.col("mv").alias("vb"), "cluster_id")
    # The drop list can be a large fraction of the corpus (that is the
    # point of dedup), so it is NOT broadcast: keep/drop is resolved by a
    # shuffle equi-join on id — scalable regardless of dup rate.
    dropped = (
        a.join(b, "cluster_id")
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.round(_cos("va", "vb"), 6) >= F.lit(float(threshold)))
        .select(F.col("id_b").alias("drop_id"))
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        assigned.join(dropped, assigned[id_col] == dropped["drop_id"], "left")
        .select(
            F.col(id_col),
            "cluster_id",
            F.coalesce(~F.col("__drop"), F.lit(True)).alias("keep"),
        )
    )
