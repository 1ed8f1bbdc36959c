"""Similarity search over embedding columns (array<float>).

Three tiers:
- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Queries are broadcast (they are the small side by construction); the
  corpus streams through one projection + per-query top-k window.  At 100
  TB this is the right plan whenever |queries| is small (the usual case for
  eval/retrieval audits): no corpus shuffle at all until the final
  per-query k-row reduction.
- ``lsh_ann_topk``: random-hyperplane LSH — corpus and queries are bucketed
  by sign-pattern; exact scoring happens only within matching buckets
  (multi-probe over ``n_tables`` independent tables).  Approximate, scales
  to corpora where even one full scan per query batch is too much.
- ``ivf_ann_topk``: inverted lists around a deterministic coarse quantizer;
  queries probe their nearest lists only.

All randomness is md5-derived via functions.hashing (Rademacher ±1
hyperplanes, md5-ranked centroid seeds) — no RNG state, identical indexes
on any cluster size AND recomputable in DuckDB SQL, so the driver value-
checks the ANN outputs (CORRECTNESS gate), not just row counts.  Ranking
ties always break on the 6-decimal-rounded cosine then neighbor id, so
the output is engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featherstore_spark.functions.hashing import (
    md5_long60,
    rademacher_planes,
    signed_sum,
)


def _cos(v_a: str, v_b: str) -> F.Column:
    dot = F.aggregate(F.zip_with(v_a, v_b, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x)
    na = F.sqrt(F.aggregate(F.transform(v_a, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    nb = F.sqrt(F.aggregate(F.transform(v_b, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for every query vector.  Self-matches (same
    id) are excluded.  Ties break by corpus id ASC (deterministic)."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_cos("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_bucket_ids(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    out_col: str = "bucket",
) -> DataFrame:
    """Adds an array of ``n_tables`` sign-pattern bucket ids (one per LSH
    table).  Hyperplanes are Rademacher ±1 (hashing.rademacher_planes), so
    each projection is a pure signed sum of vector elements — whole-stage
    codegen, no Python, and bitwise reproducible in the SQL oracle (the
    addition order is pinned by hashing.signed_sum).  Table index sits in
    the high bits so buckets never collide across tables."""
    v = F.col(vec_col).cast("array<double>")
    buckets = []
    for t in range(n_tables):
        planes = rademacher_planes(n_planes, dim, table=t, seed=seed)
        bucket = F.lit(t << 56).cast("long")
        for p, signs in enumerate(planes):
            bucket = bucket + F.when(signed_sum(v, signs) > 0, F.lit(1 << p)).otherwise(F.lit(0))
        buckets.append(bucket)
    return df.withColumn(out_col, F.array(*buckets))


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 10,
    n_tables: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: score only (query, corpus) pairs sharing an LSH
    bucket in any table.  The bucket join and the candidate de-dup carry
    only (id, bucket) rows — 16 bytes — and the vectors are fetched back
    by two equi-joins afterwards, so no array ever rides through the
    distinct shuffle.  No broadcast of the corpus; AQE-skew-splittable."""
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    qb = lsh_bucket_ids(q, "qv", n_planes, n_tables, dim).select(
        "query_id", F.explode("bucket").alias("b")
    )
    cb = lsh_bucket_ids(c, "cv", n_planes, n_tables, dim).select(
        "neighbor_id", F.explode("bucket").alias("b")
    )
    cands = (
        qb.join(cb, "b")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        cands.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", F.round(_cos("qv", "cv"), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


# ------------------------------------------------------------------- IVF --

def ivf_assign(
    corpus: DataFrame,
    n_centroids: int = 16,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: centroids are the ``n_centroids`` corpus vectors
    with the smallest md5-derived hash of their id (deterministic, no RNG,
    no k-means iteration — a coarse quantizer is enough for inverted-list
    routing); every corpus vector is assigned to its nearest centroid by
    rounded cosine (round 6; ties break by centroid id — engine-
    independent ordering).

    The assignment is one broadcast nested pass: O(N x C) cosine evals,
    embarrassingly parallel map-side work paid once at index-build time —
    the standard IVF trade.  Returns (assigned_corpus, centroids)."""
    cent = (
        corpus.select(
            F.col(corpus_id).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("centroid_v"),
        )
        .orderBy(
            md5_long60(F.col("centroid_id").cast("string")) % F.lit(1_000_000_007),
            "centroid_id",
        )
        .limit(n_centroids)
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    scored = c.join(F.broadcast(cent), how="cross").withColumn(
        "sim", F.round(_cos("cv", "centroid_v"), 6)
    )
    w = Window.partitionBy("cid").orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    assigned = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("cid").alias(corpus_id), F.col("cv").alias(vec_col), "centroid_id")
    )
    return assigned, cent


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probes: int = 4,
    query_id: str = "vec_id",
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via inverted lists: queries probe their
    ``n_probes`` nearest centroids and score exactly only within those
    lists — the scored fraction is ~n_probes/n_centroids of the corpus.
    The probe join is an equi-join on centroid_id (shuffle-partitioned,
    skew-splittable by AQE)."""
    assigned, cent = ivf_assign(corpus, n_centroids, corpus_id, vec_col)
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    q_scored = q.join(F.broadcast(cent), how="cross").withColumn(
        "sim", F.round(_cos("qv", "centroid_v"), 6)
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("centroid_id").asc())
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probes)
        .select("query_id", "qv", "centroid_id")
    )
    cands = probes.join(
        assigned.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"), "centroid_id"),
        "centroid_id",
    ).where(F.col("query_id") != F.col("neighbor_id"))
    scored = cands.withColumn("cosine", F.round(_cos("qv", "cv"), 6))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
