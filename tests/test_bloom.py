"""Deterministic Bloom filter (operators/sketch.py) + the broadcast
decontamination prefilter (operators/dedup.bloom_contamination_hits).

The claims under test: (1) no false negatives — every inserted key
probes true; (2) the false-positive rate stays near the analytic bound;
(3) shard filters OR-merge to the union filter; (4) the Spark probe
expression and the pure-python reference agree verdict-for-verdict;
(5) the prefilter is a SUPERSET of the exact decontamination pass at
matching thresholds (the safety property that makes it a prefilter);
(6) the corpus-side probe plan contains NO join — the benchmark reaches
the corpus only as a broadcast literal."""

from __future__ import annotations

from pyspark.sql import functions as F

from featherstore_spark.operators.dedup import (
    bloom_decontaminate_candidates,
    bloom_contamination_hits,
    cross_corpus_overlap,
)
from featherstore_spark.operators.sketch import (
    bloom_build,
    bloom_merge,
    bloom_might_contain,
    bloom_might_contain_py,
    bloom_words,
)

SF_DIR = "/root/testdata/sf0.001"
N_BITS = 1 << 16


def _keys_df(spark, keys):
    return spark.createDataFrame([(k,) for k in keys], "key: string")


def test_no_false_negatives(spark):
    keys = [f"fp-{i}" for i in range(500)]
    words = bloom_words(bloom_build(_keys_df(spark, keys), "key"), N_BITS)
    probe = _keys_df(spark, keys).select(
        bloom_might_contain("key", words).alias("hit")
    )
    assert all(r["hit"] for r in probe.collect())
    assert all(bloom_might_contain_py(k, words) for k in keys)


def test_false_positive_rate_bounded(spark):
    """500 inserted keys in 2^16 bits, 4 hashes: analytic fp rate
    (1-e^(-kn/m))^k ≈ 1e-6 — allow generous slack, assert < 1%."""
    keys = [f"fp-{i}" for i in range(500)]
    words = bloom_words(bloom_build(_keys_df(spark, keys), "key"), N_BITS)
    absent = [f"other-{i}" for i in range(2000)]
    fp = sum(bloom_might_contain_py(k, words) for k in absent)
    assert fp / len(absent) < 0.01, fp


def test_merge_equals_union_filter(spark):
    a = [f"a-{i}" for i in range(200)]
    b = [f"b-{i}" for i in range(200)]
    fa = bloom_build(_keys_df(spark, a), "key")
    fb = bloom_build(_keys_df(spark, b), "key")
    merged = bloom_words(bloom_merge(fa.unionByName(fb)), N_BITS)
    union = bloom_words(bloom_build(_keys_df(spark, a + b), "key"), N_BITS)
    assert merged == union


def test_spark_probe_matches_python(spark):
    keys = [f"fp-{i}" for i in range(300)]
    words = bloom_words(bloom_build(_keys_df(spark, keys), "key"), N_BITS)
    mixed = keys[:50] + [f"not-{i}" for i in range(50)] + [None]
    rows = spark.createDataFrame([(k,) for k in mixed], "key: string").select(
        "key", bloom_might_contain("key", words).alias("hit")
    )
    for r in rows.collect():
        assert r["hit"] == bloom_might_contain_py(r["key"], words), r
    # NULL key is false, never NULL
    assert [r["hit"] for r in rows.where(F.col("key").isNull()).collect()] == [False]


def test_prefilter_is_superset_of_exact(spark):
    """Every doc the exact (uncapped) cross-corpus pass flags at
    min_shared=t has >= t true fingerprints in the benchmark union, so
    it MUST appear in the bloom candidates at min_hits=t."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    exact = {
        r["corpus_id"]
        for r in cross_corpus_overlap(
            corpus, bench, min_shared=10, max_fp_docs=None
        ).collect()
    }
    cands = {
        r["doc_id"]
        for r in bloom_decontaminate_candidates(corpus, bench, min_hits=10).collect()
    }
    assert exact, "fixture must produce at least one exact overlap"
    assert exact <= cands


def test_probe_plan_has_no_join(spark):
    """The corpus probe is a pure map-side expression + one count agg:
    the benchmark is inlined as a literal, so the plan must contain no
    join of any kind."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    words = [0] * (N_BITS // 32)
    out = bloom_contamination_hits(docs, words, min_hits=0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
