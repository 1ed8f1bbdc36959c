"""Hashed-linear quality classifier + char-bigram LM (functions/text.py).

Goldens are hand-computed with hashlib/math — independent of both Spark
and DuckDB — and the scoring plans are asserted shuffle-free (the whole
point: model-shaped scoring as a pure per-row projection)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from featherstore_spark.functions.text import char_bigram_lm, quality_classifier


def _w(tok: str, seed: int = 42) -> float:
    h = int(hashlib.md5(f"qc:{seed}:{tok}".encode()).hexdigest()[:15], 16)
    return (h % 2001 - 1000) / 1000.0


def test_quality_classifier_golden(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, ""), (3, None), (4, "x")],
        "doc_id: long, text: string",
    )
    out = {r["doc_id"]: r for r in quality_classifier(df).collect()}
    exp1 = round((_w("hello") + _w("world")) / 2, 6)
    assert out[1]["q_score"] == pytest.approx(exp1, abs=0)
    assert out[1]["n_tokens"] == 2
    # empty and NULL text: neutral 0.0 score, kept at threshold 0.0
    for d in (2, 3):
        assert out[d]["q_score"] == 0.0 and out[d]["keep"] and out[d]["n_tokens"] == 0
    assert out[4]["q_score"] == pytest.approx(round(_w("x"), 6), abs=0)
    assert out[4]["keep"] == (out[4]["q_score"] >= 0.0)


def test_quality_classifier_scoring_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id: long, text: string")
    plan = quality_classifier(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_char_lm_golden_with_oov(spark):
    """'abc' has grams {ab, bc}; vocab_size=1 keeps only 'ab' (tie on
    count, gram ASC), so bc scores as OOV: avg_nll and ppl follow
    ln(1/2) and ln(0.5/2) exactly."""
    df = spark.createDataFrame([(1, "abc")], "doc_id: long, text: string")
    out = char_bigram_lm(df, vocab_size=1).collect()[0]
    avg = (math.log(1 / 2) + math.log(0.5 / 2)) / 2
    assert out["n_grams"] == 2
    assert out["avg_nll"] == pytest.approx(round(-avg, 6), abs=0)
    assert out["ppl"] == pytest.approx(round(math.exp(-avg), 6), abs=0)


def test_char_lm_uniform_corpus_ppl_one(spark):
    """Two identical 2-char docs: one gram with p=1 → nll 0, ppl 1."""
    df = spark.createDataFrame([(1, "ab"), (2, "ab")], "doc_id: long, text: string")
    rows = char_bigram_lm(df).collect()
    for r in rows:
        assert r["n_grams"] == 1 and r["avg_nll"] == 0.0 and r["ppl"] == 1.0


def test_char_lm_empty_doc_scores_null(spark):
    df = spark.createDataFrame([(1, "ab"), (2, ""), (3, None)], "doc_id: long, text: string")
    out = {r["doc_id"]: r for r in char_bigram_lm(df).collect()}
    for d in (2, 3):
        assert out[d]["n_grams"] == 0
        assert out[d]["avg_nll"] is None and out[d]["ppl"] is None


def test_char_lm_scoring_plan_shape(spark):
    """Training collects O(vocab) to the driver; scoring is explode →
    broadcast vocab join → map-combinable doc groupBy: the vocab side
    must be broadcast (never shuffled against the grams), no Python in
    the plan, and the only hash-partitioned exchanges carry doc-id
    aggregates/joins — never raw grams (partial_ aggregation visible)."""
    df = spark.createDataFrame([(1, "abcd")], "doc_id: long, text: string")
    plan = char_bigram_lm(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
