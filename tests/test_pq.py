"""Product-quantization ANN (operators/similarity.pq_*).

The claims under test: (1) the full pipeline — per-subspace md5-rank
seeds, integer Lloyd rounds, argmin encoding, ADC scoring, rank — is
reproduced exactly by an independent pure-python reference; (2) output
is partitioning-independent (the fixed-point contract); (3) codes are
genuinely small (m ints in [0, ks)); (4) on cluster-structured data the
approximation finds same-cluster neighbors; (5) the scoring plan stays
Python-free and the broadcast side is the queries."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

import __spark_entry__ as entry_mod
from featherstore_spark.operators.similarity import (
    pq_ann_topk,
    pq_encode,
    pq_fit_codebooks,
)

SF_DIR = "/root/testdata/sf0.001"


# ---------------------------------------------------- pure-python twin --

def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _quant(vec) -> list[int]:
    return [math.floor((float(x) + 1.0) * 10000.0) for x in vec]


def _dist(a: list[int], b: list[int]) -> int:
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def _py_pq(rows, m, ks, iters, dim, k, q_ids, seed=42):
    """Independent reference: (id, vec) rows -> PQ top-k tuples."""
    sub = dim // m
    q = {i: _quant(v) for i, v in rows}
    books = []
    for s in range(m):
        sl = {i: qv[s * sub : (s + 1) * sub] for i, qv in q.items()}
        order = sorted(sl, key=lambda i: (_md5_60(f"pq:{seed}:{s}:{i}"), i))
        cents = [sl[i] for i in order[:ks]]
        for _ in range(iters):
            groups: dict[int, list[list[int]]] = {}
            for i, v in sl.items():
                c = min(range(len(cents)), key=lambda j: (_dist(v, cents[j]), j))
                groups.setdefault(c, []).append(v)
            cents = [
                [sum(col) // len(vs) for col in zip(*vs)] if (vs := groups.get(c)) else cents[c]
                for c in range(len(cents))
            ]
        books.append(cents)
    codes = {
        i: [
            min(range(ks), key=lambda j: (_dist(qv[s * sub : (s + 1) * sub], books[s][j]), j))
            for s in range(m)
        ]
        for i, qv in q.items()
    }
    out = []
    for qi in q_ids:
        qsl = [q[qi][s * sub : (s + 1) * sub] for s in range(m)]
        scored = sorted(
            (
                (sum(_dist(qsl[s], books[s][codes[n][s]]) for s in range(m)), n)
                for n in q
                if n != qi
            )
        )
        out += [(qi, n, d, r + 1) for r, (d, n) in enumerate(scored[:k])]
    return sorted(out)


def test_pq_matches_pure_python_reference(spark):
    """12 vectors, dim=8, m=2 subspaces, ks=2 codes, 1 Lloyd round —
    codebooks, codes, ADC distances and ranks all recomputed by an
    independent hashlib/integer reference."""
    import random

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-0.9, 0.9) for _ in range(8)]) for i in range(12)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    # float32 storage round-trips through the parquet-typed column; feed
    # the reference the SAME float32 values the operator sees
    f32 = [(r["vec_id"], [float(x) for x in r["embedding"]])
           for r in df.select("vec_id", "embedding").collect()]
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["adc_dist"], r["rank"])
        for r in pq_ann_topk(
            df.where(F.col("vec_id") < 3), df, k=4, m=2, ks=2, iters=1, dim=8
        ).collect()
    )
    assert got == _py_pq(f32, m=2, ks=2, iters=1, dim=8, k=4, q_ids=[0, 1, 2])


def test_pq_partitioning_independent(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 4)
    r3 = sorted(pq_ann_topk(q, emb.repartition(3), k=3).collect())
    r11 = sorted(pq_ann_topk(q, emb.repartition(11), k=3).collect())
    assert r3 == r11


def test_pq_codes_are_small_ints(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    books = pq_fit_codebooks(emb, m=4, ks=8, iters=1)
    assert len(books) == 4 and all(len(b) == 8 and len(b[0]) == 16 for b in books)
    codes = pq_encode(emb, books).collect()
    assert all(len(r["codes"]) == 4 and all(0 <= c < 8 for c in r["codes"]) for r in codes)


def test_pq_finds_same_cluster_neighbors(spark):
    """Four tight clusters, one query per cluster: every top-2 neighbor
    must come from the query's own cluster — the compression must not
    scramble coarse structure."""
    import random

    rng = random.Random(3)
    centers = [[0.8] * 8, [-0.8] * 8, [0.8] * 4 + [-0.8] * 4, [-0.8] * 4 + [0.8] * 4]
    rows = [
        (c * 10 + j, [x + rng.uniform(-0.02, 0.02) for x in centers[c]])
        for c in range(4)
        for j in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    out = pq_ann_topk(
        df.where(F.col("vec_id") % 10 == 0), df, k=2, m=2, ks=4, iters=2, dim=8
    ).collect()
    assert len(out) == 8
    for r in out:
        assert r["neighbor_id"] // 10 == r["query_id"] // 10, r


def test_pq_contract_plan_shape(spark):
    """Scoring scans CODES with the queries broadcast: no Python eval,
    no CartesianProduct (the NLJ must be broadcast-shaped), and the
    post-encode scan does not carry the raw embedding column."""
    df = entry_mod.queries()["pq_ann_topk"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # broadcast queries x codes
