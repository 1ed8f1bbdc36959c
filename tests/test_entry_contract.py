"""Differential gate: every queries() entry vs its oracle_sql() twin on the
driver-provided tables — the same comparison the driver runs (row count +
order-insensitive canonical value hash), run at sf0.001 in CI-speed and at
sf0.01 when FS_CONTRACT_SF=0.01."""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = f"/root/testdata/sf{os.environ.get('FS_CONTRACT_SF', '0.001')}"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    con.create_function  # noqa: B018 - just assert the attr exists
    return con


def _canon_cell(v) -> str:
    if v is None:
        return "~"
    if isinstance(v, float):
        if math.isnan(v):
            return "~"
        if v == 0:
            v = 0.0  # normalize -0.0
        return f"{v:.6f}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonical_rows(pdf: pd.DataFrame) -> list[tuple]:
    pdf = pdf[sorted(pdf.columns)]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append(tuple(_canon_cell(v) for v in tup))
    rows.sort()
    return rows


def _spark_pdf(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    pdf = df.toPandas()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return pdf


def _duck_pdf(duck, name):
    pdf = duck.execute(ORACLES[name]).fetchdf()
    for c in pdf.columns:
        if str(pdf[c].dtype).startswith("datetime64"):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
    return pdf


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    got = _spark_pdf(spark, name)
    exp = _duck_pdf(duck, name)
    assert sorted(got.columns) == sorted(exp.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"row count: spark={len(got)} oracle={len(exp)}"
    g, e = canonical_rows(got), canonical_rows(exp)
    if g != e:
        diffs = [(a, b) for a, b in zip(g, e) if a != b][:5]
        raise AssertionError(f"value mismatch for {name}; first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_no_oracle_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs, stable schema
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    out = entry_mod.entry(spark)
    assert out.count() > 0


NULL_TEXT_QUERIES = [
    "media_byte_stats", "exact_dedup", "exact_substring_dedup", "chunk_documents",
    "text_stats", "lang_id", "gopher_repetition",
    "c4_line_clean", "pii_scrub",
    "corpus_clean_pipeline", "minhash_near_dups", "simhash_near_dups",
    "jaccard_pairs", "winnow_fingerprints", "winnow_near_dups",
    "char_ngram_jaccard", "dedup_groups", "media_decode_dims", "top_ngrams",
]


@pytest.mark.parametrize("name", NULL_TEXT_QUERIES)
def test_null_and_empty_text_semantics_match_oracle(spark, tmp_path, name):
    """The driver corpus has no null/empty text, so engine-vs-oracle NULL
    semantics (ADVICE r1) are pinned here on a hand-built corpus with
    NULL, empty, whitespace-only, and duplicate-of-empty documents."""
    rows = [
        (1, "hello world the cat", "en", "a", 19),
        (2, None, "en", "a", 0),
        (3, "", "de", "b", 0),
        (4, "   ", "fr", "b", 3),
        (5, "hello world the cat", "en", "b", 19),  # dup of 1
    ]
    sdf = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # snappy: the session default (lz4 frame) is unreadable by DuckDB
    sdf.coalesce(1).write.mode("overwrite").option("compression", "snappy").parquet(
        str(tmp_path / "documents.parquet")
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    got = QUERIES[name](spark, str(tmp_path)).toPandas()
    exp = con.execute(ORACLES[name]).fetchdf()
    assert sorted(got.columns) == sorted(exp.columns)
    assert canonical_rows(got) == canonical_rows(exp), f"null-text mismatch for {name}"
