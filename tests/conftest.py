from __future__ import annotations

import pytest

from featherstore_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", app_name="featherstore_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def transcripts(spark):
    from featherstore_spark.datagen import generate_transcripts

    df = generate_transcripts(spark, n_convs=20, mean_turns=20, seed=42).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def transcripts_pd(transcripts):
    return transcripts.toPandas()
