"""SparkSession factory with scale-oriented defaults.

The reference runs a hand-rolled connection pool over DuckDB
(/root/reference/pkg/storage/duckdb/duckdb.go:70-119); in Spark the
equivalent knobs are shuffle parallelism, AQE, and Arrow transfer. These
defaults are what we would ship for a 1000-executor cluster — AQE coalesces
the oversized static shuffle-partition count at runtime, skew-join splitting
handles hot keys, and Arrow batches bound pandas-UDF memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # AQE: runtime re-planning — partition coalescing + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every JVM<->Python exchange (pandas UDF, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Broadcast small dimension tables aggressively (catalog/spine side).
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Partitioned writes: overwrite only the partitions present in the job
    # output — the checkpoint/resume layer depends on this.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Deterministic session timezone: all event time is UTC.
    "spark.sql.session.timeZone": "UTC",
    # lz4 writes measured ~1.7x faster than snappy on the wide text-heavy
    # feature log (29.5 s vs 50 s for a 2M-turn materialization) for a
    # modest size increase — the right trade for a write-heavy pipeline.
    "spark.sql.parquet.compression.codec": "lz4",
}


def get_spark(
    master: str | None = None,
    app_name: str = "featherstore_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a
    real cluster it is left unset so spark-submit controls it.
    """
    # Under spark-submit the python driver is launched by PythonRunner
    # with a gateway to a JVM whose conf (master, executors, memory) the
    # LAUNCHER owns — setting .master() here would silently override
    # `spark-submit --master yarn` back to local[N].  The gateway env var
    # is how PySpark itself detects that mode.
    under_submit = "PYSPARK_GATEWAY_PORT" in os.environ
    if master is None and not under_submit:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    explicit_shuffle = shuffle_partitions is not None
    if shuffle_partitions is None:
        # Match local core count; on a cluster this should be
        # ~2-3x total executor cores (AQE coalesces the excess).
        try:
            shuffle_partitions = (
                int(master.split("[")[1].rstrip("]*")) if master and "[" in master else 200
            )
        except ValueError:
            shuffle_partitions = 200

    builder = SparkSession.builder.appName(app_name)
    if master is not None:
        builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if not under_submit:
        # local mode defaults to a 1g JVM heap — far too small for 32
        # executor threads; size the single JVM to the sandbox (128 GiB
        # box).  Under spark-submit these keys are OMITTED entirely:
        # explicit builder.config values override `spark-submit --conf`,
        # so setting them here would silently clobber the launcher's
        # cluster sizing (ADVICE r3) — the launcher owns cluster conf.
        conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")
        conf["spark.driver.maxResultSize"] = "4g"
    if explicit_shuffle or not under_submit:
        # same rule for shuffle parallelism: under spark-submit only an
        # EXPLICIT caller value is applied; the 200-row fallback must not
        # override a launcher-provided spark.sql.shuffle.partitions.
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
