"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline queries from __spark_entry__ against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the flagship transcript-materialization
throughput measurement (turns/sec) on a deterministic generated corpus.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "materialize": {...}}

Each query executes fully via the noop sink (no collect bottleneck, no
result materialization on the driver).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HEADLINE = [
    "latest_per_entity",
    "asof_join",
    "asof_join_bucketed",
    "lag_lead",
    "rolling_window",
    "tumbling_agg",
    "sliding_agg",
    "sessionize",
    "materialize_pipeline",
    "pricing_summary",
    "top_orders",
    "top_customers",
    "text_stats",
    "exact_dedup",
    "minhash_near_dups",
    "simhash_near_dups",
    "cosine_topk",
    "media_byte_stats",
]

BENCH_TURNS = int(os.environ.get("FS_BENCH_TURNS", "2000000"))


def _run_to_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as entry_mod
    from featherstore_spark.session import get_spark

    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="featherstore_spark_bench",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()
    # untimed warmup: JVM/codegen + python-worker spin-up otherwise lands
    # on whichever query happens to run first
    _run_to_noop(queries["pricing_summary"](spark, sf_dir))
    _run_to_noop(queries["exact_dedup"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        _run_to_noop(df)
        timings[name] = round(time.perf_counter() - t0, 3)

    # Flagship throughput: transcript corpus -> full per-turn feature
    # materialization -> partitioned parquet write (BASELINE.md protocol).
    from featherstore_spark.datagen import generate_transcripts
    from featherstore_spark.plans.materialize import build_feature_log, ordered_output

    tmp = tempfile.mkdtemp(prefix="fs_bench_")
    try:
        corpus_dir = os.path.join(tmp, "transcripts")
        mean_turns = 40
        n_convs = max(1, BENCH_TURNS // mean_turns)
        generate_transcripts(
            spark, n_convs=n_convs, mean_turns=mean_turns, seed=42
        ).write.parquet(corpus_dir)
        transcripts = spark.read.parquet(corpus_dir)
        n_turns = transcripts.count()

        # run twice: run 1 pays whole-stage-codegen JIT compilation (NOT
        # paid per-job on a long-lived cluster), run 2 is steady state.
        out_dir = os.path.join(tmp, "features")
        mat_secs = []
        for i in range(3):
            t0 = time.perf_counter()
            log = build_feature_log(transcripts)
            ordered_output(log, n_buckets=max(2 * cpus, 32)).write.mode("overwrite").partitionBy(
                "p_bucket"
            ).parquet(out_dir)
            mat_secs.append(time.perf_counter() - t0)
            # bound total bench time when the host is contended: one
            # post-warmup run is enough if it already took long
            if i >= 1 and mat_secs[-1] > 45:
                break
        # steady state = best of the post-warmup runs (host noise on the
        # shared VM can double any single wall time)
        mat_sec = min(mat_secs[1:])
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "materialize": {
            "n_turns": n_turns,
            "seconds": round(mat_sec, 3),
            "cold_seconds": round(mat_secs[0], 3),
            "turns_per_sec": round(n_turns / mat_sec, 1),
            "cores": cpus,
        },
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
