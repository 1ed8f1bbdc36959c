"""Benchmark harness (driver contract + BENCH/BASELINE.md protocol).

Runs the headline queries from __spark_entry__ against
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]``, plus the flagship transcript-materialization
throughput measurement (turns/sec) on a deterministic generated corpus.

Prints ONE JSON line:
  {"metric": ..., "value": <total headline seconds>, "unit": "sec",
   "queries": {name: sec}, "sf": ..., "materialize": {...}}

The materialize measurement and BENCH/scaling_bench.py share ONE
implementation (``run_materialize_level``): fresh 24g-G1GC JVM, tmpfs
corpus + output, shuffle = 4x cores, 2 discarded JIT-warmup runs then
MEDIAN of the measured runs, 1-min loadavg recorded around every run —
so the per-round driver number and the BASELINE figure are the same
measurement, and host contention is quantified in the artifact itself.
(A long-lived session that already ran 20 queries measured 2-4x noisier
on the same job — GC/heap history — hence the fresh JVM.)

Each headline query executes fully via the noop sink (no collect
bottleneck, no result materialization on the driver).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))

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
    "materialize_with_spine",
    "pricing_summary",
    "top_orders",
    "top_customers",
    "text_stats",
    "exact_dedup",
    "jaccard_pairs",
    "minhash_near_dups",
    "simhash_near_dups",
    "cosine_topk",
    "media_byte_stats",
]

BENCH_TURNS = int(os.environ.get("FS_BENCH_TURNS", "2000000"))
MAT_WARMUPS = int(os.environ.get("FS_MAT_WARMUPS", "2"))
MAT_RUNS = int(os.environ.get("FS_MAT_RUNS", "5"))
# bound measurement time when the host is contended (driver timeout safety)
MAT_TIME_CAP_S = float(os.environ.get("FS_MAT_TIME_CAP_S", "300"))


def _run_to_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def bench_workdir() -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return tempfile.mkdtemp(prefix="fs_bench_", dir=base)


def materialize_job(spark, transcripts, out_dir: str, cores: int) -> None:
    """THE materialization job both benches time: full per-turn feature
    log, hash-bucketed (4x cores) + sorted-within-partitions, written as
    partitioned parquet."""
    from featherstore_spark.plans.materialize import build_feature_log, ordered_output

    (
        ordered_output(build_feature_log(transcripts), n_buckets=4 * cores)
        .write.mode("overwrite")
        .partitionBy("p_bucket")
        .parquet(out_dir)
    )


# Runs in a FRESH JVM: fixed 24g heap + G1GC, shuffle = 4x cores; emits
# one JSON line with per-run wall times and loadavg samples.
_MAT_JOB = """
import json, os, sys, time, shutil
sys.path.insert(0, {repo!r})
from featherstore_spark.session import get_spark
from bench import materialize_job

cores = int(sys.argv[1]); corpus = sys.argv[2]; out = sys.argv[3]
extra = {{"spark.driver.memory": "24g",
          "spark.driver.extraJavaOptions": "-XX:+UseG1GC",
          "spark.local.dir": out + "_local"}}
spark = get_spark(master=f"local[{{cores}}]", shuffle_partitions=4 * cores,
                  extra_conf=extra, app_name=f"materialize_bench_{{cores}}")
spark.sparkContext.setLogLevel("ERROR")
t = spark.read.parquet(corpus)
n = t.count()
secs, loads = [], [round(os.getloadavg()[0], 1)]
t_start = time.perf_counter()
for i in range({warmups} + {runs}):
    t0 = time.perf_counter()
    materialize_job(spark, t, out, cores)
    secs.append(time.perf_counter() - t0)
    loads.append(round(os.getloadavg()[0], 1))
    if i >= {warmups} and time.perf_counter() - t_start > {cap}:
        break
shutil.rmtree(out, ignore_errors=True)
shutil.rmtree(out + "_local", ignore_errors=True)
print(json.dumps({{"cores": cores, "n_turns": n, "secs": secs, "loadavg": loads}}))
spark.stop()
"""


def run_materialize_level(
    cores: int,
    corpus: str,
    out_dir: str,
    warmups: int = MAT_WARMUPS,
    runs: int = MAT_RUNS,
    cap_s: float = MAT_TIME_CAP_S,
) -> dict:
    """One parallelism level of the shared protocol, in a fresh JVM.
    Returns {cores, n_turns, secs (all runs), loadavg} plus derived
    median/throughput over the post-warmup runs."""
    job = _MAT_JOB.format(repo=REPO, warmups=warmups, runs=runs, cap=cap_s)
    res = subprocess.run(
        [sys.executable, "-c", job, str(cores), corpus, out_dir],
        check=True, capture_output=True, text=True, cwd=REPO,
    )
    r = json.loads(res.stdout.strip().splitlines()[-1])
    measured = r["secs"][warmups:]
    med = statistics.median(measured)
    r.update(
        {
            "warmup_secs": [round(s, 2) for s in r.pop("secs")[:warmups]],
            "measured_secs": [round(s, 2) for s in measured],
            "seconds": round(med, 3),
            "turns_per_sec": round(r["n_turns"] / med, 1),
            "protocol": {
                "warmups": warmups,
                "aggregate": "median",
                "shuffle_partitions": 4 * cores,
                "jvm": "fresh, 24g G1GC",
                "storage": "tmpfs" if corpus.startswith("/dev/shm") else "disk",
            },
        }
    )
    return r


def generate_bench_corpus(spark, path: str, n_turns: int = BENCH_TURNS) -> None:
    from featherstore_spark.datagen import generate_transcripts

    mean_turns = 40
    generate_transcripts(
        spark, n_convs=max(1, n_turns // mean_turns), mean_turns=mean_turns, seed=42
    ).write.mode("overwrite").parquet(path)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    sys.path.insert(0, REPO)
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

    # Flagship throughput, shared protocol (fresh JVM — see module doc).
    tmp = bench_workdir()
    try:
        corpus_dir = os.path.join(tmp, "transcripts")
        generate_bench_corpus(spark, corpus_dir)
        spark.stop()  # free the headline session's heap before measuring
        mat = run_materialize_level(cpus, corpus_dir, os.path.join(tmp, "features"))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "materialize": mat,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
