"""Serving-tier micro-benchmark (zero Spark, runs in seconds).

Measures the driver-side read path a production lookup hits — the same
ServingStore the Flight/HTTP transports wrap — on a synthetic feature
table built directly with pyarrow:

- ``plain``: catalog-layout feature set (``data/*.parquet``), entity
  filters pushed to parquet statistics only;
- ``bucketed``: the ``p_bucket=`` checkpoint layout with the
  pure-python xxhash64 twin pruning each lookup to ONE directory —
  the constant-work point read, and the reason point latency stays
  flat as the table grows.

Reported per layout: latest-per-entity lookups/s, point-in-time
(get_features_at) lookups/s, p50/p99 latency.  Writes
``BENCH/SERVING.json`` and prints one JSON line.

Usage: python BENCH/serving_bench.py   (env: FS_SERVE_ROWS, default 200k)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from featherstore_spark.functions.hashing import entity_bucket  # noqa: E402
from featherstore_spark.sources.serving import ServingStore  # noqa: E402

N_ROWS = int(os.environ.get("FS_SERVE_ROWS", "200000"))
N_ENTITIES = max(N_ROWS // 50, 1)
N_BUCKETS = 64
N_LOOKUPS = int(os.environ.get("FS_SERVE_LOOKUPS", "300"))


def _table(rows_per_file: int, offset: int) -> pa.Table:
    base = datetime(2025, 6, 1)
    conv = [f"conv_{(offset + i) % N_ENTITIES}" for i in range(rows_per_file)]
    ts = [base + timedelta(seconds=(offset + i) * 7 % 900000) for i in range(rows_per_file)]
    return pa.table({
        "conv_id": conv,
        "ts": pa.array(ts, pa.timestamp("us")),
        "turn_idx": pa.array([(offset + i) % 40 for i in range(rows_per_file)], pa.int32()),
        "f_val": pa.array([float((offset + i) % 1000) for i in range(rows_per_file)]),
    })


def _build(root: str) -> ServingStore:
    store = ServingStore(os.path.join(root, "catalog"))
    schema = {"type": "struct", "fields": [
        {"name": "conv_id", "type": "string", "nullable": False, "metadata": {}},
        {"name": "ts", "type": "timestamp", "nullable": False, "metadata": {}},
        {"name": "turn_idx", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "f_val", "type": "double", "nullable": True, "metadata": {}},
    ]}
    store.create_feature_set(
        "plain", {"schema": schema, "entity_col": "conv_id", "ts_col": "ts"}
    )
    per_file = N_ROWS // 8
    for k in range(8):
        store.append_batch("plain", _table(per_file, k * per_file))

    # bucketed layout: the same rows under p_bucket=<xxhash64 % 64> dirs,
    # written with the engine's own hash twin (no Spark needed)
    bt_dir = os.path.join(root, "bucketed_tbl")
    full = pa.concat_tables([_table(per_file, k * per_file) for k in range(8)])
    by_bucket: dict[int, list[int]] = {}
    for i, c in enumerate(full.column("conv_id").to_pylist()):
        by_bucket.setdefault(entity_bucket(c, N_BUCKETS), []).append(i)
    for bkt, idxs in by_bucket.items():
        d = os.path.join(bt_dir, f"p_bucket={bkt}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(full.take(idxs), os.path.join(d, "part-0.parquet"))
    os.makedirs(bt_dir, exist_ok=True)
    with open(os.path.join(bt_dir, "_manifest.json"), "w") as fh:
        json.dump({"lineage": {"params": {"n_buckets": N_BUCKETS}}}, fh)
    store.register_bucketed_table("bucketed", bt_dir)
    return store


def _quantiles(lat: list[float]) -> dict:
    lat = sorted(lat)
    return {
        "p50_ms": round(lat[len(lat) // 2] * 1000, 3),
        "p99_ms": round(lat[min(int(len(lat) * 0.99), len(lat) - 1)] * 1000, 3),
        "mean_ms": round(statistics.fmean(lat) * 1000, 3),
    }


def _run(store: ServingStore, name: str) -> dict:
    ents = [f"conv_{(i * 37) % N_ENTITIES}" for i in range(N_LOOKUPS)]
    point_ts = datetime(2025, 6, 5)
    for e in ents[:10]:  # warm the dataset/fragment caches
        store.get_features(name, entity_ids=[e])
    out = {}
    for op, fn in (
        ("latest", lambda e: store.get_features(name, entity_ids=[e])),
        ("point_in_time", lambda e: store.get_features_at(name, [(e, point_ts)])),
    ):
        lats = []
        t0 = time.perf_counter()
        for e in ents:
            s = time.perf_counter()
            fn(e)
            lats.append(time.perf_counter() - s)
        wall = time.perf_counter() - t0
        out[op] = {"lookups_per_sec": round(N_LOOKUPS / wall, 1), **_quantiles(lats)}
    return out


def main() -> None:
    root = tempfile.mkdtemp(prefix="fs_serving_bench_")
    try:
        store = _build(root)
        result = {
            "metric": "serving_point_lookups",
            "n_rows": N_ROWS,
            "n_entities": N_ENTITIES,
            "n_buckets": N_BUCKETS,
            "plain": _run(store, "plain"),
            "bucketed": _run(store, "bucketed"),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)
    with open(os.path.join(REPO, "BENCH", "SERVING.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
