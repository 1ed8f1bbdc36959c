"""featherstore_spark — a PySpark-native point-in-time feature-engineering engine.

Re-conceives the semantics of TFMV/featherstore (an Arrow/DuckDB/Parquet
feature store, see /root/reference) as a batch-first Spark package:

- append-only entity×timestamp feature logs (reference pkg/core/model.go:25-32)
- latest-per-entity retrieval == degenerate as-of join
  (reference pkg/storage/duckdb/duckdb.go:608-625)
- generalized point-in-time as-of joins, lag/lead, tumbling/sliding window
  aggregates, gap-based sessionization over conversation transcripts
- deduplication / similarity / text-analysis operators for training-data
  pipelines at 100 TB scale

Everything is expressed with the DataFrame API + vectorized Arrow UDFs;
there is zero per-row Python in any hot path.
"""

__version__ = "0.1.0"

from featherstore_spark.session import get_spark  # noqa: F401
