"""Timestamp helpers (SURVEY.md §2.8 F1-F2).

The reference decodes Arrow timestamps unit-aware
(/root/reference/pkg/core/model.go:190-218) and stores µs in DuckDB
(duckdb.go:331-332).  Spark is µs-native, but parquet files written
without timezone metadata load as TIMESTAMP_NTZ in Spark 4, which
``unix_micros`` rejects.  With the session timezone pinned to UTC
(session.py), casting NTZ→TIMESTAMP is a pure reinterpretation (no wall
shift), so all engine time arithmetic goes through :func:`epoch_us`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column | str) -> Column:
    """Microseconds since epoch for TIMESTAMP and TIMESTAMP_NTZ alike."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def interval_to_us(spec: str) -> int:
    """'15 minutes' / '1 day' / '2 hours' → microseconds."""
    qty, unit = spec.split()
    mult = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
        "day": 86_400_000_000, "days": 86_400_000_000,
    }[unit]
    return int(qty) * mult
