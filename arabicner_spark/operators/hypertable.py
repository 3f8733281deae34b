"""Hypertable-style continuous aggregate — the third custom-operator
shape the driver mandate names (TimescaleDB's "hypertable rollup"),
built on mergeable partial aggregates.

The pattern: raw events are aggregated ONCE into fine-grained partials
(hour buckets carrying count/sum/min/max — every algebraic aggregate's
merge state); coarser views (day, week, month) then re-aggregate the
PARTIALS, never rescanning raw data.  At 100 TB this is the difference
between a dashboard query touching 24 rows/day and one touching 10^9
events/day: the partial table is the only thing that scales with time,
and it is O(buckets), not O(events).

Correctness requirement: the aggregates must be algebraic (mergeable) —
count/sum/min/max compose exactly; avg derives as sum/count at read
time.  The rel_hypertable_daily driver query pins composition equality
against a direct DuckDB aggregate over the raw table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rollup_partials(
    events: DataFrame, ts_col: str, value_col: str, bucket: str = "hour"
) -> DataFrame:
    """Raw rows -> one mergeable partial row per time bucket:
    (bucket_start, n, total, mn, mx)."""
    b = F.date_trunc(bucket, F.col(ts_col))
    return events.groupBy(b.alias("bucket_start")).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("total"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )


def reaggregate(partials: DataFrame, bucket: str = "day") -> DataFrame:
    """Partials -> coarser partials, merging states (never raw data):
    counts/sums add, min/max fold."""
    b = F.date_trunc(bucket, F.col("bucket_start"))
    return partials.groupBy(b.alias("bucket_start")).agg(
        F.sum("n").alias("n"),
        F.sum("total").alias("total"),
        F.min("mn").alias("mn"),
        F.max("mx").alias("mx"),
    )
