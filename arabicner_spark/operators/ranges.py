"""Range (interval-containment) join — the second custom-operator shape
the driver mandate names alongside as-of join, composed from existing
DataFrame ops.

Problem: ``points JOIN intervals ON start <= ts AND ts < end`` has no
equi-key, so Catalyst plans BroadcastNestedLoopJoin (fine only while
one side broadcasts) or a cartesian product — both scale walls.

Bucketed plan: quantize time into fixed-width buckets; each interval
replicates to every bucket it overlaps (one ``explode(sequence(...))``,
bounded by interval_length/bucket_width rows); each point maps to ONE
bucket; the join becomes an equi-join on the bucket id followed by the
exact containment filter.  Shuffle key = bucket — a shuffle-hash /
sort-merge join at any scale, with AQE skew-split available for hot
buckets.  Pick ``bucket_width`` near the typical interval length: the
replication factor stays O(1) and every candidate pair shares a bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    ts_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """INNER-join points to the intervals containing them
    (``start <= ts < end``, all in the same integer unit — epoch
    seconds, micros, whatever the caller quantized to).

    Returns points columns + intervals columns.  ``bucket_width`` is in
    the same unit.  Intervals must satisfy start <= end.

    Only inner semantics are offered: the containment predicate runs as
    a post-join filter, so an outer join flavor would silently drop its
    unmatched rows there (NULL start/end fails the filter) — i.e. it
    would degrade to inner anyway.  Callers needing left-outer should
    anti-join the matched point ids back against ``points``.
    """
    b_pt = F.floor(F.col(ts_col) / bucket_width)
    pts = points.withColumn("__bucket", b_pt.cast("long"))
    spans = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / bucket_width).cast("long"),
                # end is exclusive: a point at exactly `end` never
                # matches, so the last bucket is the one holding end-1
                F.floor((F.col(end_col) - 1) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        pts.join(spans, "__bucket", "inner")
        .where((F.col(start_col) <= F.col(ts_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )
