"""Z-order (Morton-curve) layout for MULTI-column data skipping.

compact_by_range gives tight per-file min/max stats on ONE cluster
key; a scan filtered on a different column still reads every file.
Z-ordering interleaves the bits of several (bucketized) columns into
one sort key, so sorting by it keeps every participating column
locally clustered — per-file bounding boxes stay small on ALL the
interleaved dimensions, and footer min/max stats prune files for
point/range predicates on any of them.  This is the layout technique
Delta/Iceberg expose as OPTIMIZE ... ZORDER BY; at 100 TB it is the
difference between a scan touching ~1/nfiles of the data and touching
all of it for the second predicate column.

Everything here is exact integer bit arithmetic (shiftleft / bitwise
OR over bucketized dims), so layout assignment is a pure function of
the input and cross-engine SQL oracles match by value hash.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: List[Column], bits: int) -> Column:
    """Morton interleave of ``len(cols)`` bucket columns, ``bits``
    bits each (each value must already lie in [0, 2**bits)): output
    bit (b * n + i) is bit b of cols[i].  Pure codegen — shiftleft +
    bitwise OR, no UDF."""
    n = len(cols)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def zorder_file_stats(
    df: DataFrame,
    dims: List[Tuple[str, int]],
    n_files: int,
) -> DataFrame:
    """Per-file bounding-box stats for a z-ordered vs a first-dim
    linear layout of the same rows -> (layout, file_id, n_rows, then
    min/max per dim).  ``dims`` = [(bucket_col, bits), ...]; files are
    equal-width slices of the key space (deterministic, no range
    sampling, so the assignment is oracle-exact).

    The output is the pruning evidence itself: under 'zorder' every
    dim's per-file min/max span is ~(extent / n_files^(1/n)) wide,
    under 'linear' only dim 0's is tight and every other dim spans its
    full extent in every file — exactly why a filter on the second
    column prunes nothing in a 1-D layout.
    """
    bits = max(b for _c, b in dims)
    # z key space = n interleaved tracks of `bits` bits each (narrower
    # dims just contribute zero high bits)
    total_bits = len(dims) * bits
    zcol = zvalue([F.col(c) for c, _b in dims], bits)
    # equal-width key-space slices; ceil-div keeps file_id < n_files
    zspan = (2 ** total_bits + n_files - 1) // n_files
    lin = F.col(dims[0][0]).cast("long")
    lspan = (2 ** dims[0][1] + n_files - 1) // n_files
    tagged = df.select(
        (zcol / zspan).cast("int").alias("zfile"),
        (lin / lspan).cast("int").alias("lfile"),
        *[F.col(c).cast("long").alias(c) for c, _b in dims],
    )
    aggs = [F.count("*").cast("long").alias("n_rows")] + [
        agg
        for c, _b in dims
        for agg in (
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
        )
    ]
    z = tagged.groupBy(F.col("zfile").alias("file_id")).agg(*aggs).select(
        F.lit("zorder").alias("layout"), "*"
    )
    l = tagged.groupBy(F.col("lfile").alias("file_id")).agg(*aggs).select(
        F.lit("linear").alias("layout"), "*"
    )
    return z.unionByName(l)
