"""Small-file compaction with range clustering.

The operational half of the 100-TB story: streaming ingests and
per-partition writers leave thousands of KB-sized files per day; scans
then pay an open/seek/footer cost per file that dwarfs the row work.
Compaction rewrites a directory into ~target-size files, and doing it
with repartitionByRange + sortWithinPartitions (instead of a plain
coalesce) additionally gives every output file a tight, NON-OVERLAPPING
min/max range on the cluster key — so later key- or time-predicates
skip whole files on parquet footer stats (poor man's Z-order for the
1-D case).

No Iceberg runtime is available in this sandbox (see sources/io.py);
this is the parquet-facade equivalent of Iceberg's rewrite_data_files
action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def compact_by_range(
    df: DataFrame,
    out_path: str,
    cluster_cols: list,
    n_files: int,
) -> None:
    """Rewrite ``df`` as ``n_files`` parquet files range-clustered on
    ``cluster_cols``: file i holds a contiguous key range, rows sorted
    within the file, so footer min/max stats prune whole files for
    range predicates.

    repartitionByRange samples the key distribution to build balanced
    range bounds (handles skewed keys without manual salting);
    sortWithinPartitions is a per-partition sort — no global shuffle
    beyond the range exchange itself.
    """
    (
        df.repartitionByRange(n_files, *cluster_cols)
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def file_ranges(spark: SparkSession, out_path: str, col: str) -> list:
    """(file, min, max) of ``col`` per parquet data file — the footer
    stats a range predicate would prune on.  Diagnostic helper for
    tests/audits (reads each file's column, not the footer, to stay
    independent of parquet-metadata APIs)."""
    import os

    from pyspark.sql import functions as F

    out = []
    for name in sorted(os.listdir(out_path)):
        if not name.endswith(".parquet"):
            continue
        part = spark.read.parquet(os.path.join(out_path, name))
        row = part.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
        out.append((name, row.mn, row.mx))
    return out
