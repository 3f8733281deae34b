"""operators/compact.py: small-file compaction with range clustering."""

import os

from pyspark.sql import functions as F


def _parquet_files(path):
    return [f for f in os.listdir(path) if f.endswith(".parquet")]


def test_compaction_reduces_files_and_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    out = str(tmp_path / "compacted")
    df = spark.range(0, 2000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    # simulate a fragmented ingest: 64 tiny files
    df.repartition(64).write.parquet(src)
    assert len(_parquet_files(src)) == 64

    from arabicner_spark.operators.compact import compact_by_range

    compact_by_range(spark.read.parquet(src), out, ["k"], n_files=4)
    assert len(_parquet_files(out)) == 4

    a = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    b = sorted(tuple(r) for r in df.collect())
    assert a == b


def test_compaction_ranges_do_not_overlap(spark, tmp_path):
    """Range clustering must give each output file a disjoint key range
    (that's what lets parquet footer stats prune whole files)."""
    src = str(tmp_path / "frag2")
    out = str(tmp_path / "comp2")
    spark.range(0, 3000).select(F.col("id").alias("k")).repartition(32).write.parquet(
        src
    )

    from arabicner_spark.operators.compact import compact_by_range, file_ranges

    compact_by_range(spark.read.parquet(src), out, ["k"], n_files=5)
    ranges = sorted(file_ranges(spark, out, "k"), key=lambda t: t[1])
    assert len(ranges) == 5
    for (_, _, prev_max), (_, nxt_min, _) in zip(ranges, ranges[1:]):
        assert prev_max < nxt_min  # disjoint, ordered ranges
    # and together they cover everything
    assert ranges[0][1] == 0 and ranges[-1][2] == 2999


def test_kmv_by_group_small_group_exact_fallback(spark):
    """A group with fewer than k distinct values must report the EXACT
    count (the sketch holds the whole set)."""
    from arabicner_spark.functions.sketches import kmv_distinct_by

    rows = [("small", i % 5) for i in range(50)] + [
        ("big", i) for i in range(500)
    ]
    df = spark.createDataFrame(rows, "grp string, v int")
    got = {r.grp: r for r in kmv_distinct_by(df, "grp", "v", k=64).collect()}
    assert got["small"].estimate == 5.0  # exact: 5 distinct < k
    assert got["small"].n_kept == 5
    assert got["big"].n_kept == 64
    # estimate is within KMV's expected error for k=64 (rsd ~ 1/sqrt(k-2))
    assert abs(got["big"].estimate - 500) / 500 < 0.5
