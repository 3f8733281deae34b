"""operators/ranges.range_join: hand fixture, boundary semantics, and
the plan-shape guarantee (equi-join on the bucket, never a nested-loop
or cartesian plan)."""

from arabicner_spark.operators.ranges import range_join


def _fixture(spark):
    pts = spark.createDataFrame(
        [(0, "a"), (10, "b"), (15, "c"), (20, "d"), (99, "e")], "ts long, tag string"
    )
    # [5, 20) and [15, 30) overlap at 15..19; [40, 41) catches nothing
    itv = spark.createDataFrame(
        [(5, 20, "w1"), (15, 30, "w2"), (40, 41, "w3")], "s long, e long, w string"
    )
    return pts, itv


def test_range_join_containment_and_boundaries(spark):
    pts, itv = _fixture(spark)
    got = sorted(
        (r.tag, r.w)
        for r in range_join(pts, "ts", itv, "s", "e", bucket_width=7).collect()
    )
    # ts=20 is NOT in [5,20) (end exclusive) but IS in [15,30);
    # ts=15 is in both; ts=0 and 99 match nothing
    assert got == [("b", "w1"), ("c", "w1"), ("c", "w2"), ("d", "w2")]


def test_range_join_bucket_width_invariance(spark):
    pts, itv = _fixture(spark)
    base = sorted(
        (r.tag, r.w)
        for r in range_join(pts, "ts", itv, "s", "e", bucket_width=7).collect()
    )
    for w in (1, 3, 100):
        got = sorted(
            (r.tag, r.w)
            for r in range_join(pts, "ts", itv, "s", "e", bucket_width=w).collect()
        )
        assert got == base, f"bucket_width={w} changed the result"


def test_range_join_plan_has_no_nested_loop(spark):
    pts, itv = _fixture(spark)
    plan = (
        range_join(pts, "ts", itv, "s", "e", bucket_width=7)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
