"""Union-find fixpoint on known graphs (SURVEY.md section 5)."""

from arabicner_spark.operators.components import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "a string, b string")
    return {
        (r.node, r.component) for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [("b", "a"), ("b", "c"), ("x", "y")])
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("x", "x"), ("y", "x")}


def test_chain_collapses(spark):
    # long path: worst case for naive propagation; large/small-star
    # must still converge within the iteration cap
    n = 40
    edges = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)]
    got = _cc(spark, edges)
    assert got == {(f"n{i:02d}", "n00") for i in range(n + 1)}


def test_self_loops_and_dups_ignored(spark):
    got = _cc(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")])
    assert got == {("a", "a"), ("b", "a")}


def test_cycle(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert got == {("a", "a"), ("b", "a"), ("c", "a")}
