"""operators/graph.pagerank vs a hand-computed power-iteration fixture.

Graph: A->B, A->C, B->C, C->A (3 nodes, no dangling nodes).
N = 3, damping 0.85, base (1-d)/N = 0.05, out: A=2, B=1, C=1.

One step from pr0 = 1/3 each:
  inflow(A) = pr(C)/1         = 1/3   -> 0.05 + 0.85/3        = 0.333333...
  inflow(B) = pr(A)/2         = 1/6   -> 0.05 + 0.85/6        = 0.191666...
  inflow(C) = pr(A)/2 + pr(B) = 1/2   -> 0.05 + 0.85*0.5      = 0.475
"""

import pytest

EDGES = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A")]


def _ranks(spark, iterations):
    from arabicner_spark.operators.graph import pagerank

    edges = spark.createDataFrame(EDGES, "src string, dst string")
    return {r.node: r.rank for r in pagerank(edges, iterations=iterations).collect()}


def test_pagerank_one_step_hand_fixture(spark):
    pr = _ranks(spark, 1)
    assert pr["A"] == pytest.approx(0.05 + 0.85 / 3)
    assert pr["B"] == pytest.approx(0.05 + 0.85 / 6)
    assert pr["C"] == pytest.approx(0.475)


def test_pagerank_mass_conserved_without_dangling(spark):
    # no dangling nodes -> total rank mass stays exactly 1 every step
    for it in (1, 5):
        pr = _ranks(spark, it)
        assert sum(pr.values()) == pytest.approx(1.0)


def test_pagerank_multi_edges_collapse(spark):
    """Duplicate (src, dst) rows must not double inflow (distinct set)."""
    from arabicner_spark.operators.graph import pagerank

    spark_edges = spark.createDataFrame(
        EDGES + EDGES, "src string, dst string"
    )
    pr = {r.node: r.rank for r in pagerank(spark_edges, iterations=1).collect()}
    assert pr["C"] == pytest.approx(0.475)
