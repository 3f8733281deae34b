"""Iterative graph analytics over the materialized KG — PageRank.

The reference has no graph algorithms (it is an NER trainer); the
north-star KG (nodes/edges tables) naturally wants them, and PageRank
is the canonical representative of the ITERATIVE dataflow class the
connected-components operator (operators/components.py) also belongs
to: a driver loop of joins/aggregations with ``localCheckpoint`` per
round to cut lineage (SURVEY.md section 4: iterative fixpoints are
orchestration, not planning — no custom Catalyst rule needed).

Scale shape per iteration: one join (ranks x edges, both keyed on the
node id — at scale both sides shuffle on src once and AQE handles the
rest) + one groupBy(dst) aggregation.  State is one (node, rank) row
per node — never collected to the driver.

Semantics (classic power iteration):
  pr_0(v)   = 1/N
  pr_t+1(v) = (1-d)/N + d * sum_{(u,v) in E} pr_t(u) / out_degree(u)
over the DISTINCT edge set; dangling mass (nodes with no out-edges) is
dropped, matching the unrolled SQL oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """-> (node, rank) after ``iterations`` power steps.

    ``edges`` may carry duplicates (multi-edges collapse to the
    distinct (src, dst) set).  Node set = union of endpoints.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).distinct()
    e = e.localCheckpoint(eager=True)  # reused every iteration
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    out_deg = e.groupBy("src").agg(F.count("*").alias("out"))
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contribs = (
            ranks.join(e, ranks["node"] == e["src"])
            .join(out_deg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("out")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))).alias(
                    "rank"
                ),
            )
            .localCheckpoint(eager=True)  # cut lineage per round
        )
    return ranks
