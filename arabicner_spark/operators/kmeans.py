"""Deterministic Lloyd (k-means) iterations in FIXED-POINT arithmetic
— the centroid-refinement step for the IVF coarse quantizer
(testdata_queries.ivf_ranked seeds cells with raw vectors; real IVF
training refines those seeds with a few Lloyd rounds).

Why fixed point: float centroid means are order-dependent reductions
(sum(double) over a shuffled group), which a cross-engine value-hash
gate cannot tolerate — the same trick as pagerank_exact.  Vectors are
quantized once to int64 units of 1/SCALE (floor, exact and portable);
distances are exact int64 sums of squares; centroid updates use
truncated integral division written as sign(s) * (|s| div n) on BOTH
engines so negative sums divide identically regardless of each
engine's native div semantics.  Magnitudes: |v| <= ~2 => scaled |val|
<= 2^21; squared-diff sums over 64 dims <= 2^48 — exact in int64 AND
in any double-based engine arithmetic.

Scale shape per round (vectors in LONG format (id, dim, val) — no
array rebuilds anywhere):
  assign: one equi-join on the dim index against k*dims centroid rows
          (broadcast) + one (id, cluster) partial-agg sum + one
          min_by arg-min agg — map-side combinable, no window;
  update: one (cluster, dim) partial-agg sum over the assigned rows.
State = k*dims centroid rows; localCheckpoint per round cuts lineage
like the other iterative operators.  Empty clusters simply drop out of
the centroid table (deterministic on both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**6


def explode_fp(vectors: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, dim, val): 1-based dim index, floor(v*SCALE) int64 value."""
    return vectors.select(
        F.col(id_col),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * SCALE).cast("long"))
        ).alias("pos0", "val"),
    ).select(id_col, (F.col("pos0") + 1).alias("dim"), "val")


def _assign(ev: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, cluster, dist_fp): nearest centroid by exact int64 L2²,
    ties to the smallest cluster id."""
    d = (
        ev.join(F.broadcast(cents), "dim")
        .groupBy(id_col, "cl")
        .agg(
            F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval")))
            .cast("long")
            .alias("dist")
        )
    )
    m = d.groupBy(id_col).agg(F.min(F.struct("dist", "cl")).alias("m"))
    return m.select(
        id_col,
        F.col("m.cl").alias("cluster"),
        F.col("m.dist").alias("dist_fp"),
    )


def _update(ev: DataFrame, assign: DataFrame, id_col: str) -> DataFrame:
    """New centroids: per-(cluster, dim) truncated integral mean,
    sign(s) * (|s| div n) — engine-portable for negative sums."""
    return (
        ev.join(assign.select(id_col, "cluster"), id_col)
        .groupBy(F.col("cluster").alias("cl"), "dim")
        .agg(F.sum("val").cast("long").alias("s"), F.count("*").alias("n"))
        .select(
            "cl",
            "dim",
            (
                F.signum("s").cast("long")
                * F.expr("abs(s) div n").cast("long")
            ).alias("cval"),
        )
    )


def centroids_fp_from_ev(
    ev: DataFrame, id_col: str = "vec_id", k: int = 8, updates: int = 1
) -> DataFrame:
    """Refined centroid table (cl, dim, cval) after ``updates`` Lloyd
    update steps from the id<k seed — the centroids a
    ``kmeans_fp(rounds=updates+1)`` run assigns against on its final
    round.  ``ev`` is the long-format (id, dim, val) table from
    :func:`explode_fp` (checkpoint it first if reused).  This is the
    IVF index-build path: testdata_queries.ivf_ranked assigns every
    vector against these refined centroids instead of the raw id<k
    seed vectors (the r5 gap: refinement existed only as a standalone
    query while the searched index stayed unrefined)."""
    cents = ev.where(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cl"), "dim", F.col("val").alias("cval")
    )
    for _ in range(updates):
        assign = _assign(ev, cents, id_col)
        cents = _update(ev, assign, id_col).localCheckpoint(eager=True)
    return cents


def kmeans_fp(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 8,
    rounds: int = 2,
) -> DataFrame:
    """-> (id, cluster int, dist_fp bigint) after ``rounds`` assign
    steps with a centroid update between consecutive assigns.  Initial
    centroids are the vectors with id < k (the IVF_CELLS seeding
    convention); the whole run is a pure function of the input."""
    ev = explode_fp(vectors, id_col, vec_col).localCheckpoint(eager=True)
    cents = ev.where(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cl"), "dim", F.col("val").alias("cval")
    )
    assign = _assign(ev, cents, id_col)
    for _ in range(rounds - 1):
        cents = _update(ev, assign, id_col).localCheckpoint(eager=True)
        assign = _assign(ev, cents, id_col)
    return assign.select(
        id_col, F.col("cluster").cast("int").alias("cluster"), "dist_fp"
    )
