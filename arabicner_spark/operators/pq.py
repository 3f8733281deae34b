"""Product quantization (PQ) for ANN at 100-TB scale — the
memory-compressed index family (IVF-PQ): split each d-dim vector into
``m`` subspaces, train a tiny k-means codebook PER subspace, and store
each vector as ``m`` small codes instead of d floats (64 dims x 4B ->
m bytes at k <= 256: a 64x compression, which is what lets a
1000-executor cluster hold a trillion-vector index in RAM).  Search
uses asymmetric distance computation (ADC): the query stays exact, one
(q, sub, code) -> partial-distance table is built against the
codebooks, and a candidate's approximate distance is the SUM of m
table lookups — no float math per candidate, just a broadcast join +
partial agg.

All arithmetic is the repo's fixed-point int64 convention
(operators/kmeans.py: floor(v * 1e6), exact L2², truncated integral
centroid means), so training, encoding, and ADC ranking are pure
functions of the input and the unrolled SQL oracle matches by value
hash.  Codebook training reuses the same assign/update algebra as
kmeans_fp with the subspace id added to every key — all m codebooks
train in ONE dataflow (no per-subspace loop over the data).

Scale shape:
  - sub-vector explode: one projection of the long-format (id, dim,
    val) table — no shuffle beyond the base explode;
  - train: per round one broadcast join against m*k*sdims centroid
    rows + two map-side-combinable aggs (same as kmeans_fp);
  - encode: the final assign — codes are (id, sub, code), m rows per
    vector (or one packed array row);
  - ADC: distance table is queries x m x k rows (tiny, broadcast);
    candidate scoring is one broadcast equi-join on (sub, code) + one
    (q, id) partial-agg sum + one per-q top-k — never a cartesian
    against raw vectors.

No counterpart in /root/reference (no retrieval stage there);
semantics follow the public IVF-PQ formulation (Jégou et al., "Product
Quantization for Nearest Neighbor Search").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arabicner_spark.operators.kmeans import explode_fp


def subspace_ev(
    ev: DataFrame, sdims: int, id_col: str = "vec_id"
) -> DataFrame:
    """(id, sub, sdim, val) from the long-format (id, dim, val) table:
    subspace id = (dim-1) div sdims + 1, local dim = (dim-1) mod sdims
    + 1.  Pure projection."""
    return ev.select(
        id_col,
        ((F.col("dim") - 1) / sdims).cast("int").alias("sub"),
        ((F.col("dim") - 1) % sdims + 1).alias("sdim"),
        "val",
    ).withColumn("sub", F.col("sub") + 1)


def _pq_assign(sv: DataFrame, cents: DataFrame, id_col: str) -> DataFrame:
    """(id, sub, code, dist): nearest codebook entry per subspace by
    exact int64 L2², ties to the smallest code."""
    d = (
        sv.join(F.broadcast(cents), ["sub", "sdim"])
        .groupBy(id_col, "sub", "cl")
        .agg(
            F.sum((F.col("val") - F.col("cval")) * (F.col("val") - F.col("cval")))
            .cast("long")
            .alias("dist")
        )
    )
    m = d.groupBy(id_col, "sub").agg(F.min(F.struct("dist", "cl")).alias("m"))
    return m.select(
        id_col,
        "sub",
        F.col("m.cl").alias("code"),
        F.col("m.dist").alias("dist"),
    )


def train_codebooks(
    sv: DataFrame, k: int, updates: int = 1, id_col: str = "vec_id"
) -> DataFrame:
    """Codebook table (sub, cl, sdim, cval): seeded per subspace with
    the sub-vectors of ids < k (the IVF_CELLS convention), refined by
    ``updates`` Lloyd update steps — all subspaces in one dataflow.
    ``sv`` should be checkpointed by the caller (it is scanned
    2*updates+1 times across train+encode)."""
    cents = sv.where(F.col(id_col) < k).select(
        "sub", F.col(id_col).cast("int").alias("cl"), "sdim",
        F.col("val").alias("cval"),
    )
    for _ in range(updates):
        a = _pq_assign(sv, cents, id_col)
        cents = (
            sv.join(
                a.select(id_col, "sub", F.col("code").alias("cl")),
                [id_col, "sub"],
            )
            .groupBy("sub", "cl", "sdim")
            .agg(F.sum("val").cast("long").alias("s"), F.count("*").alias("n"))
            .select(
                "sub",
                "cl",
                "sdim",
                (
                    F.signum("s").cast("long")
                    * F.expr("abs(s) div n").cast("long")
                ).alias("cval"),
            )
            .localCheckpoint(eager=True)
        )
    return cents


def pq_encode(
    sv: DataFrame, cents: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """The compressed index: (id, sub, code) — m rows per vector."""
    return _pq_assign(sv, cents, id_col).select(id_col, "sub", "code")


def adc_topk(
    sv: DataFrame,
    cents: DataFrame,
    codes: DataFrame,
    query_ids,
    topk: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC search: (q, neighbor, adc_dist, rank) for each query id —
    approximate L2² = sum over subspaces of the exact query-to-centroid
    partial distance for the neighbor's code.  The distance table is
    queries x m x k rows (broadcast); candidates are scored by one
    equi-join on (sub, code) + a (q, neighbor) partial-agg sum; the
    per-q top-k is a WindowGroupLimit, never a global sort."""
    qv = sv.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("q"), "sub", "sdim", F.col("val").alias("qval")
    )
    dtab = (
        qv.join(F.broadcast(cents), ["sub", "sdim"])
        .groupBy("q", "sub", "cl")
        .agg(
            F.sum((F.col("qval") - F.col("cval")) * (F.col("qval") - F.col("cval")))
            .cast("long")
            .alias("pdist")
        )
    )
    scored = (
        codes.withColumnRenamed(id_col, "neighbor")
        .join(
            F.broadcast(dtab.withColumnRenamed("cl", "code")),
            ["sub", "code"],
        )
        .groupBy("q", "neighbor")
        .agg(F.sum("pdist").cast("long").alias("adc_dist"))
        .where(F.col("q") != F.col("neighbor"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q").orderBy(F.col("adc_dist").asc(), F.col("neighbor").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("q", "neighbor", "adc_dist", F.col("rank").cast("int").alias("rank"))
    )


def pq_index_and_search(
    vectors: DataFrame,
    m: int = 4,
    k: int = 8,
    updates: int = 1,
    query_ids=range(10),
    topk: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """End-to-end: fixed-point explode -> subspace split -> codebook
    training (one Lloyd update) -> encode -> ADC top-k for the query
    ids.  Dimensionality must divide evenly into ``m`` subspaces."""
    ev = explode_fp(vectors, id_col, vec_col)
    dims = vectors.select(F.size(vec_col).alias("d")).limit(1).collect()[0]["d"]
    if dims % m:
        raise ValueError(f"dims {dims} not divisible into m={m} subspaces")
    sv = subspace_ev(ev, dims // m, id_col).localCheckpoint(eager=True)
    cents = train_codebooks(sv, k, updates, id_col)
    codes = pq_encode(sv, cents, id_col)
    return adc_topk(sv, cents, codes, query_ids, topk, id_col)
