"""operators/kmeans: the distributed fixed-point Lloyd refinement must
equal a serial numpy twin exactly (same quantization, same truncated
integral means, same (dist, cluster) tie order), stay stable across
partitionings, and handle empty clusters deterministically."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from arabicner_spark.operators.kmeans import SCALE, kmeans_fp


def _numpy_kmeans_fp(vecs: dict, k: int, rounds: int):
    """Serial twin: vecs = {id: list[float]}."""
    q = {i: np.floor(np.asarray(v, dtype=np.float64) * SCALE).astype(np.int64) for i, v in vecs.items()}
    cents = {i: q[i].copy() for i in sorted(q) if i < k}

    def assign():
        out = {}
        for i, v in q.items():
            best = min(
                ((int(((v - c) ** 2).sum()), cl) for cl, c in cents.items()),
                key=lambda t: (t[0], t[1]),
            )
            out[i] = (best[1], best[0])
        return out

    a = assign()
    for _ in range(rounds - 1):
        groups = {}
        for i, (cl, _d) in a.items():
            groups.setdefault(cl, []).append(q[i])
        cents = {}
        for cl, members in groups.items():
            s = np.sum(np.stack(members), axis=0, dtype=np.int64)
            n = len(members)
            cents[cl] = np.sign(s) * (np.abs(s) // n)
        a = assign()
    return {i: (cl, d) for i, (cl, d) in a.items()}


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.RandomState(7)
    vecs = {i: rng.uniform(-1, 1, 8).round(3).tolist() for i in range(60)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, v array<double>"
    )
    return vecs, df


def test_kmeans_matches_numpy_twin(spark, vec_df):
    vecs, df = vec_df
    want = _numpy_kmeans_fp(vecs, k=4, rounds=3)
    got = {
        r.vec_id: (r.cluster, r.dist_fp)
        for r in kmeans_fp(df, k=4, rounds=3).collect()
    }
    assert got == want


def test_kmeans_stable_across_partitionings(spark, vec_df):
    _, df = vec_df
    a = {tuple(r) for r in kmeans_fp(df.repartition(1), k=4, rounds=2).collect()}
    b = {tuple(r) for r in kmeans_fp(df.repartition(16), k=4, rounds=2).collect()}
    assert a == b


def test_kmeans_refinement_reduces_total_distortion(spark):
    # two tight blobs, seeds both inside blob A: the update round must
    # pull a centroid toward blob B and cut the summed distortion
    rng = np.random.RandomState(1)
    blob_a = [(i, (rng.uniform(-0.05, 0.05, 8) + 1.0).tolist()) for i in range(30)]
    blob_b = [(i + 30, (rng.uniform(-0.05, 0.05, 8) - 1.0).tolist()) for i in range(30)]
    df = spark.createDataFrame(blob_a + blob_b, "vec_id bigint, v array<double>")
    d1 = kmeans_fp(df, k=2, rounds=1).agg(F.sum("dist_fp")).first()[0]
    d2 = kmeans_fp(df, k=2, rounds=2).agg(F.sum("dist_fp")).first()[0]
    assert d2 <= d1


def test_kmeans_k_larger_than_input(spark):
    # only 3 vectors but k=8: every vector is its own (seed) centroid,
    # final distortion 0, assignment = identity
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])],
        "vec_id bigint, v array<double>",
    )
    rows = {r.vec_id: (r.cluster, r.dist_fp) for r in kmeans_fp(df, k=8, rounds=2).collect()}
    assert rows == {0: (0, 0), 1: (1, 0), 2: (2, 0)}
