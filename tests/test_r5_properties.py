"""Property tests for the round-5 operators.

Spark sessions are too slow for per-example use, so each property
collects many generated cases into ONE DataFrame and checks all rows
of a single Spark job against the serial reference — the same
batching trick as tests/test_properties.py.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from arabicner_spark.operators import bpe

syms_lists = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=2), min_size=0, max_size=10
)
merge_pairs = st.tuples(
    st.text(alphabet="abc", min_size=1, max_size=2),
    st.text(alphabet="abc", min_size=1, max_size=2),
)


def _py_apply(syms, x, y):
    out = []
    for s in syms:
        if out and out[-1] == x and s == y:
            out[-1] = x + y
        else:
            out.append(s)
    return out


@settings(max_examples=60, deadline=None)
@given(
    pair=merge_pairs,
    lists=st.lists(syms_lists, min_size=1, max_size=30),
)
def test_apply_merge_equals_python_fold(spark, pair, lists):
    x, y = pair
    df = spark.createDataFrame(
        [(i, syms) for i, syms in enumerate(lists)], "i int, syms array<string>"
    )
    got = {
        r.i: list(r.m)
        for r in df.select("i", bpe.apply_merge(F.col("syms"), x, y).alias("m")).collect()
    }
    for i, syms in enumerate(lists):
        assert got[i] == _py_apply(syms, x, y), (syms, x, y)


@settings(max_examples=15, deadline=None)
@given(
    n=st.integers(min_value=3, max_value=40),
    dims=st.integers(min_value=1, max_value=6),
    k=st.integers(min_value=1, max_value=6),
    rounds=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_kmeans_fp_equals_numpy_twin_random(spark, n, dims, k, rounds, seed):
    from tests.test_kmeans import _numpy_kmeans_fp

    from arabicner_spark.operators.kmeans import kmeans_fp

    rng = np.random.RandomState(seed)
    vecs = {i: rng.uniform(-1.5, 1.5, dims).round(4).tolist() for i in range(n)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id bigint, v array<double>"
    )
    want = _numpy_kmeans_fp(vecs, k=min(k, n), rounds=rounds)
    got = {
        r.vec_id: (r.cluster, r.dist_fp)
        for r in kmeans_fp(df, k=min(k, n), rounds=rounds).collect()
    }
    assert got == want
