"""Round-5 operators: deterministic label propagation, mixture
sampling, and time-travel snapshots on the TableIO facade."""

import pytest
from pyspark.sql import functions as F

from arabicner_spark.functions.sampling import mixture_sample
from arabicner_spark.operators.graph import label_propagation
from arabicner_spark.sources.io import TableIO


def _labels(df):
    return {r.node: r.label for r in df.collect()}


def test_lpa_two_cliques_converge_to_min_ids(spark):
    # two triangles joined by nothing: each community adopts its min id
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)],
        "src bigint, dst bigint",
    )
    out = _labels(label_propagation(edges, rounds=3))
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}


def test_lpa_tiebreak_smallest_label(spark):
    # node 5 sees labels {1, 9} once each -> ties to the smaller
    edges = spark.createDataFrame([(1, 5), (9, 5)], "src bigint, dst bigint")
    out = _labels(label_propagation(edges, rounds=1))
    assert out[5] == 1


def test_lpa_deterministic_across_partitionings(spark):
    edges = spark.createDataFrame(
        [(i, (i * 7) % 23) for i in range(60) if i != (i * 7) % 23],
        "src bigint, dst bigint",
    )
    a = _labels(label_propagation(edges.repartition(1), rounds=3))
    b = _labels(label_propagation(edges.repartition(16), rounds=3))
    assert a == b


@pytest.fixture()
def mix_docs(spark):
    src = (
        F.when(F.col("id") % 3 == 0, F.lit("web"))
        .when(F.col("id") % 3 == 1, F.lit("code"))
        .otherwise(F.lit("chat"))
    )
    return spark.range(0, 3000).select("id", src.alias("source"))


def test_mixture_sample_tracks_targets(spark, mix_docs):
    targets = {"web": 0.5, "code": 0.3, "chat": 0.2}
    kept = mixture_sample(mix_docs, "id", "source", targets, k=600, seed=11)
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    total = sum(counts.values())
    # md5-cut binomial noise: each source within ~25% of its target
    for s, share in targets.items():
        assert abs(counts[s] - share * 600) < 0.25 * share * 600 + 10
    assert abs(total - 600) < 100


def test_mixture_sample_saturates_small_source(spark):
    # source 'rare' has 10 rows but the target wants 50 -> rate caps at
    # 1.0 and ALL 10 are kept (cannot oversample without replacement)
    df = spark.range(0, 110).select(
        "id", F.when(F.col("id") < 10, "rare").otherwise("big").alias("source")
    )
    kept = mixture_sample(df, "id", "source", {"rare": 0.5, "big": 0.5}, k=100, seed=3)
    n_rare = kept.where(F.col("source") == "rare").count()
    assert n_rare == 10


def test_mixture_sample_membership_is_stable(spark, mix_docs):
    targets = {"web": 0.4, "code": 0.4, "chat": 0.2}
    a = {r.id for r in mixture_sample(mix_docs.repartition(2), "id", "source", targets, 300, seed=5).collect()}
    b = {r.id for r in mixture_sample(mix_docs.repartition(13), "id", "source", targets, 300, seed=5).collect()}
    assert a == b
    c = {r.id for r in mixture_sample(mix_docs, "id", "source", targets, 300, seed=6).collect()}
    assert a != c  # seed actually participates


def test_snapshot_time_travel_and_immutability(spark, tmp_path):
    io = TableIO(spark, str(tmp_path), "parquet")
    d1 = spark.range(0, 10).select("id")
    d2 = spark.range(0, 25).select("id")
    v1 = io.write_snapshot(d1, "t")
    v2 = io.write_snapshot(d2, "t")
    assert (v1, v2) == (1, 2)
    assert io.snapshot_versions("t") == [1, 2]
    # old version readable, unchanged, after the later commit
    assert io.read_snapshot("t", 1).count() == 10
    assert io.read_snapshot("t").count() == 25
    # commits never rewrite a prior version dir
    with pytest.raises(Exception):
        d2.write.mode("errorifexists").parquet(str(tmp_path / "t" / "v=1"))
    with pytest.raises(ValueError):
        io.read_snapshot("t", 99)
    with pytest.raises(ValueError):
        io.read_snapshot("missing")


def test_snapshot_expiry_keeps_newest_and_time_travel_still_works(spark, tmp_path):
    io = TableIO(spark, str(tmp_path), "parquet")
    for n in (5, 10, 15, 20):
        io.write_snapshot(spark.range(0, n), "t")
    expired = io.expire_snapshots("t", keep_last=2)
    assert expired == [1, 2]
    assert io.snapshot_versions("t") == [3, 4]
    assert io.read_snapshot("t", 3).count() == 15
    assert io.read_snapshot("t").count() == 20
    with pytest.raises(ValueError):
        io.read_snapshot("t", 1)  # expired versions are gone
    # and the next commit continues the version sequence
    assert io.write_snapshot(spark.range(0, 30), "t") == 5


def test_lpa_empty_edges_returns_empty(spark):
    edges = spark.createDataFrame([], "src bigint, dst bigint")
    assert label_propagation(edges, rounds=2).count() == 0


def test_lpa_self_loops_dropped(spark):
    # undirected_edges drops self-loops; a node with ONLY a self-loop
    # is not in the graph at all
    edges = spark.createDataFrame([(7, 7), (1, 2)], "src bigint, dst bigint")
    out = _labels(label_propagation(edges, rounds=2))
    assert 7 not in out and set(out) == {1, 2}


def test_mixture_source_missing_from_targets_is_dropped(spark):
    # sources without a target share contribute nothing (inner join
    # against the rate table) — the contract for "not in the recipe"
    df = spark.range(0, 90).select(
        "id", F.when(F.col("id") < 30, "web").otherwise("junk").alias("source")
    )
    kept = mixture_sample(df, "id", "source", {"web": 1.0}, k=30, seed=2)
    assert kept.where(F.col("source") == "junk").count() == 0
    assert kept.count() > 0


def test_mixture_zero_share_keeps_nothing(spark):
    df = spark.range(0, 50).select("id", F.lit("web").alias("source"))
    kept = mixture_sample(df, "id", "source", {"web": 0.0}, k=100, seed=2)
    assert kept.count() == 0
