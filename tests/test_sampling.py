"""functions/sampling.weighted_sample: determinism across
partitionings, the weighted-inclusion property, and plan shape."""

from pyspark.sql import functions as F

from arabicner_spark.functions.sampling import weighted_sample


def _df(spark, n=400):
    # weights 1..4: doc i has weight (i % 4) + 1
    return spark.range(n).select(
        F.col("id").alias("doc_id"), ((F.col("id") % 4) + 1).alias("w")
    )


def test_weighted_sample_deterministic_across_partitionings(spark):
    df = _df(spark)
    a = [r.doc_id for r in weighted_sample(df.repartition(1), "doc_id", "w", 50).collect()]
    b = [r.doc_id for r in weighted_sample(df.repartition(13), "doc_id", "w", 50).collect()]
    assert a == b and len(a) == 50


def test_weighted_sample_prefers_heavy_rows(spark):
    """Inclusion probability is proportional to weight (for rows below
    the threshold), so across seeds the sampled mean weight must sit
    clearly above the corpus mean (2.5 here; proportional sampling of
    weights 1..4 gives E[w | sampled] = E[w^2]/E[w] = 3.0)."""
    df = _df(spark).cache()
    means = []
    for seed in range(10):
        s = weighted_sample(df, "doc_id", "w", 80, seed=seed)
        means.append(s.agg(F.avg("w")).first()[0])
    avg = sum(means) / len(means)
    assert 2.7 < avg < 3.3, (avg, means)


def test_weighted_sample_is_takeordered(spark):
    plan = weighted_sample(_df(spark), "doc_id", "w", 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
