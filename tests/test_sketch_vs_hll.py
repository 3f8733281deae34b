"""KMV vs Spark's built-in approx_count_distinct (HyperLogLog++):
both land within their theoretical error bounds on the same input, and
the doc'd trade-off (PLANS.md "KMV vs HLL") stays true: HLL for
cheapest in-engine estimation, KMV when the ESTIMATE must be
bit-reproducible across engines/partitionings (the driver gate's
requirement — HLL register layouts are engine-specific)."""

from pyspark.sql import functions as F

from arabicner_spark.functions.sketches import kmv_distinct


def test_kmv_and_hll_error_bounds(spark):
    n, k, rsd = 20_000, 128, 0.05
    df = spark.range(n).select(F.col("id").cast("string").alias("v"))

    kmv_est = kmv_distinct(df, "v", k=k).first().estimate
    hll_est = df.agg(F.approx_count_distinct("v", rsd).alias("e")).first().e

    # KMV standard error ~ 1/sqrt(k-2); HLL++ is configured by rsd.
    # 5 sigma keeps both deterministic-given-input assertions stable.
    assert abs(kmv_est - n) / n <= 5.0 / (k - 2) ** 0.5
    assert abs(hll_est - n) / n <= 5.0 * rsd


def test_hll_not_reproducible_guarantee_vs_kmv(spark):
    """The property KMV buys over HLL: identical estimates under any
    partitioning (pure order statistic).  HLL is only *approximately*
    stable; its merge is register-wise max so it IS partition-stable in
    Spark, but its registers cannot be value-hashed against another
    engine — KMV's k-th hash can.  We pin the KMV half distributively
    (both partitionings, exact same kth_hash/estimate)."""
    df = spark.range(5000).select(F.col("id").cast("string").alias("v"))
    a = kmv_distinct(df.repartition(2), "v", k=64).first()
    b = kmv_distinct(df.repartition(17), "v", k=64).first()
    assert (a.kth_hash, a.estimate, a.n_kept) == (b.kth_hash, b.estimate, b.n_kept)
