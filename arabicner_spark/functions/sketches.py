"""KMV (k-minimum-values) distinct-count sketch — deterministic,
mergeable, and EXACTLY reproducible across engines.

Why KMV here: the usual sketches (HLL, theta) have engine-specific
register layouts, so Spark's approx_count_distinct can never value-hash
against DuckDB's.  KMV over a deterministic hash is different: hash
every distinct item to md5 (portable, memory: md5-hex lexicographic
order is identical everywhere), keep the k smallest hashes, estimate

    D  ≈  (k - 1) / frac(h_k)

where frac(h_k) maps the k-th smallest hash to (0, 1].  The k-mins set
is a pure order statistic: per-partition top-k mins merge by taking
the k smallest of the union — in Spark that is exactly the map-side
partial top-k of TakeOrderedAndProject (orderBy + limit), so the
sketch state crossing the wire is k rows per partition, never the
distinct set.  The same computation is plain SQL in DuckDB, so the
driver gate pins the ESTIMATE bit-for-bit, not "within rsd".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _frac(hex_col: Column, nibbles: int = 15) -> Column:
    """First ``nibbles`` hex digits of an md5 as a fraction in (0, 1].

    15 nibbles = 60 bits — exact in a double (no 64-bit rounding trap),
    and DuckDB computes the identical value from the same md5 string.
    """
    return (F.conv(F.substring(hex_col, 1, nibbles), 16, 10).cast("double") + 1) / F.lit(
        float(16**nibbles)
    )


def kmv_distinct(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """-> one row: (k, n_kept, kth_hash, estimate) — the KMV
    distinct-count estimate for ``col``.

    Plan: distinct -> md5 -> global k smallest (TakeOrderedAndProject:
    map-side partial top-k per partition, single k-row merge) -> the
    k-th value's fraction.  No full sort, no collect of the value set.

    Small-set rule (mirrors kmv_distinct_by): when the true distinct
    count n < k, the kept set IS the whole distinct set and the
    (k-1)/frac(h_max) formula would grossly overestimate — so the
    sketch reports the exact kept-set size instead.
    """
    hashes = (
        df.select(F.md5(F.encode(F.col(col).cast("string"), "utf-8")).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = hashes.agg(
        F.count("*").cast("bigint").alias("n_kept"), F.max("h").alias("kth_hash")
    )
    return agg.select(
        F.lit(k).alias("k"),
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.round((k - 1) / _frac(F.col("kth_hash")), 4))
        .alias("estimate"),
    )


def kmv_distinct_by(df: DataFrame, group: str, col: str, k: int = 64) -> DataFrame:
    """Per-group KMV: -> (group, n_kept, kth_hash, estimate) — the
    distinct-count estimate of ``col`` within each ``group``.

    The sketch becomes a per-group AGGREGATE: the rank window under a
    ``rank <= k`` filter plans as WindowGroupLimit, Spark's map-side
    per-group top-k pushdown, so the state crossing the shuffle is at
    most k hashes per (partition, group) — the mergeability property
    that makes the sketch a 100-TB aggregate.  Groups with fewer than k
    distinct values fall back to the EXACT count (the standard KMV
    small-set rule: the sketch holds the whole set, so report its
    size).
    """
    from pyspark.sql.window import Window

    hashes = df.select(
        F.col(group).alias("grp"),
        F.md5(F.encode(F.col(col).cast("string"), "utf-8")).alias("h"),
    ).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    kept = hashes.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
    agg = kept.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("h").alias("kth_hash"),
    )
    return agg.select(
        F.col("grp").alias(group),
        "n_kept",
        "kth_hash",
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.round((k - 1) / _frac(F.col("kth_hash")), 4))
        .alias("estimate"),
    )


def heavy_hitters_exact(df: DataFrame, col: str, s: int = 20) -> DataFrame:
    """Exact phi-heavy hitters: every value with count > n/s, plus its
    count and share.  Two map-side-combinable aggregates and a one-row
    broadcast — the exact two-pass formulation that is preferable to a
    sketch whenever a shuffle over the DISTINCT values is affordable
    (the group-by carries one row per distinct value, not per input
    row).  ``share`` is one IEEE division + round(4), cross-engine
    exact."""
    counts = df.groupBy(F.col(col).alias("val")).agg(
        F.count("*").cast("bigint").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").cast("bigint").alias("n"))
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * s > F.col("n"))
        .select("val", "cnt", F.round(F.col("cnt") / F.col("n"), 4).alias("share"))
    )


def heavy_hitters_mg(df: DataFrame, col: str, k: int = 8) -> DataFrame:
    """Misra-Gries summary, distributed and Arrow-vectorized: each
    partition folds its Arrow batches into a k-counter MG summary
    (``mapInArrow`` iterator form — per-batch C++ ``value_counts``
    concatenated into the running summary table, group-summed, then
    trimmed by the (k+1)-th largest counter; output is summary-sized,
    at most k rows per partition, never data-sized).  Partition
    summaries merge by summing per-value estimates, lowered by the
    (k+1)-th largest to restore the MG underestimate invariant.

    The batch-fold is the mergeable-summaries formulation of MG
    (Agarwal et al.): subtracting the (k+1)-th largest counter from
    all counters removes >= (k+1) x that amount of total weight, so
    the per-value underestimate stays <= n/(k+1) exactly as in the
    per-row decrement form — but the hot path is pyarrow.compute
    end to end (value_counts, group_by sum, sort, subtract): no
    per-row Python, and no Python string is ever materialized for a
    data row (a mapInPandas draft paid Arrow->pandas OBJECT
    conversion for every row — 30M PyObject strings — and measured
    only 1.7x over the rdd.mapPartitions form it replaced; the
    all-Arrow fold is where the vectorization win actually lives,
    receipt in COVERAGE.md).

    Guarantee (property-tested): for every value,
    ``true - n/(k+1) <= est <= true`` — so any value with frequency
    above n/(k+1) is guaranteed present.  Estimates depend on
    partition layout (inherent to MG), so this is the
    streaming/constant-memory path; exact two-pass above is the gate.
    """

    def mg_fold(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        state = None  # pa.Table (val, est), <= k rows between batches
        for rb in batches:
            # nulls are COUNTED as a value (the pre-Arrow rdd fold's
            # semantics, and the exact gate's: groupBy keeps a null
            # group) — a null-heavy column must not silently lose its
            # summary entry (ADVICE r6)
            vc = pc.value_counts(rb.column(0))
            tbl = pa.table(
                {
                    "val": vc.field("values"),
                    "est": pc.cast(vc.field("counts"), pa.int64()),
                }
            )
            if state is None:
                state = tbl
            else:
                state = (
                    pa.concat_tables([state, tbl])
                    .group_by("val")
                    .aggregate([("est", "sum")])
                    .rename_columns(["val", "est"])
                )
            if state.num_rows > k:
                state = state.take(
                    pc.sort_indices(state, sort_keys=[("est", "descending")])
                )
                cut = state.column("est")[k].as_py()  # (k+1)-th largest
                state = state.slice(0, k)  # ranks k+1.. are <= cut: drop
                est = pc.subtract(state.column("est"), pa.scalar(cut, pa.int64()))
                state = pa.table({"val": state.column("val"), "est": est}).filter(
                    pc.greater(est, 0)
                )
        if state is not None and state.num_rows:
            yield from state.combine_chunks().to_batches()

    parts = df.select(F.col(col).cast("string").alias("val")).mapInArrow(
        mg_fold, "val string, est long"
    )
    merged = parts.groupBy("val").agg(F.sum("est").cast("bigint").alias("est"))
    # subtract the (k+1)-th largest merged estimate — but only when
    # more than k values survived the merge (otherwise nothing to trim)
    kth = (
        merged.orderBy(F.desc("est"), "val")
        .limit(k + 1)
        .agg(
            F.when(F.count("*") > k, F.min("est"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("kth")
        )
    )
    over = merged.crossJoin(F.broadcast(kth))
    return (
        over.select(
            "val",
            F.when(F.col("est") > F.col("kth"), F.col("est") - F.col("kth"))
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("est"),
        )
        .where(F.col("est") > 0)
    )
