"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON
line: {"metric", "value", "unit", "queries": {name: sec}, "sf", ...}.

Timing = full materialization of each query (count() over the final
plan); the flagship kg_edges number also yields a triples/sec figure
(the BASELINE.json headline metric).

Measurement design (VERDICT r2 item 1): this VM's run-to-run spread is
±15% (hypervisor weather, BENCH/BASELINE.md variance table), while the
sf0.1 queries run 0.2–8 s — a single-shot bench cannot distinguish a
real 20% regression from noise.  So every query runs
$SPARK_GRAFT_BENCH_REPEATS times (default 3) in round-robin order
(whole-suite sweeps, not back-to-back repeats, so a slow patch of VM
weather hits all queries equally instead of burying one); "queries"
carries per-query MEDIANS, "spread" carries [min, max], and the
headline total is the sum of medians.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession

HEADLINE = [
    "kg_mentions_bio",
    "kg_triples",
    "kg_edges",
    "kg_components",
    "dedup_minhash_lsh",
    "dedup_jaccard",
    "dedup_simhash",
    "dedup_embedding",
    "ann_topk",
    "text_fingerprint",
    "text_quality",
    "rel_lineitem_agg",
    "rel_top_customers",
    "rel_event_sessions",
]


def skew_leg(spark, sf_dir: str, cpus: int) -> dict:
    """Planted-hot-conversation skew posture (VERDICT r1 item 7).

    Re-derives the transcript table with ONE conversation holding ~25%
    of all turns, runs the real NER -> triples path over it, and
    reports rows-per-shuffle-partition max/median for the two exchanges
    that could concentrate the hot conv:

      * the NER stage's repartitioned input, key (conv_id, turn_idx) —
        per-task work is linear in turns, so row balance IS task-time
        balance for the Python stage;
      * the triples groupBy, key (conv_id, turn_idx) — constant work
        per mention row after the bounded pair expansion.

    Partition ids use F.hash (Murmur3, seed 42) mod N — the exact
    function Catalyst's hashpartitioning applies, so the reported
    distribution is the real shuffle layout, not an approximation.
    """
    from pyspark.sql import functions as F

    from arabicner_spark.operators import ner, triples as triples_op
    from arabicner_spark.plans import testdata_queries as tq

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # doc_id % 4 == 0 -> the hot conv (~25% of turns); rest spread as usual
    hot = F.col("doc_id") % 4 == 0
    t = d.select(
        F.when(hot, F.lit("conv_hot"))
        .otherwise(
            F.concat(
                F.lit("conv_"),
                F.lpad((F.col("doc_id") % tq.N_CONVS).cast("string"), 4, "0"),
            )
        )
        .alias("conv_id"),
        F.when(hot, F.col("doc_id") / 4)
        .otherwise(F.col("doc_id") / tq.N_CONVS)
        .cast("int")
        .alias("turn_idx"),
        F.col("text"),
    )
    n_parts = spark.sparkContext.defaultParallelism
    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def ratio(df, n, *key_cols) -> float:
        sizes = (
            df.groupBy(F.pmod(F.hash(*key_cols), F.lit(n)).alias("p"))
            .count()
            .select("count")
        )
        stats = sizes.agg(
            F.max("count").alias("mx"),
            F.median("count").alias("md"),
        ).first()
        return round(float(stats.mx) / float(stats.md), 2)

    t0 = time.time()
    m = ner.extract_mentions(t, tq.gazetteer_dict_td()).localCheckpoint(eager=True)
    tri_n = triples_op.extract_triples(m, tq.PREDS_TD, tq.WINDOW_TD).count()
    wall = round(time.time() - t0, 3)

    ner_ratio = ratio(t, n_parts, F.col("conv_id"), F.col("turn_idx"))
    tri_ratio = ratio(m, shuffle_parts, F.col("conv_id"), F.col("turn_idx"))
    return {
        "hot_conv_turn_share": 0.25,
        "ner_salted_partition_max_over_median": ner_ratio,
        "triples_groupby_partition_max_over_median": tri_ratio,
        "triples_rows": tri_n,
        "wall_sec": wall,
    }


def ivf_cells_leg(spark, sf_dir: str) -> dict:
    """IVF cell fan-in balance (VERDICT r2 item 8): rows per coarse
    cell, max/median, using the EXACT assignment the ann_ivf query
    shuffles on (shared ivf_ranked helper).  The search join's shuffle
    key is the cell id, so this ratio IS the skew AQE's skew-join has
    to split at scale."""
    from pyspark.sql import functions as F

    from arabicner_spark.plans import testdata_queries as tq

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v")
    )
    sizes = (
        tq.ivf_ranked(e)
        .where(F.col("cr") == 1)
        .groupBy("cid")
        .count()
    )
    s = sizes.agg(
        F.max("count").alias("mx"),
        F.median("count").alias("md"),
        F.sum("count").alias("n"),
        F.count("*").alias("cells"),
    ).first()
    return {
        "cells": int(s.cells),
        "nprobe": tq.IVF_NPROBE,
        "rows": int(s.n),
        "cell_rows_max": int(s.mx),
        "cell_rows_max_over_median": round(float(s.mx) / float(s.md), 2),
    }


def coactivity_hot_minute_leg(spark, sf_dir: str) -> dict:
    """Planted-hot-minute posture for the co-occurrence graph build
    (graph_triangles/jaccard/bfs input): ~25% of events moved into ONE
    (event_type, minute) bucket, then the real distinct + bucket
    self-join runs.  Reports bucket occupancy max/median (the inherent
    quadratic fan-out driver: d users in a bucket emit d(d-1)/2 pairs —
    a property of co-occurrence graphs, not of the plan), the shuffle-
    partition max/median under the exact Murmur3 layout (what AQE's
    skew split sees), and pairs + wall for the hot build."""
    import time as _t

    from pyspark.sql import functions as F

    shuffle_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    hot = F.col("event_id") % 4 == 0
    b = (
        e.select(
            "user_id",
            F.when(hot, F.lit("view")).otherwise(F.col("event_type")).alias("event_type"),
            F.when(hot, F.lit(0)).otherwise(
                F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 60000000")
            ).cast("bigint").alias("minute"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    occ = b.groupBy("event_type", "minute").count()
    o = occ.agg(
        F.max("count").alias("mx"), F.median("count").alias("md")
    ).first()
    part = (
        b.groupBy(
            F.pmod(F.hash("event_type", "minute"), F.lit(shuffle_parts)).alias("p")
        )
        .count()
        .agg(F.max("count").alias("mx"), F.median("count").alias("md"))
        .first()
    )
    t0 = _t.time()
    x = b.select(F.col("user_id").alias("ua"), "event_type", "minute")
    y = b.select(F.col("user_id").alias("ub"), "event_type", "minute")
    pairs = (
        x.join(y, ["event_type", "minute"])
        .where(F.col("ua") < F.col("ub"))
        .select("ua", "ub")
        .distinct()
        .count()
    )
    wall = round(_t.time() - t0, 3)
    return {
        "hot_event_share": 0.25,
        "bucket_occupancy_max": int(o.mx),
        "bucket_occupancy_max_over_median": round(float(o.mx) / float(o.md), 2),
        "join_partition_max_over_median": round(float(part.mx) / float(part.md), 2),
        "distinct_pairs": int(pairs),
        "wall_sec": wall,
    }


def aqe_artifact_leg(spark, sf_dir: str, repeats: int) -> dict:
    """kg_edges with AQE post-shuffle coalescing disabled — the control
    from the r3 regression attribution (PLANS.md "kg_edges r1→r2
    regression"): at toy sf AQE folds the post-NER exchanges to 1-2
    partitions (tiny blocks), serializing the explode stage; at real
    block sizes it never would.  This leg pins the artifact's magnitude
    every round so headline kg_edges moves can be decomposed into
    real-plan change vs coalescing behavior."""
    from arabicner_spark.plans.testdata_queries import QUERIES

    fn, _ = QUERIES["kg_edges"]
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        samples = []
        for _ in range(max(repeats, 2)):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(round(time.time() - t0, 3))
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    s = sorted(samples)
    return {
        "kg_edges_no_coalesce_median": round(
            (s[len(s) // 2] + s[(len(s) - 1) // 2]) / 2, 3
        ),
        "samples": samples,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("arabicner-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from arabicner_spark.plans.testdata_queries import QUERIES

    samples: dict[str, list] = {name: [] for name in HEADLINE}
    counts = {}
    for _sweep in range(repeats):
        for name in HEADLINE:
            fn, _ = QUERIES[name]
            t0 = time.time()
            counts[name] = fn(spark, sf_dir).count()
            samples[name].append(round(time.time() - t0, 3))

    def median(xs):
        s = sorted(xs)
        n = len(s)
        return round((s[n // 2] + s[(n - 1) // 2]) / 2, 3)

    timings = {name: median(xs) for name, xs in samples.items()}
    spread = {name: [min(xs), max(xs)] for name, xs in samples.items()}
    total = round(sum(timings.values()), 3)
    triples_per_sec = (
        round(counts["kg_edges"] / timings["kg_edges"], 1) if timings.get("kg_edges") else None
    )
    # round-4 operator family, timed OUTSIDE the headline total so the
    # headline metric stays comparable across rounds (single-shot each;
    # these are codegen/one-pass queries without Python warmup)
    R4_OPS = [
        "text_pii_scrub",
        "text_subword_counts",
        "text_repetition",
        "text_urls",
        "sample_weighted",
        "kg_conv_profile",
    ]
    r4_timings = {}
    for name in R4_OPS:
        fn, _ = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        r4_timings[name] = round(time.time() - t0, 3)

    # round-5 operator family, same single-shot convention
    R5_OPS = [
        "ann_kmeans_refine",
        "bpe_pair_counts",
        "graph_kcore",
        "kg_label_prop",
        "sample_mixture",
        "sketch_heavy_hitters",
        "snapshot_time_travel",
        "text_arabic_normalize",
    ]
    r5_timings = {}
    for name in R5_OPS:
        fn, _ = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        r5_timings[name] = round(time.time() - t0, 3)

    # round-6 operator family, same single-shot convention
    R6_OPS = [
        "ann_pq",
        "dedup_substring",
        "dedup_substring_apply",
        "graph_kcore_fixpoint",
        "layout_zorder",
        "rel_bloom_prejoin",
        "kg_fact_fusion",
        "kg_negative_samples",
        "kg_pagerank_personalized",
        "kg_temporal_reach",
    ]
    r6_timings = {}
    for name in R6_OPS:
        fn, _ = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        r6_timings[name] = round(time.time() - t0, 3)

    skew = skew_leg(spark, sf_dir, cpus)
    ivf = ivf_cells_leg(spark, sf_dir)
    coact = coactivity_hot_minute_leg(spark, sf_dir)
    aqe = aqe_artifact_leg(spark, sf_dir, repeats)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "repeats": repeats,
                "sf": sf,
                "cpus": cpus,
                "rows": counts,
                "kg_edges_triples_per_sec": triples_per_sec,
                "r4_ops": r4_timings,
                "r5_ops": r5_timings,
                "r6_ops": r6_timings,
                "skew_hot_conv": skew,
                "ivf_cells": ivf,
                "coactivity_hot_minute": coact,
                "aqe_coalesce_artifact": aqe,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
