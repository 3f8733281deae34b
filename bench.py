"""Bench harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].  Prints ONE JSON
line: {"metric", "value", "unit", "queries": {name: sec}, "sf", ...}.

Timing = full materialization of each query (count() over the final
plan); the flagship kg_edges number also yields a triples/sec figure
(the BASELINE.json headline metric).
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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
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

    timings = {}
    counts = {}
    for name in HEADLINE:
        fn, _ = QUERIES[name]
        t0 = time.time()
        counts[name] = fn(spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    triples_per_sec = (
        round(counts["kg_edges"] / timings["kg_edges"], 1) if timings.get("kg_edges") else None
    )
    skew = skew_leg(spark, sf_dir, cpus)
    print(
        json.dumps(
            {
                "metric": "headline_query_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": cpus,
                "rows": counts,
                "kg_edges_triples_per_sec": triples_per_sec,
                "skew_hot_conv": skew,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
