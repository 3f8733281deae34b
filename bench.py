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
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
