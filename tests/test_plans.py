"""Physical-plan regression guards: the properties PLANS.md documents,
asserted programmatically so an innocent-looking refactor can't
silently reintroduce a double-computed UDF stage or a pre-join shuffle.
"""

import contextlib
import io
import re

import pytest


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def nodes_of(plan: str):
    """One entry per physical node, from the detail headers."""
    return re.findall(r"\n\(\d+\) (\w+)", plan)


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"


def test_ner_stage_runs_once_in_triples_plan(spark, sf_dir):
    from arabicner_spark.plans.testdata_queries import QUERIES

    plan = plan_of(QUERIES["kg_triples"][0](spark, sf_dir))
    nodes = nodes_of(plan)
    # the expensive Python stage must appear exactly once
    assert nodes.count("MapInPandas") == 1
    # pair generation is array-combinatorics, not a self-join
    assert "SortMergeJoin" not in nodes
    assert nodes.count("BroadcastHashJoin") == 1  # predicate table only


def test_mention_scan_has_no_prejoin_shuffle(spark, sf_dir):
    from arabicner_spark.plans.testdata_queries import QUERIES

    plan = plan_of(QUERIES["kg_mentions"][0](spark, sf_dir))
    nodes = nodes_of(plan)
    assert "Window" not in nodes
    # only the broadcast exchange for the gazetteer — no data shuffle
    exchanges = [n for n in nodes if n.endswith("Exchange")]
    assert exchanges and all(e == "BroadcastExchange" for e in exchanges), exchanges


def test_ner_column_pruning_reaches_scan(spark, sf_dir):
    from arabicner_spark.plans.testdata_queries import QUERIES

    plan = plan_of(QUERIES["kg_mentions_bio"][0](spark, sf_dir))
    # only doc_id + text may be read from the documents scan
    assert "ReadSchema: struct<doc_id:bigint,text:string>" in plan


def test_ann_topk_rank_pushdown(spark, sf_dir):
    from arabicner_spark.plans.testdata_queries import QUERIES

    plan = plan_of(QUERIES["ann_topk"][0](spark, sf_dir))
    assert "WindowGroupLimit" in plan  # top-k never materializes full score set


def test_hot_conversation_spreads_across_partitions(spark):
    """Extreme skew: one conversation with 4000 turns must not land in
    one task — the (conv_id, turn_idx) repartition spreads its turns
    uniformly."""
    import pyspark.sql.functions as F

    from arabicner_spark import schemas
    from arabicner_spark.operators import ner
    from datetime import datetime, timezone

    ts = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows = [("hot", i, "user", "زار الأسد بيرزيت", None, ts) for i in range(4000)]
    df = spark.createDataFrame(rows, schemas.TRANSCRIPTS)
    from arabicner_spark.sources import synth

    m = ner.extract_mentions(df, synth.gazetteer_dict(), salt_partitions=16)
    per_part = (
        m.withColumn("p", F.spark_partition_id()).groupBy("p").count().collect()
    )
    assert len(per_part) >= 8  # spread over many tasks, not one
    assert max(r["count"] for r in per_part) < 8000 * 0.5  # no single-task pileup


def test_r4_text_queries_are_python_free(spark, sf_dir):
    """text_repetition / text_urls / text_pii_scrub / text_subword_counts
    must stay whole-stage-codegen expression pipelines — no Python
    boundary anywhere in the hot path."""
    from arabicner_spark.plans.testdata_queries import QUERIES

    for name in (
        "text_repetition",
        "text_urls",
        "text_pii_scrub",
        "text_subword_counts",
    ):
        nodes = nodes_of(plan_of(QUERIES[name][0](spark, sf_dir)))
        assert "MapInPandas" not in nodes and "BatchEvalPython" not in nodes, name
        assert "ArrowEvalPython" not in nodes, name


def test_mm_resize_prunes_scan_to_payload_cols(spark, sf_dir):
    """The resize operator's Arrow boundary must see only the three
    asset columns; lang/source/n_chars must be pruned at the scan."""
    from arabicner_spark.plans.testdata_queries import QUERIES

    plan = plan_of(QUERIES["mm_resize"][0](spark, sf_dir))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"doc_id", "text"}, read_cols


def test_pin_width_respects_shuffle_partitions(spark):
    """r3 ADVICE item 5: the explicit width pin must never be NARROWER
    than the configured shuffle width — it replaces the AQE-sized
    exchange, so a bare-defaultParallelism pin would cap compute-bound
    stages at core count on arbitrarily large inputs."""
    from arabicner_spark.plans.testdata_queries import pin_width

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "400")
        assert pin_width(spark) == 400
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        assert pin_width(spark) == spark.sparkContext.defaultParallelism
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_r5_queries_plan_shapes(spark, sf_dir):
    """Round-5 operators stay on the fast path: BPE pair counting and
    mixture sampling are Python-free (pure codegen + one agg /
    broadcast join), the BPE top-k is a TakeOrderedAndProject (never a
    global sort), mixture's rate join broadcasts (never a shuffle of
    the doc side against 3 rate rows), and no r5 query plans a
    cartesian/BNLJ."""
    from arabicner_spark.operators import bpe
    from arabicner_spark.plans.testdata_queries import QUERIES

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pc_plan = plan_of(bpe.char_pair_counts(bpe.word_freqs(d), k=20))
    assert "TakeOrderedAndProject" in pc_plan
    assert "PythonUDF" not in pc_plan and "ArrowEval" not in pc_plan

    mix_plan = plan_of(QUERIES["sample_mixture"][0](spark, sf_dir))
    assert "BroadcastHashJoin" in mix_plan
    assert "PythonUDF" not in mix_plan
    for name in ("bpe_pair_counts", "sample_mixture", "snapshot_time_travel"):
        p = plan_of(QUERIES[name][0](spark, sf_dir))
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


def test_label_propagation_rounds_use_agg_not_window(spark):
    """The LPA arg-max must plan as a max_by HashAggregate (map-side
    combinable), not a per-node Window sort — the difference between a
    shuffle of (node,label,count) partials and a full sort of the vote
    table at 100 TB."""
    from pyspark.sql import functions as F

    from arabicner_spark.operators.graph import _lpa_round, undirected_edges

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src bigint, dst bigint"
    )
    und = undirected_edges(edges)
    adj = und.select(F.col("a").alias("node"), F.col("b").alias("peer")).unionByName(
        und.select(F.col("b").alias("node"), F.col("a").alias("peer"))
    )
    labels = adj.select("node").distinct().select(
        "node", F.col("node").cast("long").alias("label")
    )
    p = plan_of(_lpa_round(adj, labels))
    assert "Window" not in nodes_of(p)
    assert "max_by" in p


def test_r6_new_queries_plan_shapes(spark, sf_dir):
    """Round-6 additions keep the 100-TB-safe shapes: PQ search and
    the Bloom probe are broadcast-join-only (no cartesian, no BNLJ,
    no sort-merge — the fact side is never shuffled to evaluate the
    filter), and the z-order stats are pure aggregation (no joins at
    all).  negative_samples is allowed exactly ONE one-row
    BroadcastNestedLoopJoin: the entity-count scalar crossJoin, the
    same documented pattern as the sketch family's one-row bounds."""
    from arabicner_spark.plans.testdata_queries import QUERIES

    p = plan_of(QUERIES["rel_bloom_prejoin"][0](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "SortMergeJoin" not in p
    assert "BroadcastHashJoin" in p

    # r7: ann_pq's search is a MapInArrow pass over the vector table
    # (codes + ADC per batch against a broadcast codebook) + one per-q
    # WindowGroupLimit — no join of ANY kind touches the candidates
    p = plan_of(QUERIES["ann_pq"][0](spark, sf_dir))
    assert "CartesianProduct" not in p
    assert "Join" not in p
    assert "MapInArrow" in p
    assert "WindowGroupLimit" in p

    p = plan_of(QUERIES["layout_zorder"][0](spark, sf_dir))
    assert "Join" not in p
    assert "PythonUDF" not in p

    p = plan_of(QUERIES["kg_negative_samples"][0](spark, sf_dir))
    assert "CartesianProduct" not in p
    # one physical node = two mentions in formatted explain (tree +
    # details), so ONE allowed BNLJ counts as <= 2 here
    assert p.count("BroadcastNestedLoopJoin") <= 2
