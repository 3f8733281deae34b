"""Resume idempotency (north rule): kill after stage k, rerun, assert
byte-identical triple set and no duplicate lineage rows."""

import json
import os

import pytest

from arabicner_spark.plans.pipeline import PipelineConfig, run_pipeline
from arabicner_spark.sources import synth


@pytest.fixture()
def cfg():
    return PipelineConfig(
        gazetteer=synth.gazetteer_dict(), alias_rows=synth.make_alias_rows()
    )


def _edge_set(tables):
    return {
        (r.src, r.pred, r.dst, r.conv_id, r.turn_idx)
        for r in tables["edges"].collect()
    }


def test_full_run_then_resume_noop(spark, tmp_path, cfg):
    t = synth.transcripts_df(spark, n_convs=12, seed=42)
    root = str(tmp_path / "kg")
    first = _edge_set(run_pipeline(spark, t, cfg, root, run_id="r1", input_snapshot="s1"))
    assert first
    # metrics written once per stage
    metrics1 = spark.read.parquet(os.path.join(root, "_metrics"))
    stages1 = {r.stage for r in metrics1.select("stage").distinct().collect()}
    assert stages1 == {"mentions", "triples", "linking", "edges", "nodes"}
    n_metrics1 = metrics1.count()

    # resume with same snapshot: all stages skip, outputs identical,
    # no duplicate lineage/metrics rows
    second = _edge_set(run_pipeline(spark, t, cfg, root, run_id="r2", input_snapshot="s1"))
    assert second == first
    assert spark.read.parquet(os.path.join(root, "_metrics")).count() == n_metrics1


def test_partial_failure_then_resume(spark, tmp_path, cfg):
    """Simulate a kill after the triples stage: downstream manifests
    absent -> only downstream stages re-run; triple set byte-identical
    to an uninterrupted run."""
    t = synth.transcripts_df(spark, n_convs=12, seed=42)
    clean_root = str(tmp_path / "clean")
    want = _edge_set(run_pipeline(spark, t, cfg, clean_root, run_id="w", input_snapshot="s1"))

    broken_root = str(tmp_path / "broken")
    run_pipeline(spark, t, cfg, broken_root, run_id="r1", input_snapshot="s1")
    # "kill": delete manifests + outputs of linking and later stages
    for stage in ("linking", "edges", "nodes"):
        os.remove(os.path.join(broken_root, "_manifests", f"{stage}.json"))
    got = _edge_set(run_pipeline(spark, t, cfg, broken_root, run_id="r2", input_snapshot="s1"))
    assert got == want
    # mentions/triples manifests still credit the first run
    m = json.load(open(os.path.join(broken_root, "_manifests", "mentions.json")))
    assert m["run_id"] == "r1"
    e = json.load(open(os.path.join(broken_root, "_manifests", "edges.json")))
    assert e["run_id"] == "r2"
    # metrics are last-writer-wins per stage (overwrite, not append):
    # the rerun of linking/edges/nodes must not leave duplicate rows
    metrics = spark.read.parquet(os.path.join(broken_root, "_metrics"))
    dup = metrics.groupBy("stage", "partition_id").count().where("count > 1").count()
    assert dup == 0
    edge_runs = {r.run_id for r in metrics.where("stage = 'edges'").collect()}
    assert edge_runs == {"r2"}


def test_input_change_invalidates_resume(spark, tmp_path, cfg):
    t = synth.transcripts_df(spark, n_convs=12, seed=42)
    root = str(tmp_path / "kg")
    run_pipeline(spark, t, cfg, root, run_id="r1", input_snapshot="s1")
    t2 = synth.transcripts_df(spark, n_convs=13, seed=43)
    tables = run_pipeline(spark, t2, cfg, root, run_id="r2", input_snapshot="s2")
    m = json.load(open(os.path.join(root, "_manifests", "mentions.json")))
    assert m["run_id"] == "r2"  # stage re-ran, not skipped
    assert tables["edges"].count() > 0
