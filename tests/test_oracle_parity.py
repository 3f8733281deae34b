"""The core correctness gate (SURVEY.md section 5): Spark pipeline vs
serial oracle on the deterministic synthetic transcript corpus —
mention-set equality, triple-set P/R >= 0.95, and the per-turn text
equality invariant under stable (conv_id, turn_idx) ordering."""

import pyspark.sql.functions as F
import pytest

from arabicner_spark import oracle
from arabicner_spark.operators import ner, triples
from arabicner_spark.sources import synth


@pytest.fixture(scope="module")
def corpus(spark):
    rows = synth.make_transcript_rows(n_convs=30, seed=42)
    df = synth.transcripts_df(spark, n_convs=30, seed=42)
    return rows, df


def test_mentions_spark_equals_oracle(spark, corpus):
    rows, df = corpus
    gaz = synth.gazetteer_dict()
    want = set(oracle.oracle_mentions(rows, gaz))
    got_df = ner.extract_mentions(df, gaz, salt_partitions=8)
    got = {
        (r.conv_id, r.turn_idx, r.level, r.type, r.start_tok, r.end_tok, r.text)
        for r in got_df.collect()
    }
    assert got == want
    assert len(got) > 100  # corpus actually plants entities


def test_triples_spark_vs_oracle_pr(spark, corpus):
    rows, df = corpus
    gaz = synth.gazetteer_dict()
    want = oracle.oracle_triples(oracle.oracle_mentions(rows, gaz))
    got_df = triples.extract_triples(ner.extract_mentions(df, gaz))
    got = [tuple(r) for r in got_df.collect()]
    p, r = oracle.precision_recall(got, want)
    assert p >= 0.95 and r >= 0.95
    # with identical scorer both ways the match is exact
    assert p == 1.0 and r == 1.0
    assert len(want) > 20


def test_triples_pr_threshold_under_perturbation(spark, corpus):
    """Perturb the Spark side's gazetteer (drop one rare phrase, add a
    spurious one) so P/R dips below 1.0 but stays >= 0.95 — exercises
    the threshold logic itself rather than only exact equality."""
    rows, df = corpus
    gaz = synth.gazetteer_dict()
    want = oracle.oracle_triples(oracle.oracle_mentions(rows, gaz))
    perturbed = {t: set(ps) for t, ps in gaz.items()}
    perturbed["GPE"] = perturbed["GPE"] - {("القاهره",)}
    got_df = triples.extract_triples(ner.extract_mentions(df, perturbed))
    got = [tuple(r) for r in got_df.collect()]
    p, r = oracle.precision_recall(got, want)
    assert p == 1.0  # dropping a phrase cannot add false triples
    assert 0.95 <= r < 1.0


def test_per_turn_text_equality_invariant(spark, corpus):
    """concat_ws(' ', split(text)) == text for every turn, checked under
    stable (conv_id, turn_idx) ordering (north-rule invariant)."""
    _, df = corpus
    bad = (
        df.withColumn("rejoined", F.concat_ws(" ", F.split(F.col("text"), " ")))
        .where(F.col("rejoined") != F.col("text"))
        .count()
    )
    assert bad == 0
    # stable ordering: turn_idx dense 0..n-1 within each conv
    agg = df.groupBy("conv_id").agg(
        F.count("*").alias("n"),
        F.min("turn_idx").alias("lo"),
        F.max("turn_idx").alias("hi"),
        F.countDistinct("turn_idx").alias("d"),
    )
    assert agg.where(
        (F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1) | (F.col("d") != F.col("n"))
    ).count() == 0


def test_truncation_preserves_text_but_drops_tail_mentions(spark, corpus):
    """Long turns (>510 stand-in subwords) keep full text (equality
    invariant) but mentions planted in the truncated tail are absent."""
    rows, df = corpus
    gaz = synth.gazetteer_dict()
    long_rows = [r for r in rows if len(r[3].split()) > 600]
    assert long_rows, "corpus must contain long turns"
    got = ner.extract_mentions(df, gaz).collect()
    by_turn = {}
    for m in got:
        by_turn.setdefault((m.conv_id, m.turn_idx), []).append(m)
    for r in long_rows:
        ms = by_turn.get((r[0], r[1]), [])
        n_tok = len(r[3].split())
        # the tail-planted GPE sits at the very end — beyond the budget
        assert all(m.end_tok < n_tok - 1 for m in ms)
