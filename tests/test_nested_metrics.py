"""nested_metrics vs a hand-computed seqeval-IOB2 fixture.

seqeval is not installed in this sandbox, so the expected numbers below
are worked out by hand for a small two-type nested fixture, following
seqeval's documented semantics exactly (arabiner/utils/metrics.py:31-46
uses f1_score(average=micro|macro|weighted, scheme=IOB2) +
accuracy_score over the per-level duplicated dataset):

Fixture: turns t0 (6 tokens) and t1 (4 tokens); types A (level 0) and
B (level 1).

  gold:  (t0,A,0-2) (t0,A,4-5) (t1,A,0-1) (t0,B,1-2) (t1,B,2-4)
  pred:  (t0,A,0-2)            (t1,A,0-2) (t0,B,2-3) (t1,B,2-4)

  micro: tp=2, |gold|=5, |pred|=4 -> P=0.5 R=0.4 F1=0.4444...
  type A: gold 3, pred 2, tp 1 -> P=0.5 R=1/3 F1=0.4
  type B: gold 2, pred 2, tp 1 -> P=0.5 R=0.5 F1=0.5
  macro F1 = (0.4+0.5)/2 = 0.45
  weighted F1 = (0.4*3 + 0.5*2)/5 = 0.44
  accuracy: 20 token slots (10 tokens x 2 levels);
    level A: t0 B-A I-A O O B-A O vs B-A I-A O O O O -> 5/6
             t1 B-A O O O        vs B-A I-A O O      -> 3/4
    level B: t0 O B-B O O O O    vs O O B-B O O O    -> 4/6
             t1 O O B-B I-B      vs O O B-B I-B      -> 4/4
    -> 16/20 = 0.8
"""

import pytest

from arabicner_spark.operators import metrics

SPAN_SCHEMA = (
    "conv_id string, turn_idx int, level int, type string, "
    "start_tok int, end_tok int"
)

GOLD = [
    ("c", 0, 0, "A", 0, 2),
    ("c", 0, 0, "A", 4, 5),
    ("c", 1, 0, "A", 0, 1),
    ("c", 0, 1, "B", 1, 2),
    ("c", 1, 1, "B", 2, 4),
]
PRED = [
    ("c", 0, 0, "A", 0, 2),
    ("c", 1, 0, "A", 0, 2),
    ("c", 0, 1, "B", 2, 3),
    ("c", 1, 1, "B", 2, 4),
]


def test_nested_metrics_hand_fixture(spark):
    gold = spark.createDataFrame(GOLD, SPAN_SCHEMA)
    pred = spark.createDataFrame(PRED, SPAN_SCHEMA)
    turn_tokens = spark.createDataFrame(
        [("c", 0, 6), ("c", 1, 4)], "conv_id string, turn_idx int, n_tokens int"
    )
    m = metrics.nested_metrics(gold, pred, turn_tokens, n_levels=2)
    assert m.precision == pytest.approx(0.5)
    assert m.recall == pytest.approx(0.4)
    assert m.micro_f1 == pytest.approx(4.0 / 9.0)
    assert m.macro_f1 == pytest.approx(0.45)
    assert m.weights_f1 == pytest.approx(0.44)
    assert m.accuracy == pytest.approx(0.8)


def test_nested_metrics_perfect_and_empty(spark):
    gold = spark.createDataFrame(GOLD, SPAN_SCHEMA)
    turn_tokens = spark.createDataFrame(
        [("c", 0, 6), ("c", 1, 4)], "conv_id string, turn_idx int, n_tokens int"
    )
    perfect = metrics.nested_metrics(gold, gold, turn_tokens, n_levels=2)
    assert perfect.micro_f1 == perfect.macro_f1 == perfect.weights_f1 == 1.0
    assert perfect.accuracy == 1.0

    empty = spark.createDataFrame([], SPAN_SCHEMA)
    none_pred = metrics.nested_metrics(gold, empty, turn_tokens, n_levels=2)
    assert none_pred.micro_f1 == 0.0
    assert none_pred.recall == 0.0
    # 7 gold-tagged slots of 20 are wrong when predicting all-O
    assert none_pred.accuracy == pytest.approx(13 / 20)


def test_token_tags_bio_shape(spark):
    spans = spark.createDataFrame([("c", 0, 0, "A", 1, 4)], SPAN_SCHEMA)
    rows = sorted(
        (r.pos, r.tag) for r in metrics.token_tags(spans).collect()
    )
    assert rows == [(1, "B-A"), (2, "I-A"), (3, "I-A")]
