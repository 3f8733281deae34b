"""Parity on the LARGE Wojood fixture (train.txt: 1114 segments,
18,887 tokens, multi-label depth up to 4 — the hardest real data the
reference ships)."""

import os

import pytest

from arabicner_spark import oracle, schemas
from arabicner_spark.operators import ner
from arabicner_spark.sources import conll

TRAIN = "/root/reference/data/train.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(TRAIN), reason="reference fixtures unavailable"
)


@pytest.fixture(scope="module")
def train_corpus():
    segments = conll.parse_conll(TRAIN)
    types = conll.entity_types(segments)
    gaz = conll.gazetteer_from_gold(segments, types)
    rows = conll.segments_to_transcript_rows(segments)
    return segments, types, gaz, rows


def test_depth4_fixture_shape(train_corpus):
    segments, *_ = train_corpus
    assert len(segments) == 1114
    assert sum(len(s) for s in segments) == 18887
    depth = max(len(tags) for seg in segments for _t, tags in seg)
    assert depth == 4


def test_spark_equals_oracle_on_train(spark, train_corpus):
    segments, types, gaz, rows = train_corpus
    df = spark.createDataFrame(rows, schemas.TRANSCRIPTS)
    got = {
        (r.conv_id, r.turn_idx, r.level, r.type, r.start_tok, r.end_tok, r.text)
        for r in ner.extract_mentions(df, gaz, salt_partitions=8).collect()
    }
    want = set(oracle.oracle_mentions(rows, gaz))
    assert got == want
    assert len(got) > 2000


def test_gold_recall_on_train(spark, train_corpus):
    segments, types, gaz, rows = train_corpus
    df = spark.createDataFrame(rows, schemas.TRANSCRIPTS)
    got = {
        (r.conv_id, r.turn_idx, r.type, r.start_tok, r.end_tok)
        for r in ner.extract_mentions(df, gaz).collect()
    }
    gold = {
        (f"wojood_{si // 50:05d}", si % 50, typ, s, e)
        for si, _lvl, typ, s, e in conll.gold_spans(segments, types)
    }
    recall = len(gold & got) / len(gold)
    assert len(gold) > 2500  # measured: 2856 gold spans in train.txt
    assert recall >= 0.88, f"gold-span recall {recall:.3f} on depth-4 corpus"
