"""Oracle-parity on the REAL Wojood nested-entity fixtures
(/root/reference/data/*.txt — the corpus the reference's eval.py runs,
multi-label depth up to 4, 21 entity types).

The AraBERT checkpoint is LFS-stubbed in the reference checkout, so the
scorer is the shared deterministic gazetteer built FROM the gold spans
(recall-oriented); the test then verifies that

  1. the Spark mapInPandas stage and the serial oracle produce the
     IDENTICAL mention set over the real Arabic text (nested, RTL,
     diacritics — everything the synthetic corpus approximates), and
  2. decoded spans against GOLD spans reach high recall (every gold
     surface is in the gazetteer, so misses can only come from decode /
     alignment bugs) — precision is left loose (gazetteer matching
     overfires on O-context, which is expected without real weights).
"""

import os

import pytest

from arabicner_spark import oracle, schemas
from arabicner_spark.functions.normalize import normalize_py
from arabicner_spark.operators import ner
from arabicner_spark.sources import conll

VAL = "/root/reference/data/val.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(VAL), reason="reference fixtures unavailable"
)


@pytest.fixture(scope="module")
def wojood():
    segments = conll.parse_conll(VAL)
    types = conll.entity_types(segments)
    gaz = conll.gazetteer_from_gold(segments, types)
    rows = conll.segments_to_transcript_rows(segments)
    return segments, types, gaz, rows


def test_fixture_shape(wojood):
    segments, types, _gaz, _rows = wojood
    assert len(segments) == 158  # BASELINE.md fixture row
    assert sum(len(s) for s in segments) == 2743
    # multi-label tokens exist (nested depth >= 2)
    assert any(len(tags) > 1 for seg in segments for _t, tags in seg)


def test_spark_equals_oracle_on_wojood(spark, wojood):
    segments, types, gaz, rows = wojood
    df = spark.createDataFrame(rows, schemas.TRANSCRIPTS)
    got = {
        (r.conv_id, r.turn_idx, r.level, r.type, r.start_tok, r.end_tok, r.text)
        for r in ner.extract_mentions(df, gaz).collect()
    }
    want = set(oracle.oracle_mentions(rows, gaz))
    assert got == want
    assert len(got) > 300


def test_gold_recall_on_wojood(spark, wojood):
    """Every gold span surface is a gazetteer phrase, so decode must
    rediscover nearly all gold spans (losses only from same-type
    overlap resolution, which the greedy matcher resolves one way)."""
    segments, types, gaz, rows = wojood
    df = spark.createDataFrame(rows, schemas.TRANSCRIPTS)
    got = {
        (r.conv_id, r.turn_idx, r.type, r.start_tok, r.end_tok)
        for r in ner.extract_mentions(df, gaz).collect()
    }
    gold = set()
    for si, lvl, typ, s, e in conll.gold_spans(segments, types):
        conv = f"wojood_{si // 50:05d}"
        gold.add((conv, si % 50, typ, s, e))
    hit = len(gold & got)
    recall = hit / len(gold)
    assert len(gold) > 400
    assert recall >= 0.9, f"gold-span recall {recall:.3f}"


def test_normalization_stable_on_real_arabic(wojood):
    segments, *_ = wojood
    for seg in segments[:50]:
        for tok, _tags in seg:
            n = normalize_py(tok)
            # idempotent and never longer
            assert normalize_py(n) == n
            assert len(n) <= len(tok)
