"""The reference-parity CLI surfaces: infer (bin/infer.py) and
evaluate (bin/eval.py)."""

import glob
import os

import pytest

from arabicner_spark.plans.evaluate import evaluate_file
from arabicner_spark.plans.infer import tag_text
from arabicner_spark.sources import synth

VAL = "/root/reference/data/val.txt"


def test_tag_text_nested_output(spark):
    tagged = tag_text(spark, "زار الأسد جامعة بيرزيت أمس", synth.gazetteer_dict())
    by_tok = dict(tagged)
    assert "B-PERS" in by_tok["الأسد"]
    # nested: بيرزيت carries both I-ORG (inside جامعة بيرزيت) and B-GPE
    assert {"I-ORG", "B-GPE"} <= set(by_tok["بيرزيت"])
    assert all(len(tags) == len(synth.gazetteer_dict()) for _t, tags in tagged)


@pytest.mark.skipif(not os.path.exists(VAL), reason="reference fixtures unavailable")
def test_evaluate_file_on_wojood(spark, tmp_path):
    rep = evaluate_file(spark, VAL, str(tmp_path))
    # gold-derived gazetteer: recall must be near-total (decode bugs
    # would show up here); precision dips on short generic surfaces
    assert rep.recall >= 0.95
    assert rep.micro_f1 >= 0.85
    # the reference's full seqeval report lines (metrics.py:31-46):
    # macro <= micro here (rare types score worse), weighted in between
    assert 0.0 < rep.macro_f1 <= 1.0
    assert rep.macro_f1 <= rep.weights_f1 <= 1.0
    assert rep.accuracy >= 0.95
    part = glob.glob(str(tmp_path / "predictions_val.txt" / "part-*"))[0]
    lines = open(part, encoding="utf-8").read().splitlines()
    # reference format: token<TAB>gold|gold<TAB>pred|pred, blank between segments
    assert lines[0].count("\t") == 2
    assert "" in lines
