"""Evaluation entry point — the reference's bin/eval.py surface.

    python -m arabicner_spark.plans.evaluate --data-paths f1.txt f2.txt \
        --output-path /tmp/eval_out

Per input CoNLL file (arabiner/bin/eval.py:50-83): run the pipeline,
write ``predictions_{filename}`` in the reference's Token.__str__
format, and print micro + per-type span P/R/F1 (the seqeval-IOB2-style
report, computed as DataFrame joins in operators/metrics.py).

The scorer is the gazetteer stand-in (AraBERT weights are LFS-stubbed
in the reference checkout); by default the gazetteer is built from the
GOLD spans of the supplied files, which makes this an end-to-end decode
/alignment check on real nested data rather than a model benchmark.
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Optional

from pyspark.sql import SparkSession

from arabicner_spark import schemas
from arabicner_spark.functions import tagcore
from arabicner_spark.operators import metrics, ner
from arabicner_spark.sources import conll, predictions


def evaluate_file(
    spark: SparkSession,
    path: str,
    output_path: str,
    gazetteer: Optional[Dict[str, set]] = None,
) -> "metrics.SimpleNamespace":
    segments = conll.parse_conll(path)
    types_all = conll.entity_types(segments)
    gaz = gazetteer or conll.gazetteer_from_gold(segments, types_all)
    types = tagcore.gazetteer_types(gaz)

    rows = conll.segments_to_transcript_rows(segments)
    df = spark.createDataFrame(rows, schemas.TRANSCRIPTS)
    pred_rows = ner.extract_mentions(df, gaz).collect()

    # span frames for the metrics joins; gold levels are indexes into
    # the PREDICTION type list so levels line up
    span_schema = (
        "conv_id string, turn_idx int, level int, type string, "
        "start_tok int, end_tok int"
    )
    gold = []
    for si, _lvl, typ, s, e in conll.gold_spans(segments, types_all):
        if typ not in types:
            continue
        gold.append(
            (f"wojood_{si // 50:05d}", si % 50, types.index(typ), typ, s, e)
        )
    gold_df = spark.createDataFrame(gold, span_schema)
    pred_df = spark.createDataFrame(
        [(m.conv_id, m.turn_idx, m.level, m.type, m.start_tok, m.end_tok) for m in pred_rows],
        span_schema,
    )
    micro = metrics.span_prf(gold_df, pred_df)
    report = metrics.per_type_report(gold_df, pred_df).orderBy("type")

    # predictions_{filename} in the reference sink format
    by_turn: Dict[tuple, list] = {}
    for m in pred_rows:
        si = int(m.conv_id.split("_")[1]) * 50 + m.turn_idx
        by_turn.setdefault(si, []).append(m)
    tok_rows = []
    for si, seg in enumerate(segments):
        tags = [["O"] * len(types) for _ in seg]
        for m in by_turn.get(si, []):
            tags[m.start_tok][m.level] = f"B-{m.type}"
            for pos in range(m.start_tok + 1, m.end_tok):
                tags[pos][m.level] = f"I-{m.type}"
        for pos, (tok, gold_tags) in enumerate(seg):
            tok_rows.append((si, pos, tok, gold_tags, tags[pos]))
    toks_df = spark.createDataFrame(
        tok_rows,
        "seg_id long, pos int, token string, gold_tags array<string>, pred_tags array<string>",
    )
    out = os.path.join(output_path, f"predictions_{os.path.basename(path)}")
    predictions.write_predictions(toks_df, out)

    print(f"== {os.path.basename(path)} ==")
    print(
        f"micro: P={micro.precision:.4f} R={micro.recall:.4f} F1={micro.f1:.4f} "
        f"(tp={micro.tp} gold={micro.n_gold} pred={micro.n_pred})"
    )
    report.show(100, truncate=False)
    return micro


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--data-paths", nargs="+", required=True)
    p.add_argument("--output-path", required=True)
    p.add_argument("--master", default="local[8]")
    args = p.parse_args()
    spark = (
        SparkSession.builder.master(args.master)
        .appName("arabicner-spark-eval")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.output_path, exist_ok=True)
    for path in args.data_paths:
        evaluate_file(spark, path, args.output_path)
    spark.stop()


if __name__ == "__main__":
    main()
