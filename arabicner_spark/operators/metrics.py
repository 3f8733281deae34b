"""Span-set evaluation as DataFrame joins — SURVEY.md section 2.A
operator #17.

The reference scores with seqeval IOB2 span P/R/F1, duplicating the
dataset once per entity-type level (arabiner/utils/metrics.py:16-46).
Span-set scoring is exactly set intersection, so on DataFrames it is
one inner join: TP = |gold ∩ pred| on the full span identity
(conv, turn, level, type, start, end).  Micro scores come from three
counts; the per-type report is the same join grouped by type.  No
collect of span tables — only the final counts reach the driver.
"""

from __future__ import annotations

from types import SimpleNamespace

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_KEYS = ["conv_id", "turn_idx", "level", "type", "start_tok", "end_tok"]


def span_prf(gold: DataFrame, pred: DataFrame, keys=None) -> SimpleNamespace:
    """Micro precision/recall/F1 over exact span identity."""
    keys = keys or SPAN_KEYS
    g = gold.select(*keys).distinct()
    p = pred.select(*keys).distinct()
    tp = g.join(p, keys, "inner").count()
    n_gold = g.count()
    n_pred = p.count()
    prec = tp / n_pred if n_pred else (1.0 if not n_gold else 0.0)
    rec = tp / n_gold if n_gold else (1.0 if not n_pred else 0.0)
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return SimpleNamespace(
        precision=prec, recall=rec, f1=f1, tp=tp, n_gold=n_gold, n_pred=n_pred
    )


def per_type_report(gold: DataFrame, pred: DataFrame, keys=None) -> DataFrame:
    """-> (type, n_gold, n_pred, tp, precision, recall, f1) — one row
    per entity type, computed in two aggregations + one join."""
    keys = keys or SPAN_KEYS
    g = gold.select(*keys).distinct()
    p = pred.select(*keys).distinct()
    tp = g.join(p, keys, "inner").groupBy("type").agg(F.count("*").alias("tp"))
    ng = g.groupBy("type").agg(F.count("*").alias("n_gold"))
    np_ = p.groupBy("type").agg(F.count("*").alias("n_pred"))
    rep = (
        ng.join(np_, "type", "full")
        .join(tp, "type", "left")
        .fillna(0, ["n_gold", "n_pred", "tp"])
    )
    prec = F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0)
    rec = F.when(F.col("n_gold") > 0, F.col("tp") / F.col("n_gold")).otherwise(0.0)
    return rep.select(
        "type",
        "n_gold",
        "n_pred",
        "tp",
        F.round(prec, 4).alias("precision"),
        F.round(rec, 4).alias("recall"),
        F.round(
            F.when(prec + rec > 0, 2 * prec * rec / (prec + rec)).otherwise(0.0), 4
        ).alias("f1"),
    )


def token_tags(spans: DataFrame, keys=("conv_id", "turn_idx", "level")) -> DataFrame:
    """Span rows -> exploded BIO token tags (*keys, pos, tag).

    Within one level spans never overlap (the BIO head can express only
    one segmentation), so (*keys, pos) is unique.  Positions covered by
    no span carry the implicit "O" and are NOT emitted — consumers
    treat absence as "O".
    """
    pos = F.explode(F.sequence(F.col("start_tok"), F.col("end_tok") - 1)).alias("pos")
    return spans.select(*keys, "type", "start_tok", pos).select(
        *keys,
        "pos",
        F.when(
            F.col("pos") == F.col("start_tok"), F.concat(F.lit("B-"), "type")
        )
        .otherwise(F.concat(F.lit("I-"), "type"))
        .alias("tag"),
    )


def nested_metrics(
    gold: DataFrame, pred: DataFrame, turn_tokens: DataFrame, n_levels: int
) -> SimpleNamespace:
    """The reference's full nested report — micro/macro/weighted P/R/F1
    plus token accuracy (arabiner/utils/metrics.py:31-46, seqeval IOB2).

    seqeval semantics reproduced:
      * micro: pooled span counts (span_prf);
      * macro: unweighted mean of per-type F1 over every type present
        in gold OR pred;
      * weighted: per-type F1 weighted by GOLD support (types with no
        gold spans contribute 0 weight);
      * accuracy: token-level tag equality over the dataset duplicated
        once per level (seqeval.accuracy_score flattens exactly that),
        with un-spanned positions counting as "O".

    ``turn_tokens`` is (conv_id, turn_idx, n_tokens); only per-type
    counts (a #types-row frame) and two scalars reach the driver.
    """
    micro = span_prf(gold, pred)
    g = gold.select(*SPAN_KEYS).distinct()
    p = pred.select(*SPAN_KEYS).distinct()
    tp = g.join(p, SPAN_KEYS, "inner").groupBy("type").agg(F.count("*").alias("tp"))
    counts = (
        g.groupBy("type").agg(F.count("*").alias("n_gold"))
        .join(p.groupBy("type").agg(F.count("*").alias("n_pred")), "type", "full")
        .join(tp, "type", "left")
        .fillna(0, ["n_gold", "n_pred", "tp"])
        .collect()  # one row per entity type — vocabulary-sized
    )
    f1s, weights = [], []
    for r in counts:
        prec = r.tp / r.n_pred if r.n_pred else 0.0
        rec = r.tp / r.n_gold if r.n_gold else 0.0
        f1s.append(2 * prec * rec / (prec + rec) if prec + rec else 0.0)
        weights.append(r.n_gold)
    macro_f1 = sum(f1s) / len(f1s) if f1s else 0.0
    total_w = sum(weights)
    weighted_f1 = (
        sum(f * w for f, w in zip(f1s, weights)) / total_w if total_w else 0.0
    )

    keys = ["conv_id", "turn_idx", "level", "pos"]
    gt = token_tags(gold).withColumnRenamed("tag", "g")
    pt = token_tags(pred).withColumnRenamed("tag", "p")
    mismatches = (
        gt.join(pt, keys, "full")
        .where(
            F.coalesce("g", F.lit("O")) != F.coalesce("p", F.lit("O"))
        )
        .count()
    )
    total_row = turn_tokens.agg(F.sum("n_tokens")).first()[0]
    total = (total_row or 0) * n_levels
    accuracy = (total - mismatches) / total if total else 1.0

    return SimpleNamespace(
        micro_f1=micro.f1,
        macro_f1=macro_f1,
        weights_f1=weighted_f1,
        precision=micro.precision,
        recall=micro.recall,
        accuracy=accuracy,
    )


def triple_prf(gold: DataFrame, pred: DataFrame) -> SimpleNamespace:
    """BASELINE.json headline: P/R over the emitted (subj, pred, obj)
    set (full triple identity incl. location columns)."""
    keys = ["subj", "pred", "obj", "conv_id", "turn_idx", "subj_type", "obj_type"]
    return span_prf(gold, pred, keys=keys)
