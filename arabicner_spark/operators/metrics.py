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


def triple_prf(gold: DataFrame, pred: DataFrame) -> SimpleNamespace:
    """BASELINE.json headline: P/R over the emitted (subj, pred, obj)
    set (full triple identity incl. location columns)."""
    keys = ["subj", "pred", "obj", "conv_id", "turn_idx", "subj_type", "obj_type"]
    return span_prf(gold, pred, keys=keys)
