"""Prediction sink — SURVEY.md section 2.A operator #20: the
reference's predictions.txt format (Token.__str__ rows
``text<TAB>gold1|gold2<TAB>pred1|pred2``, blank line between segments;
arabiner/trainers/BaseTrainer.py:71-82, arabiner/data/datasets.py:34-51).

Kept for interop (a user of the reference can diff our file against
theirs); the scalable sink is the parquet/Iceberg mentions table — this
writer is for fixture-scale eval outputs, so a single ordered text
write is appropriate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def predictions_lines(tokens: DataFrame) -> DataFrame:
    """tokens: (seg_id, pos, token, gold_tags array, pred_tags array)
    -> one formatted text line per token plus a blank line per segment
    end, ordered — ready for .write.text or collect-and-write."""
    line = F.concat_ws(
        "\t",
        F.col("token"),
        F.array_join("gold_tags", "|"),
        F.array_join(F.coalesce("pred_tags", F.array()), "|"),
    )
    body = tokens.select(
        "seg_id", F.col("pos").cast("long").alias("ord"), line.alias("value")
    )
    # blank separator after each segment (max pos + 1)
    seps = tokens.groupBy("seg_id").agg(
        (F.max("pos").cast("long") + 1).alias("ord")
    ).select("seg_id", "ord", F.lit("").alias("value"))
    return body.unionByName(seps).orderBy("seg_id", "ord").select("value")


def write_predictions(tokens: DataFrame, path: str) -> None:
    predictions_lines(tokens).coalesce(1).write.mode("overwrite").text(path)
