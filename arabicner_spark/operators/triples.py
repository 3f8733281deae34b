"""Triple extraction: per-turn mention self-join + type-pair predicates.

The reference has no relation extraction; the north rule adds
"dependency-free pattern predicates over detected mentions".  The exact
rule (shared by the Spark plan, the serial oracle, and the DuckDB SQL
oracle — one definition, three renderings):

    For mentions a, b of the same (conv_id, turn_idx):
      * (a.type, pred, b.type) is a row of the predicate table,
      * a and b are not the same span on the same level,
      * token gap = greatest(b.start - a.end, a.start - b.end) <= window
        (<= 0 means the spans overlap/nest — allowed: nested mentions
        are first-class here),
      * emit DISTINCT (subj=a.text, pred, obj=b.text, conv_id, turn_idx,
        subj_type, obj_type).

Scale notes: the self-join key is (conv_id, turn_idx) — high
cardinality, low per-key fan-out (mentions per turn is small and
bounded by turn length), so a shuffled sort-merge/hash join partitions
evenly; the predicate table is a handful of rows and is broadcast.  No
window functions, no per-row Python.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (subj_type, pred, obj_type) for the synthetic/Wojood-typed corpus
DEFAULT_PREDICATES: List[Tuple[str, str, str]] = [
    ("PERS", "works_for", "ORG"),
    ("PERS", "holds_occ", "OCC"),
    ("ORG", "located_in", "GPE"),
    ("ORG", "located_in", "LOC"),
    ("FAC", "located_in", "GPE"),
    ("FAC", "located_in", "LOC"),
    ("EVENT", "on_date", "DATE"),
]

DEFAULT_WINDOW = 10


def extract_triples(
    mentions: DataFrame,
    predicates: List[Tuple[str, str, str]] = DEFAULT_PREDICATES,
    window: int = DEFAULT_WINDOW,
) -> DataFrame:
    """mentions -> triples (schemas.TRIPLES)."""
    spark = mentions.sparkSession
    pred_df = spark.createDataFrame(
        predicates, "subj_type string, pred string, obj_type string"
    )
    a = mentions.alias("a")
    b = mentions.alias("b")
    pairs = a.join(
        b,
        on=[
            F.col("a.conv_id") == F.col("b.conv_id"),
            F.col("a.turn_idx") == F.col("b.turn_idx"),
        ],
    ).where(
        ~(
            (F.col("a.level") == F.col("b.level"))
            & (F.col("a.start_tok") == F.col("b.start_tok"))
            & (F.col("a.end_tok") == F.col("b.end_tok"))
        )
    )
    gap = F.greatest(
        F.col("b.start_tok") - F.col("a.end_tok"),
        F.col("a.start_tok") - F.col("b.end_tok"),
    )
    return (
        pairs.where(gap <= F.lit(window))
        .join(
            F.broadcast(pred_df),
            on=[
                F.col("a.type") == F.col("subj_type"),
                F.col("b.type") == F.col("obj_type"),
            ],
        )
        .select(
            F.col("a.text").alias("subj"),
            F.col("pred"),
            F.col("b.text").alias("obj"),
            F.col("a.conv_id").alias("conv_id"),
            F.col("a.turn_idx").alias("turn_idx"),
            F.col("subj_type"),
            F.col("obj_type"),
        )
        .distinct()
    )
