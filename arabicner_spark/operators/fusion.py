"""Knowledge fusion + negative sampling — the two post-extraction
steps a KG-construction pipeline runs between "triples extracted" and
"graph shipped to training".

fuse_facts: conflicting-fact resolution.  Extraction emits one triple
per supporting mention, and different conversations assert different
objects for the same (subject, predicate) — fusion picks the winner by
support count with a total tie order (count desc, object asc), and
keeps the support/total evidence so downstream consumers can threshold
on confidence.  One map-side-combinable count agg + one arg-min
struct agg per (src, pred) — no window, no self-join.

negative_samples: filtered negative sampling for KG-embedding
training (TransE-style corrupt-tail negatives): for each positive
(src, pred, dst) and sample index j, a corrupted tail is drawn
deterministically from the entity vocabulary via the repo's portable
md5 convention, then FILTERED against the positive set (a "filtered"
negative in the KG-embedding sense — corrupted triples that happen to
be true positives are dropped, not labeled false).  The entity
vocabulary is dimension-sized (entities, not mentions), so the
index table is a one-time tiny global sort and the candidate lookup
is a broadcast join; the only data-sized operations are one
projection per sample index and one anti-join against the positives
on their natural key.

Both are pure functions of the edge table (md5 draws, total tie
orders), so their DuckDB oracles match by value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuse_facts(edges: DataFrame) -> DataFrame:
    """(src, pred, dst, support, total, share, n_alternatives) — one
    row per (src, pred): the winning object with its evidence.
    ``edges`` carries one row PER SUPPORTING OCCURRENCE (do not
    distinct it first — occurrences are the votes)."""
    sup = edges.groupBy("src", "pred", "dst").agg(
        F.count("*").cast("long").alias("support")
    )
    fused = sup.groupBy("src", "pred").agg(
        F.min(F.struct((-F.col("support")).alias("ns"), F.col("dst"))).alias("w"),
        F.sum("support").cast("long").alias("total"),
        F.count("*").cast("int").alias("n_alternatives"),
    )
    return fused.select(
        "src",
        "pred",
        F.col("w.dst").alias("dst"),
        (-F.col("w.ns")).cast("long").alias("support"),
        "total",
        F.round((-F.col("w.ns")) / F.col("total"), 4).alias("share"),
        "n_alternatives",
    )


def entity_index(edges: DataFrame) -> DataFrame:
    """(idx, entity): the DISTINCT src ∪ dst vocabulary with a dense
    0-based index in entity sort order.  Dimension-sized by
    construction (the ENTITY vocab, not the mention stream), so the
    one global row_number window is a one-time build over a tiny
    table — the same class of driver-acceptable work as collecting
    k centroids."""
    ents = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
    )
    w = Window.orderBy("entity")
    return ents.select(
        (F.row_number().over(w) - 1).cast("long").alias("idx"), "entity"
    )


def negative_samples(edges: DataFrame, k: int = 2) -> DataFrame:
    """(src, pred, dst, j, neg_dst): up to ``k`` filtered corrupt-tail
    negatives per DISTINCT positive triple.  Draw j: entity index =
    md5("j|src|pred|dst") first-8-nibble int mod |E| (portable);
    candidates whose corrupted triple IS a positive are dropped via
    anti-join (filtered sampling), as are self-corruptions that drew
    the true tail."""
    # pos is consumed by the draws AND the anti-join, and the entity
    # index + its count derive from the same upstream — without a
    # materialization the whole upstream chain (the Python NER stage,
    # when fed from extraction) replays once per consumer, four times
    # total (r7).  pos is the distinct triple set — small — and the
    # entity vocabulary derived from pos equals the one derived from
    # raw edges (distinct src/dst of a distinct projection).
    pos = edges.select("src", "pred", "dst").distinct().localCheckpoint(eager=True)
    ents = entity_index(pos).localCheckpoint(eager=True)
    n_ents = ents.agg(F.count("*").cast("long").alias("n_ents"))
    draws = pos.crossJoin(F.broadcast(n_ents)).select(
        "src",
        "pred",
        "dst",
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
        "n_ents",
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.encode(
                    F.concat_ws("|", F.col("j"), F.col("src"), F.col("pred"), F.col("dst")),
                    "UTF-8",
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    cand = draws.withColumn("idx", h % F.col("n_ents")).join(
        F.broadcast(ents), "idx"
    ).select("src", "pred", "dst", "j", F.col("entity").alias("neg_dst"))
    return cand.join(
        pos.select(
            F.col("src"), F.col("pred"), F.col("dst").alias("neg_dst")
        ),
        ["src", "pred", "neg_dst"],
        "left_anti",
    )
