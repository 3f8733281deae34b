"""Incremental deduplication: fold a NEW batch of documents into an
existing dedup state without re-shingling or re-hashing the old corpus
— the operational shape of dedup at 100 TB, where the corpus grows
daily and "recompute everything" is a non-starter.

State kept from the previous run (all compact relative to the corpus):
  * hashes(h, rep)        — exact-text md5 -> group-min rep id
  * bands(id, band, sig)  — LSH band table of the exact-group REPS
  * comp(node, keep)      — final keep/drop decision per doc

Incremental step for a new batch:
  1. exact: md5 new texts; texts seen before attach to the stored rep
     (one hash join); unseen texts form new exact groups (one groupBy).
  2. LSH: shingle + minhash ONLY the new unseen-text reps; candidate
     pairs = new-bands x old-bands (band equi-join) + new-bands self
     pairs.  Old x old pairs are NOT recomputed — they are already
     folded into comp.
  3. connectivity: old components enter as COMPRESSED star edges
     (keep -> node), so merges that a bridging new document causes
     (new doc near-dup of two different old clusters) still happen;
     the expensive per-document work (tokenize/shingle/16 hashes) is
     what's skipped, not correctness.

EXACTNESS CONTRACT (gated): when new ids sort after old ids (the
monotone-id ingest reality), the result is IDENTICAL to a full batch
recompute over old+new — the oracle for the gate query is literally
the full-corpus dedup SQL.  Star-compression preserves old
connectivity exactly, and identical texts produce identical shingles,
so band tables built from either group representative agree.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arabicner_spark.functions import hashing
from arabicner_spark.operators.components import connected_components_adaptive


def dedup_state(docs: DataFrame, width: int | None = None) -> Dict[str, DataFrame]:
    """Full run over ``docs`` (id string, text) -> state dict
    {hashes, bands, comp} + the keep/drop table under 'decision'."""
    g = docs.groupBy(hashing.md5_utf8(F.col("text")).alias("h")).agg(
        F.min("id").alias("rep"),
        F.min("text").alias("text"),
        F.collect_set("id").alias("ids"),
    )
    hashes = g.select("h", "rep").localCheckpoint(eager=True)
    star = g.select(
        F.col("rep").alias("a"), F.explode("ids").alias("b")
    ).where(F.col("a") != F.col("b"))
    reps = g.select(F.col("rep").alias("id"), "text")
    # distinct=False + width=None: minhash's min is duplicate-
    # insensitive, so the shingle distinct exchange is skipped and the
    # explode feeds the map-side partial min directly (r7, guide 2.3)
    sh = hashing.word_shingles(reps, ["id"], "text", n=3, width=width, distinct=False)
    sig = hashing.minhash_signatures(sh, ["id"], n_hashes=16)
    bands = hashing.lsh_bands(sig, ["id"], bands=8, rows_per_band=2).localCheckpoint(
        eager=True
    )
    near = hashing.lsh_candidate_pairs(bands, "id")
    cc = connected_components_adaptive(star.unionByName(near))
    decision = (
        docs.select(F.col("id").alias("node"))
        .join(cc, "node", "left")
        .select("node", F.coalesce("component", "node").alias("keep"))
        .localCheckpoint(eager=True)
    )
    return {"hashes": hashes, "bands": bands, "comp": decision, "decision": decision}


def save_state(state: Dict[str, DataFrame], prefix: str, buckets: int = 8) -> None:
    """Persist the dedup state as BUCKETED tables (``<prefix>_hashes``
    / ``_bands`` / ``_comp``), bucketed on each table's probe key —
    ``bands`` on (band, sig), ``hashes`` on h, ``comp`` on node.

    Bucketing is the durability + scale lever together: the daily
    incremental fold probes the stored band table with the new batch's
    band keys, and a bucketed stored side makes that join exchange-free
    on the (large) stored side — only the small new batch shuffles
    (write-time pre-shuffle, same mechanism test_storage_layout.py pins
    for the warehouse tables).  This is the parquet-facade equivalent
    of an Iceberg bucket-partitioned state table (sources/io.py)."""
    spark = state["bands"].sparkSession
    # Hadoop FileSystem API, not a local rmtree: the warehouse dir may
    # be any scheme (file:, hdfs:, s3a:) and Path.getFileSystem picks
    # the right implementation for each — a parsed-local-path delete
    # silently no-ops on an object-store warehouse.
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    for name, keys in (("hashes", ["h"]), ("bands", ["band", "sig"]), ("comp", ["node"])):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{name}")
        # a previously-aborted write can leave the managed location
        # behind after the metadata drop; saveAsTable then refuses
        loc = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{prefix}_{name}")
        loc.getFileSystem(hconf).delete(loc, True)
        (
            state[name]
            .write.bucketBy(buckets, *keys)
            .sortBy(*keys)
            .mode("overwrite")
            .saveAsTable(f"{prefix}_{name}")
        )


def load_state(spark, prefix: str) -> Dict[str, DataFrame]:
    """Reload a persisted dedup state; ``decision`` aliases ``comp``."""
    st = {name: spark.table(f"{prefix}_{name}") for name in ("hashes", "bands", "comp")}
    st["decision"] = st["comp"]
    return st


def dedup_incremental(
    state: Dict[str, DataFrame], new_docs: DataFrame, width: int | None = None
) -> Dict[str, DataFrame]:
    """Fold ``new_docs`` (id string, text; ids sort after the state's)
    into ``state``; returns the updated state (same keys) whose
    'decision' covers old + new documents exactly as a full recompute
    would."""
    nh = new_docs.select(
        "id", "text", hashing.md5_utf8(F.col("text")).alias("h")
    )
    seen = nh.join(state["hashes"], "h", "inner")
    seen_edges = seen.select(F.col("rep").alias("a"), F.col("id").alias("b"))

    unseen = nh.join(state["hashes"], "h", "left_anti")
    g = unseen.groupBy("h").agg(
        F.min("id").alias("rep"),
        F.min("text").alias("text"),
        F.collect_set("id").alias("ids"),
    )
    new_star = g.select(
        F.col("rep").alias("a"), F.explode("ids").alias("b")
    ).where(F.col("a") != F.col("b"))
    new_reps = g.select(F.col("rep").alias("id"), "text")

    sh = hashing.word_shingles(
        new_reps, ["id"], "text", n=3, width=width, distinct=False
    )
    sig = hashing.minhash_signatures(sh, ["id"], n_hashes=16)
    new_bands = hashing.lsh_bands(sig, ["id"], bands=8, rows_per_band=2).localCheckpoint(
        eager=True
    )
    # new x old candidates: one equi-join on the band key
    cross = (
        new_bands.select("band", "sig", F.col("id").alias("b"))
        .join(
            state["bands"].select("band", "sig", F.col("id").alias("a")),
            ["band", "sig"],
        )
        .select("a", "b")
        .distinct()
    )
    # new x new candidates
    nn = hashing.lsh_candidate_pairs(new_bands, "id")
    # old connectivity, star-compressed (keep -> node)
    old_star = state["comp"].where(F.col("node") != F.col("keep")).select(
        F.col("keep").alias("a"), F.col("node").alias("b")
    )
    edges = old_star.unionByName(seen_edges).unionByName(new_star).unionByName(
        cross
    ).unionByName(nn)
    cc = connected_components_adaptive(edges)
    all_nodes = state["comp"].select("node").unionByName(
        new_docs.select(F.col("id").alias("node"))
    )
    decision = (
        all_nodes.join(cc, "node", "left")
        .select("node", F.coalesce("component", "node").alias("keep"))
        .localCheckpoint(eager=True)
    )
    return {
        "hashes": state["hashes"].unionByName(g.select("h", "rep")),
        "bands": state["bands"].unionByName(new_bands),
        "comp": decision,
        "decision": decision,
    }


def decision_delta(old_comp: DataFrame, new_decision: DataFrame) -> DataFrame:
    """The rows a MERGE INTO the stored decision table would touch:
    nodes absent from the old state (the new batch) plus old nodes
    whose ``keep`` changed (a bridging new document merging two old
    clusters re-keys every member of the losing cluster).

    This is the daily-write shape at 100 TB: the full ``decision`` is
    corpus-sized, but the day's churn is delta-sized — persist via
    ``MERGE INTO comp USING delta ON comp.node = delta.node WHEN
    MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT`` once the Iceberg
    runtime lands (sources/io.py blocker note); on the parquet facade,
    apply with :func:`apply_decision_delta`.  One left join on the
    bucketed ``node`` key — exchange-free on the stored side."""
    old = old_comp.select("node", F.col("keep").alias("old_keep"))
    return (
        new_decision.join(old, "node", "left")
        .where(F.col("old_keep").isNull() | (F.col("old_keep") != F.col("keep")))
        .select("node", "keep")
    )


def apply_decision_delta(old_comp: DataFrame, delta: DataFrame) -> DataFrame:
    """Parquet-facade MERGE: old rows not in the delta + the delta.
    ``apply_decision_delta(old, decision_delta(old, new)) == new`` —
    pinned by tests/test_incremental_delta.py."""
    untouched = old_comp.join(delta.select("node"), "node", "left_anti")
    return untouched.select("node", "keep").unionByName(delta)
