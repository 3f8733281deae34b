"""Entity linking + canonicalization (north-rule operators; the
reference has no linking stage — SURVEY.md section 2.B).

Pipeline:
  1. DIRECT: normalized mention surface -> alias dictionary via
     broadcast hash join (dimension is small; zero shuffle).  Ties on a
     shared alias break by (weight desc, entity_id asc) — one window
     over the TINY alias dict, not over mentions.
  2. LSH: surfaces that miss the dictionary are blocked against it (and
     against each other) with char-3gram MinHash-LSH; candidate pairs
     are verified with exact shingle Jaccard >= threshold.
  3. CC: verified similarity edges -> connected components
     (large-star/small-star); the canonical id of a component is the
     best entity among its alias members, else "S:" + min surface.

All of it runs on DISTINCT surfaces, not raw mentions: at 10^12 turns
the mention table is enormous but the distinct-surface table is
vocabulary-sized, so every expensive step downstream of the first
``.distinct()`` touches the small table.  The final surface->canonical
map joins back to mentions/triples as a broadcast (or salted) join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from arabicner_spark.functions import hashing
from arabicner_spark.functions.normalize import normalize_col
from arabicner_spark.operators.components import connected_components_adaptive

DEFAULT_JACCARD = 0.5


def best_alias(alias_df: DataFrame) -> DataFrame:
    """One row per alias: highest weight wins, then lexicographic
    entity_id (deterministic tie-break, mirrored in oracle + SQL)."""
    w = Window.partitionBy("alias").orderBy(
        F.col("weight").desc(), F.col("entity_id").asc()
    )
    return (
        alias_df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def link_surfaces(
    mentions: DataFrame,
    alias_df: DataFrame,
    jaccard_threshold: float = DEFAULT_JACCARD,
    n_hashes: int = 16,
    bands: int = 8,
    broadcast_alias_limit: int = 5_000_000,
) -> DataFrame:
    """mentions -> (surface, canonical_id, link_kind) map.

    link_kind: 'alias' (direct dictionary hit), 'lsh' (reached via
    MinHash-LSH + components), 'self' (novel surface, canonical is
    itself).

    The dictionary join broadcasts while the alias table is below
    ``broadcast_alias_limit`` rows; above it, the join switches to the
    deterministic salted shuffle join (functions/joins.py) — hot
    aliases (one surface matched by millions of mentions upstream
    collapses here to ONE distinct surface, so the dictionary side is
    the only realistic skew carrier at this stage).
    """
    # vocabulary-sized and reused by every branch below -> checkpoint
    # once; without this the whole upstream plan (incl. the NER stage)
    # re-executes per branch of the final union.
    surfaces = (
        mentions.select(normalize_col(F.col("text")).alias("surface"))
        .where(F.length("surface") > 0)
        .distinct()
        .localCheckpoint(eager=True)
    )
    dict_best = best_alias(alias_df)
    use_broadcast = alias_df.count() <= broadcast_alias_limit

    if use_broadcast:
        direct = surfaces.join(
            F.broadcast(dict_best), surfaces["surface"] == dict_best["alias"], "inner"
        ).select("surface", F.col("entity_id").alias("canonical_id"))
        unlinked = surfaces.join(
            F.broadcast(dict_best.select("alias")),
            surfaces["surface"] == F.col("alias"),
            "left_anti",
        ).localCheckpoint(eager=True)
    else:
        # surfaces is DISTINCT — every join key appears exactly once on
        # the fact side, so no key can be hot and salting would only pay
        # S-fold dict replication for nothing (a salt derived from the
        # lone key column would be a pure function of it anyway).  A
        # plain shuffle join is the right plan; AQE splits any residual
        # partition imbalance.  salted_join remains the tool for joins
        # whose FACT side repeats hot keys (e.g. raw mentions -> dict).
        joined = (
            surfaces.withColumnRenamed("surface", "alias")
            .join(dict_best, "alias", "left")
            .withColumnRenamed("alias", "surface")
            .localCheckpoint(eager=True)
        )
        direct = joined.where(F.col("entity_id").isNotNull()).select(
            "surface", F.col("entity_id").alias("canonical_id")
        )
        unlinked = joined.where(F.col("entity_id").isNull()).select("surface")

    if unlinked.isEmpty():
        # nothing to block — LSH exists to rescue dictionary misses
        return direct.withColumn("link_kind", F.lit("alias"))

    # --- LSH blocking over unlinked surfaces + dictionary aliases
    s_nodes = unlinked.select(
        F.concat(F.lit("S:"), "surface").alias("id"), F.col("surface").alias("t")
    )
    a_nodes = dict_best.select(
        F.concat(F.lit("A:"), "alias").alias("id"), F.col("alias").alias("t")
    ).distinct()
    nodes = s_nodes.union(a_nodes)
    # reused 3x (signatures, pair verification x2, sizes)
    shingles = hashing.char_shingles(nodes, ["id"], "t", n=3).localCheckpoint(eager=True)
    sigs = hashing.minhash_signatures(shingles, ["id"], n_hashes=n_hashes)
    pairs = hashing.lsh_candidate_pairs(
        hashing.lsh_bands(sigs, ["id"], bands=bands, rows_per_band=n_hashes // bands),
        "id",
    )
    # exact Jaccard verification on candidate pairs only
    sh_a = shingles.select(F.col("id").alias("a"), "shingle")
    sh_b = shingles.select(F.col("id").alias("b"), "shingle")
    inter = (
        pairs.join(sh_a, "a").join(sh_b, ["b", "shingle"]).groupBy("a", "b").count()
    )
    sizes = shingles.groupBy("id").agg(F.count("*").alias("sz"))
    verified = (
        inter.join(sizes.withColumnRenamed("id", "a").withColumnRenamed("sz", "sza"), "a")
        .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("sz", "szb"), "b")
        .where(
            F.col("count")
            >= F.lit(jaccard_threshold) * (F.col("sza") + F.col("szb") - F.col("count"))
        )
        .select("a", "b")
    )

    comp = connected_components_adaptive(verified).localCheckpoint(eager=True)

    # canonical per component: best entity among alias members, else
    # "S:" + min surface member.
    members = comp.withColumn(
        "kind", F.substring("node", 1, 2)
    ).withColumn("t", F.expr("substring(node, 3)"))
    alias_members = (
        members.where(F.col("kind") == "A:")
        .join(F.broadcast(dict_best), F.col("t") == dict_best["alias"])
        .groupBy("component")
        .agg(F.min("entity_id").alias("ent"))
    )
    surf_min = (
        members.where(F.col("kind") == "S:")
        .groupBy("component")
        .agg(F.min("t").alias("min_surface"))
    )
    comp_canon = surf_min.join(alias_members, "component", "left").select(
        "component",
        F.coalesce(F.col("ent"), F.concat(F.lit("S:"), "min_surface")).alias(
            "canonical_id"
        ),
        F.col("ent").isNotNull().alias("via_alias"),
    )
    lsh_linked = (
        members.where(F.col("kind") == "S:")
        .join(comp_canon, "component")
        .select(
            F.col("t").alias("surface"),
            "canonical_id",
            F.when(F.col("via_alias"), F.lit("lsh")).otherwise(F.lit("lsh_cluster")).alias(
                "link_kind"
            ),
        )
    )

    singles = (
        unlinked.join(
            lsh_linked.select("surface").distinct(), "surface", "left_anti"
        ).select(
            "surface",
            F.concat(F.lit("S:"), "surface").alias("canonical_id"),
            F.lit("self").alias("link_kind"),
        )
    )

    return (
        direct.withColumn("link_kind", F.lit("alias"))
        .unionByName(lsh_linked)
        .unionByName(singles)
    )


def canonicalize_triples(triples: DataFrame, surface_map: DataFrame) -> DataFrame:
    """Rewrite triple subj/obj to canonical ids via the surface map.

    The map is vocabulary-sized -> broadcast both joins; unmapped
    surfaces (shouldn't happen, but belt-and-braces) stay as "S:" +
    normalized surface.
    """
    m = F.broadcast(surface_map.select("surface", "canonical_id"))
    t = triples.withColumn("_ns", normalize_col(F.col("subj"))).withColumn(
        "_no", normalize_col(F.col("obj"))
    )
    t = (
        t.join(m.withColumnRenamed("surface", "_ns").withColumnRenamed("canonical_id", "subj_id"), "_ns", "left")
        .join(m.withColumnRenamed("surface", "_no").withColumnRenamed("canonical_id", "obj_id"), "_no", "left")
    )
    return t.select(
        F.coalesce("subj_id", F.concat(F.lit("S:"), "_ns")).alias("src"),
        "pred",
        F.coalesce("obj_id", F.concat(F.lit("S:"), "_no")).alias("dst"),
        "conv_id",
        "turn_idx",
        "subj",
        "obj",
        "subj_type",
        "obj_type",
    )
