"""Bloom-filter pre-join (runtime join filter), portable and exact.

The 100-TB join problem this solves: a fact table shuffles ALL its
rows on the join key even when the dim side's filter keeps only a few
percent of keys — the shuffle, not the join, is the cost.  Engines
push a RUNTIME FILTER (a Bloom filter of the surviving dim keys) into
the fact scan so non-matching rows die before the exchange.  Spark
has spark.sql.optimizer.runtime.bloomFilter for this; building it
explicitly makes the mechanism testable, portable, and measurable
(selectivity and false-positive rate become oracle-gated numbers).

Hashing follows the repo's md5 convention (functions/hashing.py):
position j of key v = first-8-nibble int of md5("j|v") mod m_bits —
bit-identical in Spark, DuckDB, and Python, so the pass/fail decision
for every row is a pure function of the input and the SQL oracle
matches by value hash.

Scale shape: the bit table is <= m_bits rows (a few KB — broadcast);
the probe is one per-(key, hash) projection + a broadcast LEFT join +
one all-hashes-matched count per key — no shuffle of the fact table
at all until AFTER the filter has discarded non-candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from arabicner_spark.functions.hashing import seeded_md5


def _bloom_pos(col: Column, seed: int, m_bits: int) -> Column:
    """Bit position of hash-family member ``seed`` for ``col``."""
    return (
        F.conv(F.substring(seeded_md5(col, seed), 1, 8), 16, 10).cast("bigint")
        % m_bits
    )


def bloom_bits(
    dim: DataFrame, key_col: str, n_hashes: int = 5, m_bits: int = 8192
) -> DataFrame:
    """The filter itself: the DISTINCT set bit positions of every dim
    key under the ``n_hashes``-member hash family -> (pos).  At most
    ``m_bits`` rows regardless of dim size — broadcastable by
    construction."""
    key = F.col(key_col).cast("string")
    positions = F.array(
        *[_bloom_pos(key, j, m_bits) for j in range(1, n_hashes + 1)]
    )
    return (
        dim.select(F.explode(positions).alias("pos"))
        .distinct()
    )


def bloom_probe(
    facts: DataFrame,
    key_col: str,
    bits: DataFrame,
    n_hashes: int = 5,
    m_bits: int = 8192,
) -> DataFrame:
    """-> (key, bloom_pass) for each DISTINCT fact key: pass iff ALL
    ``n_hashes`` positions are set.  Probe = explode the key's
    positions, broadcast-LEFT-join the bit table, demand every row
    matched (count of matches == count of probes — duplicate positions
    for one key match consistently, so equality is exact)."""
    keys = facts.select(F.col(key_col).alias("key")).distinct()
    kstr = F.col("key").cast("string")
    probes = keys.select(
        "key",
        F.explode(
            F.array(*[_bloom_pos(kstr, j, m_bits) for j in range(1, n_hashes + 1)])
        ).alias("pos"),
    )
    hits = (
        probes.join(
            F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left"
        )
        .groupBy("key")
        .agg(
            (F.count("*") == F.count("hit")).alias("bloom_pass"),
        )
    )
    return hits
