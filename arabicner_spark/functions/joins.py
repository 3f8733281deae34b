"""Skew-aware join helpers.

``broadcast`` is always the first choice for dimension tables (the
alias dictionary broadcasts in one hop, no shuffle at all).  When the
dimension is too big to broadcast but the fact side has hot keys, the
classic remedy is key salting: replicate the dimension S ways, spray
the fact side across the replicas, join on (key, salt).  Salting uses a
deterministic hash of stable row attributes — NOT rand() — so retried
tasks and resumed stages produce identical assignments (resume
idempotency is a north-rule requirement).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt: int = 8,
    salt_by: List[str] | None = None,
    how: str = "left",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with S-way salting.

    ``salt_by``: fact columns whose hash picks the replica (defaults to
    the NON-KEY fact columns) — deterministic, unlike rand().  The dim
    side is exploded S ways (dim must be small-ish; this trades S x dim
    shuffle volume for an even fact-side distribution on hot keys).

    The salt must not be a pure function of the join key: then every
    row of a hot key lands in ONE replica — zero skew relief, while
    still paying the S-fold dim replication.  Hence the non-key default
    and the guard below; a fact with no non-key columns is either
    key-unique (no skew exists — use a plain join) or needs an explicit
    row-distinguishing ``salt_by`` from the caller.
    """
    salt_cols = salt_by or [c for c in fact.columns if c != key]
    if not salt_cols or set(salt_cols) == {key}:
        raise ValueError(
            "salted_join: salt would be a pure function of the join key "
            "(no skew relief). Key-unique facts should use a plain join; "
            "otherwise pass salt_by with at least one non-key column."
        )
    fact_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)).cast("int")
    )
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = fact_s.join(dim_s, on=[key, "_salt"], how=how)
    return out.drop("_salt")
