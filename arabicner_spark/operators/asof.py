"""As-of join — an operator Spark's built-in joins lack, composed from
union + running window (the driver mandate's named example of a custom
operator built as "(a) a composition of existing DataFrame ops").

Semantics (matching DuckDB/kdb ASOF JOIN, inequality ``left.ts >=
right.ts``): for every left row, attach the single right row with the
GREATEST right timestamp <= the left timestamp within the same key
group; left rows with no predecessor keep NULLs (left-join flavor).

Plan shape — why union+window instead of join+rank:
  * the naive range join (l JOIN r ON key AND r.ts <= l.ts, then
    rank=1) materializes O(|l| x matching |r|) intermediate rows per
    key before pruning — quadratic in hot keys;
  * here both sides are unioned (one column-aligned scan each), ONE
    shuffle on the key, and a RUNNING ``last(ignorenulls)`` window
    (rowsBetween unboundedPreceding..current) fills right values
    forward in timestamp order — O(n log n) sort per key group, no
    intermediate blowup, whole-stage-codegen friendly.
  * tie rule: right rows sort BEFORE left rows at an equal timestamp
    (side 0 < 1), so an exactly-simultaneous right row IS visible to
    the left row — the ASOF ``>=`` convention.

Scale note: per-key data sorts within one task; a pathologically hot
key concentrates its sort (AQE cannot split window skew).
``asof_join_bucketed`` is the implemented mitigation: time pre-sliced
into coarse buckets, the same window run per (key, bucket) — bounded
partitions under ANY key skew — and bucket boundaries stitched with a
carry table of per-(key, bucket) last values whose own as-of pass runs
over DISTINCT BUCKETS (rows bounded by time-range / bucket_width, not
by data volume).  Equivalence to the plain operator is property-tested.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Left as-of join.  ``value_cols`` are the right-side payload
    columns to attach; they must not collide with left column names
    (alias on the right beforehand).  ``right`` should be unique per
    (keys, right_ts) — pre-aggregate if not, or the attached payload at
    a tied timestamp is engine-dependent.
    """
    keys = list(keys)
    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(f"value_cols collide with left columns: {sorted(clash)}")
    l = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    r = right.select(
        *keys, F.col(right_ts).alias("__ts"), *[F.col(c) for c in value_cols]
    ).withColumn("__side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Fill ONE struct of the whole right-side payload, gated on
    # __side==0, then unpack: the matched row wins ATOMICALLY.  Filling
    # each column independently with last(col, ignorenulls) would mix
    # values across right rows whenever the matched row carries a NULL
    # payload column (that column would leak in from an OLDER row —
    # not ASOF semantics).  The struct is non-null for every right row
    # even when all its fields are NULL, so a matched-but-NULL payload
    # correctly attaches NULL.  Still a single Window node.
    match = (
        F.last(
            F.when(
                F.col("__side") == 0, F.struct(*[F.col(c) for c in value_cols])
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("__match")
    )
    keep = [c for c in u.columns if c not in value_cols]
    return (
        u.select(*keep, match)
        .where(F.col("__side") == 1)
        .select(*keep, *[F.col("__match")[c].alias(c) for c in value_cols])
        .drop("__ts", "__side")
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    bucket_width: int,
) -> DataFrame:
    """asof_join for HOT keys: identical output, skew-proof plan.

    Pass 1 (the data-sized pass) windows per (key, time-bucket) — a key
    holding half the corpus still splits into time-range/bucket_width
    partitions.  Pass 2 stitches boundaries: the latest right row per
    (key, bucket) forms a carry table; each DISTINCT left (key, bucket)
    as-of joins against it over earlier buckets (rows = buckets, not
    events), and the carried value fills left rows whose bucket holds
    no in-bucket predecessor.  Timestamps must be integers in the same
    unit as ``bucket_width``.
    """
    keys = list(keys)
    lb = left.withColumn("__kb", F.floor(F.col(left_ts) / bucket_width).cast("long"))
    rb = right.withColumn("__kb", F.floor(F.col(right_ts) / bucket_width).cast("long"))
    # pass 1: in-bucket as-of — bounded windows under any key skew.
    # __hit marks "an in-bucket predecessor EXISTS" (fills atomically
    # with the payload), so the boundary stitch below can distinguish a
    # matched-but-NULL payload (keep the NULL — ASOF semantics) from
    # "no in-bucket match" (take the carried value).
    rb_hit = rb.withColumn("__hit", F.lit(1))
    infill = asof_join(
        lb, rb_hit, keys + ["__kb"], left_ts, right_ts, list(value_cols) + ["__hit"]
    )

    # carry table: the latest right ROW per (key, bucket) — max_by over
    # one struct so a NULL payload column cannot be skipped per-column
    # (max_by(c, ts) ignores rows where c is NULL, which would mix rows)
    summaries = (
        rb.groupBy(*keys, "__kb")
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in value_cols]), F.col(right_ts)
            ).alias("__row")
        )
        .select(
            *keys,
            "__kb",
            *[F.col("__row")[c].alias(f"__prev_{c}") for c in value_cols],
        )
    )

    # distinct left buckets as-of the latest summary in an EARLIER
    # bucket — this union+window runs over bucket-granular rows only
    lbuckets = lb.select(*keys, "__kb").distinct().withColumn(
        "__pb", F.col("__kb") - 1
    )
    carried = asof_join(
        lbuckets,
        summaries.select(
            *keys,
            F.col("__kb").alias("__sb"),
            *[F.col(f"__prev_{c}") for c in value_cols],
        ),
        keys,
        "__pb",
        "__sb",
        [f"__prev_{c}" for c in value_cols],
    ).select(*keys, "__kb", *[F.col(f"__prev_{c}") for c in value_cols])

    out = infill.join(carried, keys + ["__kb"], "left")
    # stitch on the EXISTENCE flag, not value-NULLness: an in-bucket
    # match whose payload is NULL keeps its NULL (the matched row wins
    # whole); only rows with no in-bucket predecessor take the carry
    final = [
        F.when(F.col("__hit").isNotNull(), F.col(c))
        .otherwise(F.col(f"__prev_{c}"))
        .alias(c)
        for c in value_cols
    ]
    keep = [
        c
        for c in infill.columns
        if c not in value_cols and c not in ("__kb", "__hit")
    ]
    return out.select(*keep, *final)
