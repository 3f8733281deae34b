"""Portable, deterministic hashing primitives.

Every hash here is built from ``md5`` over UTF-8 bytes so the exact
same value is computable in Spark SQL (``md5(encode(col,'utf-8'))``),
DuckDB (``md5(col)``) and Python (``hashlib.md5``) — which is what lets
MinHash-LSH blocking, SimHash, and fingerprint sketches have *exact*
SQL oracles instead of weaker rows-only checks.  MinHash uses the
lexicographic min of seeded md5 hex digests: hex strings order the same
everywhere, no integer conversion needed.

xxhash64/crc32 are deliberately avoided in anything oracle-checked
(engine-specific); they may appear only in internal salting.
"""

from __future__ import annotations

import hashlib
from typing import List

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def md5_utf8(col: Column) -> Column:
    """md5 hex of the UTF-8 bytes — equals DuckDB's md5(varchar)."""
    return F.md5(F.encode(col, "UTF-8"))


def seeded_md5(col: Column, seed: int) -> Column:
    """Independent-ish hash family member: md5(seed || '|' || value)."""
    return md5_utf8(F.concat(F.lit(f"{seed}|"), col))


def word_shingles(
    df: DataFrame,
    id_cols: List[str],
    text_col: str,
    n: int = 3,
    width: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Distinct word n-gram shingles per id.

    ``distinct=False`` skips the final distinct and returns the raw
    shingle stream (duplicates per id possible).  Callers whose
    downstream aggregate is DUPLICATE-INSENSITIVE — minhash is a MIN
    over hashes, so the min over the multiset equals the min over the
    set — should pass False: the explode then feeds the min's map-side
    partial aggregation in the same stage and the shuffle carries one
    row of longs per id instead of the full shingle stream (r7, guide
    section 2.3 "aggregate before you shuffle").  Jaccard-style
    consumers that COUNT shingles must keep the distinct.

    Pure array expressions (split -> transform over an index sequence ->
    explode): shingling is per-row work, so it must not shuffle — the
    only shuffle is the final distinct, keyed (id, shingle).  An earlier
    window-based version shuffled the full token stream; this one stays
    inside whole-stage codegen until the distinct.

    ``width``: explicit partition count for the shingle stage.  The
    explode + distinct partial aggregate is the compute-heavy part
    (shingle construction + hashing of every shingle occurrence), but
    its width is whatever the upstream doc frame has — a single parquet
    split or an AQE-coalesced exchange leaves it at 1 and the stage
    runs single-threaded.  Repartitioning the DOC rows (cheap — one row
    per document) by id first makes the per-shingle work data-parallel.
    """
    if width:
        df = df.repartition(width, *[F.col(c) for c in id_cols])
    arr = F.split(F.col(text_col), " ")
    idx = F.when(
        F.size(arr) >= n, F.sequence(F.lit(0), F.size(arr) - n)
    ).otherwise(F.array().cast("array<int>"))
    shingle = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(arr, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    out = df.select(*id_cols, F.explode(shingle).alias("shingle"))
    return out.distinct() if distinct else out


def shingle_hash_table(
    docs: DataFrame,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    width: int | None = None,
) -> DataFrame:
    """Per-document DISTINCT word n-gram shingles as md5 identities:
    (id, h32, hi, lo) — h32 = the minhash base (first 8 md5 hex chars
    as a long, byte-identical to minhash_base), (hi, lo) = the full
    128-bit md5 as two signed longs.

    The Arrow twin of word_shingles + minhash_base for EXACT-set
    consumers (guide section 4.2): shingle construction, per-document
    dedup (a Python set — per-doc distinct equals the global
    (id, shingle) distinct, so no exchange is needed for it), and the
    md5 run per batch in the Python worker; downstream set algebra
    (intersection counts, set sizes) joins on two fixed-width longs
    instead of variable-length shingle strings.  Identifying shingles
    by their full md5 is the repo's standing convention (exact dedup
    groups documents by md5(text) the same way); distinct shingles
    with colliding md5s are the one divergence mode, as everywhere
    else md5 identity is used.
    """
    import hashlib

    if width:
        docs = docs.repartition(width, F.col(id_col))
    narrow = docs.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))

    def hash_shingles(batches):
        import pyarrow as pa

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id, out_h32, out_hi, out_lo = [], [], [], []
            for i, txt in zip(ids, texts):
                toks = (txt or "").split(" ")
                if len(toks) < n:
                    continue
                seen = set()
                for p in range(len(toks) - n + 1):
                    seen.add(" ".join(toks[p : p + n]))
                for s in seen:
                    d = hashlib.md5(s.encode("utf-8")).digest()
                    out_id.append(i)
                    out_h32.append(int.from_bytes(d[:4], "big"))
                    out_hi.append(int.from_bytes(d[:8], "big", signed=True))
                    out_lo.append(int.from_bytes(d[8:16], "big", signed=True))
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.string()),
                    pa.array(out_h32, type=pa.int64()),
                    pa.array(out_hi, type=pa.int64()),
                    pa.array(out_lo, type=pa.int64()),
                ],
                ["id", "h32", "hi", "lo"],
            )

    return narrow.mapInArrow(
        hash_shingles, "id string, h32 long, hi long, lo long"
    )


def char_shingles(df: DataFrame, id_cols: List[str], text_col: str, n: int = 3) -> DataFrame:
    """Distinct char n-gram shingles per id (for short surface forms).

    Texts shorter than n yield the whole text as its single shingle, so
    every id gets at least one shingle.
    """
    padded = df.select(*id_cols, F.col(text_col).alias("t"))
    idx = F.sequence(F.lit(1), F.greatest(F.length("t") - (n - 1), F.lit(1)))
    return (
        padded.select(*id_cols, F.col("t"), F.explode(idx).alias("i"))
        .select(*id_cols, F.substring(F.col("t"), F.col("i"), n).alias("shingle"))
        .distinct()
    )


# MinHash rehash family: ONE strong base hash per shingle (md5, kept
# for cross-engine portability and distribution quality) + n cheap
# affine rehashes h_s = (A[s]*h + B[s]) mod MINHASH_P — the classic
# universal-family construction.  r4 change, measured motivation: the
# old form computed n_hashes FULL md5s per shingle; md5 is the single
# most expensive expression in the dedup chain and dense hash compute
# is exactly what saturates shared execution ports first (sandbox
# scaling probes: md5-bound stages cap at ~0.63 efficiency 4->16 cores
# while Python/numpy stages reach ~0.9).  One md5 + n integer mul-mods
# is ~n x less hash work at ANY scale, and every value stays in
# branch-free int64 codegen.  Bounds: base h < 2^32 (8 md5 nibbles),
# A[s] < 2^30, B[s] < 2^32, so A*h + B < 2^63 — exact in BIGINT in
# both Spark and DuckDB; MINHASH_P is the smallest prime > 2^32.
# 32-bit base caveat: distinct-shingle collisions run ~n_shingles/2^32
# (1% at 43M shingles) — noise for Jaccard estimation; widen the slice
# + switch the mul-mod to DECIMAL(38)/HUGEINT if a corpus ever needs
# a 60-bit base.
MINHASH_P = 4_294_967_311


def minhash_affine_consts(n_hashes: int) -> list:
    """Deterministic (A[s], B[s]) pairs, identical for the SQL mirror."""
    return [
        (
            (((2 * s + 1) * 0x9E3779B9) % (1 << 30)) | 1,
            (s * 0xC2B2AE35 + 0x165667B1) % (1 << 32),
        )
        for s in range(n_hashes)
    ]


def minhash_base(col: Column) -> Column:
    """First 8 md5 nibbles of the shingle as a BIGINT in [0, 2^32)."""
    return F.conv(F.substring(md5_utf8(col), 1, 8), 16, 10).cast("bigint")


def minhash_signatures(
    shingles: DataFrame,
    id_cols: List[str],
    n_hashes: int = 16,
    width: int | None = None,
    base_col: str | None = None,
) -> DataFrame:
    """id -> [h0..h{n-1}] BIGINT minhash columns, ONE aggregation pass.

    min over (A[s]*md5_32(shingle)+B[s]) mod P per s — a single
    hash-aggregate with map-side partial mins, so the shuffle carries
    one row per id (and 8-byte longs, not 32-char hex strings).

    ``width``: explicit partition count for the hashing stage.  The
    hash work is COMPUTE-bound, but AQE coalesces the upstream
    distinct's output by BYTES — a few MB of shingles folds to one
    partition and the whole hashing stage runs single-threaded
    (measured 5.4s -> sub-second at sf0.1 with width=32).  An explicit
    repartition(width, id_cols) pins the stage width; the groupBy
    reuses that clustering (ClusteredDistribution is number-agnostic),
    so it costs no extra exchange beyond the small re-spread itself.
    """
    if width:
        shingles = shingles.repartition(width, *[F.col(c) for c in id_cols])
    consts = minhash_affine_consts(n_hashes)
    # ``base_col``: a caller that already carries the 32-bit md5 base
    # as a long column (e.g. shingle_hash_table) skips the in-plan
    # md5+conv entirely
    base = F.col(base_col) if base_col else minhash_base(F.col("shingle"))
    aggs = [
        F.min((base * F.lit(a) + F.lit(b)) % F.lit(MINHASH_P)).alias(f"h{s}")
        for s, (a, b) in enumerate(consts)
    ]
    return shingles.groupBy(*id_cols).agg(*aggs)


def lsh_bands(
    signatures: DataFrame,
    id_cols: List[str],
    bands: int = 8,
    rows_per_band: int = 2,
) -> DataFrame:
    """Banded signatures: (id, band, sig) — join key for candidate pairs."""
    band_cols = []
    for b in range(bands):
        hs = [
            F.col(f"h{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.concat_ws("#", *hs).alias("sig")))
    return signatures.select(
        *id_cols, F.explode(F.array(*band_cols)).alias("bs")
    ).select(*id_cols, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def lsh_candidate_pairs(
    bands_df: DataFrame,
    id_col: str,
    materialize: bool = True,
    width: int | None = None,
    dedupe: bool = True,
    key_cols: List[str] | None = None,
) -> DataFrame:
    """Self-join on (band, sig): distinct (a, b) with a < b.

    ``dedupe=False`` skips the final distinct and returns the raw pair
    stream (one row per SHARED BAND, so a pair colliding in several
    bands appears several times).  Callers that verify candidates with
    a cheap per-pair predicate and keep only a tiny survivor set can
    dedupe AFTER verification instead — the distinct then shuffles the
    survivors, not the O(candidate) pair stream (r7, guide section
    2.3: shuffle decisions' inputs, not the full pair table, when the
    verifier is cheaper than the exchange).

    ``key_cols`` overrides the join key (default ["band", "sig"]) —
    e.g. a caller that packs band+sig into one integer column joins on
    a single 8-byte key instead of an (int, string) composite.

    The shuffle key (band, sig) is high-cardinality; genuinely hot
    buckets (many near-identical texts) are exactly the pairs we want,
    and AQE skew-join splitting handles pathological buckets.
    ``materialize`` checkpoints the band table first: both join sides
    reference the same upstream (shingle -> minhash) pipeline, and
    without materialization Spark executes it twice (exchange reuse
    dies as soon as AQE broadcasts one side).

    ``width``: explicit partition count for the pair join + distinct.
    The band table is BYTES-small (AQE coalesces its exchange to ~1
    partition) but the join OUTPUT is quadratic per bucket — at a
    low-selectivity threshold millions of pairs emerge from a few MB of
    bands, all on one thread.  Same starvation mode as the shingle
    stage (PLANS.md): pin the width when candidates >> bands.
    """
    keys = key_cols if key_cols is not None else ["band", "sig"]
    if materialize:
        bands_df = bands_df.localCheckpoint(eager=True)
    if width:
        bands_df = bands_df.repartition(width, *[F.col(c) for c in keys])
    a = bands_df.select(F.col(id_col).alias("a"), *keys)
    b = bands_df.select(F.col(id_col).alias("b"), *keys)
    out = (
        a.join(b, keys)
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    return out.distinct() if dedupe else out


def rademacher_matrix(n_hyperplanes: int, dim: int):
    """Deterministic +/-1 hyperplane matrix (dim x H) derived from
    md5(f"{j}|{i}") — the same formula is computable in DuckDB SQL
    (instr-based first-nibble parity), so Spark and the oracle see
    byte-identical hyperplanes with no literal matrix shipped around."""
    import numpy as np

    W = np.empty((dim, n_hyperplanes), dtype=np.int64)
    for j in range(n_hyperplanes):
        for i in range(dim):
            h = hashlib.md5(f"{j}|{i}".encode()).hexdigest()
            W[i, j] = 1 if int(h[0], 16) % 2 == 0 else -1
    return W


def sign_lsh_bands(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    bits_per_band: int = 5,
    n_bands: int = 48,
) -> DataFrame:
    """(id, band, sig) sign-LSH band table for a double-array column.

    Random-hyperplane LSH for cosine similarity, banded OR-composition:
    sig = the band's bits_per_band sign bits of v . W.  Projections are
    computed in exact int64 fixed point (floor(v * 1e6) per component,
    +/-1 weights) so the sign is bit-identical in any engine / any
    summation order — no FP sign-flip at the bucket boundary.

    The heavy part (the matmul) runs as one vectorized pandas_udf per
    Arrow batch; output fans out n_bands rows per vector via posexplode.
    Candidate generation downstream joins on (band, sig) — a bounded,
    spillable shuffle join, never a cross join.

    Parameter coupling (Goemans-Williamson: P[bit agree] = 1 - theta/pi):
    recall ~ 1 - (1 - p^bits)^bands.  The defaults (5, 48) are tuned for
    the testdata's low threshold (cos 0.45, p~0.65): measured recall is
    1.0 at every sf while pruning ~25% of pairs.  At production near-dup
    thresholds (cos >= 0.9, p~0.86) the same defaults give recall
    1 - 3e-9 with ~50x candidate pruning; longer bands (8-12 bits) prune
    further.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    H = bits_per_band * n_bands
    cache: dict = {}

    @pandas_udf("array<string>")
    def band_sigs(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype=object)
        X = np.stack(vecs.to_numpy()).astype(np.float64)
        W = cache.get(X.shape[1])
        if W is None:
            W = cache[X.shape[1]] = rademacher_matrix(H, X.shape[1])
        Xi = np.floor(X * 1e6).astype(np.int64)
        S = (Xi @ W) >= 0
        bits = np.where(S, "1", "0")
        return pd.Series(
            [
                [
                    "".join(row[b * bits_per_band : (b + 1) * bits_per_band])
                    for b in range(n_bands)
                ]
                for row in bits
            ]
        )

    return df.select(
        id_col, F.posexplode(band_sigs(F.col(vec_col))).alias("band", "sig")
    )


def _vector_matrix(vectors: DataFrame, id_col: str, vec_col: str):
    """Collect (id, vector) into (sorted ids, float64 matrix, norms) —
    the broadcast build side of the Arrow cosine verifier.  Norms use
    the sequential per-dim fold + IEEE sqrt, bit-identical to
    sqrt(aggregate(v, 0.0, acc + x*x))."""
    import numpy as np
    import pyarrow.compute as pc

    tbl = vectors.select(id_col, vec_col).toArrow()
    ids = np.asarray(tbl.column(id_col).to_pylist(), dtype=np.int64)
    combined = tbl.column(vec_col).combine_chunks()
    n = len(ids)
    if n:
        lens = pc.list_value_length(combined).to_numpy(zero_copy_only=False)
        dims = np.unique(lens)
        if len(dims) != 1:
            raise ValueError(f"cosine verifier needs uniform dims, got {dims}")
        dim = int(dims[0])
        V = combined.flatten().to_numpy(zero_copy_only=False).astype(
            np.float64, copy=False
        ).reshape(n, dim)
    else:
        V = np.zeros((0, 1))
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    V = np.ascontiguousarray(V[order])
    nacc = V[:, 0] * V[:, 0]
    for i in range(1, V.shape[1]):
        nacc = nacc + V[:, i] * V[:, i]
    norms = np.sqrt(nacc)
    return ids, V, norms


def cosine_bucket_verify(
    bands_packed: DataFrame,
    vectors: DataFrame,
    id_col: str = "vec_id",
    bucket_col: str = "bkey",
    threshold: float = 0.45,
    round_to: int = 4,
    block_rows: int = 512,
    width: int | None = None,
) -> DataFrame:
    """Per-bucket candidate generation + exact cosine verification in
    one vectorized Arrow pass -> (a, b, cos) with a < b,
    round(cos, round_to) >= threshold, deduped across buckets.

    Replaces "self-join on the bucket key -> O(candidates) pair rows
    -> verify" with the guide section 4.2 / section 8 shape: only the
    BAND table (n_vectors x n_bands small rows) crosses the Python
    boundary, partitioned by bucket; inside each partition numpy
    enumerates each bucket's pairs and verifies them against the
    broadcast vector matrix — the O(candidates) intermediate never
    exists as rows anywhere.

    Two-phase exactness (the gate-safe fast path):
      1. SCREEN: per bucket, a blocked matmul G = M_blk @ M^T gives
         every pair dot to within 64*eps relative cosine error
         (classical fp error bound: |err| <= dim * eps * ||a|| ||b||,
         and the cosine divides by exactly ||a|| ||b||).  Pairs are
         kept when G >= (threshold - 10^-round_to - 1e-9) * na * nb —
         a strict superset of everything that can round up to the
         threshold; non-finite entries are kept too.
      2. EXACT: survivors (a ~1e-4 fraction at near-dup thresholds)
         are recomputed with the sequential per-dim fold
         acc = acc + A[:,i]*B[:,i] — each step one IEEE multiply then
         one IEEE add, bit-identical to the aggregate/zip_with fold —
         and the exact division dot/(na*nb).  The JVM then applies the
         exact round-half-up + threshold, so the kept rows and their
         cos values are bit-identical to the all-JVM formulation.

    Bucket members are processed in ascending id order, so emitted
    pairs satisfy a < b; a pair colliding in several buckets is
    emitted once per bucket and deduped by the final (tiny) distinct.
    """
    import numpy as np

    spark = bands_packed.sparkSession
    ids, V, norms = _vector_matrix(vectors, id_col, "v")
    bc = spark.sparkContext.broadcast((ids, V, norms))
    lowbound = threshold - 10.0 ** (-round_to)
    screen_margin = 1e-9

    def gen_verify(batches):
        import pyarrow as pa

        b_ids, b_V, b_norms = bc.value
        empty = pa.RecordBatch.from_arrays(
            [
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.int64()),
                pa.array([], type=pa.float64()),
            ],
            ["a", "b", "raw"],
        )
        chunks = [b for b in batches if b.num_rows]
        if not chunks:
            yield empty
            return
        part = pa.Table.from_batches(chunks)
        vec = part.column(0).to_numpy(zero_copy_only=False).astype(np.int64)
        key = part.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((vec, key))
        vec, key = vec[order], key[order]
        idx = np.searchsorted(b_ids, np.minimum(vec, b_ids[-1]))
        if (b_ids[idx] != vec).any():
            raise ValueError("band row id missing from vector table")
        rows_v = b_V[idx]
        rows_n = b_norms[idx]
        bounds = np.flatnonzero(np.r_[True, key[1:] != key[:-1], True])
        out_a, out_b, out_raw = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            d = e - s
            if d < 2:
                continue
            M = rows_v[s:e]
            nb_ = rows_n[s:e]
            mids = vec[s:e]
            for b0 in range(0, d, block_rows):
                b1 = min(b0 + block_rows, d)
                G = M[b0:b1] @ M.T
                thr = (lowbound - screen_margin) * np.outer(nb_[b0:b1], nb_)
                with np.errstate(invalid="ignore"):
                    keep = (G >= thr) | ~np.isfinite(G)
                # strict upper triangle only: local row i (global b0+i)
                # pairs with global cols j > b0+i
                cols = np.arange(d)
                keep &= cols[None, :] > (b0 + np.arange(b1 - b0))[:, None]
                ii, jj = np.nonzero(keep)
                if ii.size == 0:
                    continue
                gi = b0 + ii
                A = M[gi]
                B = M[jj]
                acc = A[:, 0] * B[:, 0]
                for t in range(1, M.shape[1]):
                    acc = acc + A[:, t] * B[:, t]
                with np.errstate(invalid="ignore", divide="ignore"):
                    raw = acc / (nb_[gi] * nb_[jj])
                    final = raw >= lowbound
                if final.any():
                    out_a.append(mids[gi[final]])
                    out_b.append(mids[jj[final]])
                    out_raw.append(raw[final])
        if not out_a:
            yield empty
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.concatenate(out_a)),
                pa.array(np.concatenate(out_b)),
                pa.array(np.concatenate(out_raw)),
            ],
            ["a", "b", "raw"],
        )

    narrow = bands_packed.select(
        F.col(id_col).cast("long").alias("vid"), F.col(bucket_col).alias("bkey")
    )
    # every bucket must land whole in ONE partition — hash-partition on
    # the bucket key (also pins the width of the verify stage; the band
    # table is bytes-small, so AQE would otherwise fold it to a few
    # partitions and serialize the numpy work)
    narrow = narrow.repartition(width or 32, F.col("bkey"))
    survivors = narrow.mapInArrow(gen_verify, "a long, b long, raw double")
    return (
        survivors.select("a", "b", F.round(F.col("raw"), round_to).alias("cos"))
        .where(F.col("cos") >= threshold)
        .distinct()
    )


def simhash32(df: DataFrame, id_cols: List[str], token_col: str) -> DataFrame:
    """32-bit SimHash per id from exploded tokens.

    Bit j of md5(token) votes +1/-1; the sign of the per-bit sum forms
    the fingerprint.  Bits come from hex nibbles (instr over
    '0123456789abcdef'), which is portable to DuckDB verbatim.
    One groupBy — map-side combinable sums.
    """
    h = md5_utf8(F.col(token_col))
    bit_sums = []
    for j in range(32):
        nibble = F.conv(F.substring(h, j // 4 + 1, 1), 16, 10).cast("int")
        # (nibble >> (j%4)) & 1, written as floor-div/mod so the SQL
        # oracle (instr-based nibble, same arithmetic) matches exactly
        bit = F.pmod(F.floor(nibble / F.lit(2 ** (j % 4))), F.lit(2))
        bit_sums.append(F.sum(bit * 2 - 1).cast("bigint").alias(f"b{j}"))
    sums = df.groupBy(*id_cols).agg(*bit_sums)
    acc = F.lit(0).cast("bigint")
    for j in range(32):
        acc = acc + F.when(F.col(f"b{j}") > 0, F.lit(2 ** j).cast("bigint")).otherwise(0)
    return sums.select(*id_cols, acc.alias("simhash"))
