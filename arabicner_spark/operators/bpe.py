"""BPE tokenizer training on Spark — the tokenizer-side operator of a
training-data pipeline (the reference consumes a pretrained WordPiece
vocab via transformers, arabiner/utils/helpers.py; building the vocab
from the corpus is the upstream step a 100-TB pipeline owns).

Scale shape (the classic two-tier BPE formulation):
  1. ONE corpus scan builds the word-frequency table — explode + one
     map-side-combinable count agg.  At 100 TB this is the only pass
     over the data; everything after runs on the VOCABULARY table
     (millions of rows, not billions).
  2. The merge loop iterates over the vocab table: count adjacent
     symbol pairs weighted by word frequency (explode + sum agg —
     partial-aggregated, so the shuffle carries distinct pairs, not
     occurrences), take the arg-max pair (orderBy+limit(1) =
     TakeOrderedAndProject, one row to the driver), and apply the
     merge with a PURE-EXPRESSION array fold (no Python, no UDF):
     greedy left-to-right, exactly the textbook BPE apply.
     localCheckpoint per round cuts the lineage like the other
     iterative operators (components, pagerank).

Determinism: the arg-max tie-break is (count desc, pair asc) — a total
order — so the merge sequence is a pure function of the corpus.
"""

from __future__ import annotations

from typing import List, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# separator used in the pair label; word symbols can never contain a
# space because words come from splitting text on spaces
PAIR_SEP = " "


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus scan -> (word, freq).  The single pass over the data."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )


def char_symbols(word_col: Column) -> Column:
    """Initial BPE state: the word as its character sequence.  Guarded
    for the empty word: Spark's sequence(1, 0) is DESCENDING ([1, 0]),
    which would turn "" into two empty symbols and let a ('', '')
    merge win the first round (observed on a synthetic vocab before
    the guard) — same bug class as the text_repetition chunk fix."""
    idx = F.when(
        F.length(word_col) >= 1, F.sequence(F.lit(1), F.length(word_col))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: word_col.substr(i, F.lit(1)))


def char_pair_counts(words: DataFrame, k: int = 20) -> DataFrame:
    """One BPE counting step over the initial (character) state as
    2-char substrings: top-k adjacent character pairs weighted by word
    frequency, (count desc, pair asc).  Pure expressions; the global
    top-k is a TakeOrderedAndProject."""
    n = (F.length("word") - 1).cast("int")
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    pairs = words.select(
        "freq", F.explode(F.transform(idx, lambda i: F.col("word").substr(i, F.lit(2)))).alias("pair")
    )
    agg = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("n"))
    return agg.orderBy(F.desc("n"), "pair").limit(k)


def symbol_pair_counts(syms_df: DataFrame) -> DataFrame:
    """(pair, n) over the current symbol state: adjacent symbol pairs
    joined with PAIR_SEP, weighted by word freq."""
    n = (F.size("syms") - 1).cast("int")
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    pair = F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(F.col("syms"), i), F.lit(PAIR_SEP), F.element_at(F.col("syms"), i + 1)
        ),
    )
    return (
        syms_df.select("freq", F.explode(pair).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").cast("long").alias("n"))
    )


def apply_merge(sym_col: Column, x: str, y: str) -> Column:
    """Greedy left-to-right application of merge (x, y) -> x+y to a
    symbol array, as one expression fold: append each symbol unless the
    accumulator ends with ``x`` and the symbol is ``y``, in which case
    replace the tail with the merged symbol.  Because the merged
    symbol differs from ``x`` (strictly longer), overlapping runs
    resolve exactly like the textbook sequential scan:
    [a,a,a] -> [aa,a] and [a,a,a,a] -> [aa,aa]."""
    merged = x + y
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(x))
            & (s == F.lit(y)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def apply_merges_batch(sym_col: Column, merges: List[Tuple[str, str]]) -> Column:
    """Apply an INTERACTION-FREE batch of merges in one expression
    fold.  Valid when no two batch members interleave anywhere in the
    data (pairwise ``dmat`` bounds all zero — they may still share a
    first or last symbol) and no member contains another's x+y concat:
    then no position ever offers two merges a choice, so one
    simultaneous left-to-right scan equals applying the merges
    sequentially in any order — each step looks the (tail, symbol) key
    up in a literal map instead of testing one pair.  Interacting
    batches must chain :func:`apply_merge` folds in priority order
    instead."""
    m = F.create_map(
        *[
            F.lit(v)
            for (x, y) in merges
            for v in (x + PAIR_SEP + y, x + y)
        ]
    )
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & F.element_at(
                m, F.concat(F.element_at(acc, -1), F.lit(PAIR_SEP), s)
            ).isNotNull(),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.element_at(
                        m, F.concat(F.element_at(acc, -1), F.lit(PAIR_SEP), s)
                    )
                ),
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def pair_interactions(
    syms_df: DataFrame, cand_pairs: List[str]
) -> Tuple[dict, dict]:
    """One bounded triple scan -> the two tables the greedy-safe batch
    selection needs, for candidate pair strings "x y":

    - ``tmax[pair]``: max count of any adjacent symbol TRIPLE containing
      (x, y) as its prefix or suffix pair.  Bounds every pair a merge of
      (x, y) can CREATE: a new pair (t, xy) has one occurrence per
      "t x y" adjacency, (xy, u) per "x y u", and (xy, xy) per
      "x y x y" <= both of its triples.
    - ``dmat[(p, q)]``: summed count of triples whose prefix pair is p
      and suffix pair is q (both candidates).  Bounds how many
      occurrences of q a merge of p can DESTROY: a destroyed q=(u,v)
      occurrence has u or v consumed by a p=(x,y) merge event, which
      forces the adjacency x,y(=u),v or u,v(=x),y — i.e. an
      interleaving triple (shared middle symbol).  Pairs sharing only
      their first or only their last symbol never interleave: D = 0.

    Both bounds are computed on the round-start state and stay valid at
    every intra-batch step: batch merges only coarsen words (adjacent
    symbols in a later state were adjacent at round start), so every
    later-event triple maps to a round-start triple already counted.
    """
    if not cand_pairs:
        return {}, {}
    n = (F.size("syms") - 2).cast("int")
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    s = lambda i: F.element_at(F.col("syms"), i)  # noqa: E731
    trip = F.transform(
        idx,
        lambda i: F.struct(
            F.concat_ws(PAIR_SEP, s(i), s(i + 1), s(i + 2)).alias("t"),
            F.concat_ws(PAIR_SEP, s(i), s(i + 1)).alias("pre"),
            F.concat_ws(PAIR_SEP, s(i + 1), s(i + 2)).alias("suf"),
        ),
    )
    per_triple = (
        syms_df.select("freq", F.explode(trip).alias("tr"))
        .select("freq", "tr.t", "tr.pre", "tr.suf")
        .where(F.col("pre").isin(cand_pairs) | F.col("suf").isin(cand_pairs))
        .groupBy("t", "pre", "suf")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    t_rows = (
        per_triple.select(
            F.explode(
                F.array_distinct(F.array("pre", "suf"))
            ).alias("pair"),
            "cnt",
        )
        .where(F.col("pair").isin(cand_pairs))
        .groupBy("pair")
        .agg(F.max("cnt").alias("v"))
        .select(F.lit("T").alias("k"), "pair", F.lit("").alias("pair2"), "v")
    )
    d_rows = (
        per_triple.where(
            F.col("pre").isin(cand_pairs) & F.col("suf").isin(cand_pairs)
        )
        .groupBy("pre", "suf")
        .agg(F.sum("cnt").alias("v"))
        .select(
            F.lit("D").alias("k"),
            F.col("pre").alias("pair"),
            F.col("suf").alias("pair2"),
            "v",
        )
    )
    tmax: dict = {}
    dmat: dict = {}
    for r in t_rows.unionByName(d_rows).collect():
        if r["k"] == "T":
            tmax[r["pair"]] = r["v"]
        else:
            dmat[(r["pair"], r["pair2"])] = r["v"]
    return tmax, dmat


def _greedy_safe_batch(
    cands: List[Tuple[str, int]],
    tmax: dict,
    dmat: dict,
    batch: int,
    min_count: int,
    bounded: "set | None" = None,
) -> Tuple[List[Tuple[str, str]], bool]:
    """Maximal PREFIX of the (count desc, pair asc) candidate order
    that provably reproduces the serial greedy sequence, and whether
    the accepted set is pairwise interaction-free (so a simultaneous
    shared-map fold may apply it instead of sequential chained folds).

    A candidate q with round-start count n joins the batch iff, at its
    serial step, it is STILL the strict argmax no matter how the
    accepted merges played out:

    - q contains no accepted x+y concat (such a pair's count can GROW
      with the merge — unbounded above, stop);
    - low = n - sum of interleave bounds dmat vs every accepted p is
      q's worst-case serial count (old pairs never increase);
    - low >= min_count (serial must not have stopped first);
    - low > t_cap = max tmax over accepted (strictly beats every pair
      the accepted merges can CREATE — ties lose: serial tie-break is
      by pair string, which a new pair could win);
    - low > next candidate's count, or the decrement is provably zero
      and n >= next (equal counts resolve by pair asc = list order).
      The final candidate uses its own n as "next": pairs beyond the
      truncated top-4*batch list rank below it at round start, which
      only suffices when q's count provably did not move.

    Stops at the first violation — pairs ranked between accepted
    members must themselves be accepted, or the serial order beyond
    them is unknown without a recount.

    ``bounded`` (None = every candidate): the set of candidates whose
    tmax/dmat rows were actually computable this round.  When the
    triple scan is filtered by a PREDICTED candidate set (the fused
    one-job round), a candidate outside it has UNKNOWN bounds — a
    missing dict entry must then mean "unsafe", never the exact-scan
    meaning "provably zero".  An unbounded candidate is accepted only
    as the round's first merge (the serial argmax needs no bounds)
    and ends the batch: neither the pairs it creates (t_cap) nor its
    decrements on followers (dmat) are known."""
    accepted: List[Tuple[str, str]] = []
    acc_strs: List[str] = []
    concats: set = set()
    t_cap = 0
    clean = True
    for j, (pair, cnt) in enumerate(cands):
        if cnt < min_count or len(accepted) >= batch:
            break
        unbounded = bounded is not None and pair not in bounded
        if accepted and unbounded:
            break
        x, y = pair.split(PAIR_SEP, 1)
        if accepted:
            if x in concats or y in concats:
                break
            d = sum(
                dmat.get((p, pair), 0) + dmat.get((pair, p), 0)
                for p in acc_strs
            )
            low = cnt - d
            nxt = cands[j + 1][1] if j + 1 < len(cands) else cnt
            if low < min_count or low <= t_cap:
                break
            if not (low > nxt or (d == 0 and cnt >= nxt)):
                break
            if d > 0:
                clean = False
        accepted.append((x, y))
        acc_strs.append(pair)
        concats.add(x + y)
        t_cap = max(t_cap, tmax.get(pair, 0))
        if unbounded:
            break
    return accepted, clean


def _membership_map(values: List[str]):
    """O(1)-lookup literal membership test (create_map hash probe, not
    an O(n) array_contains scan — the predicted-pair set reaches ~128
    entries and the test runs per triple per row)."""
    if not values:
        return None
    m = F.create_map(*[F.lit(v) for s in values for v in (s, "1")])
    return lambda c: F.element_at(m, c).isNotNull()


def fused_round_scan(
    syms_df: DataFrame,
    pred_pairs: "List[str] | None",
    new_syms: List[str],
) -> DataFrame:
    """ONE pass over the symbol state -> eager-checkpointed round
    table (kind, k1, k2, k3, cnt):

    - kind 'P': adjacent-pair counts (k1 = pair) — every pair, always;
    - kind 'T': adjacent-triple counts (k1 = triple, k2 = prefix pair,
      k3 = suffix pair), FILTERED to triples that can bound a
      plausible candidate: prefix/suffix in ``pred_pairs`` (last
      round's observed top pairs) or any component among ``new_syms``
      (symbols recent merges created — the pairs a merge creates are
      exactly the ones prediction cannot name in advance).
      ``pred_pairs`` None = first round = keep every triple.

    The filter bounds the triple-agg size without a second scan; a
    candidate it misses is handled by _greedy_safe_batch's ``bounded``
    rule (conservative fill loss, never a parity loss).  Because the
    caller lazily localCheckpoints the pending merge fold into
    ``syms_df``, the single job materializing this agg also
    materializes the fold — pair counting, interaction bounding, and
    merge application cost ONE Spark job per round."""
    s = lambda i: F.element_at(F.col("syms"), i)  # noqa: E731
    np_ = (F.size("syms") - 1).cast("int")
    pidx = F.when(np_ >= 1, F.sequence(F.lit(1), np_)).otherwise(
        F.array().cast("array<int>")
    )
    prow = F.transform(
        pidx,
        lambda i: F.struct(
            F.lit("P").alias("kind"),
            F.concat_ws(PAIR_SEP, s(i), s(i + 1)).alias("k1"),
            F.lit("").alias("k2"),
            F.lit("").alias("k3"),
        ),
    )
    nt = (F.size("syms") - 2).cast("int")
    tidx = F.when(nt >= 1, F.sequence(F.lit(1), nt)).otherwise(
        F.array().cast("array<int>")
    )

    def trow_at(i):
        return F.struct(
            F.lit("T").alias("kind"),
            F.concat_ws(PAIR_SEP, s(i), s(i + 1), s(i + 2)).alias("k1"),
            F.concat_ws(PAIR_SEP, s(i), s(i + 1)).alias("k2"),
            F.concat_ws(PAIR_SEP, s(i + 1), s(i + 2)).alias("k3"),
        )

    if pred_pairs is None:
        trow = F.transform(tidx, trow_at)
    else:
        in_pred = _membership_map(pred_pairs)
        in_new = _membership_map(new_syms)

        def keep(i):
            cond = F.lit(False)
            if in_pred is not None:
                cond = cond | in_pred(F.concat_ws(PAIR_SEP, s(i), s(i + 1)))
                cond = cond | in_pred(F.concat_ws(PAIR_SEP, s(i + 1), s(i + 2)))
            if in_new is not None:
                for off in (0, 1, 2):
                    cond = cond | in_new(s(i + off))
            return cond

        trow = F.filter(
            F.transform(tidx, lambda i: F.when(keep(i), trow_at(i))),
            lambda r: r.isNotNull(),
        )
    return (
        syms_df.select("freq", F.explode(F.concat(prow, trow)).alias("r"))
        .select("freq", "r.kind", "r.k1", "r.k2", "r.k3")
        .groupBy("kind", "k1", "k2", "k3")
        .agg(F.sum("freq").cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )


def _bounds_from_round_table(round_df: DataFrame, cand_pairs: List[str]):
    """tmax/dmat dicts (pair_interactions semantics) from the fused
    round table's kind='T' rows — two tiny aggs over a checkpointed
    summary, no rescan of the corpus."""
    trip = round_df.where(F.col("kind") == "T")
    t_rows = (
        trip.select(
            F.explode(F.array_distinct(F.array("k2", "k3"))).alias("pair"), "cnt"
        )
        .where(F.col("pair").isin(cand_pairs))
        .groupBy("pair")
        .agg(F.max("cnt").alias("v"))
        .collect()
    )
    d_rows = (
        trip.where(F.col("k2").isin(cand_pairs) & F.col("k3").isin(cand_pairs))
        .groupBy("k2", "k3")
        .agg(F.sum("cnt").alias("v"))
        .collect()
    )
    tmax = {r["pair"]: r["v"] for r in t_rows}
    dmat = {(r["k2"], r["k3"]): r["v"] for r in d_rows}
    return tmax, dmat


_NEW_SYM_ROUNDS = 4  # rounds a created symbol stays in the triple filter


def train_bpe_batched(
    words: DataFrame,
    n_merges: int,
    min_count: int = 2,
    batch: int = 16,
) -> Tuple[List[Tuple[str, str]], DataFrame]:
    """Batched BPE training: IDENTICAL merge sequence to
    :func:`train_bpe` (property-tested on interacting corpora), but up
    to ``batch`` greedy-safe merges are selected and applied per Spark
    round, amortizing the per-round job latency that makes the serial
    loop one full job per merge (~4.3 s/merge at 2M words — a real
    30k-merge tokenizer would need ~36 h of round-trips).

    Per round, ONE full-corpus Spark job (:func:`fused_round_scan`):
    the previous round's merge fold rides in via a LAZY localCheckpoint
    and materializes inside the same pass that counts pairs and the
    prediction-filtered interaction triples; everything after — the
    top-``8*batch`` candidate collect, the tmax/dmat bound aggs, the
    greedy-safe selection — runs over the checkpointed round summary
    (driver-size rows).  Interaction-free batches apply as a single
    shared-map fold, interacting-but-still-safe ones as sequential
    chained folds (serial order) in the same projection; candidates
    the prediction filter missed are admitted conservatively
    (``bounded`` rule) — fill loss, never parity loss.  Worst case
    (every top candidate truly interacts) degenerates to the serial
    loop; the Zipfian receipt corpus measures the per-round batch fill
    in COVERAGE.md."""
    syms = words.select(
        "word", "freq", char_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: List[Tuple[str, str]] = []
    pred: "List[str] | None" = None
    recent_syms: List[List[str]] = []
    while len(merges) < n_merges:
        new_syms = [x for rnd in recent_syms[-_NEW_SYM_ROUNDS:] for x in rnd]
        round_df = fused_round_scan(syms, pred, new_syms)
        top = (
            round_df.where(F.col("kind") == "P")
            .orderBy(F.desc("cnt"), "k1")
            .limit(8 * batch)
            .collect()
        )
        cands = [(r["k1"], r["cnt"]) for r in top[: 4 * batch]]
        if not cands or cands[0][1] < min_count:
            break
        room = min(batch, n_merges - len(merges))
        if room <= 1:
            tmax, dmat = {}, {}
        else:
            tmax, dmat = _bounds_from_round_table(
                round_df, [p for p, _ in cands]
            )
        if pred is None:
            bounded = None
        else:
            pset, nset = set(pred), set(new_syms)
            bounded = {
                p
                for p, _ in cands
                if p in pset or any(c in nset for c in p.split(PAIR_SEP, 1))
            }
        step, clean = _greedy_safe_batch(
            cands, tmax, dmat, room, min_count, bounded
        )
        if not step:
            break
        merges.extend(step)
        if clean:
            col = apply_merges_batch(F.col("syms"), step)
        else:
            col = F.col("syms")
            for x, y in step:
                col = apply_merge(col, x, y)
        # LAZY: the fold materializes inside the next round's scan job
        syms = syms.withColumn("syms", col).localCheckpoint(eager=False)
        pred = [r["k1"] for r in top]
        recent_syms.append([x + y for x, y in step])
    return merges, syms


def train_bpe(
    words: DataFrame, n_merges: int, min_count: int = 2
) -> Tuple[List[Tuple[str, str]], DataFrame]:
    """-> (merge list in order learned, final symbolized vocab
    (word, freq, syms)).  ``words`` is the (word, freq) table from
    :func:`word_freqs`.  Stops early when no pair reaches
    ``min_count``.  Only ONE row crosses to the driver per merge."""
    syms = words.select(
        "word", "freq", char_symbols(F.col("word")).alias("syms")
    ).localCheckpoint(eager=True)
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            symbol_pair_counts(syms)
            .orderBy(F.desc("n"), "pair")
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_count:
            break
        x, y = top[0]["pair"].split(PAIR_SEP, 1)
        merges.append((x, y))
        syms = syms.withColumn("syms", apply_merge(F.col("syms"), x, y)).localCheckpoint(
            eager=True
        )
    return merges, syms


def encode_word(word: str, merges: List[Tuple[str, str]]) -> List[str]:
    """Driver-side reference encoder (tests + tokenizer export): apply
    the learned merges in order to one word.  Mirrors apply_merge's
    greedy fold exactly."""
    syms = list(word)
    for x, y in merges:
        out: List[str] = []
        for s in syms:
            if out and out[-1] == x and s == y:
                out[-1] = x + y
            else:
                out.append(s)
        syms = out
    return syms
