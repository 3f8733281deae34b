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
