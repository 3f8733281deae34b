"""Subword token counting — LLM data budgeting is denominated in
subword tokens, not whitespace tokens (r3 ADVICE item).

Two implementations of the SAME counting rule (the stand-in chunker:
``max(1, ceil(len/SUBWORD_CHARS))`` pieces per whitespace token, the
min-1 mirroring the reference tokenizer's [UNK] fallback at
arabiner/data/transforms.py:23-52, truncation budget
``max_seq_len - 2`` as in transforms.py:101-107):

* ``subword_counts_expr`` — pure ``pyspark.sql.functions`` expression
  pipeline: transform() for per-token piece counts and ONE aggregate()
  higher-order fold carrying a (cumsum, taggable) struct accumulator
  for the truncation-aware taggable count.  Whole-stage codegen, no
  Python, no shuffle — the 100-TB path.
* ``subword_counts`` — iterator mapInPandas through the REAL numpy
  machinery (tagcore.subword_lengths + encode_from_lengths), i.e. the
  exact code the NER encoder runs; swaps to real-WordPiece counts via
  functions.bert_scorer when a checkpoint is supplied upstream.

Equality of the two (and of both to tagcore on the driver) is pinned
in tests/test_tokencount.py; the oracle gate runs the expression path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arabicner_spark.functions import tagcore


def _piece_count(tok):
    # max(1, ceil(len/SUBWORD_CHARS)) in pure integer arithmetic
    return F.greatest(
        F.lit(1).cast("long"),
        ((F.length(tok) + tagcore.SUBWORD_CHARS - 1) / tagcore.SUBWORD_CHARS).cast(
            "long"
        ),
    )


def subword_counts_expr(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_seq_len: int = tagcore.DEFAULT_MAX_SEQ_LEN,
) -> DataFrame:
    """-> (id, n_tokens, n_subwords, n_kept, n_taggable), codegen-only.

    NULL text counts as empty — one empty token, one subword — matching
    the mapInPandas twin's ``None -> ""`` rule (least/size on NULL would
    otherwise produce an inconsistent NULL/510 row)."""
    budget = max_seq_len - 2
    toks = F.split(F.coalesce(F.col(text_col), F.lit("")), " ")
    pieces = F.transform(toks, _piece_count)
    # one fold, struct accumulator: cum = subwords so far, tag = tokens
    # whose FIRST subword index (= cum before adding) is inside budget
    acc0 = F.struct(
        F.lit(0).cast("long").alias("cum"), F.lit(0).cast("int").alias("tag")
    )
    folded = F.aggregate(
        pieces,
        acc0,
        lambda acc, x: F.struct(
            (acc["cum"] + x).alias("cum"),
            (
                acc["tag"]
                + F.when(acc["cum"] < budget, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("int")
            .alias("tag"),
        ),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("int").alias("n_tokens"),
        folded["cum"].alias("n_subwords"),
        F.least(folded["cum"], F.lit(budget).cast("long"))
        .cast("int")
        .alias("n_kept"),
        folded["tag"].alias("n_taggable"),
    )


def subword_counts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_seq_len: int = tagcore.DEFAULT_MAX_SEQ_LEN,
) -> DataFrame:
    """Same output through tagcore's numpy encoder (mapInPandas)."""
    # Preserve the caller's id type (string/int/bigint id columns all
    # occur); hardcoding bigint silently miscast non-bigint ids while
    # the expression twin preserved them.
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_tokens int, n_subwords bigint, n_kept int, n_taggable int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                toks = ("" if txt is None else txt).split(" ")
                sl = tagcore.subword_lengths(toks)
                _, n_kept, n_taggable = tagcore.encode_from_lengths(sl, max_seq_len)
                out.append((did, len(toks), int(sl.sum()), n_kept, n_taggable))
            yield pd.DataFrame(
                out,
                columns=[id_col, "n_tokens", "n_subwords", "n_kept", "n_taggable"],
            )

    return df.select(id_col, text_col).mapInPandas(gen, schema)
