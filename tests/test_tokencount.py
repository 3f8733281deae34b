"""operators/tokencount: the codegen expression path, the
mapInPandas/tagcore path, and driver-side numpy must agree exactly —
including across the max_seq_len truncation boundary."""

from pyspark.sql import functions as F

from arabicner_spark.functions import tagcore
from arabicner_spark.operators.tokencount import subword_counts, subword_counts_expr


def _rows(df):
    return {
        r.doc_id: (r.n_tokens, r.n_subwords, r.n_kept, r.n_taggable)
        for r in df.collect()
    }


def test_expr_equals_mapinpandas_equals_numpy(spark):
    # doc 3 straddles the budget: 200 x 12-char tokens = 600 subwords
    # at 3 pieces each -> first_idx of token i is 3i; budget 30 with
    # max_seq_len=32 -> taggable = tokens with 3i < 30 = 10
    docs = [
        (1, "short text here"),
        (2, ""),
        (3, " ".join(["abcdefghijkl"] * 200)),
        (4, "a bb ccc dddd eeeee"),
        (5, "x  y"),  # double space -> empty token, still 1 piece
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    a = _rows(subword_counts_expr(df, max_seq_len=32))
    b = _rows(subword_counts(df, max_seq_len=32))
    assert a == b
    # driver-side ground truth straight through tagcore
    for did, txt in docs:
        toks = txt.split(" ")
        sl = tagcore.subword_lengths(toks)
        _, n_kept, n_tag = tagcore.encode_from_lengths(sl, 32)
        assert a[did] == (len(toks), int(sl.sum()), n_kept, n_tag), did
    assert a[3] == (200, 600, 30, 10)


def test_expr_path_has_no_python(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id bigint, text string")
    plan = subword_counts_expr(df)._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "PythonUDF" not in plan


def test_null_text_consistent_between_paths(spark):
    df = spark.createDataFrame([(1, None), (2, "ab cd")], "doc_id bigint, text string")
    a = _rows(subword_counts_expr(df))
    b = _rows(subword_counts(df))
    assert a == b
    assert a[1] == (1, 1, 1, 1)  # NULL -> "" -> one empty token, one piece
