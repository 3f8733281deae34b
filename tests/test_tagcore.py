"""Unit tests for the shared numpy tag core (decode/truncation edge
cases called out in SURVEY.md section 5)."""

import numpy as np

from arabicner_spark.functions import tagcore
from arabicner_spark.functions.normalize import normalize_py


def _decode_ids(ids, types):
    """Helper: run decode_turn on explicit (n_tok, L) token-level label
    ids with 1 subword per token."""
    n = ids.shape[0]
    logits = np.zeros((n + 2, ids.shape[1], 3), np.float32)
    logits[:, :, tagcore.O_ID] = 1.0
    for t in range(n):
        for l in range(ids.shape[1]):
            logits[t + 1, l, :] = 0
            logits[t + 1, l, ids[t, l]] = 1.0
    first = np.arange(n)
    return tagcore.decode_turn(logits, first, n, types)


B, I, O = tagcore.B_ID, tagcore.I_ID, tagcore.O_ID


def test_iob2_basic_span():
    ids = np.array([[O], [B], [I], [O]])
    assert _decode_ids(ids, ["X"]) == [(0, "X", 1, 3)]


def test_iob2_stray_I_does_not_open_span():
    # IOB2-strict: leading I- without B- is not a span (seqeval IOB2,
    # arabiner/utils/metrics.py:35)
    ids = np.array([[I], [I], [O]])
    assert _decode_ids(ids, ["X"]) == []


def test_iob2_b_after_b_splits():
    ids = np.array([[B], [B], [I]])
    assert _decode_ids(ids, ["X"]) == [(0, "X", 0, 1), (0, "X", 1, 3)]


def test_iob2_span_at_sequence_end():
    ids = np.array([[O], [B]])
    assert _decode_ids(ids, ["X"]) == [(0, "X", 1, 2)]


def test_nested_levels_overlap():
    ids = np.array([[B, O], [I, B], [O, O]])
    got = _decode_ids(ids, ["ORG", "PERS"])
    assert got == [(0, "ORG", 0, 2), (1, "PERS", 1, 2)]


def test_subword_lengths_and_unk_fallback():
    # ceil(len/4) pieces, min 1 — empty token maps to 1 piece ([UNK]
    # fallback, arabiner/data/transforms.py:30)
    assert tagcore.subword_lengths(["ab", "abcd", "abcde", ""]).tolist() == [1, 1, 2, 1]


def test_truncation_drops_tail_tags():
    # 200 tokens of 8 chars -> 2 subwords each -> 400 subwords; budget
    # with max_seq_len=102 is 100 subwords -> 50 taggable tokens
    toks = ["abcdefgh"] * 200
    first, n_sub, n_tag = tagcore.encode_tokens(toks, max_seq_len=102)
    assert n_sub == 100 and n_tag == 50
    # token 50's first subword is exactly at the budget boundary (idx
    # 100) -> not taggable; token 49 (idx 98) is.
    assert first[49] == 98 and first[50] == 100


def test_truncated_entity_not_emitted():
    gaz = {"GPE": {("x",)}}
    toks = ["aaaa"] * 600 + ["x"]
    got = tagcore.mentions_for_turn(toks, toks, gaz, ["GPE"])
    assert got == []
    # same turn, un-truncated: mention appears
    got2 = tagcore.mentions_for_turn(toks, toks, gaz, ["GPE"], max_seq_len=4096)
    assert got2 == [(0, "GPE", 600, 601, "x")]


def test_straddling_entity_keeps_truncated_prefix():
    """A phrase starting before the subword budget but ending after it
    decodes as its kept prefix — the reference slices the tag lists
    (transforms.py:101-107), preserving B-/I- up to the boundary."""
    gaz = {"ORG": {("x", "y", "z")}}
    # 4-char tokens = 1 subword each; budget = max_seq_len-2 = 8
    toks = ["aaaa"] * 7 + ["x", "y", "z"]
    got = tagcore.mentions_for_turn(toks, toks, gaz, ["ORG"], max_seq_len=10)
    assert got == [(0, "ORG", 7, 8, "x")]
    # starting exactly AT the boundary: B- is cut, nothing emitted
    toks2 = ["aaaa"] * 8 + ["x", "y", "z"]
    assert tagcore.mentions_for_turn(toks2, toks2, gaz, ["ORG"], max_seq_len=10) == []


def test_greedy_longest_match_and_first_match_per_type():
    gaz = {"ORG": {("a", "b"), ("a",)}}
    # longest wins at position 0; the inner ("a",) at pos 0 is consumed
    got = tagcore.mentions_for_turn(["a", "b", "a"], ["a", "b", "a"], gaz, ["ORG"])
    assert got == [(0, "ORG", 0, 2, "a b"), (0, "ORG", 2, 3, "a")]


def test_normalize_folds():
    assert normalize_py("الأَسَد") == "الاسد"
    assert normalize_py("مدرسةٌ") == "مدرسه"
    assert normalize_py("عَلَى") == "علي"  # alef maqsura -> yaa
    assert normalize_py("مُسْتَشْفَى") == "مستشفي"
    assert normalize_py("ABC def") == "abc def"
