"""Property-based tests (hypothesis) over the shared tag core — the
invariants that must hold for ANY input, not just fixtures."""

from hypothesis import given, settings
from hypothesis import strategies as st

from arabicner_spark.functions import tagcore
from arabicner_spark.functions.normalize import normalize_py

# small closed alphabet so gazetteer hits actually occur
WORDS = ["ab", "cd", "efg", "hijk", "lm", "xyzq", "p"]
token_lists = st.lists(st.sampled_from(WORDS), min_size=0, max_size=40)
phrase = st.lists(st.sampled_from(WORDS), min_size=1, max_size=3).map(tuple)
gazetteers = st.fixed_dictionaries(
    {},
    optional={
        "A": st.sets(phrase, min_size=1, max_size=4),
        "B": st.sets(phrase, min_size=1, max_size=4),
    },
)


@settings(max_examples=300, deadline=None)
@given(tokens=token_lists, gaz=gazetteers)
def test_mention_invariants(tokens, gaz):
    if not gaz:
        return
    ms = tagcore.mentions_for_turn(tokens, tokens, gaz)
    types = tagcore.gazetteer_types(gaz)
    by_level = {}
    for lvl, typ, s, e, text in ms:
        # spans are in-bounds, non-empty, level/type consistent
        assert 0 <= s < e <= len(tokens)
        assert types[lvl] == typ
        # surface text equals the original tokens joined
        assert text == " ".join(tokens[s:e])
        # every emitted span is a gazetteer phrase of its type
        assert tuple(tokens[s:e]) in gaz[typ]
        by_level.setdefault(lvl, []).append((s, e))
    # within one level spans never overlap (single BIO segmentation)
    for spans in by_level.values():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert e1 <= s2


@settings(max_examples=300, deadline=None)
@given(tokens=token_lists, gaz=gazetteers)
def test_greedy_maximal_munch(tokens, gaz):
    """No emitted span can be extended: at each match start, the
    longest phrase starting there is the one chosen."""
    if not gaz:
        return
    for lvl, typ, s, e, _ in tagcore.mentions_for_turn(tokens, tokens, gaz):
        for k in range(len(tokens) - s, e - s, -1):
            assert tuple(tokens[s : s + k]) not in gaz[typ]


@settings(max_examples=200, deadline=None)
@given(tokens=token_lists, gaz=gazetteers, max_seq_len=st.integers(8, 64))
def test_truncation_monotone(tokens, gaz, max_seq_len):
    """Shrinking the subword budget can only remove or shorten spans,
    never create new surface text, and all spans stay within the
    taggable prefix."""
    if not gaz:
        return
    _first, _nsub, n_tag = tagcore.encode_tokens(tokens, max_seq_len)
    small = tagcore.mentions_for_turn(tokens, tokens, gaz, max_seq_len=max_seq_len)
    for _lvl, _typ, s, e, _ in small:
        assert e <= n_tag


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=30))
def test_normalize_idempotent_and_shrinking(s):
    n = normalize_py(s)
    assert normalize_py(n) == n
    assert len(n) <= len(s)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet="ابتثجحخدذرزسشصضطظعغفقكلمنهوي", min_size=1, max_size=12), min_size=1, max_size=30))
def test_encode_tokens_partition(tokens):
    """first_subword indexes are strictly increasing and consistent
    with the per-token subword lengths."""
    first, n_sub, n_tag = tagcore.encode_tokens(tokens, max_seq_len=32)
    lens = tagcore.subword_lengths(tokens)
    assert (first[1:] - first[:-1] == lens[:-1]).all()
    assert 0 <= n_tag <= len(tokens)
    assert n_sub <= 30
