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


# ---------------------------------------------- r2 primitives (properties)

import numpy as np

from arabicner_spark.functions import bert_scorer


@settings(max_examples=200, deadline=None)
@given(
    lens=st.lists(st.integers(min_value=1, max_value=20), min_size=0, max_size=80),
    budget=st.integers(min_value=3, max_value=200),
)
def test_encode_from_lengths_invariants(lens, budget):
    arr = np.array(lens, dtype=np.int64)
    first, n_sub, n_tag = tagcore.encode_from_lengths(arr, max_seq_len=budget)
    assert 0 <= n_tag <= len(lens)
    assert 0 <= n_sub <= budget - 2
    # first-subword indices are the exclusive prefix sums: monotone,
    # and every taggable token's first subword fits the kept budget
    assert all(first[i] <= first[i + 1] for i in range(len(lens) - 1))
    assert all(first[i] < budget - 2 for i in range(n_tag))
    assert all(first[i] >= budget - 2 for i in range(n_tag, len(lens)))
    if len(lens):
        assert n_sub == min(int(arr.sum()), budget - 2)


@settings(max_examples=100, deadline=None)
@given(
    names=st.lists(
        st.integers(min_value=0, max_value=10**6).map(
            lambda n: f"checkpoint_{n}.pt"
        ),
        min_size=1,
        max_size=30,
    )
)
def test_natsorted_orders_by_epoch_number(names):
    got = bert_scorer.natsorted(names)
    nums = [int(n.split("_")[1].split(".")[0]) for n in got]
    assert nums == sorted(nums)


@settings(max_examples=50, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-10, max_value=10, allow_nan=False, allow_infinity=False
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=10,
    )
)
def test_sign_lsh_signature_determinism_and_shape(vecs):
    """The numpy band-signature math must equal a per-vector scalar
    reimplementation (the portability contract the SQL oracle relies
    on), for any float input."""
    import hashlib

    from arabicner_spark.functions.hashing import rademacher_matrix

    bits_per_band, n_bands = 3, 4
    H = bits_per_band * n_bands
    X = np.array(vecs, dtype=np.float64)

    Wm = rademacher_matrix(H, X.shape[1])
    Xi = np.floor(X * 1e6).astype(np.int64)
    S = (Xi @ Wm) >= 0
    for r in range(X.shape[0]):
        for j in range(H):
            acc = 0
            for i in range(X.shape[1]):
                h = hashlib.md5(f"{j}|{i}".encode()).hexdigest()
                w = 1 if int(h[0], 16) % 2 == 0 else -1
                acc += w * int(np.floor(X[r, i] * 1e6))
            assert (acc >= 0) == S[r, j]


@settings(max_examples=300, deadline=None)
@given(tokens=token_lists, gaz=gazetteers, budget=st.integers(min_value=3, max_value=60))
def test_truncation_is_prefix_clamp_of_unbounded_run(tokens, gaz, budget):
    """Reference truncation semantics (transforms.py:101-107 slices the
    tag lists): for ANY budget, the budgeted mention set equals the
    unbounded set with spans starting past the boundary dropped and
    straddling spans clamped to the kept prefix."""
    if not gaz:
        return
    _, _, n_tag = tagcore.encode_tokens(tokens, max_seq_len=budget)
    budgeted = tagcore.mentions_for_turn(tokens, tokens, gaz, max_seq_len=budget)
    unbounded = tagcore.mentions_for_turn(tokens, tokens, gaz, max_seq_len=10**6)
    expected = [
        (lvl, typ, s, min(e, n_tag), " ".join(tokens[s : min(e, n_tag)]))
        for (lvl, typ, s, e, _txt) in unbounded
        if s < n_tag
    ]
    assert sorted(budgeted) == sorted(expected)
    assert all(s < n_tag and e <= n_tag for (_l, _t, s, e, _x) in budgeted)
