"""Property tests for the r4 text operators: the subword-count
expression path must equal the tagcore numpy path for ANY text (both
Spark-executed), and scrub_pii must be idempotent and length-sane for
any input drawn from a PII-shaped alphabet."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arabicner_spark.functions import tagcore
from arabicner_spark.functions.pii import PII_CLASSES, scrub_pii
from arabicner_spark.operators.tokencount import subword_counts, subword_counts_expr

# word shapes that stress the chunker: empty (double spaces), 1-char,
# exactly SUBWORD_CHARS, one over, and long
words = st.sampled_from(["", "a", "abcd", "abcde", "abcdefghijklmnop", "x" * 41])
texts = st.lists(words, min_size=1, max_size=30).map(" ".join)


@settings(
    max_examples=12, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(batch=st.lists(texts, min_size=1, max_size=8))
def test_subword_expr_equals_tagcore_any_text(spark, batch):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "doc_id bigint, text string"
    )
    a = {
        r.doc_id: (r.n_tokens, r.n_subwords, r.n_kept, r.n_taggable)
        for r in subword_counts_expr(df, max_seq_len=16).collect()
    }
    b = {
        r.doc_id: (r.n_tokens, r.n_subwords, r.n_kept, r.n_taggable)
        for r in subword_counts(df, max_seq_len=16).collect()
    }
    assert a == b
    for i, t in enumerate(batch):
        toks = t.split(" ")
        sl = tagcore.subword_lengths(toks)
        _, n_kept, n_tag = tagcore.encode_from_lengths(sl, 16)
        assert a[i] == (len(toks), int(sl.sum()), n_kept, n_tag)


pii_atoms = st.sampled_from(
    [
        "word",
        "a@b.co",
        "x1y",
        "42",
        "7",
        "10.0.0.1",
        "+1-555-0000",
        "bob42@ex.com",
        "999999",
        ".",
        "-",
    ]
)
pii_texts = st.lists(pii_atoms, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=10, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(batch=st.lists(pii_texts, min_size=1, max_size=6))
def test_pii_scrub_idempotent_and_complete(spark, batch):
    """Scrubbing twice changes nothing (replacement tokens contain no
    PII), and a scrubbed text re-scanned by every class pattern yields
    zero matches."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(batch)], "id int, text string"
    )
    once = scrub_pii(df, "text").select(
        "id", "scrubbed", "n_email", "n_ip", "n_phone", "n_num"
    )
    twice = scrub_pii(
        once.withColumnRenamed("scrubbed", "text").select("id", "text"), "text"
    )
    got1 = {r.id: r.scrubbed for r in once.collect()}
    rows2 = {r.id: r for r in twice.collect()}
    for i in got1:
        assert rows2[i].scrubbed == got1[i]
        assert (
            rows2[i].n_email,
            rows2[i].n_ip,
            rows2[i].n_phone,
            rows2[i].n_num,
        ) == (0, 0, 0, 0), got1[i]
    assert len(PII_CLASSES) == 4
