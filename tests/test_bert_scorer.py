"""Real-model scorer branch: checkpoint discovery, natural sort,
vocab->types recovery, and decode parity through the injection points.

The transformers/torch libs are absent in this sandbox, so the actual
weight load is skip-marked; everything up to it (the loader semantics
that mirror arabiner/utils/helpers.py:65-98 + BaseTrainer.py:104-117)
and the shared decode path are exercised with fake checkpoints and a
fake model-shaped scorer.
"""

import json
import pickle
from datetime import datetime, timezone

import numpy as np
import pytest

from arabicner_spark import schemas
from arabicner_spark.functions import bert_scorer, tagcore
from arabicner_spark.operators import ner

# ------------------------------------------------------------- natural sort


def test_natsorted_numeric_chunks():
    files = [
        "checkpoint_10.pt",
        "checkpoint_9.pt",
        "checkpoint_1.pt",
        "checkpoint_2.pt",
    ]
    assert bert_scorer.natsorted(files) == [
        "checkpoint_1.pt",
        "checkpoint_2.pt",
        "checkpoint_9.pt",
        "checkpoint_10.pt",
    ]
    # lexicographic sort would put 10 before 9 — the exact bug natural
    # sort exists to avoid (BaseTrainer.py:110 takes the LAST element)
    assert sorted(files)[-1] == "checkpoint_9.pt"


# ------------------------------------------------------- checkpoint layout


@pytest.fixture()
def fake_checkpoint(tmp_path):
    ckpt = tmp_path / "model"
    (ckpt / "checkpoints").mkdir(parents=True)
    tag_vocab = [
        ["O", "B-ORG", "I-ORG", "B-PERS", "I-PERS"],  # flat vocab head
        ["B-ORG", "I-ORG", "O"],  # per-type vocabs, sorted type order
        ["B-PERS", "I-PERS", "O"],
    ]
    with open(ckpt / "tag_vocab.pkl", "wb") as fh:
        pickle.dump(tag_vocab, fh)
    with open(ckpt / "args.json", "w") as fh:
        json.dump(
            {
                "network_config": {
                    "fn": "arabiner.nn.BertNestedTagger",
                    "kwargs": {"bert_model": "aubmindlab/bert-base-arabertv2"},
                },
                "batch_size": 8,
            },
            fh,
        )
    for epoch in (1, 2, 9, 10):
        (ckpt / "checkpoints" / f"checkpoint_{epoch}.pt").touch()
    return str(ckpt)


def test_load_checkpoint_meta_picks_natsort_latest(fake_checkpoint):
    meta = bert_scorer.load_checkpoint_meta(fake_checkpoint)
    assert meta.latest_checkpoint.endswith("checkpoint_10.pt")
    assert meta.train_config["batch_size"] == 8
    assert bert_scorer.types_from_tag_vocab(meta.tag_vocab) == ["ORG", "PERS"]


def test_load_checkpoint_meta_missing_pieces(tmp_path):
    with pytest.raises(FileNotFoundError, match="tag_vocab"):
        bert_scorer.load_checkpoint_meta(str(tmp_path))
    with open(tmp_path / "tag_vocab.pkl", "wb") as fh:
        pickle.dump(["ORG"], fh)
    with pytest.raises(FileNotFoundError, match="args.json"):
        bert_scorer.load_checkpoint_meta(str(tmp_path))
    (tmp_path / "args.json").write_text("{}")
    with pytest.raises(FileNotFoundError, match="checkpoint_"):
        bert_scorer.load_checkpoint_meta(str(tmp_path))


def test_types_from_tag_vocab_shapes():
    assert bert_scorer.types_from_tag_vocab(["PERS", "ORG"]) == ["ORG", "PERS"]

    class FakeVocab:
        def __init__(self, tags):
            self._tags = tags

        def get_itos(self):
            return self._tags

    payload = [FakeVocab(["O", "B-GPE"]), FakeVocab(["B-GPE", "I-GPE", "O"])]
    assert bert_scorer.types_from_tag_vocab(payload) == ["GPE"]


def test_scorer_requires_transformers(fake_checkpoint):
    if bert_scorer.HAS_TRANSFORMERS:
        pytest.skip("transformers installed — covered by the real-load test")
    with pytest.raises(RuntimeError, match="transformers"):
        bert_scorer.BertTurnScorer(fake_checkpoint)


@pytest.mark.skipif(
    not bert_scorer.HAS_TRANSFORMERS, reason="transformers/torch not installed"
)
def test_real_model_load(fake_checkpoint):  # pragma: no cover - env-gated
    # a real environment additionally needs genuine weights; this
    # asserts the load path raises cleanly on the empty fixture .pt
    with pytest.raises(Exception):
        bert_scorer.BertTurnScorer(fake_checkpoint)


# --------------------------------------------- decode parity via injection


def _transcript_df(spark, texts):
    rows = [
        ("c0", i, "user", t, None, datetime(2026, 1, 1, tzinfo=timezone.utc))
        for i, t in enumerate(texts)
    ]
    return spark.createDataFrame(rows, schemas.TRANSCRIPTS)


GAZ = {
    "ENGINE": {("spark",)},
    "OPER": {("hash", "join"), ("table", "scan")},
}

TEXTS = [
    "spark runs a hash join over the table scan",
    "nothing to see here",
    "spark spark hash join",
]


def test_model_shaped_scorer_decodes_identically(spark):
    """A 'real-model-shaped' scorer (continuous logits, 4-tuple enc) must
    decode byte-identically to the stand-in when its argmax agrees —
    decode is shared, so only argmax matters."""

    def encoder(tokens, max_seq_len):
        first_idx, n_sub, n_tag = tagcore.encode_tokens(tokens, max_seq_len)
        fake_input_ids = [101] + [0] * n_sub + [102]
        return first_idx, n_sub, n_tag, fake_input_ids

    def score_fn(norm_tokens, gaz, types, max_seq_len, enc=None):
        base = tagcore.score_turn(norm_tokens, gaz, types, max_seq_len, enc=enc[:3])
        # continuous, model-ish values with the same argmax
        return base * 3.7 + 0.123

    df = _transcript_df(spark, TEXTS)
    got = sorted(
        map(tuple, ner.extract_mentions(df, GAZ, encoder=encoder, score_fn=score_fn).collect())
    )
    want = sorted(map(tuple, ner.extract_mentions(df, GAZ).collect()))
    assert got == want
    assert len(want) > 0


def test_batched_scorer_path_decodes_identically(spark):
    """A score_fn marked ``batched`` is called once per collate chunk
    with the turn list (the reference's batch-forward shape) — padding
    to the chunk max then slicing back must decode identically."""
    calls = []

    def score_fn(turns, gaz, types, max_seq_len, encs=None):
        calls.append(len(turns))
        per_turn = [
            tagcore.score_turn(n, gaz, types, max_seq_len, enc=e[:3])
            for n, e in zip(turns, encs)
        ]
        # pad to chunk max like a real batched forward, slice back
        tmax = max(lg.shape[0] for lg in per_turn)
        out = []
        for lg in per_turn:
            pad = np.zeros((tmax, lg.shape[1], lg.shape[2]), np.float32)
            pad[: lg.shape[0]] = lg * 2.5 + 0.01
            out.append(pad[: lg.shape[0]])
        return out

    score_fn.batched = True
    df = _transcript_df(spark, TEXTS)
    got = sorted(map(tuple, ner.extract_mentions(df, GAZ, score_fn=score_fn).collect()))
    want = sorted(map(tuple, ner.extract_mentions(df, GAZ).collect()))
    assert got == want and len(want) > 0


def test_streaming_and_batch_share_one_loop(spark, tmp_path):
    """streaming_mentions reuses make_score_batches — same mentions, plus
    the ts passthrough column."""
    from arabicner_spark.streaming import ingest

    df = _transcript_df(spark, TEXTS)
    src = str(tmp_path / "stream_src")
    df.write.parquet(src)
    out = (
        ingest.streaming_mentions(ingest.stream_transcripts(spark, src), GAZ)
        .writeStream.format("memory")
        .queryName("t_stream_mentions")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)
    got = spark.sql(
        "SELECT conv_id, turn_idx, level, type, start_tok, end_tok, text "
        "FROM t_stream_mentions"
    ).collect()
    want = ner.extract_mentions(df, GAZ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    ts = spark.sql("SELECT ts FROM t_stream_mentions").first().ts
    assert ts is not None


# ------------------------------------------- state-dict layer (torch-free)


def test_strip_module_prefix_and_detect_kind():
    state = {
        "module.bert.embeddings.weight": np.zeros(2),
        "module.classifiers.0.weight": np.zeros((3, 4)),
    }
    stripped = bert_scorer.strip_module_prefix(state)
    assert set(stripped) == {"bert.embeddings.weight", "classifiers.0.weight"}
    assert bert_scorer.detect_head_kind(stripped) == "nested"
    assert bert_scorer.detect_head_kind({"linear.weight": 0, "bert.x": 0}) == "flat"
    with pytest.raises(KeyError, match="unknown model family"):
        bert_scorer.detect_head_kind({"bert.x": 0})


def test_encoder_state_raises_on_empty():
    """ADVICE r2 (medium): a checkpoint with no consumable bert.* keys
    must fail loudly — strict=False would silently keep the pretrained
    base weights and predict garbage."""
    with pytest.raises(KeyError, match="no 'bert\\.\\*' encoder weights"):
        bert_scorer.encoder_state({"model.enc.weight": np.zeros(2)})
    enc = bert_scorer.encoder_state({"bert.layer.0.w": np.zeros(2), "linear.weight": 0})
    assert set(enc) == {"layer.0.w"}


def test_validate_encoder_load():
    bert_scorer.validate_encoder_load([], [])
    # pooler / position_ids are legitimately absent from fine-tunes
    bert_scorer.validate_encoder_load(
        ["pooler.dense.weight", "embeddings.position_ids"], []
    )
    with pytest.raises(KeyError, match="did not consume"):
        bert_scorer.validate_encoder_load([], ["stray.weight"])
    with pytest.raises(KeyError, match="missing"):
        bert_scorer.validate_encoder_load(["encoder.layer.0.attention.self.query.weight"], [])


def test_build_heads_nested_and_flat():
    state = {
        "classifiers.0.weight": np.ones((3, 4)),
        "classifiers.0.bias": np.zeros(3),
        "classifiers.1.weight": np.ones((2, 4)),  # width-2 head (no I- seen)
        "classifiers.1.bias": np.zeros(2),
    }
    heads = bert_scorer.build_nested_heads(state, 2)
    assert [h[0].shape for h in heads] == [(3, 4), (2, 4)]
    assert all(h[0].dtype == np.float32 for h in heads)
    with pytest.raises(KeyError, match="head 2"):
        bert_scorer.build_nested_heads(state, 3)
    w, b = bert_scorer.build_flat_head({"linear.weight": np.ones((5, 4)), "linear.bias": np.zeros(5)})
    assert w.shape == (5, 4) and b.shape == (5,)


# --------------------------------------------------- label-order remap


def test_bio_perm_first_appearance_order():
    """ADVICE r2: the reference Vocab is first-appearance order with O
    appended last — a stray I- before any B- yields [I-X, B-X, O], which
    a fixed [B, I, O] assumption would silently swap."""
    assert bert_scorer.bio_perm(["B-ORG", "I-ORG", "O"], "ORG") == [0, 1, 2]
    assert bert_scorer.bio_perm(["I-ORG", "B-ORG", "O"], "ORG") == [1, 0, 2]
    # width-2 head: type never saw an I- tag
    assert bert_scorer.bio_perm(["B-GPE", "O"], "GPE") == [0, -1, 1]
    with pytest.raises(ValueError, match="lacks 'O'"):
        bert_scorer.bio_perm(["B-ORG", "I-ORG"], "ORG")
    with pytest.raises(ValueError, match="lacks 'B-ORG'"):
        bert_scorer.bio_perm(["I-ORG", "O"], "ORG")


def test_label_perms_payload_shapes():
    # plain type-string payload (our checkpoints): identity perms
    assert bert_scorer.label_perms(["ORG", "PERS"], ["ORG", "PERS"]) == [
        [0, 1, 2],
        [0, 1, 2],
    ]
    payload = [
        ["O", "B-ORG", "I-ORG", "B-PERS"],  # flat head (ignored)
        ["I-ORG", "B-ORG", "O"],
        ["B-PERS", "O"],
    ]
    assert bert_scorer.label_perms(payload, ["ORG", "PERS"]) == [
        [1, 0, 2],
        [0, -1, 1],
    ]
    with pytest.raises(ValueError, match="per-type vocabs"):
        bert_scorer.label_perms(payload, ["ORG"])


def test_flat_tag_maps():
    tags = ["O", "B-ORG", "I-ORG", "B-PERS", "<pad>"]
    t2l, t2b = bert_scorer.flat_tag_maps(tags, ["ORG", "PERS"])
    assert t2l.tolist() == [-1, 0, 0, 1, -1]
    assert t2b.tolist() == [tagcore.O_ID, tagcore.B_ID, tagcore.I_ID, tagcore.B_ID, tagcore.O_ID]


# ------------------------------------------- numpy twin of the forward


def test_stack_nested_logits_remaps_and_decodes():
    """The head-application + B x T x L x C assembly of score_batch
    (previously only runnable behind the torch skip) — exercised in
    numpy: a hand-built hidden state + heads whose vocab order is NOT
    [B, I, O] must still decode to the right spans."""
    H = 8
    # hidden: (B=1, T=5) CLS + 3 subwords + SEP, one-hot per position so
    # each head weight column addresses exactly one row
    hidden = np.zeros((1, 5, H), np.float32)
    for t in range(5):
        hidden[0, t, t] = 1.0
    # Head 0 (ORG), vocab order [I-ORG, B-ORG, O] -> perm [1, 0, 2].
    # Want tokens 0..1 (subword rows 1..2) tagged B-ORG, I-ORG.
    w0 = np.zeros((3, H), np.float32)
    b0 = np.array([0.0, 0.0, 1.0], np.float32)  # O (col 2) wins by default
    # col 1 is B-ORG, col 0 is I-ORG in checkpoint order:
    w0[1, 1] = 2.0  # B-ORG fires on row 1
    w0[0, 2] = 2.0  # I-ORG fires on row 2
    # Head 1 (PERS), width 2, order [B-PERS, O] -> perm [0, -1, 1]; all O.
    w1 = np.zeros((2, H), np.float32)
    b1 = np.array([0.0, 1.0], np.float32)
    logits = bert_scorer.stack_nested_logits(
        hidden, [(w0, b0), (w1, b1)], [[1, 0, 2], [0, -1, 1]]
    )
    assert logits.shape == (1, 5, 2, 3)
    # absent I-PERS can never win argmax
    assert (logits[:, :, 1, tagcore.I_ID] < -1e29).all()
    first_idx = np.array([0, 1, 2])
    spans = tagcore.decode_turn(logits[0], first_idx, 3, ["ORG", "PERS"])
    assert spans == [(0, "ORG", 0, 2)]


def test_flat_to_nested_logits_decodes_like_flat_argmax():
    """Flat decode parity vs a hand-built expectation: argmax over the
    flat vocab (BertTrainer.py:115 + to_segments :146), projected onto
    the level axis, must decode to the same spans."""
    flat_tags = ["O", "B-ORG", "I-ORG", "B-PERS"]
    t2l, t2b = bert_scorer.flat_tag_maps(flat_tags, ["ORG", "PERS"])
    # (B=1, T=6): CLS + 4 subwords + SEP; tokens: B-ORG I-ORG O B-PERS
    flat = np.zeros((1, 6, 4), np.float32)
    flat[0, :, 0] = 1.0  # O baseline
    flat[0, 1, 1] = 5.0  # B-ORG
    flat[0, 2, 2] = 5.0  # I-ORG
    flat[0, 4, 3] = 5.0  # B-PERS
    logits = bert_scorer.flat_to_nested_logits(flat, t2l, t2b, 2)
    assert logits.shape == (1, 6, 2, 3)
    first_idx = np.array([0, 1, 2, 3])
    spans = sorted(tagcore.decode_turn(logits[0], first_idx, 4, ["ORG", "PERS"]))
    assert spans == [(0, "ORG", 0, 2), (1, "PERS", 3, 4)]


def test_flat_family_through_ner_stage(spark):
    """A fake flat-tagger scorer (the REAL flat math: flat logits ->
    flat_to_nested_logits -> shared decode) run through the full Spark
    NER stage must reproduce the stand-in's mentions."""
    flat_tags = ["O"] + [
        f"{k}-{t}" for t in sorted(GAZ) for k in ("B", "I")
    ]
    types = sorted(GAZ)
    t2l, t2b = bert_scorer.flat_tag_maps(flat_tags, types)
    stoi = {t: i for i, t in enumerate(flat_tags)}

    def encoder(tokens, max_seq_len):
        first_idx, n_sub, n_tag = tagcore.encode_tokens(tokens, max_seq_len)
        return first_idx, n_sub, n_tag, [101] + [0] * n_sub + [102]

    def score_fn(turns, gaz, typs, max_seq_len, encs=None):
        # emulate BertSeqTagger: per-subword flat logits whose argmax is
        # the stand-in's tag sequence, then the REAL flat projection
        out = []
        for norm, e in zip(turns, encs):
            base = tagcore.score_turn(norm, gaz, typs, max_seq_len, enc=e[:3])
            ids = np.argmax(base, axis=-1)  # (T, L)
            flat = np.zeros((1, base.shape[0], len(flat_tags)), np.float32)
            flat[0, :, stoi["O"]] = 1.0
            for pos in range(base.shape[0]):
                for lvl in range(ids.shape[1]):
                    if ids[pos, lvl] == tagcore.B_ID:
                        flat[0, pos, stoi[f"B-{typs[lvl]}"]] = 5.0
                    elif ids[pos, lvl] == tagcore.I_ID:
                        flat[0, pos, stoi[f"I-{typs[lvl]}"]] = 5.0
            nested = bert_scorer.flat_to_nested_logits(flat, t2l, t2b, len(typs))
            out.append(nested[0])
        return out

    score_fn.batched = True
    df = _transcript_df(spark, TEXTS)
    got = sorted(map(tuple, ner.extract_mentions(df, GAZ, encoder=encoder, score_fn=score_fn).collect()))
    want = sorted(map(tuple, ner.extract_mentions(df, GAZ).collect()))
    # the flat family can express at most ONE tag per token (a nested
    # overlap collapses to the argmax winner); on these texts the
    # stand-in produces no cross-level overlap, so the sets are equal
    assert got == want and len(want) > 0


def test_pad_batch_ids_shapes():
    ids, mask = bert_scorer.pad_batch_ids([[1, 2, 3], [4]], pad_id=9)
    assert ids.tolist() == [[1, 2, 3], [4, 9, 9]]
    assert mask.tolist() == [[1, 1, 1], [1, 0, 0]]


# ------------------------------------------------------- bounded memos


def test_bounded_memo_cap_triggers_and_results_unchanged():
    memo = tagcore.BoundedMemo(cap=3)
    for i in range(10):
        memo.put(i, i * 2)
    assert memo.resets > 0 and len(memo) <= 3
    # a re-query after a reset recomputes, never returns a wrong value
    assert memo.get(9) == 18 or memo.get(9) is None


def test_ner_norm_cache_cap_does_not_change_output(spark, monkeypatch):
    df = _transcript_df(spark, TEXTS)
    want = sorted(map(tuple, ner.extract_mentions(df, GAZ).collect()))
    monkeypatch.setattr(tagcore, "MEMO_CAP", 2)
    got = sorted(map(tuple, ner.extract_mentions(df, GAZ).collect()))
    assert got == want and len(want) > 0


def test_tag_text_model_path_requires_transformers(spark, fake_checkpoint):
    """The reference-parity --model_path CLI flag routes to the real
    branch; without transformers installed it must fail loudly, not
    silently fall back to the stand-in."""
    from arabicner_spark.plans.infer import tag_text

    if bert_scorer.HAS_TRANSFORMERS:
        pytest.skip("transformers installed — real path covered elsewhere")
    with pytest.raises(RuntimeError, match="transformers"):
        tag_text(spark, "spark runs", {"E": {("spark",)}}, model_path=fake_checkpoint)
