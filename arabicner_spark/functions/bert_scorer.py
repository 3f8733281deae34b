"""Real-model scorer branch: transformers/torch-backed encode + score.

This is the production counterpart of tagcore's deterministic stand-in.
It reproduces the reference's checkpoint layout and load order exactly
(file:line cites into /root/reference):

* checkpoint directory layout — ``args.json`` + ``tag_vocab.pkl`` +
  ``checkpoints/checkpoint_{epoch}.pt``, latest selected by NATURAL
  sort: arabiner/utils/helpers.py:65-98 and
  arabiner/trainers/BaseTrainer.py:104-117 (natsort.natsorted, take
  last).  ``natsorted`` below is a dependency-free re-implementation
  (numeric-aware chunk sort) asserted against natsort's documented
  behavior in tests.
* per-token subword encoding with UNK fallback —
  ``tokenizer.encode(text)[1:-1] or encode("[UNK]")[1:-1]``:
  arabiner/data/transforms.py:30-33.  Alignment + truncation reuse
  tagcore.encode_from_lengths, the SAME math the stand-in uses, so the
  only difference between the branches is where subword lengths come
  from.
* BOTH model families the reference ships:
  - nested multi-head (BertNestedTagger, arabiner/nn/BertNestedTagger.py:
    14-33): one Linear(768, w_l) per entity type, logits stacked to
    B x T x L x C; decode maps each head's argmax id through ITS OWN
    per-type vocab order (BertNestedTrainer.to_segments :196-197);
  - flat single-head (BertSeqTagger, arabiner/nn/BertSeqTagger.py:11):
    one Linear(768, |flat tags|); decode = argmax(dim=2) through the
    flat tag vocab (BertTrainer.py:115,132 + to_segments :139-163).
* label-order faithfulness: the reference's Vocab is FIRST-APPEARANCE
  order with "O" appended last (arabiner/utils/data.py:14,89-91) — NOT
  guaranteed to be [B-X, I-X, O].  All head outputs are therefore
  REMAPPED from checkpoint vocab order into tagcore's fixed
  [B, I, O] axis before the shared decode (label ids absent from a
  head — e.g. a type that never saw an I- tag, head width 2 — score
  -inf so argmax can never pick them; the reference would IndexError
  on that impossible pick, see stack_nested_logits).

The forward's pad/head/stack math is TORCH-FREE numpy
(``stack_nested_logits`` / ``flat_to_nested_logits`` / ``pad_batch_ids``)
so it runs in CI without torch; torch is used only for the encoder
forward and the state-dict load.  Decode downstream is
tagcore.decode_turn, shared verbatim with the stand-in.

Executor lifecycle: the tokenizer+model pair is a lazy PER-PROCESS
singleton keyed by model_path (``_SCORERS``).  Ship the checkpoint
directory to executors via ``spark.sparkContext.addFile(..,
recursive=True)`` (or a shared filesystem) and pass the SparkFiles-
resolved path; weights are then loaded once per Python worker, never
per task and never through the task closure.

transformers/torch are OPTIONAL (absent in this sandbox): everything
importable here except the actual model load works without them, and
``HAS_TRANSFORMERS`` gates the rest.  The loader, natural sort, head
detection/assembly, label remap, forward assembly, and decode parity
are fully unit-tested with fake checkpoints; only the encoder's own
matmuls need the real libs.
"""

from __future__ import annotations

import glob
import json
import os
import pickle
import re
from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple

import numpy as np

from arabicner_spark.functions import tagcore

try:  # pragma: no cover - environment probe
    import torch  # noqa: F401
    import transformers  # noqa: F401

    HAS_TRANSFORMERS = True
except ImportError:
    HAS_TRANSFORMERS = False

_NAT_CHUNK = re.compile(r"(\d+)")

# score for label ids a head cannot express (absent from its vocab):
# low enough that argmax never picks them, finite so fp32 math stays
# NaN-free.
_NEG = np.float32(-1e30)


def natsorted(items: Sequence[str]) -> List[str]:
    """Natural (numeric-aware) sort: checkpoint_9 < checkpoint_10.

    Matches natsort.natsorted for the checkpoint-file shapes the
    reference feeds it (BaseTrainer.py:110) — digit runs compare as
    integers, everything else as strings.
    """

    def key(s: str):
        return [
            (1, int(c)) if c.isdigit() else (0, c)
            for c in _NAT_CHUNK.split(str(s))
        ]

    return sorted(items, key=key)


@dataclass
class CheckpointMeta:
    """What load_checkpoint needs before any tensor is touched."""

    model_path: str
    tag_vocab: object  # unpickled tag_vocab.pkl payload
    train_config: dict  # parsed args.json
    latest_checkpoint: str  # natsort-latest checkpoints/checkpoint_*.pt


def load_checkpoint_meta(model_path: str) -> CheckpointMeta:
    """Discover a reference-layout checkpoint directory.

    Mirrors arabiner/utils/helpers.py:65-98 (tag_vocab.pkl + args.json)
    and BaseTrainer.load (BaseTrainer.py:104-117: natsorted glob of
    checkpoints/checkpoint_*.pt, take LAST).  Raises FileNotFoundError
    with a precise message for each missing piece.
    """
    vocab_path = os.path.join(model_path, "tag_vocab.pkl")
    args_path = os.path.join(model_path, "args.json")
    if not os.path.exists(vocab_path):
        raise FileNotFoundError(f"no tag_vocab.pkl under {model_path}")
    if not os.path.exists(args_path):
        raise FileNotFoundError(f"no args.json under {model_path}")
    with open(vocab_path, "rb") as fh:
        tag_vocab = pickle.load(fh)
    with open(args_path) as fh:
        train_config = json.load(fh)
    ckpts = natsorted(glob.glob(os.path.join(model_path, "checkpoints", "checkpoint_*.pt")))
    if not ckpts:
        raise FileNotFoundError(f"no checkpoints/checkpoint_*.pt under {model_path}")
    return CheckpointMeta(model_path, tag_vocab, train_config, ckpts[-1])


def _vocab_tags(per_type) -> List[str]:
    """Tag strings of one Vocab-ish payload element (torchtext-style
    ``get_itos()``, plain ``.itos``, or a raw list)."""
    if hasattr(per_type, "get_itos"):
        return list(per_type.get_itos())
    if hasattr(per_type, "itos"):
        return list(per_type.itos)
    return list(per_type)


def types_from_tag_vocab(tag_vocab) -> List[str]:
    """Entity-type names (sorted level order) from a tag-vocab payload.

    The reference pickles ``vocab.tags`` — a list whose head is the flat
    tag vocab and whose tail is one per-type vocab in sorted type order
    (arabiner/utils/data.py:82-93).  Accepted payload shapes:

    * a plain list of type-name strings (our own checkpoints);
    * the reference family: a list whose tail elements each expose their
      tag strings via ``.itos`` (torchtext-style), ``.get_itos()``, or a
      plain list — the type name is recovered from the first ``B-X`` /
      ``I-X`` tag in each per-type vocab.
    """
    if all(isinstance(t, str) for t in tag_vocab):
        return sorted(tag_vocab)
    types: List[str] = []
    for per_type in list(tag_vocab)[1:]:
        tags = _vocab_tags(per_type)
        name = next(
            (t.split("-", 1)[1] for t in tags if "-" in t and t[0] in "BI"), None
        )
        if name is None:
            raise ValueError(f"per-type vocab carries no B-/I- tag: {tags!r}")
        types.append(name)
    return types


# --------------------------------------------------------- state-dict layer
# Pure functions over a loaded state dict — torch-free (values only need
# numpy conversion via np.asarray / .numpy()), unit-tested with fakes.


def strip_module_prefix(state: dict) -> dict:
    """Strip the DataParallel ``module.`` prefix — helpers.py:86-87 wraps
    every saved model in DataParallel, so shipped checkpoints carry it."""
    return {(k[7:] if k.startswith("module.") else k): v for k, v in state.items()}


def detect_head_kind(state: dict) -> str:
    """'nested' (BertNestedTagger: ``classifiers.{i}.*``) or 'flat'
    (BertSeqTagger: single ``linear.*`` head, BertSeqTagger.py:11)."""
    if "classifiers.0.weight" in state:
        return "nested"
    if "linear.weight" in state:
        return "flat"
    raise KeyError(
        "checkpoint has neither 'classifiers.0.weight' (BertNestedTagger) "
        "nor 'linear.weight' (BertSeqTagger) — unknown model family; keys "
        f"sample: {sorted(state)[:8]!r}"
    )


def _np(v) -> np.ndarray:
    arr = v.numpy() if hasattr(v, "numpy") else np.asarray(v)
    return arr.astype(np.float32, copy=False)


def encoder_state(state: dict) -> dict:
    """The ``bert.*``-prefixed sub-dict, keys stripped for an AutoModel
    load.  Raises if EMPTY — a checkpoint with unexpected key naming
    must fail loudly, not silently leave pretrained base weights in
    place (strict=False would otherwise mask it)."""
    enc = {k[len("bert."):]: v for k, v in state.items() if k.startswith("bert.")}
    if not enc:
        raise KeyError(
            "checkpoint carries no 'bert.*' encoder weights after prefix "
            "strip — wrong checkpoint layout or key naming; refusing to "
            "run with the pretrained base weights silently in place. Keys "
            f"sample: {sorted(state)[:8]!r}"
        )
    return enc


# encoder buffers/params legitimately absent from fine-tuned checkpoints
_LOAD_OK_MISSING = ("pooler.", "position_ids", "embeddings.position_ids")


def validate_encoder_load(missing: Sequence[str], unexpected: Sequence[str]):
    """Audit load_state_dict(strict=False)'s report.

    * unexpected keys = checkpoint weights the encoder did not consume —
      always an error (a silent mismatch means wrong predictions);
    * missing keys = encoder params the checkpoint did not provide —
      allowed only for the pooler / position-id buffers (untrained /
      non-persistent in HF BERT), anything else is an error.
    """
    if unexpected:
        raise KeyError(
            f"encoder did not consume {len(unexpected)} checkpoint keys "
            f"(sample: {list(unexpected)[:5]!r}) — checkpoint/model mismatch"
        )
    bad = [m for m in missing if not any(tok in m for tok in _LOAD_OK_MISSING)]
    if bad:
        raise KeyError(
            f"checkpoint is missing {len(bad)} encoder weights "
            f"(sample: {bad[:5]!r}) — refusing a partially-initialized encoder"
        )


def build_nested_heads(state: dict, n_types: int) -> List[Tuple[np.ndarray, np.ndarray]]:
    """One (W, b) numpy pair per type head (BertNestedTagger.py:14-20).
    Head widths may differ per type (num_labels = len(per-type vocab))."""
    heads = []
    for lvl in range(n_types):
        w = state.get(f"classifiers.{lvl}.weight")
        b = state.get(f"classifiers.{lvl}.bias")
        if w is None or b is None:
            raise KeyError(f"missing classifier head {lvl} in checkpoint")
        heads.append((_np(w), _np(b)))
    return heads


def build_flat_head(state: dict) -> Tuple[np.ndarray, np.ndarray]:
    """The single (W, b) of a BertSeqTagger checkpoint."""
    return _np(state["linear.weight"]), _np(state["linear.bias"])


# ------------------------------------------------------- label-order remap


def bio_perm(tags: Sequence[str], type_name: str) -> List[int]:
    """Column indices of [B-type, I-type, O] inside one head's vocab
    order; -1 where the head has no such label (e.g. a type that never
    saw a multi-token span has no I- tag — head width 2).

    The reference's per-type Vocab is first-appearance order with "O"
    appended last (arabiner/utils/data.py:89-91) — for a corpus with a
    stray I- before any B- that is [I-X, B-X, O], so assuming [B, I, O]
    would silently swap B and I.  This perm makes decode order-proof.
    """
    stoi = {t: i for i, t in enumerate(tags)}
    perm = [stoi.get(f"B-{type_name}", -1), stoi.get(f"I-{type_name}", -1), stoi.get("O", -1)]
    if perm[tagcore.O_ID] < 0:
        raise ValueError(f"per-type vocab for {type_name} lacks 'O': {list(tags)!r}")
    if perm[tagcore.B_ID] < 0:
        raise ValueError(f"per-type vocab for {type_name} lacks 'B-{type_name}': {list(tags)!r}")
    return perm


def label_perms(tag_vocab, types: Sequence[str]) -> List[List[int]]:
    """Per-level [B, I, O] column perms for a tag-vocab payload.

    Plain list-of-type-strings payloads (our own checkpoints) use the
    fixed [B-X, I-X, O] order by construction — identity perms.
    """
    if all(isinstance(t, str) for t in tag_vocab):
        return [[0, 1, 2] for _ in types]
    tails = list(tag_vocab)[1:]
    if len(tails) != len(types):
        raise ValueError(f"{len(tails)} per-type vocabs != {len(types)} types")
    return [bio_perm(_vocab_tags(v), t) for v, t in zip(tails, types)]


def flat_tag_maps(flat_tags: Sequence[str], types: Sequence[str]) -> Tuple[np.ndarray, np.ndarray]:
    """flat tag id -> (level, BIO label id) arrays for the flat family.

    ``flat_tags`` is vocab.tags[0]'s itos (first-appearance order, "O"
    somewhere in it — BertTrainer.to_segments :146 indexes it
    directly).  Tags whose type is unknown, and "O"/specials, map to
    level -1 (decoded as O everywhere).
    """
    lvl_of = {t: i for i, t in enumerate(types)}
    tag2lvl = np.full(len(flat_tags), -1, dtype=np.int64)
    tag2lab = np.full(len(flat_tags), tagcore.O_ID, dtype=np.int64)
    for i, tag in enumerate(flat_tags):
        if "-" in tag and tag[0] in "BI":
            kind, name = tag.split("-", 1)
            lvl = lvl_of.get(name, -1)
            if lvl >= 0:
                tag2lvl[i] = lvl
                tag2lab[i] = tagcore.B_ID if kind == "B" else tagcore.I_ID
    return tag2lvl, tag2lab


# ------------------------------------------------------- forward assembly
# Torch-free: the encoder's last_hidden_state arrives as a numpy array.


def pad_batch_ids(id_lists: Sequence[Sequence[int]], pad_id: int) -> Tuple[np.ndarray, np.ndarray]:
    """Dynamic padding to the batch max (the reference's collate,
    datasets.py:139-148): -> (ids, attention_mask), both (B, Tmax)."""
    Tmax = max((len(ids) for ids in id_lists), default=1)
    ids = np.full((len(id_lists), Tmax), pad_id, dtype=np.int64)
    mask = np.zeros((len(id_lists), Tmax), dtype=np.int64)
    for i, seq in enumerate(id_lists):
        ids[i, : len(seq)] = seq
        mask[i, : len(seq)] = 1
    return ids, mask


def stack_nested_logits(
    hidden: np.ndarray,
    heads: Sequence[Tuple[np.ndarray, np.ndarray]],
    perms: Sequence[Sequence[int]],
) -> np.ndarray:
    """(B, T, H) hidden -> (B, T, L, 3) logits in [B, I, O] axis order.

    Mirrors BertNestedTagger.forward (BertNestedTagger.py:27-33: per-type
    linears stacked on a new level axis) with the checkpoint-order ->
    [B, I, O] remap applied per head.  Where the reference pads narrow
    heads with ZERO columns for DataParallel (:24) — columns its decode
    could argmax into only by crashing (to_segments :196-197 would index
    past the head's vocab) — absent labels here score -1e30, so argmax
    provably never picks a label the head cannot express.
    """
    B, T, _ = hidden.shape
    out = np.full((B, T, len(heads), tagcore.N_LABELS), _NEG, dtype=np.float32)
    for lvl, ((w, b), perm) in enumerate(zip(heads, perms)):
        logits = hidden @ w.T + b  # (B, T, w_l)
        for lab, col in enumerate(perm):
            if col >= 0:
                out[:, :, lvl, lab] = logits[:, :, col]
    return out


def flat_to_nested_logits(
    flat_logits: np.ndarray, tag2lvl: np.ndarray, tag2lab: np.ndarray, n_types: int
) -> np.ndarray:
    """(B, T, C_flat) flat logits -> (B, T, L, 3) one-hot-ish scores
    whose argmax reproduces the flat decode exactly.

    The reference's flat decode is argmax over the flat tag vocab then
    tags_itos[id] (BertTrainer.py:115,132 + to_segments :146) — one tag
    per token.  Projecting that single tag onto the per-type level axis
    (its own level gets B/I, every other level O) lets the nested decode
    path (tagcore.decode_turn) serve both families unchanged.
    """
    pred = np.argmax(flat_logits, axis=-1)  # (B, T) flat tag ids
    B, T = pred.shape
    out = np.zeros((B, T, n_types, tagcore.N_LABELS), dtype=np.float32)
    out[:, :, :, tagcore.O_ID] = 1.0
    lvl = tag2lvl[pred]  # (B, T), -1 for O/unknown
    lab = tag2lab[pred]
    bi, ti = np.nonzero(lvl >= 0)
    out[bi, ti, lvl[bi, ti], lab[bi, ti]] = 2.0
    out[bi, ti, lvl[bi, ti], tagcore.O_ID] = 0.0
    return out


class BertTurnScorer:
    """Lazy per-process transformers scorer bound to one checkpoint dir.

    Handles BOTH reference model families (auto-detected from the state
    dict): nested multi-head and flat single-head.  ``encode`` and
    ``score`` plug straight into
    operators.ner.make_score_batches(encoder=..., score_fn=...) — the
    output is always (T, L, 3) in [B, I, O] axis order, so the shared
    decode never knows which family scored.
    """

    def __init__(self, model_path: str, device: str = "cpu", memo_cap: int = tagcore.MEMO_CAP):
        if not HAS_TRANSFORMERS:
            raise RuntimeError(
                "transformers/torch not installed — the real-model branch "
                "needs them; the deterministic gazetteer scorer (tagcore) "
                "is the fallback"
            )
        import torch
        from transformers import AutoModel, AutoTokenizer

        meta = load_checkpoint_meta(model_path)
        self.meta = meta
        self.types = types_from_tag_vocab(meta.tag_vocab)
        bert_name = meta.train_config.get("network_config", {}).get(
            "kwargs", {}
        ).get("bert_model") or meta.train_config.get("bert_model")
        self.tokenizer = AutoTokenizer.from_pretrained(bert_name)
        self.encoder_core = AutoModel.from_pretrained(bert_name)
        self.device = torch.device(device)
        state = strip_module_prefix(
            torch.load(meta.latest_checkpoint, map_location="cpu", weights_only=False)["model"]
        )
        self.head_kind = detect_head_kind(state)
        if self.head_kind == "nested":
            self.heads = build_nested_heads(state, len(self.types))
            self.perms = label_perms(meta.tag_vocab, self.types)
        else:
            self.flat_head = build_flat_head(state)
            self.flat_tags = _vocab_tags(list(meta.tag_vocab)[0])
            self.tag2lvl, self.tag2lab = flat_tag_maps(self.flat_tags, self.types)
        enc_state = encoder_state(state)
        report = self.encoder_core.load_state_dict(
            {k: torch.as_tensor(v) for k, v in enc_state.items()}, strict=False
        )
        validate_encoder_load(report.missing_keys, report.unexpected_keys)
        self.encoder_core.to(self.device).eval()
        self._subword_memo = tagcore.BoundedMemo(memo_cap)
        unk = self.tokenizer.encode("[UNK]")[1:-1]
        self._unk_ids = unk or [self.tokenizer.unk_token_id]

    def _token_ids(self, token: str) -> List[int]:
        """Per-token WordPiece ids, UNK fallback, memoized (bounded —
        an open vocabulary must not grow the memo forever).

        Exactly transforms.py:30-33: ``encode(text)[1:-1] or
        encode("[UNK]")[1:-1]``.
        """
        ids = self._subword_memo.get(token)
        if ids is None:
            ids = self._subword_memo.put(
                token, self.tokenizer.encode(token)[1:-1] or self._unk_ids
            )
        return ids

    def encode(self, tokens: Sequence[str], max_seq_len: int):
        """-> (first_subword_idx, n_subwords, n_taggable, input_ids).

        Alignment/truncation = tagcore.encode_from_lengths (shared with
        the stand-in); input_ids are CLS + kept subwords + SEP
        (transforms.py:36-45).
        """
        per_tok = [self._token_ids(t) for t in tokens]
        lens = np.fromiter((len(p) for p in per_tok), dtype=np.int64, count=len(per_tok))
        first_idx, n_subwords, n_taggable = tagcore.encode_from_lengths(
            lens, max_seq_len
        )
        flat: List[int] = []
        for p in per_tok:
            if len(flat) >= n_subwords:
                break
            flat.extend(p)
        input_ids = (
            [self.tokenizer.cls_token_id]
            + flat[:n_subwords]
            + [self.tokenizer.sep_token_id]
        )
        return first_idx, n_subwords, n_taggable, input_ids

    def score(self, norm_tokens, gaz=None, types=None, max_seq_len=512, enc=None):
        """(T, L, 3) logits for one turn — make_score_batches signature.

        ``gaz`` is ignored (the model IS the scorer); ``enc`` must come
        from self.encode.
        """
        if enc is None or len(enc) < 4:
            enc = self.encode(norm_tokens, max_seq_len)
        return self.score_batch([norm_tokens], max_seq_len=max_seq_len, encs=[enc])[0]

    def _encoder_hidden(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        """One torch forward -> numpy (B, Tmax, H).  The ONLY torch use
        on the scoring path; everything around it is shared numpy."""
        import torch

        with torch.inference_mode():
            hidden = self.encoder_core(
                torch.from_numpy(ids).to(self.device),
                attention_mask=torch.from_numpy(mask).to(self.device),
            ).last_hidden_state
        return hidden.cpu().numpy().astype(np.float32, copy=False)

    def score_batch(self, turns, gaz=None, types=None, max_seq_len=512, encs=None):
        """Batched forward: pad input_ids to the batch max (dynamic
        padding, the reference's collate — datasets.py:139-148), one
        encoder pass, head application + [B, I, O] assembly in shared
        numpy, then slice each turn back to its own length.
        -> list of (T_i, L, 3) float32."""
        if encs is None:
            encs = [self.encode(ts, max_seq_len) for ts in turns]
        id_lists = [e[3] for e in encs]
        ids, mask = pad_batch_ids(id_lists, self.tokenizer.pad_token_id or 0)
        hidden = self._encoder_hidden(ids, mask)
        if self.head_kind == "nested":
            logits = stack_nested_logits(hidden, self.heads, self.perms)
        else:
            flat = hidden @ self.flat_head[0].T + self.flat_head[1]
            logits = flat_to_nested_logits(
                flat, self.tag2lvl, self.tag2lab, len(self.types)
            )
        return [logits[i, : len(seq)] for i, seq in enumerate(id_lists)]


_SCORERS: Dict[str, BertTurnScorer] = {}


def get_scorer(model_path: str) -> BertTurnScorer:
    """Per-process singleton — executors load weights once, not per task."""
    sc = _SCORERS.get(model_path)
    if sc is None:
        sc = _SCORERS[model_path] = BertTurnScorer(model_path)
    return sc


def attach(model_path: str):
    """(encoder, score_fn) pair for ner.extract_mentions.

    Both are thin pickleable shims around the lazy singleton: the task
    closure carries only the path string, never the weights.  The
    score_fn is marked ``batched`` so make_score_batches runs ONE
    forward per collate chunk (the reference's batch path) instead of a
    per-turn forward.

        enc, fn = bert_scorer.attach(SparkFiles.get("ckpt_dir"))
        ner.extract_mentions(df, gaz, encoder=enc, score_fn=fn)
    """

    def encoder(tokens, max_seq_len):
        return get_scorer(model_path).encode(tokens, max_seq_len)

    def score_fn(turns, gaz, types, max_seq_len, encs=None):
        return get_scorer(model_path).score_batch(
            turns, gaz, types, max_seq_len, encs=encs
        )

    score_fn.batched = True
    return encoder, score_fn
