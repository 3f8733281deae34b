"""Serial reference oracle: the pipeline re-implemented in plain
Python/numpy over in-memory lists, no Spark.

This is "the reference pipeline" that the distributed job is scored
against (triple P/R >= 0.95 per BASELINE.json): the real AraBERT
checkpoint is LFS-stubbed in the reference checkout
(/root/reference/B1/tag_vocab.pkl is an LFS pointer, *.pt absent), so
the deterministic gazetteer scorer in ``functions.tagcore`` stands in
for the model on BOTH sides, and the oracle exercises the exact decode /
truncation / alignment semantics cited there.

Kept intentionally boring: per-turn loops, sets, sorted lists.  Any
cleverness belongs in the Spark side; the oracle's job is to be
obviously correct.
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Set, Tuple

from arabicner_spark.functions import tagcore
from arabicner_spark.functions.normalize import normalize_py
from arabicner_spark.operators.triples import DEFAULT_PREDICATES, DEFAULT_WINDOW

Mention = Tuple[str, int, int, str, int, int, str]  # conv, turn, level, type, s, e, text
Triple = Tuple[str, str, str, str, int, str, str]


def oracle_mentions(
    rows: Iterable[Tuple],  # (conv_id, turn_idx, role, text, tool, ts) or prefix
    gazetteer: Dict[str, set],
    max_seq_len: int = tagcore.DEFAULT_MAX_SEQ_LEN,
) -> List[Mention]:
    gazetteer = tagcore.prepare(gazetteer)
    types = tagcore.gazetteer_types(gazetteer)
    out: List[Mention] = []
    for row in rows:
        conv_id, turn_idx, text = row[0], row[1], row[3] if len(row) > 3 else row[2]
        tokens = (text or "").split()
        norm = [normalize_py(t) for t in tokens]
        for lvl, typ, s, e, surface in tagcore.mentions_for_turn(
            tokens, norm, gazetteer, types, max_seq_len
        ):
            out.append((conv_id, turn_idx, lvl, typ, s, e, surface))
    return sorted(out)


def oracle_triples(
    mentions: Sequence[Mention],
    predicates: Sequence[Tuple[str, str, str]] = DEFAULT_PREDICATES,
    window: int = DEFAULT_WINDOW,
) -> List[Triple]:
    by_turn: Dict[Tuple[str, int], List[Mention]] = {}
    for m in mentions:
        by_turn.setdefault((m[0], m[1]), []).append(m)
    pred_map: Dict[Tuple[str, str], List[str]] = {}
    for st, p, ot in predicates:
        pred_map.setdefault((st, ot), []).append(p)
    out: Set[Triple] = set()
    for (conv, turn), ms in by_turn.items():
        for a in ms:
            for b in ms:
                if (a[2], a[4], a[5]) == (b[2], b[4], b[5]):
                    continue
                gap = max(b[4] - a[5], a[4] - b[5])
                if gap > window:
                    continue
                for p in pred_map.get((a[3], b[3]), ()):
                    out.add((a[6], p, b[6], conv, turn, a[3], b[3]))
    return sorted(out)


def oracle_link(
    mentions: Sequence[Mention],
    alias_rows: Sequence[Tuple[str, str, str, float]],
) -> Dict[str, str]:
    """normalized surface -> entity_id, best (weight desc, entity_id asc).

    Mirrors the Spark broadcast-join + row_number tie-break in
    operators/linking.py.
    """
    best: Dict[str, Tuple[float, str]] = {}
    alias_map: Dict[str, List[Tuple[float, str]]] = {}
    for alias, eid, _typ, w in alias_rows:
        alias_map.setdefault(alias, []).append((-w, eid))
    for cands in alias_map.values():
        cands.sort()
    out: Dict[str, str] = {}
    for m in mentions:
        surface = normalize_py(m[6])
        if surface in alias_map:
            out[surface] = alias_map[surface][0][1]
    return out


def precision_recall(
    got: Sequence[Tuple], want: Sequence[Tuple]
) -> Tuple[float, float]:
    """Set P/R, the BASELINE.json triple-match metric."""
    gs, ws = set(got), set(want)
    if not gs or not ws:
        return (1.0 if gs == ws else 0.0,) * 2
    tp = len(gs & ws)
    return tp / len(gs), tp / len(ws)
