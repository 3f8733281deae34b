"""operators/fusion: fact-fusion winner/evidence vs a hand-computed
fixture (including ties), and negative-sampling guarantees — every
emitted negative is certifiably false, draws are deterministic, and
the entity index is dense over the src ∪ dst vocabulary."""

import hashlib

from pyspark.sql import functions as F

from arabicner_spark.operators.fusion import (
    entity_index,
    fuse_facts,
    negative_samples,
)


def _edges(spark):
    rows = (
        [("a", "likes", "x")] * 3
        + [("a", "likes", "y")] * 2
        + [("a", "knows", "x")] * 1
        + [("b", "likes", "y")] * 2
        + [("b", "likes", "x")] * 2  # tie on support: winner = smaller dst
    )
    return spark.createDataFrame(rows, "src string, pred string, dst string")


def test_fuse_facts_winner_and_evidence(spark):
    got = {
        (r["src"], r["pred"]): (
            r["dst"], r["support"], r["total"], r["share"], r["n_alternatives"]
        )
        for r in fuse_facts(_edges(spark)).collect()
    }
    assert got[("a", "likes")] == ("x", 3, 5, 0.6, 2)
    assert got[("a", "knows")] == ("x", 1, 1, 1.0, 1)
    # tie 2-2 resolves to the lexicographically smaller object
    assert got[("b", "likes")] == ("x", 2, 4, 0.5, 2)


def test_entity_index_dense_and_sorted(spark):
    idx = {r["entity"]: r["idx"] for r in entity_index(_edges(spark)).collect()}
    ents = sorted(idx)
    assert ents == ["a", "b", "x", "y"]
    assert [idx[e] for e in ents] == [0, 1, 2, 3]


def test_negative_samples_filtered_and_deterministic(spark):
    e = _edges(spark)
    pos = {(r["src"], r["pred"], r["dst"]) for r in e.distinct().collect()}
    out = negative_samples(e, k=2).collect()
    # every emitted negative is NOT a positive (filtered guarantee)
    for r in out:
        assert (r["src"], r["pred"], r["neg_dst"]) not in pos
    # the draw mirrors the md5 convention exactly
    ents = sorted({s for s, _p, _d in pos} | {d for _s, _p, d in pos})
    expect = set()
    for s, p, d in pos:
        for j in (1, 2):
            h = int(hashlib.md5(f"{j}|{s}|{p}|{d}".encode()).hexdigest()[:8], 16)
            nd = ents[h % len(ents)]
            if (s, p, nd) not in pos:
                expect.add((s, p, d, j, nd))
    got = {(r["src"], r["pred"], r["dst"], r["j"], r["neg_dst"]) for r in out}
    assert got == expect
    # deterministic across partitionings
    got2 = {
        (r["src"], r["pred"], r["dst"], r["j"], r["neg_dst"])
        for r in negative_samples(e.repartition(7), k=2).collect()
    }
    assert got2 == got
