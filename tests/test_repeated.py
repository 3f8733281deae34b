"""Exact cross-document repeated-substring dedup
(operators/repeated.py) vs a brute-force serial twin on corpora with
PLANTED shared substrings — the r6 VERDICT #7 modality (MinHash
catches near-dup documents; this catches long verbatim token runs
shared across otherwise-different documents)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from arabicner_spark.operators.repeated import (
    apply_substring_cuts,
    repeated_substring_cuts,
)


def _twin_cuts(docs: dict, k: int) -> set:
    """Brute-force serial twin: all maximal cross-doc repeated runs of
    >= k tokens as (doc_id, start_tok 1-based, len_tok)."""
    grams: dict = {}
    toks = {d: t.split(" ") for d, t in docs.items()}
    for d, ts in toks.items():
        for i in range(len(ts) - k + 1):
            grams.setdefault(tuple(ts[i : i + k]), set()).add(d)
    dup = {g for g, ds in grams.items() if len(ds) >= 2}
    out = set()
    for d, ts in toks.items():
        hit = [i for i in range(len(ts) - k + 1) if tuple(ts[i : i + k]) in dup]
        run: list = []
        for p in hit:
            if run and p == run[-1] + 1:
                run.append(p)
            else:
                if run:
                    out.add((d, run[0] + 1, run[-1] - run[0] + k))
                run = [p]
        if run:
            out.add((d, run[0] + 1, run[-1] - run[0] + k))
    return out


def _spark_cuts(spark, docs: dict, k: int) -> set:
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    return {
        (r.doc_id, r.start_tok, r.len_tok)
        for r in repeated_substring_cuts(df, k=k).collect()
    }


WORDS = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()


def test_planted_substring_property(spark):
    rng = random.Random(20260817)
    for trial in range(5):
        docs = {}
        for d in range(8):
            docs[d] = " ".join(rng.choice(WORDS) for _ in range(rng.randint(4, 30)))
        # plant one shared phrase in 2-3 docs at random token offsets
        phrase = " ".join(rng.choice(WORDS) for _ in range(rng.randint(5, 9)))
        carriers = rng.sample(range(8), rng.randint(2, 3))
        for d in carriers:
            ts = docs[d].split(" ")
            at = rng.randint(0, len(ts))
            docs[d] = " ".join(ts[:at] + phrase.split(" ") + ts[at:])
        k = 5
        got = _spark_cuts(spark, docs, k)
        want = _twin_cuts(docs, k)
        assert got == want, (trial, sorted(got) , sorted(want))
        # every carrier holds at least one cut if the phrase is >= k
        if len(phrase.split(" ")) >= k:
            assert {d for d, _, _ in got} >= set(carriers)


def test_short_docs_and_within_doc_repeats_never_cut(spark):
    docs = {
        1: "a b c",  # shorter than k
        2: "x y x y x y x y x y x y",  # repeats only WITHIN one doc
        3: "p q r s t u v w",
    }
    assert _spark_cuts(spark, docs, k=4) == set()


def test_apply_removes_planted_phrase_and_preserves_others(spark):
    boiler = "all rights reserved under the applicable license terms"
    docs = {
        1: "unique intro one " + boiler,
        2: boiler + " trailing unique text two",
        3: "completely unrelated document three",
        4: boiler,  # fully cut -> empty
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    cuts = repeated_substring_cuts(df, k=4).localCheckpoint(eager=True)
    out = {r.doc_id: r.text_deduped for r in apply_substring_cuts(df, cuts).collect()}
    assert out[3] == docs[3]  # untouched doc passes through identically
    for d in (1, 2, 4):
        assert boiler not in out[d]
    assert out[1] == "unique intro one"
    assert out[2] == "trailing unique text two"
    assert out[4] == ""


def test_cut_plan_has_no_cartesian_and_single_gram_shuffle(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string"
    )
    plan = repeated_substring_cuts(df, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
