"""Loud guards for the testdata properties kg_mentions_bio parity rests on.

The BIO path tokenizes with str.split() (collapses whitespace runs) and
normalizes tokens (lowercase/Arabic folding) and truncates at the
510-subword budget, while its SQL oracle n-gram-scans the RAW text with
string_split(text, ' ') and no truncation.  Equality of the two is
therefore conditional on the generated documents being (a) single-space
separated with no edge spaces, (b) already normalization-fixed, and
(c) under the subword budget.  A testdata refresh that breaks any of
these must fail HERE with a diagnosis, not as a bare value-hash
MISMATCH in the driver's correctness gate.
"""

import os

import pytest

from arabicner_spark.functions import tagcore
from arabicner_spark.functions.normalize import normalize_py

SF_DIRS = [
    d for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(d)
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_satisfy_bio_oracle_preconditions(sf_dir):
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"]).column(
        "text"
    ).to_pylist()
    assert texts
    bad_ws = [t[:60] for t in texts if t != " ".join(t.split())]
    assert not bad_ws, f"whitespace runs / edge spaces break split-parity: {bad_ws[:3]}"
    bad_norm = [
        t[:60] for t in texts if any(normalize_py(w) != w for w in t.split())
    ]
    assert not bad_norm, f"non-normalized tokens break parity: {bad_norm[:3]}"
    budget = tagcore.DEFAULT_MAX_SEQ_LEN - 2
    over = [
        t[:60]
        for t in texts
        if int(tagcore.subword_lengths(t.split()).sum()) > budget
    ]
    assert not over, f"docs over the {budget}-subword budget get truncated: {over[:3]}"
