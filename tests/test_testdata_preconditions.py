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


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_r4_injected_branches_stay_live(sf_dir):
    """The r4 queries inject synthetic PII/URLs because the corpus has
    none; every injected class must actually FIRE, or a scrub/extract
    branch silently becomes dead weight in the gate (caught live in r4:
    n_num == 0 with an empty else-branch; uppercase-HTTPS never
    matching a case-sensitive pattern)."""
    import duckdb

    from arabicner_spark.plans.testdata_queries import (
        SQL_TEXT_PII_SCRUB,
        SQL_TEXT_URLS,
        SQL_SPLIT_THREE_WAY,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    e, ip, ph, num = con.execute(
        f"SELECT sum(n_email), sum(n_ip), sum(n_phone), sum(n_num) FROM ({SQL_TEXT_PII_SCRUB})"
    ).fetchone()
    assert min(e, ip, ph, num) > 0, (e, ip, ph, num)

    urls = dict(
        con.execute(
            f"SELECT CASE WHEN url_norm LIKE 'https://docs.example.com%' THEN 'up' ELSE 'low' END, count(*) "
            f"FROM ({SQL_TEXT_URLS}) GROUP BY 1"
        ).fetchall()
    )
    # both the uppercase-normalized and the already-lowercase branches live
    assert urls.get("up", 0) > 0 and urls.get("low", 0) > 0, urls

    splits = dict(
        con.execute(f"SELECT split, n_docs FROM ({SQL_SPLIT_THREE_WAY})").fetchall()
    )
    assert set(splits) == {"train", "dev", "test"} and min(splits.values()) > 0, splits
