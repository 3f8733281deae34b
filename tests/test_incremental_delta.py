"""decision_delta / apply_decision_delta: the MERGE-shaped daily write.

At 100 TB the full keep/drop decision is corpus-sized; the day's churn
is delta-sized.  These tests pin (a) the delta is EXACTLY the row set a
MERGE would touch — the new batch plus old nodes re-keyed by a bridging
merge, nothing else — and (b) applying the delta to the old decision
reproduces the new decision bit-for-bit.
"""

from arabicner_spark.operators.incremental import (
    apply_decision_delta,
    decision_delta,
    dedup_incremental,
    dedup_state,
)

BASE_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
BASE_B = "one two three four five six seven eight nine ten"


def _rows(df):
    return {(r.node, r.keep) for r in df.collect()}


def test_delta_is_new_nodes_plus_rekeyed_old_nodes(spark):
    """Synthesized decisions (delta semantics are independent of how
    the decisions were computed): a bridging merge re-keys the losing
    old cluster; the delta is exactly new nodes + re-keyed old nodes —
    the untouched cluster stays out."""
    old_comp = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("b1", "b1"), ("b2", "b1"), ("c1", "c1")],
        "node string, keep string",
    )
    # n1 bridged A and B: B's members re-key to a1; c1 untouched
    new_decision = spark.createDataFrame(
        [
            ("a1", "a1"),
            ("a2", "a1"),
            ("b1", "a1"),
            ("b2", "a1"),
            ("c1", "c1"),
            ("n1", "a1"),
        ],
        "node string, keep string",
    )
    delta = decision_delta(old_comp, new_decision)
    assert _rows(delta) == {("b1", "a1"), ("b2", "a1"), ("n1", "a1")}
    merged = apply_decision_delta(old_comp, delta)
    assert _rows(merged) == _rows(new_decision)


def test_delta_on_real_incremental_fold(spark):
    """Delta over an actual dedup_incremental fold: every row the delta
    touches differs from (or is absent in) the old decision, and no
    changed row is missed."""
    old_docs = [
        ("a1", BASE_A),
        ("a2", BASE_A + " extra"),
        ("b1", BASE_B),
        ("c1", "totally unrelated content words here now"),
    ]
    new_docs = [
        ("n1", BASE_A + " joinword one two three four five six seven"),
        ("n2", "joinword one two three four five six seven eight nine ten"),
    ]
    st = dedup_state(spark.createDataFrame(old_docs, "id string, text string"))
    old_comp = st["comp"]
    st2 = dedup_incremental(
        st, spark.createDataFrame(new_docs, "id string, text string")
    )
    delta = decision_delta(old_comp, st2["decision"])
    touched = {n for n, _ in _rows(delta)}
    old_keep = {r.node: r.keep for r in old_comp.collect()}
    new_keep = {r.node: r.keep for r in st2["decision"].collect()}
    expected = {n for n in new_keep if n not in old_keep} | {
        n for n in old_keep if old_keep[n] != new_keep[n]
    }
    assert touched == expected
    assert "c1" not in touched


def test_apply_delta_reproduces_new_decision(spark):
    old_docs = [("a1", BASE_A), ("a2", BASE_A + " extra"), ("c1", BASE_B)]
    new_docs = [("n1", BASE_A + " more"), ("n2", "unrelated fresh text entirely")]
    st = dedup_state(spark.createDataFrame(old_docs, "id string, text string"))
    st2 = dedup_incremental(
        st, spark.createDataFrame(new_docs, "id string, text string")
    )
    delta = decision_delta(st["comp"], st2["decision"])
    merged = apply_decision_delta(st["comp"], delta)
    assert _rows(merged) == _rows(st2["decision"])
    # delta-sized, not corpus-sized: untouched old rows are absent
    assert delta.count() < st2["decision"].count()
