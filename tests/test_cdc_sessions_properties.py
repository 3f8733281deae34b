"""Property-based cross-checks: CDC changelog apply vs a dict-replay
reference, and Spark's native session_window vs a gap-scan reference.
Random inputs cover the shapes fixed testdata can't: same-key op runs,
delete-then-upsert, insert-only keys, session-boundary gaps at exactly
the merge threshold."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from arabicner_spark.operators.cdc import apply_changelog

KEYS = [1, 2, 3, 4]
base_maps = st.dictionaries(
    st.sampled_from(KEYS), st.integers(0, 99), min_size=0, max_size=4
)
# changelog: (key, op, value) rows; seq = list position (unique)
log_lists = st.lists(
    st.tuples(
        st.sampled_from(KEYS), st.sampled_from(["U", "D"]), st.integers(100, 199)
    ),
    min_size=0,
    max_size=10,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(base=base_maps, log=log_lists)
def test_cdc_apply_matches_dict_replay(spark, base, log):
    base_df = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(-1, -1)], "k int, val int"
    )
    log_df = spark.createDataFrame(
        [(k, i, op, v) for i, (k, op, v) in enumerate(log)] or [(-2, 0, "D", 0)],
        "k int, seq int, op string, val int",
    )
    got = {
        r.k: (r.val, r.src)
        for r in apply_changelog(base_df, log_df, "k", payload=["val"]).collect()
    }

    # reference: replay the log over the base dict in seq order
    state = dict(base)
    if not base:
        state = {-1: -1}
    touched = {}
    for k, op, v in log or [(-2, "D", 0)]:
        touched[k] = (op, v)  # latest op wins
    want = {}
    for k, v in state.items():
        if k in touched:
            op, nv = touched[k]
            if op != "D":
                want[k] = (nv, "cdc")
        else:
            want[k] = (v, "base")
    for k, (op, nv) in touched.items():
        if k not in state and op != "D":
            want[k] = (nv, "cdc")
    assert got == want, (base, log, got, want)


sessions_events = st.lists(
    st.tuples(st.sampled_from([1, 2]), st.integers(0, 40)), min_size=1, max_size=12
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=sessions_events)
def test_session_window_matches_gap_scan(spark, rows):
    """session_window(gap=10s) on integer-second events vs a linear gap
    scan: merge while next - prev <= gap, end = last + gap.  The 0..40s
    domain makes exact-gap boundaries (delta == 10) common, pinning the
    touching-intervals-merge rule on random data."""
    gap = 10
    df = spark.createDataFrame(rows, "u int, t int").withColumn(
        "ts", F.timestamp_seconds("t")
    )
    out = (
        df.groupBy("u", F.session_window("ts", f"{gap} seconds").alias("sw"))
        .agg(F.count("*").alias("n"))
        .select(
            "u",
            F.unix_timestamp("sw.start").alias("start_s"),
            F.unix_timestamp("sw.end").alias("end_s"),
            "n",
        )
    )
    got = sorted(tuple(r) for r in out.collect())

    want = []
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        ts.sort()
        cur = [ts[0]]
        for t in ts[1:]:
            if t - cur[-1] <= gap:
                cur.append(t)
            else:
                want.append((u, cur[0], cur[-1] + gap, len(cur)))
                cur = [t]
        want.append((u, cur[0], cur[-1] + gap, len(cur)))
    assert got == sorted(want), (rows, got, sorted(want))


funnel_events = st.lists(
    st.tuples(
        st.sampled_from([1, 2, 3]),
        st.sampled_from(["view", "click", "purchase", "error"]),
        st.integers(0, 30),
    ),
    min_size=0,
    max_size=14,
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=funnel_events)
def test_funnel_stage_matches_linear_replay(spark, rows):
    """q_funnel's strict-order first-qualifying semantics vs a linear
    replay: stage k is reached iff some step-k event is STRICTLY after
    the FIRST qualifying step-(k-1) event.  Random data covers the
    shapes the fixed testdata can't: same-timestamp steps (no
    progress), purchases before views, missing middle steps."""
    from datetime import datetime, timezone

    from arabicner_spark.plans.testdata_queries import q_funnel

    def _ts(t):
        return datetime.fromtimestamp(t, tz=timezone.utc).replace(tzinfo=None)

    df = spark.createDataFrame(
        [(i, u, et, _ts(t)) for i, (u, et, t) in enumerate(rows)]
        or [(0, 99, "error", _ts(0))],
        "event_id long, user_id long, event_type string, ts timestamp",
    )

    # route q_funnel's load() at our in-memory frame
    import arabicner_spark.plans.testdata_queries as tq

    orig = tq.load
    tq.load = lambda spark, sf_dir, name: df
    try:
        got = {r.user_id: r.stage for r in q_funnel(spark, "ignored").collect()}
    finally:
        tq.load = orig

    def replay(evts):
        def first_after(kind, after):
            cands = [t for et, t in evts if et == kind and (after is None or t > after)]
            return min(cands) if cands else None

        t1 = first_after("view", None)
        if t1 is None:
            return 0
        t2 = first_after("click", t1)
        if t2 is None:
            return 1
        t3 = first_after("purchase", t2)
        return 2 if t3 is None else 3

    by_user = {}
    data = rows or [(99, "error", 0)]
    for u, et, t in data:
        by_user.setdefault(u, []).append((et, t))
    want = {u: replay(evts) for u, evts in by_user.items()}
    assert got == want, (rows, got, want)
