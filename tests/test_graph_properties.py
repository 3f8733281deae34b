"""Property-based cross-checks of the graph operators against
brute-force Python references — random edge lists over a small node
universe, not fixtures.  Few examples (each is a real Spark job) but
the generator produces the adversarial shapes that break orientation
and dedup logic: duplicate edges, reversed duplicates, self-loops,
disconnected nodes, degree ties."""

from itertools import combinations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from arabicner_spark.operators.graph import bfs_depths, neighbor_jaccard, triangle_count

NODES = list("ABCDEFG")
edge_lists = st.lists(
    st.tuples(st.sampled_from(NODES), st.sampled_from(NODES)),
    min_size=0,
    max_size=14,
)


def _und(edges):
    return {tuple(sorted(e)) for e in edges if e[0] != e[1]}


def _adj(und):
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_triangle_count_matches_bruteforce(spark, edges):
    und = _und(edges)
    df = spark.createDataFrame(list(edges) or [("zz", "zz")], "src string, dst string")
    got = {r.node: r.n_triangles for r in triangle_count(df).collect()}
    want = {}
    for x, y, z in combinations(sorted({n for e in und for n in e}), 3):
        if {(x, y), (x, z), (y, z)} <= {tuple(sorted(p)) for p in und}:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    assert got == want, (sorted(und), got, want)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists)
def test_neighbor_jaccard_matches_bruteforce(spark, edges):
    und = _und(edges)
    adj = _adj(und)
    df = spark.createDataFrame(list(edges) or [("zz", "zz")], "src string, dst string")
    got = {
        (r.node_a, r.node_b): (r.common, r.jaccard)
        for r in neighbor_jaccard(df, min_common=1).collect()
    }
    want = {}
    for a, b in combinations(sorted(adj), 2):
        common = len(adj[a] & adj[b])
        if common >= 1:
            want[(a, b)] = (common, round(common / len(adj[a] | adj[b]), 4))
    assert got == want, (sorted(und), got, want)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_lists, seed=st.sampled_from(NODES))
def test_bfs_matches_bruteforce(spark, edges, seed):
    und = _und(edges)
    adj = _adj(und)
    df = spark.createDataFrame(list(edges) or [("zz", "zz")], "src string, dst string")
    got = {r.node: r.depth for r in bfs_depths(df, [seed], max_depth=3).collect()}
    want, frontier = {seed: 0}, {seed}
    for d in (1, 2, 3):
        frontier = {
            p for n in frontier for p in adj.get(n, ()) if p not in want
        }
        for p in frontier:
            want[p] = d
        if not frontier:
            break
    assert got == want, (sorted(und), seed, got, want)
