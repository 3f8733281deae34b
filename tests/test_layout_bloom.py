"""operators/layout (z-order) and functions/bloom (pre-join filter):
bit-level twins, Bloom guarantees (zero false negatives, bounded and
deterministic false positives), and the pruning claim the z-order
layout exists to make."""

import pytest
from pyspark.sql import functions as F

from arabicner_spark.functions.bloom import bloom_bits, bloom_probe
from arabicner_spark.operators.layout import zorder_file_stats, zvalue


def _interleave(vals, bits):
    z = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            z |= ((v >> b) & 1) << (b * len(vals) + i)
    return z


def test_zvalue_matches_python_twin(spark):
    rows = [(a, b) for a in range(0, 64, 7) for b in range(0, 24, 5)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zvalue([F.col("a"), F.col("b")], 6).alias("z")
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _interleave([a, b], 6), (a, b)


def test_zorder_tightens_every_dim_linear_only_first(spark):
    """The pruning claim itself: across a uniform grid, per-file
    bounding boxes under zorder are tight on BOTH dims, while the
    linear layout leaves dim 2 spanning its full extent in every
    file."""
    rows = [(u, h) for u in range(64) for h in range(24)]
    df = spark.createDataFrame(rows, "ub long, hr long")
    stats = zorder_file_stats(df, [("ub", 6), ("hr", 5)], 16).collect()
    z = [r for r in stats if r["layout"] == "zorder"]
    l = [r for r in stats if r["layout"] == "linear"]
    # every linear file spans the full hour extent: min 0, max 23
    assert all(r["min_hr"] == 0 and r["max_hr"] == 23 for r in l)
    # z-order files: every file's hour span is a strict subset
    assert all(r["max_hr"] - r["min_hr"] < 23 for r in z)
    # both layouts partition all rows
    assert sum(r["n_rows"] for r in z) == len(rows)
    assert sum(r["n_rows"] for r in l) == len(rows)


def test_bloom_no_false_negatives_and_deterministic(spark):
    dim = spark.createDataFrame([(i,) for i in range(0, 200, 3)], "k long")
    facts = spark.createDataFrame([(i,) for i in range(250)], "k long")
    bits = bloom_bits(dim, "k", n_hashes=5, m_bits=4096)
    out = {r["key"]: r["bloom_pass"] for r in bloom_probe(facts, "k", bits, 5, 4096).collect()}
    members = set(range(0, 200, 3))
    # zero false negatives: every member passes
    assert all(out[k] for k in members)
    # false-positive rate is small at this fill factor and, above all,
    # DETERMINISTIC: a second build/probe gives the same decisions
    fps = [k for k, p in out.items() if p and k not in members]
    assert len(fps) < 25
    bits2 = bloom_bits(dim, "k", n_hashes=5, m_bits=4096)
    out2 = {r["key"]: r["bloom_pass"] for r in bloom_probe(facts, "k", bits2, 5, 4096).collect()}
    assert out == out2


def test_bloom_bits_bounded_by_m(spark):
    dim = spark.createDataFrame([(i,) for i in range(5000)], "k long")
    n = bloom_bits(dim, "k", n_hashes=3, m_bits=512).count()
    assert n <= 512
