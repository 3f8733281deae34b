"""Iceberg branch of TableIO, exercised against a mocked catalog.

The sandbox ships no Iceberg runtime jars, so the V2 writer path
(``writeTo(...).using("iceberg").partitionedBy(...).createOrReplace()``)
can't run for real — but a signature typo or a wrong table identifier
must not be able to hide in the untested branch.  These tests pin the
exact call sequence with mocks; the parquet facade (same TableIO
surface) is integration-tested elsewhere (tests/test_resume.py).
"""

from unittest.mock import MagicMock

from arabicner_spark.sources.io import TableIO, iceberg_available, parquet_fingerprint


def _fluent_writer():
    """A writeTo-style mock where every fluent call returns the mock."""
    w = MagicMock()
    w.using.return_value = w
    w.partitionedBy.return_value = w
    return w


def test_iceberg_write_call_sequence(spark):
    df = MagicMock()
    w = _fluent_writer()
    df.writeTo.return_value = w
    io = TableIO(spark=MagicMock(), root="kg.prod", mode="iceberg")

    io.write(df, "edges", partition_by=["pred"])

    df.writeTo.assert_called_once_with("kg.prod.edges")
    w.using.assert_called_once_with("iceberg")
    assert w.partitionedBy.call_count == 1
    # partition columns are Column objects over the requested names
    (col_arg,), _ = w.partitionedBy.call_args
    assert "pred" in str(col_arg)
    w.createOrReplace.assert_called_once_with()


def test_iceberg_write_unpartitioned_skips_partitionedBy():
    df = MagicMock()
    w = _fluent_writer()
    df.writeTo.return_value = w
    io = TableIO(spark=MagicMock(), root="kg.prod", mode="iceberg")

    io.write(df, "nodes")

    w.partitionedBy.assert_not_called()
    w.createOrReplace.assert_called_once_with()


def test_iceberg_read_and_exists_identifiers():
    sp = MagicMock()
    io = TableIO(spark=sp, root="kg.prod", mode="iceberg")
    io.read("mentions")
    sp.read.table.assert_called_once_with("kg.prod.mentions")
    sp.catalog.tableExists.return_value = True
    assert io.exists("mentions") is True
    sp.catalog.tableExists.assert_called_once_with("kg.prod.mentions")


def test_iceberg_snapshot_id_queries_snapshots_table():
    """The resume rule's snapshot identity on the iceberg branch: the
    latest snapshot_id from the table's .snapshots metadata table."""
    sp = MagicMock()
    row = MagicMock()
    row.snapshot_id = 7812930412
    sp.sql.return_value.first.return_value = row
    io = TableIO(spark=sp, root="kg.prod", mode="iceberg")
    assert io.snapshot_id("edges") == "7812930412"
    (sql_arg,), _ = sp.sql.call_args
    assert "kg.prod.edges.snapshots" in sql_arg
    assert "ORDER BY committed_at DESC" in sql_arg
    # empty table (no snapshots yet) -> empty identity, never a crash
    sp.sql.return_value.first.return_value = None
    assert io.snapshot_id("edges") == ""


def test_parquet_snapshot_id_changes_on_rewrite(spark, tmp_path):
    """The parquet facade's snapshot identity: stable across re-reads,
    different after ANY rewrite (fresh part-file UUIDs)."""
    io = TableIO(spark=spark, root=str(tmp_path), mode="parquet")
    df = spark.range(100).toDF("n")
    io.write(df, "t")
    s1 = io.snapshot_id("t")
    assert s1 == io.snapshot_id("t")  # deterministic re-read
    io.write(df, "t")  # same CONTENT, new materialization
    s2 = io.snapshot_id("t")
    assert s1 != s2
    # and the standalone fingerprint matches the facade's
    assert s2 == parquet_fingerprint(str(tmp_path / "t"))


def _spark_with_conf(pairs):
    sp = MagicMock()
    sp.sparkContext.getConf.return_value.getAll.return_value = pairs
    return sp


def test_iceberg_available_detection_and_auto():
    with_iceberg = _spark_with_conf(
        [
            ("spark.app.name", "x"),
            ("spark.sql.catalog.kg", "org.apache.iceberg.spark.SparkCatalog"),
        ]
    )
    without = _spark_with_conf([("spark.app.name", "x")])
    assert iceberg_available(with_iceberg) is True
    assert iceberg_available(without) is False
    assert TableIO.auto(with_iceberg, "kg.prod").mode == "iceberg"
    assert TableIO.auto(without, "/tmp/t").mode == "parquet"
