"""Iceberg branch of TableIO, exercised against a mocked catalog.

The sandbox ships no Iceberg runtime jars, so the V2 writer path
(``writeTo(...).using("iceberg").partitionedBy(...).createOrReplace()``)
can't run for real — but a signature typo or a wrong table identifier
must not be able to hide in the untested branch.  These tests pin the
exact call sequence with mocks; the parquet facade (same TableIO
surface) is integration-tested elsewhere (tests/test_resume.py).
"""

from unittest.mock import MagicMock

from arabicner_spark.sources.io import TableIO, iceberg_available


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
