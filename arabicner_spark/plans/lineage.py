"""Per-stage lineage, metrics, and idempotent resume.

The reference's checkpointing is model-state (torch.save per epoch,
arabiner/trainers/BaseTrainer.py:84-117, natsort-latest load); ours is
DATA checkpointing per the north rule: every stage writes its output
table plus

  * a ``_metrics`` row set — (stage, partition_id, rows_in, rows_out,
    triples, wall_ms, run_id), where partition counts come from one
    ``groupBy(spark_partition_id())`` over the written table (columnar
    count, no second pass over the compute graph);
  * a manifest — (stage, input_snapshot, complete, run_id) JSON.

Resume rule: a stage is skipped iff its manifest is complete AND its
recorded input snapshot equals the current one.  Outputs are written
createOrReplace-style (sources/io.py), so a re-run after a mid-stage
kill simply replaces a partial table — byte-identical results, no
duplicate lineage (manifests are keyed by stage, last-writer-wins).
"""

from __future__ import annotations

import json
import os
import sys
import time
from dataclasses import dataclass
from typing import Callable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arabicner_spark.sources.io import TableIO


@dataclass
class StageRunner:
    io: TableIO
    run_id: str
    input_snapshot: str

    def _manifest_path(self, stage: str) -> str:
        d = os.path.join(self.io.root, "_manifests")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"{stage}.json")

    def is_complete(self, stage: str) -> bool:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return False
        try:
            m = json.load(open(p))
        except Exception:
            return False
        return bool(m.get("complete")) and m.get("input_snapshot") == self.input_snapshot

    def _write_manifest(self, stage: str) -> None:
        tmp = self._manifest_path(stage) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "stage": stage,
                    "input_snapshot": self.input_snapshot,
                    "complete": True,
                    "run_id": self.run_id,
                },
                f,
            )
        os.replace(tmp, self._manifest_path(stage))  # atomic

    def _write_metrics(self, stage: str, rows: DataFrame) -> None:
        """Overwrite THIS stage's metrics partition (stage=<name> dir).

        An append here would duplicate rows if a run died in the window
        between the metrics write and the manifest write (the rerun
        recomputes the stage); per-stage overwrite makes the metrics
        table last-writer-wins exactly like the manifests, so resume
        stays duplicate-free (asserted in tests/test_resume.py).
        Readers load the _metrics root and get ``stage`` back as the
        partition column.
        """
        path = os.path.join(self.io.root, "_metrics", f"stage={stage}")
        rows.drop("stage").write.mode("overwrite").parquet(path)

    def run(
        self,
        stage: str,
        out_table: str,
        compute: Callable[[], DataFrame],
        partition_by: Optional[List[str]] = None,
        rows_in_of: Optional[str] = None,
        count_as_triples: bool = False,
    ) -> DataFrame:
        """Execute (or skip) one stage; returns the stage output table."""
        if self.is_complete(stage):
            return self.io.read(out_table)
        t0 = time.time()
        self.io.write(compute(), out_table, partition_by)
        wall_ms = int((time.time() - t0) * 1000)
        print(f"[stage {stage}] {wall_ms} ms", file=sys.stderr)
        written = self.io.read(out_table)
        rows_in = self.io.read(rows_in_of).count() if rows_in_of else 0
        per_part = written.groupBy(
            F.spark_partition_id().cast("int").alias("partition_id")
        ).agg(F.count("*").alias("rows_out"))
        metrics = per_part.select(
            F.lit(stage).alias("stage"),
            "partition_id",
            F.lit(rows_in).cast("bigint").alias("rows_in"),
            F.col("rows_out").cast("bigint"),
            (F.col("rows_out") if count_as_triples else F.lit(0)).cast("bigint").alias("triples"),
            F.lit(wall_ms).cast("bigint").alias("wall_ms"),
            F.lit(self.run_id).alias("run_id"),
        )
        self._write_metrics(stage, metrics)
        self._write_manifest(stage)
        return written
