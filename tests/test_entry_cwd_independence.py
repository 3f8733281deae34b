"""The driver contract must not depend on the process working
directory: Python workers inherit the driver's CWD (not sys.path), so
module-level closures (mapInPandas scorers, the foreachBatch sink)
deserialize on workers only because __spark_entry__._tuned ships the
package zip via addPyFile.  Round-5 regression: the streaming gate
query failed with ModuleNotFoundError when driven from outside the
repo root."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
import __spark_entry__ as e
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
# a mapInPandas query whose closure references package module functions
n = qs["kg_mentions_bio"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("OK", n)
"""


def test_worker_closures_resolve_from_foreign_cwd(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),  # NOT the repo root
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "OK" in proc.stdout
