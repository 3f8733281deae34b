"""Build arabicner_spark.zip for spark-submit --py-files.

The package is pure Python, so deployment is:

    python tools/make_pyfiles_zip.py
    spark-submit --py-files arabicner_spark.zip \
        --master <cluster> arabicner_spark/plans/run.py \
        --input <iceberg-or-parquet transcripts> --output <kg root>
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = os.path.join(REPO, "arabicner_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "arabicner_spark")):
            for f in sorted(files):
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    z.write(p, os.path.relpath(p, REPO))
    print(out)


if __name__ == "__main__":
    main()
