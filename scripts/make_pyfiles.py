#!/usr/bin/env python
"""Package the library for ``spark-submit --py-files`` (north_rule).

Produces ``dist/anomaly_detection_spark.zip`` containing the package
sources — importable by executors when shipped with ``--py-files``:

    python scripts/make_pyfiles.py
    spark-submit --py-files dist/anomaly_detection_spark.zip your_job.py

No build backend needed (pure-Python package); the zip root holds the
package directory so ``import anomaly_detection_spark`` resolves on
every executor.
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "anomaly_detection_spark"


def main() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, f"{PKG}.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, PKG)):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    print(out)
    return out


if __name__ == "__main__":
    main()
