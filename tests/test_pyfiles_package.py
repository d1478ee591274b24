"""spark-submit --py-files packaging (north rule): the zip built by
scripts/make_pyfiles.py must be importable the way executors import
shipped py-files (zip on sys.path).  A live `spark-submit --py-files`
smoke run of the same zip (build + BM25 top-k on executors) is
recorded in BASELINE.md; this test keeps the zip's importability from
regressing without paying a JVM launch."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pyfiles_zip_imports_standalone(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "make_pyfiles.py")],
        capture_output=True, text=True, check=True)
    zip_path = out.stdout.strip().splitlines()[-1]
    assert zip_path.endswith("anomaly_detection_spark.zip")
    assert os.path.exists(zip_path)

    # import with ONLY the zip on the path (plus the stdlib) — the
    # executor posture; pyspark deps are not imported at package
    # import time, so this isolates zip completeness
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import anomaly_detection_spark; "
        "import numpy as np; "
        "from anomaly_detection_spark.functions.codecs import "
        "varint_encode, varint_decode; "
        "v = np.array([3, 1, 2], dtype=np.int64); "
        "assert (varint_decode(varint_encode(v)) == v).all(); "
        "print('ZIP_IMPORT_OK', anomaly_detection_spark.__name__)"
        % zip_path)
    r = subprocess.run([sys.executable, "-c", probe], capture_output=True,
                       text=True, cwd=str(tmp_path))
    assert r.returncode == 0, r.stderr
    assert "ZIP_IMPORT_OK" in r.stdout
