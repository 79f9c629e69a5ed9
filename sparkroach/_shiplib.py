"""Ship the sparkroach package to executors.

Pandas UDFs defined at module level (chain.transforms' canonical-JSON
codecs) are pickled BY REFERENCE (module + qualname), so executor Python
workers must be able to ``import sparkroach``.  When the driver process
runs from a directory where the package isn't importable-by-path (any
harness cwd) and the package isn't pip-installed, that import fails.

``ensure_shipped`` zips the package once per SparkContext and registers it
with ``addPyFile`` — the standard deployment mechanism (``--py-files``) in
API form.  Idempotent and cheap (the package is a few hundred KB).
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_FLAG = "_sparkroach_shipped"


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    if getattr(sc, _FLAG, False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="sparkroach_pyfiles_"), "sparkroach.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.join(
                    "sparkroach", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
    sc.addPyFile(zpath)
    setattr(sc, _FLAG, True)
