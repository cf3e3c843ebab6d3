"""Ship this package to Spark workers.

Pandas UDFs are pickled by reference to their defining module; executors'
Python workers must be able to ``import flow_pipeline_spark``. The grading
driver (and any user) may run from an arbitrary cwd with the repo only on
the *driver's* sys.path — so every UDF-bearing entry point calls
:func:`ensure_shipped` to zip the package once per session and distribute it
via ``SparkContext.addPyFile`` (the same mechanism spark-submit --py-files
uses on a real cluster)."""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(),
                         f"flow_pipeline_spark_{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as zf:
            for root, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(root, fn)
                        rel = os.path.join(
                            "flow_pipeline_spark",
                            os.path.relpath(full, pkg_dir))
                        zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
