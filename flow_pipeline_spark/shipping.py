"""Ship this package to Spark workers.

Pandas UDFs are pickled by reference to their defining module; executors'
Python workers must be able to ``import flow_pipeline_spark``. The grading
driver (and any user) may run from an arbitrary cwd with the repo only on
the *driver's* sys.path — so every UDF-bearing entry point calls
:func:`ensure_shipped` to zip the package once per session and distribute it
via ``SparkContext.addPyFile`` (the same mechanism spark-submit --py-files
uses on a real cluster).

The zip is CONTENT-keyed and atomically published (round-7 review: the old
pid-keyed name collided across container launches — same pid, persistent
/tmp — and shipped a STALE zip after a source edit, so executors ran old
UDF code against the driver's new plans; and a crash mid-write left a
truncated zip at the final path that every later run shipped). Same
digest+tmp+rename discipline as plans._artifact_dir/_publish_once.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()


def _pkg_digest(pkg_dir: str) -> str:
    """md5 over every .py's (relative path, bytes) in sorted walk order —
    any source edit changes the digest, so the zip name, so a rebuild."""
    h = hashlib.md5()
    for root, dirs, files in os.walk(pkg_dir):
        dirs.sort()
        for fn in sorted(files):
            if fn.endswith(".py"):
                full = os.path.join(root, fn)
                h.update(os.path.relpath(full, pkg_dir).encode())
                with open(full, "rb") as f:
                    h.update(f.read())
    return h.hexdigest()[:16]


def ensure_shipped(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"flow_pipeline_spark_{os.getuid()}_{_pkg_digest(pkg_dir)}.zip")
    if not os.path.exists(zpath):
        fd, tmp = tempfile.mkstemp(suffix=".zip",
                                   dir=tempfile.gettempdir())
        os.close(fd)
        try:
            with zipfile.ZipFile(tmp, "w") as zf:
                for root, dirs, files in os.walk(pkg_dir):
                    dirs.sort()
                    for fn in sorted(files):
                        if fn.endswith(".py"):
                            full = os.path.join(root, fn)
                            rel = os.path.join(
                                "flow_pipeline_spark",
                                os.path.relpath(full, pkg_dir))
                            zf.write(full, rel)
            os.replace(tmp, zpath)      # publish complete zips only
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
