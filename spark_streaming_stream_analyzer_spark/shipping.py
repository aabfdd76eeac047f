"""Ship the package source to Spark's Python workers.

Module-level Python functions used by Arrow-batched operators
(``applyInPandasWithState`` state updaters, grouped-map UDFs) are
cloudpickled **by reference**: the worker process re-imports
``spark_streaming_stream_analyzer_spark...`` from disk. That works when the
driver's working directory happens to contain the repo (pytest,
scripts/) and silently breaks under any other launcher — the external
driver imports ``__spark_entry__`` by absolute path from its own cwd,
so worker Pythons raise ``ModuleNotFoundError`` the first time a
module-referenced UDF runs.

Fix: zip the package once per process and ``sc.addPyFile`` it — Spark
distributes the zip to every executor (local or cluster) and prepends
it to each worker's ``sys.path``. Idempotent per SparkContext; the
registry calls it in front of every query, so any entry point is
covered. This is also exactly what shipping this engine to a real
1000-executor cluster requires (``--py-files``), expressed in code.
"""

from __future__ import annotations

import atexit
import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[str] = set()
_ZIP_PATH: str | None = None


def _package_zip() -> str:
    """Build (once per process) a zip of the package importable from
    worker sys.path: entries are spark_streaming_stream_analyzer_spark/**/*.py."""
    global _ZIP_PATH
    if _ZIP_PATH is not None and os.path.exists(_ZIP_PATH):
        return _ZIP_PATH
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    path = os.path.join(
        tempfile.gettempdir(), f"sgs_pyfiles_{os.getpid()}.zip"
    )
    with zipfile.ZipFile(path, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, parent))
    _ZIP_PATH = path
    atexit.register(lambda: os.path.exists(path) and os.remove(path))
    return path


def ensure_package_shipped(spark: SparkSession) -> None:
    """Make the package importable on this session's Python workers."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    sc.addPyFile(_package_zip())
    _SHIPPED.add(key)
