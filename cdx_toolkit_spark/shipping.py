"""Ship the package to executors.

Module-level (pandas) UDFs pickle by *reference*, so executors must be able
to import `cdx_toolkit_spark`. Under `spark-submit --py-files cdx.zip` that
is automatic (the deployment path, BASELINE.json north_star); in ad-hoc
sessions (driver started from any cwd) we self-ship: zip the package once
per SparkContext and addPyFile it. Every module that sends Python to
executors calls ensure_shipped() first.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[int] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    zpath = os.path.join(
        tempfile.gettempdir(), f"cdx_toolkit_spark_{os.getpid()}_{key}.zip"
    )
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for root, _, files in os.walk(pkg_dir):
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(root, f)
                        z.write(full, os.path.relpath(full, parent))
    try:
        sc.addPyFile(zpath)
    except Exception:
        pass  # already registered under this name — fine
    _SHIPPED.add(key)


def build_pyfiles_zip(dest: str) -> str:
    """Build the --py-files artifact for spark-submit deployments."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    parent = os.path.dirname(pkg_dir)
    with zipfile.ZipFile(dest, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, parent))
    return dest
