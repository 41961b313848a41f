"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship mapping pipeline at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full registry in
``asctb_ct_label_mapper_spark.queries`` (one entry per implemented
SURVEY §2 operator; oracle present wherever the op is SQL-expressible).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# robust against the driver importing this file with a different cwd
_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from asctb_ct_label_mapper_spark.queries import all_oracles, all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"

# keyed on applicationId, not id(sc): a stopped context's id() can be
# reused by a later one, which would silently skip the package ship
_shipped_contexts: set[str] = set()


def _ensure_package_on_workers(spark: SparkSession) -> None:
    """Python workers deserialize our pandas UDFs by importing the package;
    when the driver process was started outside the repo dir the workers
    cannot resolve it from cwd. Shipping a zip via addPyFile puts the
    package on every worker's sys.path regardless of deployment layout
    (works identically on a real cluster)."""
    sc = spark.sparkContext
    if sc.applicationId in _shipped_contexts:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.join(_REPO_DIR, "asctb_ct_label_mapper_spark")
    fd, zpath = tempfile.mkstemp(suffix=".zip", prefix="asctb_pkg_")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if fname.endswith(".py"):
                    full = os.path.join(root, fname)
                    zf.write(full, os.path.relpath(full, _REPO_DIR))
    sc.addPyFile(zpath)
    _shipped_contexts.add(sc.applicationId)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full label-mapping pipeline (clean -> stub-encode ->
    broadcast cosine top-k -> pivot -> exact overwrite) over sf0.001."""
    _ensure_package_on_workers(spark)
    return all_queries()["mapping_report"](spark, SMOKE_SF_DIR)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_package_on_workers(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
