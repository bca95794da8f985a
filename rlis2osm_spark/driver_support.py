"""Support for running under an external driver (spark-submit contract).

Python workers deserialize pandas UDFs by importing this package; when the
driver's SparkSession was created without ``--py-files rlis2osm_spark.zip``
(e.g. the verification harness), we ship the package at runtime via
``SparkContext.addPyFile`` — the local-mode equivalent of the north rule's
``spark-submit --py-files`` deployment.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_SHIPPED: set[int] = set()


def ensure_package_on_workers(spark: SparkSession) -> None:
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    zip_path = os.path.join(root, ".cache", "rlis2osm_spark_pyfiles.zip")
    os.makedirs(os.path.dirname(zip_path), exist_ok=True)
    if not os.path.exists(zip_path):
        with zipfile.ZipFile(zip_path, "w") as zf:
            for dirpath, _dirnames, filenames in os.walk(pkg_dir):
                for fn in filenames:
                    if not fn.endswith(".py"):
                        continue
                    full = os.path.join(dirpath, fn)
                    rel = os.path.relpath(full, root)
                    zf.write(full, rel)
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)
