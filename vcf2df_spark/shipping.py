"""Ship this package to executor Python workers.

UDFs defined at module level are cloudpickled by reference, so workers must
be able to ``import vcf2df_spark``. When the driver process wasn't launched
from the repo root (or on a real cluster without --py-files), that import
fails. ``ensure_shipped`` zips the installed package once per process and
registers it via ``addPyFile`` — the programmatic twin of the
``spark-submit --py-files`` contract the jobs use.
"""

from __future__ import annotations

import os
import threading
import zipfile

from pyspark.sql import SparkSession

_shipped: set[int] = set()
_lock = threading.Lock()  # concurrent driver threads (verify.multiset_equal)


def ensure_shipped(spark: SparkSession) -> None:
    key = id(spark.sparkContext)
    if key in _shipped:
        return
    with _lock:
        if key in _shipped:
            return
        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_path = os.path.join(
            "/tmp", f"vcf2df_spark_ship_{os.getpid()}.zip"
        )
        if not os.path.exists(zip_path):
            tmp = f"{zip_path}.tmp-{threading.get_ident()}"
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
                for root, _, files in os.walk(pkg_dir):
                    for f in files:
                        if f.endswith(".py"):
                            full = os.path.join(root, f)
                            rel = os.path.join(
                                "vcf2df_spark",
                                os.path.relpath(full, pkg_dir),
                            )
                            z.write(full, rel)
            os.replace(tmp, zip_path)
        spark.sparkContext.addPyFile(zip_path)
        _shipped.add(key)
