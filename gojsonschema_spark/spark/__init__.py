"""Spark-facing engine package.

Importing this package makes the library self-shipping for pandas-UDF
closures: cloudpickle is told to pickle ``gojsonschema_spark`` by value,
so executors do NOT need the package on their PYTHONPATH (no
``--py-files`` required in local/dev use). For classic cluster deploys,
:func:`ship` zips the package and registers it via ``sc.addPyFile`` —
the ``spark-submit --py-files`` path.
"""

from __future__ import annotations

import os
import shutil
import tempfile


def _register_by_value() -> None:
    try:
        from pyspark import cloudpickle  # pyspark's vendored cloudpickle

        import gojsonschema_spark

        cloudpickle.register_pickle_by_value(gojsonschema_spark)
    except Exception:
        pass


_register_by_value()


def ship(spark) -> str:
    """Zip this package and addPyFile it (spark-submit --py-files parity)."""
    pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tmp = tempfile.mkdtemp(prefix="gjs_ship_")
    zip_base = os.path.join(tmp, "gojsonschema_spark")
    archive = shutil.make_archive(zip_base, "zip",
                                  root_dir=os.path.dirname(pkg_dir),
                                  base_dir=os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(archive)
    return archive
