"""Ship this package to Spark executors on demand.

Why this exists: cloudpickle serializes module-level functions and globals
BY REFERENCE (module + qualname). A Python-executing operator whose worker
function touches anything module-level therefore requires
``haf_plug_play_spark`` to be importable inside the executor's Python
worker — which it is NOT when the driver-side client located the package
via ``sys.path`` manipulation only (exactly how the correctness driver
invokes the engine: a vanilla SparkSession from a non-repo cwd). The
stateful streaming handler dodges this by closing over everything
(streaming/stateful.py), but the multimodal decoders legitimately share
module-level parsers with their tests, so the package itself must travel.

``ensure_package_shipped`` zips the installed package once per
SparkContext and registers it with ``addPyFile`` — the runtime equivalent
of ``spark-submit --py-files``, which is the deployment-time answer.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_SHIPPED: set[str] = set()


def ensure_package_shipped(spark) -> None:
    """Idempotently addPyFile a zip of haf_plug_play_spark to executors."""
    sc = spark.sparkContext
    key = sc.applicationId
    if key in _SHIPPED:
        return
    import haf_plug_play_spark as pkg

    root = os.path.dirname(os.path.abspath(pkg.__file__))
    fd, zpath = tempfile.mkstemp(prefix="haf_plug_play_spark_", suffix=".zip")
    os.close(fd)
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(root):
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.join(
                    "haf_plug_play_spark", os.path.relpath(full, root)
                )
                zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(key)
