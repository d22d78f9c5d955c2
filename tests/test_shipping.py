"""External-driver contract: Python-executing operators must work when the
driver process found this package via sys.path ONLY (a vanilla
SparkSession from a non-repo cwd — exactly how the correctness driver
invokes the engine). cloudpickle serializes module-level helpers BY
REFERENCE, so either the worker function closes over everything
(streaming/stateful.py) or the package is shipped to executors
(shipping.ensure_package_shipped, called by the multimodal operators).
This was a real failure: QSA-stream-stateful and decode_media both died
with ModuleNotFoundError in the executor's Python worker before the fix.
"""

from __future__ import annotations

import subprocess
import sys

_SCRIPT = """
import sys; sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
spark = SparkSession.builder.master("local[2]").getOrCreate()
from haf_plug_play_spark.ext import multimodal as mm
from haf_plug_play_spark.sources.tables import load_table
docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(10)
out = mm.decode_media(mm.attach_fake_media(docs)).collect()
assert len(out) == 10, out
from haf_plug_play_spark.queries.advanced import ADVANCED_QUERIES
n = ADVANCED_QUERIES["QSA-stream-stateful"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("EXTERNAL_DRIVER_OK")
"""


def test_python_operators_from_external_driver(tmp_path):
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        cwd=str(tmp_path),  # NOT the repo — workers can't rely on cwd
        capture_output=True,
        text=True,
        timeout=300,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert "EXTERNAL_DRIVER_OK" in proc.stdout, (
        proc.stdout[-2000:],
        proc.stderr[-2000:],
    )
