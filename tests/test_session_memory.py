"""Local-mode driver-heap sizing (r15, guide §5).

The pyspark launcher's 1g default heap is the cluster-sizing bug of local
mode: the driver JVM hosts every executor thread, so 1g across local[32]
is ~32 MB of execution+storage memory per core. ``get_spark`` fixes the
heap BEFORE the py4j gateway launches (SparkConf is applied after launch
and silently ineffective), sized to half of box RAM clamped to [2g, 16g].
"""

from __future__ import annotations

import os
import re

from haf_plug_play_spark.session import _default_driver_memory, get_spark


def test_default_driver_memory_is_clamped():
    mem = _default_driver_memory()
    m = re.fullmatch(r"(\d+)g", mem)
    assert m, mem
    assert 2 <= int(m.group(1)) <= 16


def test_running_jvm_actually_got_the_sized_heap(spark):
    """The point of the pre-launch injection: the live JVM's -Xmx must
    reflect the sized heap, not pyspark's 1g launcher default. (The test
    session is built by conftest through get_spark, so this asserts the
    real end-to-end effect.)"""
    expect = os.environ.get("SPARK_GRAFT_DRIVER_MEMORY") or _default_driver_memory()
    gb = int(expect.rstrip("g"))
    rt = spark.sparkContext._jvm.java.lang.Runtime.getRuntime()
    max_mb = rt.maxMemory() // 1048576
    # maxMemory() reports slightly under -Xmx; 1g default would read ~1024
    assert max_mb > gb * 1024 * 0.9, f"JVM heap {max_mb} MB, expected ~{gb}g"


def test_get_spark_respects_existing_submit_args(spark, monkeypatch):
    """A caller-provided PYSPARK_SUBMIT_ARGS must never be overwritten —
    and with the gateway already up, get_spark must not mutate the env at
    all (the injection is launch-time-only)."""
    monkeypatch.setenv("PYSPARK_SUBMIT_ARGS", "--driver-memory 3g pyspark-shell")
    get_spark("haf_plug_play_spark_tests", master="local[4]")
    assert os.environ["PYSPARK_SUBMIT_ARGS"] == "--driver-memory 3g pyspark-shell"


def test_default_local_dir_resolution(monkeypatch):
    """Scratch-dir selection (r16, guide §5/§6): explicit env wins, a
    caller/cluster-set SPARK_LOCAL_DIRS suppresses any engine choice, and
    the /dev/shm fallback only fires when the mount has headroom."""
    from haf_plug_play_spark.session import _default_local_dir

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "/scratch/x")
    assert _default_local_dir() == "/scratch/x"
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR")

    monkeypatch.setenv("SPARK_LOCAL_DIRS", "/cluster/managed")
    assert _default_local_dir() is None
    monkeypatch.delenv("SPARK_LOCAL_DIRS")

    result = _default_local_dir()
    import os as _os

    st = _os.statvfs("/dev/shm")
    if st.f_bavail * st.f_frsize >= 16 * 1024**3:
        assert result == "/dev/shm/spark_graft_scratch"
        assert _os.path.isdir(result)
    else:
        assert result is None


def test_running_session_uses_fast_scratch_when_available(spark):
    """End-to-end: the conftest session (built via get_spark) must have
    its local dir on the engine-selected scratch when /dev/shm has room
    and nothing overrode it."""
    import os as _os

    if _os.environ.get("SPARK_GRAFT_LOCAL_DIR") or _os.environ.get("SPARK_LOCAL_DIRS"):
        return  # caller controls scratch; nothing to assert
    st = _os.statvfs("/dev/shm")
    if st.f_bavail * st.f_frsize < 16 * 1024**3:
        return
    assert spark.conf.get("spark.local.dir", None) == "/dev/shm/spark_graft_scratch"
