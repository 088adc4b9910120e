"""Unit pins for the SparkSession factory's scratch-dir selection.

``spark.local.dir`` (shuffle/spill scratch) must land on fast local
storage: the sandbox root disk has measured write-throttled epochs
(~60 MB/s), and on a real cluster node this is the local NVMe array.
These tests pin the selection contract without starting a JVM.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_spark.session import _scratch_dir  # noqa: E402


def test_env_override_wins(monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", str(tmp_path))
    assert _scratch_dir() == str(tmp_path)


def test_env_empty_disables(monkeypatch):
    # empty string = explicit opt-out: Spark falls back to its default
    monkeypatch.setenv("SPARK_GRAFT_LOCAL_DIR", "")
    assert _scratch_dir() is None


def test_default_prefers_tmpfs_when_writable(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_DIR", raising=False)
    d = _scratch_dir()
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        assert d == "/dev/shm/spark_graft_local"
        assert os.path.isdir(d)  # created eagerly so the JVM can use it
    else:
        assert d is None
