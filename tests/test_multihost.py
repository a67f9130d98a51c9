"""Two-REAL-process multi-host validation (SURVEY §7 "multi-host input
pipeline").

Everything else in the suite exercises the multi-host code paths at
``jax.process_count() == 1`` on the 8-device single-process CPU mesh;
this module actually launches two processes under
``jax.distributed.initialize`` (gloo CPU collectives) and checks the
process-local banded build + forward + psum'd gradient + a 2-iteration
``gd`` run against the single-process global build.

~12 min wall (interpret-mode kernels in three subprocesses) — run this
module as its own shard, like tests/test_sharded.py.
"""
import os
import subprocess
import sys

TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "multihost_check.py")


def test_two_process_multihost_build():
    r = subprocess.run([sys.executable, TOOL], capture_output=True,
                       text=True, timeout=2400)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "[multihost_check] OK" in r.stdout
