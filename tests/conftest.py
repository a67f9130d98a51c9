"""Test configuration: force a local CPU backend with an 8-device virtual
mesh.

Multi-device sharding tests run on fake CPU devices
(``xla_force_host_platform_device_count``) — the mechanism SURVEY §4
prescribes for testing multi-chip paths without a pod.

The environment may pin ``JAX_PLATFORMS`` to a remote TPU platform and
install a sitecustomize hook that routes *all* XLA compiles through a
device tunnel (making CPU unit tests ~15× slower).  Since that hook runs
at interpreter startup, the only reliable escape is to re-exec pytest once
with a scrubbed environment before any JAX backend initializes.  Set
``SPH_TPU_TESTS_ON_DEVICE=1`` to skip the scrub and run tests on the real
device platform.
"""
import os
import sys

_SCRUB = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
          "AXON_POOL_SVC_OVERRIDE", "AXON_LOOPBACK_RELAY")

if (
    os.environ.get("SPH_TPU_TESTS_ON_DEVICE") != "1"
    and os.environ.get("_SPH_TPU_TEST_REEXEC") != "1"
    and any(os.environ.get(k) for k in _SCRUB)
):
    env = dict(os.environ)
    for k in _SCRUB:
        env.pop(k, None)
    # drop the sitecustomize dir that registers the tunnel PJRT plugin
    pyp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon_site" not in p]
    if pyp:
        env["PYTHONPATH"] = os.pathsep.join(pyp)
    else:
        env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["_SPH_TPU_TEST_REEXEC"] = "1"
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *sys.argv[1:]], env)

if os.environ.get("SPH_TPU_TESTS_ON_DEVICE") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# f64 available for parity tests; defaults stay f32 because all library
# code requests dtypes explicitly.
jax.config.update("jax_enable_x64", True)
