"""Utility subsystem tests: checkpointing round-trips, profiling timers."""
import numpy as np
import jax
import jax.numpy as jnp

from sph_raytracer_tpu.utils import load_checkpoint, save_checkpoint
from sph_raytracer_tpu.utils.profiling import fetch_sync, time_fn


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "coeffs": jnp.arange(12.0).reshape(3, 4),
        "nested": (jnp.ones(5), jnp.zeros(2, jnp.int32)),
    }
    p = str(tmp_path / "ck.npz")
    save_checkpoint(p, state, 17)
    loaded, it = load_checkpoint(p, state)
    assert it == 17
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_missing(tmp_path):
    assert load_checkpoint(str(tmp_path / "nope.npz"), {"a": jnp.ones(1)}) \
        is None


def test_time_fn_runs():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.ones((64, 64))
    dt = time_fn(f, x, iters=3)
    assert dt >= 0


def test_fetch_sync():
    out = fetch_sync({"a": jnp.ones(4), "b": (jnp.zeros(2),)})
    assert len(out) == 2
