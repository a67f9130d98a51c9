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


# ---------------------------------------------------------------------------
# integrated per-LOS debug surface (reference raytracer.py:175-225, 656-665)

def test_operator_debug_los(capsys):
    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid

    grid = SphericalGrid(shape=(6, 6, 6), size_r=(1, 4))
    geom = ConeRectGeom((5, 7), (8.0, 0.0, 0.0), fov=(30, 30))
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32,
                  debug=True, debug_los=(2, 3))
    out = capsys.readouterr().out
    assert "LOS (2, 3):" in out and "ray_start:" in out

    # the printed trace matches the operator's own table for that LOS
    from sph_raytracer_tpu.utils.debug import debug_trace

    regs, lens, ts = debug_trace(op, los=(2, 3))
    flat = 2 * 7 + 3
    row_len = float(np.asarray(op.lens)[flat].sum())
    assert np.isclose(lens.sum(), row_len, rtol=1e-5)

    # default LOS = central pixel
    debug_trace(op)
    assert "LOS (2, 3):" in capsys.readouterr().out

    # bad LOS rank is rejected
    import pytest

    with pytest.raises(ValueError):
        debug_trace(op, los=(1, 2, 3))


def test_operator_debug_view_times(capsys):
    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.viewgeom import ViewGeomCollection

    grid = SphericalGrid(shape=(3, 5, 5, 5), size_r=(1, 4),
                         size_t=(0.0, 2.0))
    geoms = ViewGeomCollection(
        *[ConeRectGeom((4, 4), (8.0, 0.1 * i, 0.2), fov=(30, 30))
          for i in range(3)])
    op = Operator(grid, geoms, view_times=[0.0, 0.5, 2.0],
                  mode="precomputed", ftype=jnp.float32,
                  debug=True, debug_los=(1, 2, 2))
    out = capsys.readouterr().out
    assert "time lerp: bin 0" in out and "0.5" in out

    # pure-binned 4D prints the single bin
    op2 = Operator(grid, geoms, mode="precomputed", ftype=jnp.float32,
                   dynamic=True, debug=True, debug_los=(2, 1, 1))
    out2 = capsys.readouterr().out
    assert "time bin: 2" in out2


# ---------------------------------------------------------------------------
# AOT export for serving (utils/export.py; no reference analog)

def test_export_forward_roundtrip(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.utils.export import export_operator, load_exported

    grid = SphericalGrid(shape=(6, 6, 6), size_r=(1, 4))
    geom = ConeRectGeom((5, 7), (8, 0.5, 0.2), fov=(30, 30))
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    p = str(tmp_path / "fwd.zip")
    export_operator(op, p, what="forward")
    served = load_exported(p)
    assert np.allclose(np.asarray(served(x)), np.asarray(op(x)), atol=1e-6)


def test_export_grad_step_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.utils.export import export_operator, load_exported

    grid = SphericalGrid(shape=(6, 6, 6), size_r=(1, 4))
    geom = ConeRectGeom((5, 7), (8, 0.5, 0.2), fov=(30, 30))
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    y = op(x)
    p = str(tmp_path / "step.zip")
    export_operator(op, p, what="grad_step", loss_y=y)
    served = load_exported(p)
    g_ref = jax.grad(lambda d: jnp.mean((op(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(served(x, y)), np.asarray(g_ref),
                       atol=1e-6)


def test_autotune_mechanics(tmp_path, monkeypatch):
    """autotune measures candidates (interpret kernels on CPU), returns a
    routed config, and caches the choice to a JSON sidecar."""
    import jax.numpy as jnp
    import numpy as np

    from sph_raytracer_tpu import (ConeRectGeom, Operator, SphericalGrid,
                                   TraceConfig, autotune)

    monkeypatch.setenv("SPH_TPU_TUNE_CACHE", str(tmp_path))
    grid = SphericalGrid(shape=(8, 8, 8), size_r=(1, 4))
    geom = ConeRectGeom((6, 8), (8, 0.5, 0.2), fov=(35, 35))
    base = TraceConfig(interpret=True, routed_g=128)
    cfg = autotune(grid, geom, candidates=[(4, 8), (8, 8)], config=base,
                   iters=1)
    assert cfg.mode == "routed" and cfg.routed_bands in (4, 8)
    import os
    assert any(f.startswith("tune_") for f in os.listdir(tmp_path))
    cfg2 = autotune(grid, geom, candidates=[(4, 8), (8, 8)], config=base,
                    iters=1)  # cached
    assert (cfg2.routed_bands, cfg2.routed_band_rows) == \
        (cfg.routed_bands, cfg.routed_band_rows)
    # cached_only: hits the sidecar without measuring...
    cfg3 = autotune(grid, geom, config=base, cached_only=True)
    assert (cfg3.routed_bands, cfg3.routed_band_rows) == \
        (cfg.routed_bands, cfg.routed_band_rows)
    # ...and passes the base config through when there is no sidecar
    geom2 = ConeRectGeom((6, 8), (9, 0.5, 0.2), fov=(35, 35))
    cfg4 = autotune(grid, geom2, config=base, cached_only=True)
    assert (cfg4.routed_bands, cfg4.routed_band_rows) == \
        (base.routed_bands, base.routed_band_rows)
    op = Operator(grid, geom, config=cfg)
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    op0 = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    assert np.allclose(np.asarray(op(x)), np.asarray(op0(x)), atol=1e-4)

    # legacy sidecars in the (RAM-backed) trace-cache dir are still read,
    # and migrated into the persistent tune dir on first hit
    legacy = tmp_path / "legacy"
    fresh = tmp_path / "fresh"
    legacy.mkdir()
    fresh.mkdir()
    import shutil
    name = next(f for f in os.listdir(tmp_path) if f.startswith("tune_"))
    shutil.move(str(tmp_path / name), str(legacy / name))
    monkeypatch.setenv("SPH_TPU_TUNE_CACHE", str(fresh))
    monkeypatch.setenv("SPH_TPU_TRACE_CACHE", str(legacy))
    cfg5 = autotune(grid, geom, config=base, cached_only=True)
    assert (cfg5.routed_bands, cfg5.routed_band_rows) == \
        (cfg.routed_bands, cfg.routed_band_rows)
    assert (fresh / name).exists()
