"""Time-interpolated 4D operators (``Operator(view_times=...)``).

The reference's 4D mode is one-view-per-bin nearest lookup
(raytracer.py:705-710).  ``view_times`` generalizes it: each view sees
the volume linearly interpolated between its two bracketing time bins,
and the view count is decoupled from the bin count.  Implemented by
doubling the crossing table with lerp-weighted segment lengths, so every
engine (XLA gather, routed kernels, sharded shard_map builds) consumes
it unchanged — these tests pin that equivalence.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.config import TraceConfig

F64 = jnp.float64


def _orbit(V, npix=4):
    return sum(
        ConeRectGeom((npix, npix),
                     pos=(2 * np.cos(th), 2 * np.sin(th), 0.3),
                     fov=(45, 45))
        for th in np.linspace(0, np.pi, V, endpoint=False)
    )


@pytest.fixture(scope="module")
def setup():
    T = 4
    grid = SphericalGrid(shape=(T, 5, 5, 5), size_t=(10.0, 40.0))
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(tuple(grid.shape)))
    return grid, vol


def test_integer_times_match_binned_dynamic(setup):
    grid, vol = setup
    T = grid.shape.t
    geom = _orbit(T)
    op_binned = Operator(grid, geom, ftype=jnp.float64)
    # times exactly on the grid's samples -> pure binning, w == 0
    op_t = Operator(grid, geom, ftype=jnp.float64,
                    view_times=np.asarray(grid.t))
    a = np.asarray(op_binned(vol))
    b = np.asarray(op_t(vol))
    assert np.allclose(a, b, atol=1e-12)


def test_fractional_lerp_identity(setup):
    grid, vol = setup
    V = 6  # view count decoupled from the T=4 bins
    geom = _orbit(V)
    t0, t1 = float(grid.t[0]), float(grid.t[-1])
    times = np.linspace(t0 + 1.0, t1 - 1.0, V)
    op = Operator(grid, geom, ftype=jnp.float64, view_times=times)

    # oracle: per-view lerp of two pure-bin operators
    fi = np.interp(times, np.asarray(grid.t),
                   np.arange(grid.shape.t, dtype=np.float64))
    k0 = np.floor(fi).astype(int)
    w = fi - k0
    op_k0 = Operator(grid, geom, ftype=jnp.float64,
                     view_times=np.asarray(grid.t)[k0])
    op_k1 = Operator(grid, geom, ftype=jnp.float64,
                     view_times=np.asarray(grid.t)[np.minimum(k0 + 1,
                                                              grid.shape.t - 1)])
    ref = ((1 - w)[:, None, None] * np.asarray(op_k0(vol))
           + w[:, None, None] * np.asarray(op_k1(vol)))
    assert np.allclose(np.asarray(op(vol)), ref, atol=1e-12)


def test_times_outside_axis_clamp(setup):
    grid, vol = setup
    V = 3
    geom = _orbit(V)
    t0, t1 = float(grid.t[0]), float(grid.t[-1])
    op = Operator(grid, geom, ftype=jnp.float64,
                  view_times=np.array([t0 - 5.0, 0.5 * (t0 + t1), t1 + 5.0]))
    op_ends = Operator(grid, geom, ftype=jnp.float64,
                       view_times=np.array([t0, 0.5 * (t0 + t1), t1]))
    assert np.allclose(np.asarray(op(vol)), np.asarray(op_ends(vol)),
                       atol=1e-12)


def test_adjoint_identity_and_grad(setup):
    grid, vol = setup
    V = 5
    geom = _orbit(V)
    times = np.linspace(float(grid.t[0]) + 2.0, float(grid.t[-1]) - 2.0, V)
    op = Operator(grid, geom, ftype=jnp.float64, view_times=times)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=tuple(grid.shape)), F64)
    y = jnp.asarray(rng.normal(size=(V, 4, 4)), F64)
    lhs = float(jnp.vdot(op(x), y))
    rhs = float(jnp.vdot(x, op.T(y)))
    assert np.isclose(lhs, rhs, rtol=1e-10)
    # autodiff gradient == adjoint application (linearity)
    g = jax.grad(lambda v: jnp.vdot(op(v), y))(x)
    assert np.allclose(np.asarray(g), np.asarray(op.T(y)), atol=1e-10)


def test_datetime_view_times():
    T = 3
    grid = SphericalGrid(shape=(T, 5, 5, 5), size_t=(0.0, 7200.0),
                         timeunit="s")
    geom = _orbit(T)
    rng = np.random.default_rng(1)
    vol = jnp.asarray(rng.random(tuple(grid.shape)))
    vt = grid.nptime  # exactly on the samples
    op_dt = Operator(grid, geom, ftype=jnp.float64, view_times=vt)
    op_bin = Operator(grid, geom, ftype=jnp.float64)
    assert np.allclose(np.asarray(op_dt(vol)), np.asarray(op_bin(vol)),
                       atol=1e-12)


def test_view_times_validation(setup):
    grid, vol = setup
    with pytest.raises(ValueError):  # count mismatch
        Operator(grid, _orbit(3), ftype=jnp.float64,
                 view_times=np.zeros(5))
    static = SphericalGrid(shape=(5, 5, 5))
    with pytest.raises(ValueError):  # static grid
        Operator(static, _orbit(3), view_times=np.zeros(3))


def test_fused_falls_back(setup):
    grid, vol = setup
    geom = _orbit(4)
    frac = np.asarray(grid.t) + 0.3 * np.diff(grid.t, append=grid.t[-1])
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        op = Operator(grid, geom, ftype=jnp.float64, mode="fused",
                      view_times=frac)
    assert op._mode == "precomputed"
    assert any("view_times" in str(w.message) for w in rec)
    # exact-bin times need no table doubling — fused mode stays fused
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        op2 = Operator(grid, geom, ftype=jnp.float64, mode="fused",
                       view_times=np.asarray(grid.t))
    assert op2._mode == "fused"
    assert not any("view_times" in str(w.message) for w in rec2)
    # and the binned fused forward matches the plain dynamic operator
    op_bin = Operator(grid, geom, ftype=jnp.float64)
    assert np.allclose(np.asarray(op2(vol)), np.asarray(op_bin(vol)),
                       atol=1e-10)


def test_routed_interpret_matches_precomputed(setup):
    grid, vol = setup
    V = 6
    geom = _orbit(V)
    times = np.linspace(float(grid.t[0]) + 3.0, float(grid.t[-1]) - 3.0, V)
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    op_r = Operator(grid, geom, config=cfg, view_times=times)
    op_p = Operator(grid, geom, mode="precomputed", view_times=times)
    v32 = vol.astype(jnp.float32)
    a = np.asarray(op_r(v32))
    b = np.asarray(op_p(v32))
    assert np.allclose(a, b, atol=1e-4)
    # adjoint through the routed engine too
    y = jnp.asarray(np.random.default_rng(2).random((V, 4, 4)), jnp.float32)
    assert np.allclose(np.asarray(op_r.T(y)), np.asarray(op_p.T(y)),
                       atol=1e-4)


def test_banded_cache_keyed_by_view_times(tmp_path, monkeypatch, setup):
    """Same geometry + grid, different view_times must not share a banded
    routed-table cache entry (regression: the key once hashed only
    spatial state, silently serving the first operator's lerp tables)."""
    monkeypatch.setenv("SPH_TPU_TRACE_CACHE", str(tmp_path))
    grid, vol = setup
    V = 6
    geom = _orbit(V)
    t0, t1 = float(grid.t[0]), float(grid.t[-1])
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    times_a = np.linspace(t0 + 1.0, t1 - 1.0, V)
    times_b = np.linspace(t0 + 4.0, t1 - 4.0, V)
    v32 = vol.astype(jnp.float32)
    op_a = Operator(grid, geom, config=cfg, view_times=times_a)
    ya = np.asarray(op_a(v32))
    op_b = Operator(grid, geom, config=cfg, view_times=times_b)  # warm cache dir
    yb = np.asarray(op_b(v32))
    # each must match its own precomputed oracle (no cross-hit)
    pa = np.asarray(Operator(grid, geom, mode="precomputed",
                             view_times=times_a)(v32))
    pb = np.asarray(Operator(grid, geom, mode="precomputed",
                             view_times=times_b)(v32))
    assert np.allclose(ya, pa, atol=1e-4)
    assert np.allclose(yb, pb, atol=1e-4)
    assert not np.allclose(ya, yb, atol=1e-4)  # genuinely different ops
    # static operator on the spatial grid shares geometry but not tables
    sgrid = SphericalGrid(shape=tuple(grid.shape)[1:])
    op_s = Operator(sgrid, geom, config=cfg)
    ys = np.asarray(op_s(jnp.asarray(
        np.asarray(vol)[0], jnp.float32)))
    ps = np.asarray(Operator(sgrid, geom, mode="precomputed")(
        jnp.asarray(np.asarray(vol)[0], jnp.float32)))
    assert np.allclose(ys, ps, atol=1e-4)


def test_fused_pallas_lerp_matches_precomputed(setup):
    """Round 4 (VERDICT r3 #6): time-interpolated 4D runs IN the fused
    Pallas kernel (two density streams + lerp weight per segment) —
    forward and gradient parity vs the doubled-table precomputed path."""
    grid, vol = setup
    geom = _orbit(6)
    frac = np.interp(np.linspace(0, 1, 6),
                     np.linspace(0, 1, grid.shape.t), np.asarray(grid.t))
    frac = frac + 0.37 * np.diff(np.asarray(grid.t),
                                 append=np.asarray(grid.t)[-1]).mean()
    cfg = TraceConfig(mode="fused", interpret=True,
                      fused_backend="pallas", ftype=jnp.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        op_f = Operator(grid, geom, config=cfg, view_times=frac)
    assert op_f._mode == "fused", [str(w.message) for w in rec]
    assert op_f._time_w is not None  # genuinely fractional
    op_p = Operator(grid, geom, ftype=jnp.float32, view_times=frac)
    v32 = vol.astype(jnp.float32)
    yf = np.asarray(op_f(v32))
    yp = np.asarray(op_p(v32))
    assert np.allclose(yf, yp, atol=5e-3), np.abs(yf - yp).max()
    y0 = jnp.asarray(yp)
    gf = np.asarray(jax.grad(
        lambda d: jnp.mean((op_f(d) - y0) ** 2))(v32))
    gp = np.asarray(jax.grad(
        lambda d: jnp.mean((op_p(d) - y0) ** 2))(v32))
    assert np.allclose(gf, gp, atol=1e-5), np.abs(gf - gp).max()


def test_sharded_fused_lerp_correct(setup):
    """Regression (round-4 review): ShardedOperator with mode='fused'
    and fractional view_times must lerp — either through the per-shard
    Pallas engine or by demoting to precomputed — never silently drop
    the interpolation."""
    from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh

    grid, vol = setup
    geom = _orbit(4)
    frac = np.asarray(grid.t) + 0.4 * np.diff(grid.t, append=grid.t[-1])
    cfg = TraceConfig(mode="fused", interpret=True,
                      fused_backend="pallas", ftype=jnp.float32)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg,
                          view_times=frac)
    op = Operator(grid, geom, ftype=jnp.float32, view_times=frac)
    v32 = vol.astype(jnp.float32)
    ys = np.asarray(sop(v32))
    yp = np.asarray(op(v32))
    assert np.allclose(ys, yp, atol=5e-3), np.abs(ys - yp).max()
    # and the XLA-only sharded path demotes (with a warning) instead of
    # dropping the lerp
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sop2 = ShardedOperator(grid, geom, mesh=make_mesh(),
                               config=cfg.replace(fused_backend="xla"),
                               view_times=frac)
    assert sop2._mode == "precomputed"
    assert any("view_times" in str(w.message) for w in rec)
    assert np.allclose(np.asarray(sop2(v32)), yp, atol=5e-3)
