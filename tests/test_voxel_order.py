"""Voxel-order option of the routed engine (config.routed_voxel_order).

The routed tables may be built in a radius-innermost linearization
('r') instead of the canonical azimuth-innermost order ('a'): each
ray's consecutive same-(e,a) crossings then share a 128-lane density
row, clustering crossings into fewer 8-row bands on crossing-dense
volumes.  The relabel is internal — density arguments, outputs, lin
mirrors and gradients stay in the canonical layout — so the whole
engine must be order-transparent.  (Reference has no analog: its
Operator gathers from the (r, e, a)-indexed tensor directly,
raytracer.py:692-713.)
"""
import jax
import jax.numpy as jnp
import numpy as np

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.config import TraceConfig
from sph_raytracer_tpu.ops.trace import (
    voxel_order_flat,
    voxel_order_lin,
    voxel_order_unflat,
)


def test_voxel_order_helpers_consistent():
    """flat'[lin'] == flat[lin] for every voxel id, including 4D t·V
    offsets; unflat inverts flat."""
    rng = np.random.default_rng(0)
    vshape = (5, 3, 4)
    V = int(np.prod(vshape))
    for T in (1, 3):
        flat = rng.random(T * V).astype(np.float32)
        lin = np.arange(T * V, dtype=np.int32)
        lin_r = voxel_order_lin(lin, vshape, "r")
        flat_r = np.asarray(voxel_order_flat(jnp.asarray(flat), vshape, "r"))
        assert np.array_equal(flat_r[lin_r], flat[lin])
        # a permutation (bijective relabel)
        assert np.array_equal(np.sort(lin_r), lin)
        back = np.asarray(voxel_order_unflat(
            jnp.asarray(flat_r), vshape, "r"))
        assert np.array_equal(back, flat)
    # 'a' is the identity
    assert voxel_order_lin(lin, vshape, "a") is lin


def test_voxel_order_routed_parity():
    """Banded routed engine with routed_voxel_order='r' matches the XLA
    precomputed operator: forward, gradient, adjoint."""
    grid = SphericalGrid(shape=(32, 16, 16))
    geom = sum(
        ConeRectGeom((8, 10), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False)
    )
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2, routed_voxel_order="r")
    op_r = Operator(grid, geom, config=cfg)
    op_a = Operator(grid, geom, mode="precomputed")
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_r(x)), np.asarray(op_a(x)), atol=1e-4)
    y = op_a(x)
    ga = jax.grad(lambda d: jnp.mean((op_a(d) - y) ** 2))(x)
    gr = jax.grad(lambda d: jnp.mean((op_r(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(gr), np.asarray(ga), atol=1e-5)
    assert np.allclose(np.asarray(op_r.T(y)), np.asarray(op_a.T(y)),
                       atol=1e-4)
    # adjoint identity survives the relabel: <Ax, y> == <x, A'y>
    assert np.isclose(float(jnp.vdot(op_r(x), y)),
                      float(jnp.vdot(x, op_r.T(y))), rtol=1e-4)


def test_voxel_order_device_build_parity():
    """The on-device router path (routed_build='device') relabels too —
    tables must match the host build byte-for-byte given the same trace
    order, so forward/grad parity vs precomputed suffices here."""
    grid = SphericalGrid(shape=(16, 8, 8))
    geom = ConeRectGeom((8, 10), (2.0, 0.5, 0.4), fov=(45, 45))
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2, routed_voxel_order="r",
                      routed_build="device")
    op_d = Operator(grid, geom, config=cfg)
    op_a = Operator(grid, geom, mode="precomputed")
    x = jnp.asarray(np.random.default_rng(5).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_d(x)), np.asarray(op_a(x)), atol=1e-4)
    y = op_a(x)
    gd_ = jax.grad(lambda d: jnp.mean((op_d(d) - y) ** 2))(x)
    ga = jax.grad(lambda d: jnp.mean((op_a(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(gd_), np.asarray(ga), atol=1e-5)


def test_voxel_order_dynamic_4d():
    """Per-view time offsets (t·V multiples) relabel per slice."""
    T = 3
    grid = SphericalGrid(shape=(T, 6, 6, 6))
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, T, endpoint=False)
    )
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2, routed_voxel_order="r")
    op_r = Operator(grid, geom, config=cfg)
    op_a = Operator(grid, geom, mode="precomputed")
    x = jnp.asarray(np.random.default_rng(1).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_r(x)), np.asarray(op_a(x)), atol=1e-4)
    y = op_a(x)
    assert np.allclose(np.asarray(op_r.T(y)), np.asarray(op_a.T(y)),
                       atol=1e-4)


def test_voxel_order_view_times_lerp():
    """Time-interpolated 4D (view_times doubles the crossing table) under
    the relabel."""
    T = 3
    grid = SphericalGrid(shape=(T, 6, 6, 6), t=(0.0, 1.0, 2.0))
    nviews = 4
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, nviews, endpoint=False)
    )
    vt = np.array([0.0, 0.4, 1.3, 2.0])
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2, routed_voxel_order="r")
    op_r = Operator(grid, geom, config=cfg, view_times=vt)
    op_a = Operator(grid, geom, mode="precomputed", view_times=vt)
    x = jnp.asarray(np.random.default_rng(2).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_r(x)), np.asarray(op_a(x)), atol=1e-4)


def test_voxel_order_sharded():
    """ShardedOperator banded path honors the relabel (8-device CPU
    mesh, interpret kernels)."""
    from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh

    grid = SphericalGrid(shape=(16, 8, 8))
    geom = sum(
        ConeRectGeom((8, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 2, endpoint=False)
    )
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2, routed_voxel_order="r")
    mesh = make_mesh()
    op_s = ShardedOperator(grid, geom, mesh=mesh, config=cfg)
    op_a = Operator(grid, geom, mode="precomputed")
    x = jnp.asarray(np.random.default_rng(3).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_s(x)), np.asarray(op_a(x)), atol=1e-4)
    y = op_a(x)
    gs_ = jax.grad(lambda d: jnp.mean((op_s(d) - y) ** 2))(x)
    ga = jax.grad(lambda d: jnp.mean((op_a(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(gs_), np.asarray(ga), atol=1e-5)
    assert np.allclose(np.asarray(op_s.T(y)), np.asarray(op_a.T(y)),
                       atol=1e-4)


def test_voxel_order_rejects_unknown():
    import pytest

    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((4, 4), (3.0, 0.0, 0.3), fov=(30, 30))
    with pytest.raises(ValueError):
        Operator(grid, geom,
                 config=TraceConfig(mode="routed", interpret=True,
                                    routed_voxel_order="z"))
