"""Operator integration tests: shape matrix, channel broadcasting, dynamic
4D semantics (reference test_raytracer.py:54-82), plus the checks the
reference lacks (SURVEY §4): adjoint identity ⟨Ax,y⟩=⟨x,Aᵀy⟩, autodiff
gradient vs adjoint, fused-vs-precomputed cross-validation."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import (
    ConeCircGeom,
    ConeRectGeom,
    Operator,
    ParallelGeom,
    SphericalGrid,
    ViewGeomCollection,
)

F64 = jnp.float64


@pytest.fixture(scope="module")
def small():
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((6, 6), pos=(2.0, 0, 0), fov=(40, 40))
    op = Operator(grid, geom, ftype=jnp.float64)
    return grid, geom, op


def test_uniform_sphere_image(small):
    grid, geom, op = small
    img = np.asarray(op(jnp.ones(grid.shape, F64)))
    assert img.shape == (6, 6)
    # central pixels pass near the center: integral ≈ 2·r_max
    assert img.max() <= 2.0 + 1e-2
    assert img.max() >= 2.0 - 5e-2


def test_hollow_sphere(small):
    grid, geom, op = small
    density = np.zeros(grid.shape)
    density[-1] = 1.0  # outermost shell only
    img = np.asarray(op(jnp.asarray(density)))
    # every ray hitting the sphere crosses the outer shell twice
    shell = (grid.r_b[-1] - grid.r_b[-2])
    assert img.max() >= 2 * shell * 0.9


def test_channel_broadcasting(small):
    grid, geom, op = small
    d = jnp.ones((3, 2, *grid.shape), F64)
    out = op(d)
    assert out.shape == (3, 2, 6, 6)
    single = op(jnp.ones(grid.shape, F64))
    assert np.allclose(np.asarray(out[1, 1]), np.asarray(single))


def test_operator_shape_matrix():
    grid = SphericalGrid(shape=(5, 6, 7))
    for geom in [
        ConeRectGeom((4, 3), pos=(2.0, 0, 0)),
        ConeCircGeom((3, 5), pos=(0, 2.0, 0), fov=(5, 30)),
        ParallelGeom((4, 4), pos=(0, 0, 2.0), size=(1.5, 1.5)),
    ]:
        op = Operator(grid, geom)
        out = op(jnp.ones(grid.shape))
        assert out.shape == tuple(geom.shape)

    col = sum(
        ConeRectGeom((4, 3), pos=p)
        for p in [(2.0, 0, 0), (0, 2.0, 0), (0, 0, 2.0)]
    )
    op = Operator(grid, col)
    out = op(jnp.ones(grid.shape))
    assert out.shape == (3, 4, 3)


def test_adjoint_dot_product(small):
    """⟨Ax, y⟩ == ⟨x, Aᵀy⟩ — the fundamental adjoint identity."""
    grid, geom, op = small
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=grid.shape), F64)
    y = jnp.asarray(rng.normal(size=geom.shape), F64)
    lhs = float(jnp.vdot(op(x), y))
    rhs = float(jnp.vdot(x, op.T(y)))
    assert np.isclose(lhs, rhs, rtol=1e-10)


def test_grad_matches_adjoint(small):
    """d/dx ⟨Ax, y⟩ = Aᵀy: autodiff through the forward equals the adjoint."""
    grid, geom, op = small
    rng = np.random.default_rng(4)
    y = jnp.asarray(rng.normal(size=geom.shape), F64)
    g = jax.grad(lambda d: jnp.vdot(op(d), y))(jnp.zeros(grid.shape, F64))
    bp = op.T(y)
    assert np.allclose(np.asarray(g), np.asarray(bp), atol=1e-10)


def test_fused_matches_precomputed(small):
    grid, geom, _ = small
    rng = np.random.default_rng(5)
    d = jnp.asarray(rng.uniform(size=grid.shape), F64)
    op_a = Operator(grid, geom, mode="precomputed", ftype=jnp.float64)
    op_b = Operator(grid, geom, mode="fused", ftype=jnp.float64)
    ya, yb = np.asarray(op_a(d)), np.asarray(op_b(d))
    assert np.allclose(ya, yb, atol=1e-10)
    # gradients agree too
    y = jnp.asarray(rng.normal(size=geom.shape), F64)
    ga = jax.grad(lambda x: jnp.vdot(op_a(x), y))(d)
    gb = jax.grad(lambda x: jnp.vdot(op_b(x), y))(d)
    assert np.allclose(np.asarray(ga), np.asarray(gb), atol=1e-10)


def test_dynamic_operator():
    """4D dynamic grid: view i sees only time bin i
    (reference raytracer.py:705-710)."""
    T = 4
    grid = SphericalGrid(shape=(T, 6, 6, 6))
    col = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(th), 2 * np.sin(th), 0))
        for th in np.linspace(0, np.pi, T, endpoint=False)
    )
    op = Operator(grid, col, ftype=jnp.float64)
    # density nonzero only in time bin 2
    d = np.zeros(grid.shape)
    d[2] = 1.0
    out = np.asarray(op(jnp.asarray(d)))
    assert out.shape == (T, 5, 5)
    assert np.abs(out[[0, 1, 3]]).max() == 0.0
    assert out[2].max() > 1.0  # chord through the unit sphere

    # static uniform volume through every time bin == static operator result
    d_all = jnp.ones(grid.shape, F64)
    out_all = np.asarray(op(d_all))
    static_grid = SphericalGrid(shape=(6, 6, 6))
    out_static = np.asarray(
        Operator(static_grid, col, ftype=jnp.float64)(jnp.ones((6, 6, 6), F64))
    )
    assert np.allclose(out_all, out_static, atol=1e-10)


def test_dynamic_adjoint():
    """The reference raises NotImplementedError for 4D adjoints
    (raytracer.py:732-734); we support them — verify the identity."""
    T = 3
    grid = SphericalGrid(shape=(T, 5, 5, 5))
    col = sum(ConeRectGeom((4, 4), pos=(2.0, 0.1 * i, 0)) for i in range(T))
    op = Operator(grid, col, ftype=jnp.float64)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=grid.shape), F64)
    y = jnp.asarray(rng.normal(size=(T, 4, 4)), F64)
    lhs = float(jnp.vdot(op(x), y))
    rhs = float(jnp.vdot(x, op.T(y)))
    assert np.isclose(lhs, rhs, rtol=1e-10)


def test_dynamic_shape_validation():
    grid = SphericalGrid(shape=(4, 5, 5, 5))
    bad = sum(ConeRectGeom((4, 4), pos=(2.0, 0.1 * i, 0)) for i in range(3))
    with pytest.raises(ValueError):
        Operator(grid, bad)


def test_parallel_beam_integral():
    """Parallel beams at known impact parameters: chord = 2√(R²−b²)."""
    grid = SphericalGrid(shape=(16, 16, 16))
    geom = ParallelGeom((9, 9), pos=(3.0, 0, 0), size=(1.6, 1.6))
    op = Operator(grid, geom, ftype=jnp.float64)
    img = np.asarray(op(jnp.ones(grid.shape, F64)))
    b = np.linalg.norm(
        np.asarray(geom.ray_starts)[..., 1:] - 0.0, axis=-1
    )  # impact parameter = distance from x-axis
    expect = 2 * np.sqrt(np.clip(1 - b**2, 0, None))
    assert np.allclose(img, expect, atol=2e-2)


def test_repr(small):
    grid, geom, op = small
    assert "8, 8, 8" in repr(op)
    assert "6, 6" in repr(op)


def test_routed_f64_falls_back():
    """Routed tables are f32 (ops/route.py); a non-f32 operator must fall
    back to the XLA path with a warning rather than silently degrade."""
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((6, 6), pos=(2.0, 0, 0), fov=(40, 40))
    with pytest.warns(UserWarning, match="falling back"):
        op = Operator(grid, geom, mode="routed", ftype=jnp.float64)
    assert op._mode == "precomputed"
    img = np.asarray(op(jnp.ones(grid.shape, F64)))
    assert np.isfinite(img).all()


def test_trace_cache_roundtrip(tmp_path, monkeypatch):
    """SPH_TPU_TRACE_CACHE: second construction loads identical tables."""
    monkeypatch.setenv("SPH_TPU_TRACE_CACHE", str(tmp_path))
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((6, 6), pos=(2.0, 0, 0), fov=(40, 40))
    x = jnp.ones(grid.shape, jnp.float32)
    y1 = np.asarray(Operator(grid, geom)(x))
    assert len(list(tmp_path.glob("trace_*.npz"))) == 1
    y2 = np.asarray(Operator(grid, geom)(x))
    assert np.array_equal(y1, y2)
    # a different geometry must get its own cache entry
    geom2 = ConeRectGeom((6, 6), pos=(3.0, 0, 0), fov=(40, 40))
    Operator(grid, geom2)
    assert len(list(tmp_path.glob("trace_*.npz"))) == 2


def test_interior_viewer_half_line():
    """A viewer inside the grid integrates only the forward path (here
    from r=0.5 out through r=1 ⇒ ≈0.5).  The reference integrates the
    whole line and dumps the behind-path into the start voxel despite
    marking behind-start crossings invalid (raytracer.py:125-137) —
    documented divergence; see tests/test_trace.py::test_start_inside_grid."""
    from sph_raytracer_tpu import ViewGeom

    grid = SphericalGrid(shape=(16, 8, 8))
    geom = ViewGeom(np.array([[0.5, 1e-3, 1e-3]]), np.array([[1.0, 0, 0]]))
    op = Operator(grid, geom, ftype=F64)
    val = float(op(jnp.ones(grid.shape, F64))[0])
    assert np.isclose(val, 0.5, atol=1e-2), val


def test_fused_matches_precomputed_nonunit_grid():
    """Cross-mode agreement on a non-unit grid with near-axis rays — the
    config where event-fill labeling diverged between program shapes."""
    grid = SphericalGrid(shape=(8, 8, 8), size_r=(0, 5))
    geom = ConeRectGeom((6, 7), pos=(10.0, 1e-3, 2e-3), fov=(30, 30))
    rng = np.random.default_rng(7)
    d = jnp.asarray(rng.uniform(size=grid.shape), F64)
    op_a = Operator(grid, geom, mode="precomputed", ftype=jnp.float64)
    op_b = Operator(grid, geom, mode="fused", ftype=jnp.float64)
    assert np.allclose(np.asarray(op_a(d)), np.asarray(op_b(d)), atol=1e-9)


def test_trace_method_ranked_matches_sorted():
    """`trace_method='ranked'` (the on-TPU auto choice) produces the same
    forward projection and volume gradient as the sorted pipeline through
    the full precomputed-mode Operator."""
    grid = SphericalGrid(shape=(8, 8, 8), size_r=(0, 3))
    geom = ConeRectGeom((6, 7), pos=(6.0, 1e-3, 2e-3), fov=(35, 35))
    rng = np.random.default_rng(3)
    d = jnp.asarray(rng.uniform(size=grid.shape), F64)
    op_s = Operator(grid, geom, mode="precomputed", ftype=jnp.float64,
                    trace_method="sorted")
    op_r = Operator(grid, geom, mode="precomputed", ftype=jnp.float64,
                    trace_method="ranked")
    assert np.allclose(np.asarray(op_s(d)), np.asarray(op_r(d)), atol=1e-9)
    y = jnp.asarray(rng.uniform(size=(6, 7)), F64)
    gs_ = jax.grad(lambda v: jnp.vdot(op_s(v), y))(d)
    gr_ = jax.grad(lambda v: jnp.vdot(op_r(v), y))(d)
    assert np.allclose(np.asarray(gs_), np.asarray(gr_), atol=1e-9)


def test_itype_overflow_guard():
    """Linear voxel ids exceeding the index dtype raise instead of
    silently wrapping (reference overflow assert, raytracer.py:273)."""
    import jax.numpy as jnp_

    grid = SphericalGrid(shape=(8, 8, 8))  # 512 linear voxels
    geom = ConeRectGeom((2, 2), pos=(3.0, 0, 0))
    with pytest.raises(OverflowError):
        Operator(grid, geom, itype=jnp_.int8, _compute=False)
    Operator(grid, geom, itype=jnp_.int16, _compute=False)  # 512 fit int16


def test_regs_size_guard(small, monkeypatch):
    """Operator.regs warns before materializing the (3, rays, M) tensor
    above REGS_WARN_ELEMS rays*M (VERDICT r4 weak #6) — at production
    scale that is a GB-class device allocation reachable from a bare
    attribute access.  Below the threshold: silent; above (threshold
    lowered for the test): one warning, same tensor."""
    import warnings

    grid, geom, op = small
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        r0 = np.asarray(op.regs)  # small problem: no warning
    monkeypatch.setattr(Operator, "REGS_WARN_ELEMS", 10)
    with pytest.warns(UserWarning, match="materializes"):
        r1 = np.asarray(op.regs)
    assert np.array_equal(r0, r1)
    assert r0.shape[0] == 3 and r0.shape[1:-1] == tuple(geom.shape)
