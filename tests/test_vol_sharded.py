"""Volume-sharded operator (parallel/vol_sharded.py): density rows and
banded tables split by window range across the 8-device CPU mesh; the
forward psums partial images, the backward's density gradient comes out
row-sharded with no collective.  Must match the single-device operator.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.config import TraceConfig
from sph_raytracer_tpu.parallel import VolShardedOperator, make_mesh


@pytest.fixture(scope="module")
def setup():
    grid = SphericalGrid(shape=(16, 12, 12))
    geom = sum(
        ConeRectGeom((8, 12), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 4, endpoint=False)
    )
    x = jnp.asarray(
        np.random.default_rng(0).random(tuple(grid.shape)), jnp.float32)
    op = Operator(grid, geom, ftype=jnp.float32)
    return grid, geom, op, x


def _cfg():
    return TraceConfig(mode="routed", interpret=True, routed_g=128,
                       routed_bands=4, routed_chunk_multiple=2)


def test_vol_sharded_matches_single_device(setup):
    grid, geom, op, x = setup
    sop = VolShardedOperator(grid, geom, mesh=make_mesh(), config=_cfg())
    y = np.asarray(sop(x))
    y0 = np.asarray(op(x))
    assert np.allclose(y, y0, atol=1e-4), np.abs(y - y0).max()
    # gradient: rides the banded transpose per slab, no psum needed
    yj = jnp.asarray(y0)
    g = jax.grad(lambda d: jnp.mean((sop(d) - yj) ** 2))(x)
    g0 = jax.grad(lambda d: jnp.mean((op(d) - yj) ** 2))(x)
    assert np.allclose(np.asarray(g), np.asarray(g0), atol=1e-5), \
        np.abs(np.asarray(g) - np.asarray(g0)).max()
    # adjoint
    bt = np.asarray(sop.T(yj))
    b0 = np.asarray(op.T(yj))
    assert np.allclose(bt, b0, atol=1e-4), np.abs(bt - b0).max()


def test_vol_sharded_table_memory_splits(setup):
    """Each device holds only its window range's bands: per-device table
    rows must sum to ~the single build's (plus padding), and the density
    image arrives row-sharded."""
    grid, geom, op, x = setup
    mesh = make_mesh()
    sop = VolShardedOperator(grid, geom, mesh=mesh, config=_cfg())
    D = mesh.devices.size
    assert sop._ft["w"].shape[0] == D
    # windows partition: every live window appears on exactly one device
    cov = np.asarray(sop._bt["covered"])
    assert cov.ndim == 2 and cov.shape[0] == D


def test_vol_sharded_payload_threading(setup):
    grid, geom, op, x = setup
    sop = VolShardedOperator(grid, geom, mesh=make_mesh(), config=_cfg())
    y0 = sop(x)

    @jax.jit
    def step(d, pl):
        fx = sop.with_payload(pl)
        return jax.grad(lambda v: jnp.mean((fx(v) - y0) ** 2))(d)

    g = step(x, sop.payload)
    g0 = jax.grad(lambda d: jnp.mean((sop(d) - y0) ** 2))(x)
    assert np.allclose(np.asarray(g), np.asarray(g0), atol=1e-6)


def test_vol_sharded_4d_lerp(setup):
    """Time-interpolated 4D through the volume sharding (offsets extend
    H with time blocks; windows partition the extended rows)."""
    T = 3
    grid = SphericalGrid(shape=(T, 8, 8, 8), size_t=(0.0, 10.0))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 4, endpoint=False))
    times = np.array([0.0, 3.3, 6.7, 10.0])
    x = jnp.asarray(
        np.random.default_rng(1).random(tuple(grid.shape)), jnp.float32)
    sop = VolShardedOperator(grid, geom, mesh=make_mesh(), config=_cfg(),
                             view_times=times)
    op = Operator(grid, geom, ftype=jnp.float32, view_times=times)
    assert np.allclose(np.asarray(sop(x)), np.asarray(op(x)), atol=1e-4)


def test_vol_sharded_gd_convergence(setup):
    """The retrieval driver duck-types VolShardedOperator (payload /
    with_payload / grid) — a few gd steps must reduce the loss."""
    from sph_raytracer_tpu.loss import SquareLoss
    from sph_raytracer_tpu.models import FullyDenseModel
    from sph_raytracer_tpu.retrieval import gd

    grid, geom, op, x = setup
    sop = VolShardedOperator(grid, geom, mesh=make_mesh(), config=_cfg())
    y = sop(x)
    coeffs, reproj, losses = gd(sop, y, FullyDenseModel(grid),
                                num_iterations=4, chunk=2,
                                progress_bar=False,
                                loss_fns=[SquareLoss()], learning_rate=0.1)
    hist = losses[next(iter(losses))]
    assert len(hist) == 4 and hist[-1] < hist[0]


def test_solvers_with_vol_sharded_operator(setup):
    """solve.cg and solve.mlem over the VOLUME-sharded operator
    (VERDICT r4 #7): payload threading carries the window-range table
    shards through the compiled sweeps; solutions match the
    single-device solvers."""
    from sph_raytracer_tpu.solve import cg, mlem

    grid, geom, op, x = setup
    vop = VolShardedOperator(grid, geom, mesh=make_mesh(), config=_cfg())
    y = op(x)
    xs, rs, _ = cg(vop, y, num_iterations=25, damp=1e-6)
    xp, rp, _ = cg(op, y, num_iterations=25, damp=1e-6)
    assert np.allclose(np.asarray(xs), np.asarray(xp), atol=1e-4)
    xm_s, _, _ = mlem(vop, y, num_iterations=5)
    xm_p, _, _ = mlem(op, y, num_iterations=5)
    assert np.allclose(np.asarray(xm_s), np.asarray(xm_p), atol=1e-5)


def test_vol_sharded_channels(setup):
    """Multi-channel __call__/T() through the volume-sharded engine runs
    as one compiled scan dispatch (round 5) and matches per-channel
    calls bitwise."""
    grid, geom, op, x = setup
    vop = VolShardedOperator(grid, geom, mesh=make_mesh(), config=_cfg())
    xc = jnp.stack([x, x * 0.5 + 0.1])
    yb = np.asarray(vop(xc))
    yl = np.stack([np.asarray(vop(xc[i])) for i in range(2)])
    assert np.array_equal(yb, yl)
    tb = np.asarray(vop.T(yb))
    tl = np.stack([np.asarray(vop.T(yb[i])) for i in range(2)])
    assert np.array_equal(tb, tl)
