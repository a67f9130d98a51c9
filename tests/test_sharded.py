"""Multi-device sharding tests on the 8-device fake CPU mesh (SURVEY §4:
the multi-node-without-a-cluster mechanism; the reference has no
distributed layer at all)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh


@pytest.fixture(scope="module")
def setup():
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = sum(
        ConeRectGeom((6, 7), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 5, endpoint=False)
    )
    op = Operator(grid, geom, ftype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)))
    return grid, geom, op, x


def test_mesh_has_8_devices():
    assert make_mesh().devices.size == 8


@pytest.mark.parametrize("mode", ["precomputed", "fused"])
def test_sharded_matches_single_device(setup, mode):
    grid, geom, op, x = setup
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), mode=mode,
                          ftype=jnp.float64)
    assert np.allclose(np.asarray(sop(x)), np.asarray(op(x)), atol=1e-10)


def test_sharded_gradient_psum(setup):
    """Gradient of the replicated volume is the full psum'd gradient."""
    grid, geom, op, x = setup
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), ftype=jnp.float64)
    y = op(x)
    g_ref = jax.grad(lambda d: jnp.mean((op(d) - y) ** 2))(x)
    g_sh = jax.grad(lambda d: jnp.mean((sop(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-10)


def test_sharded_adjoint(setup):
    grid, geom, op, x = setup
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), ftype=jnp.float64)
    y = jnp.asarray(
        np.random.default_rng(1).random(tuple(geom.shape)))
    assert np.allclose(np.asarray(sop.T(y)), np.asarray(op.T(y)), atol=1e-10)


def test_sharded_channels(setup):
    grid, geom, op, x = setup
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), ftype=jnp.float64)
    xc = jnp.stack([x, 2 * x])
    out = sop(xc)
    assert out.shape == (2, *geom.shape)
    assert np.allclose(np.asarray(out), np.asarray(op(xc)), atol=1e-10)


def test_sharded_uneven_rays():
    """Ray count not divisible by the mesh: padding handles it."""
    grid = SphericalGrid(shape=(5, 5, 5))
    geom = ConeRectGeom((3, 5), pos=(2.0, 0.3, 0.2), fov=(40, 40))  # 15 rays
    op = Operator(grid, geom, ftype=jnp.float64)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), ftype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(2).random((5, 5, 5)))
    assert np.allclose(np.asarray(sop(x)), np.asarray(op(x)), atol=1e-10)


def test_sharded_dynamic_4d():
    T = 4
    grid = SphericalGrid(shape=(T, 6, 6, 6))
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, T, endpoint=False)
    )
    op = Operator(grid, geom, ftype=jnp.float64)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), ftype=jnp.float64)
    x = jnp.asarray(np.random.default_rng(3).random(tuple(grid.shape)))
    assert np.allclose(np.asarray(sop(x)), np.asarray(op(x)), atol=1e-10)


def test_submesh():
    """Operator on a 4-device submesh."""
    grid = SphericalGrid(shape=(5, 5, 5))
    geom = ConeRectGeom((4, 4), pos=(2.0, 0.3, 0.2), fov=(40, 40))
    mesh = make_mesh(jax.devices()[:4])
    sop = ShardedOperator(grid, geom, mesh=mesh, ftype=jnp.float64)
    x = jnp.ones((5, 5, 5))
    op = Operator(grid, geom, ftype=jnp.float64)
    assert np.allclose(np.asarray(sop(x)), np.asarray(op(x)), atol=1e-10)


def test_sharded_routed_matches_single_device(setup):
    """mode='routed' ShardedOperator (reference impl on CPU mesh) matches
    the single-device operator for forward, gradient, and adjoint."""
    grid, geom, op, x = setup
    from sph_raytracer_tpu.parallel.sharded import ShardedOperator

    sop = ShardedOperator(grid, geom, mesh=make_mesh(), mode="routed")
    x32 = x.astype(jnp.float32)
    op32 = Operator(grid, geom)
    assert np.allclose(np.asarray(sop(x32)), np.asarray(op32(x32)),
                       atol=1e-4)
    y = op32(x32)
    g_ref = jax.grad(lambda d: jnp.mean((op32(d) - y) ** 2))(x32)
    g_sh = jax.grad(lambda d: jnp.mean((sop(d) - y) ** 2))(x32)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-4)
    bp_ref = np.asarray(op32.T(y))
    bp_sh = np.asarray(sop.T(y))
    assert np.allclose(bp_sh, bp_ref, atol=1e-4)


def test_sharded_banded_matches_single_device(setup):
    """Band-compacted sharded engine (interpret kernels on the CPU mesh):
    forward, gradient (psum), and adjoint match the single-device op."""
    grid, geom, op, x = setup
    from sph_raytracer_tpu.config import TraceConfig

    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    assert sop._sharded_routed == "banded"
    x32 = x.astype(jnp.float32)
    op32 = Operator(grid, geom)
    assert np.allclose(np.asarray(sop(x32)), np.asarray(op32(x32)),
                       atol=1e-4)
    y = op32(x32)
    g_ref = jax.grad(lambda d: jnp.mean((op32(d) - y) ** 2))(x32)
    g_sh = jax.grad(lambda d: jnp.mean((sop(d) - y) ** 2))(x32)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-4)
    assert np.allclose(np.asarray(sop.T(y)), np.asarray(op32.T(y)),
                       atol=1e-4)


def test_sharded_routed_f64_falls_back(setup):
    """mode='routed' with a non-f32 ftype falls back to precomputed (the
    routed tables are f32-only; Mosaic rejects 64-bit types) instead of
    crashing in kernel lowering — same guard as the single-device Operator."""
    grid, geom, op, x = setup
    with pytest.warns(UserWarning, match="routed mode requires float32"):
        sop = ShardedOperator(grid, geom, mesh=make_mesh(), mode="routed",
                              ftype=jnp.float64)
    assert sop._mode == "precomputed"
    assert np.allclose(np.asarray(sop(x)), np.asarray(op(x)), atol=1e-10)


def test_make_mesh_int():
    """make_mesh accepts a device count."""
    m = make_mesh(4)
    assert m.devices.size == 4
    with pytest.raises(ValueError):
        make_mesh(99)


def test_sharded_payload_threading(setup):
    """ShardedOperator.payload exposes the routed device tables so callers
    (retrieval.gd) thread them through jit as *arguments*; baking them in
    as trace constants would bloat the HLO (and break relayed
    remote-compile at production table sizes)."""
    from sph_raytracer_tpu.config import TraceConfig

    grid, geom, op, x = setup
    x32 = x.astype(jnp.float32)
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    for sop in (
        ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg),
        ShardedOperator(grid, geom, mesh=make_mesh(), mode="routed"),
    ):
        pl = sop.payload
        leaves = jax.tree_util.tree_leaves(pl)
        assert leaves, "routed tables must be exposed via payload"
        out = jax.jit(lambda d, p: sop.with_payload(p)(d))(x32, pl)
        assert np.allclose(np.asarray(out), np.asarray(sop(x32)), atol=1e-5)


def test_gd_with_sharded_operator(setup):
    """retrieval.gd drives the sharded banded engine end-to-end (the pod
    training path: shard_map kernels + psum'd gradients inside the scan)."""
    from sph_raytracer_tpu.config import TraceConfig
    from sph_raytracer_tpu.loss import SquareLoss
    from sph_raytracer_tpu.models import FullyDenseModel
    from sph_raytracer_tpu.retrieval import gd

    grid, geom, op, x = setup
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    y = sop(x.astype(jnp.float32))
    coeffs, reproj, losses = gd(
        sop, y, FullyDenseModel(grid),
        num_iterations=4, chunk=2, progress_bar=False,
        loss_fns=[SquareLoss()], learning_rate=0.1)
    hist = losses[next(iter(losses))]
    assert len(hist) == 4
    assert hist[-1] < hist[0]


def test_process_local_build_bit_identical(setup):
    """The multi-host (process-local) banded table build — each shard
    traced + routed independently of the others — produces byte-identical
    device tables, metas, and results to the global single-build (the
    correctness contract that lets each pod host build only its own ray
    ranges)."""
    grid, geom, op, x = setup
    from sph_raytracer_tpu.config import TraceConfig

    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128)
    sop_g = ShardedOperator(grid, geom, mesh=make_mesh(),
                            config=cfg.replace(sharded_local_build=False))
    sop_l = ShardedOperator(grid, geom, mesh=make_mesh(),
                            config=cfg.replace(sharded_local_build=True))
    assert sop_l._sharded_routed == "banded"
    assert sop_g._sb_meta == sop_l._sb_meta
    assert sop_g._sb_metab == sop_l._sb_metab
    for k in sop_g._sb_ft:
        a, b = np.asarray(sop_g._sb_ft[k]), np.asarray(sop_l._sb_ft[k])
        assert a.shape == b.shape and np.array_equal(a, b), k
    for k in sop_g._sb_bt:
        a, b = np.asarray(sop_g._sb_bt[k]), np.asarray(sop_l._sb_bt[k])
        assert a.shape == b.shape and np.array_equal(a, b), k

    x32 = x.astype(jnp.float32)
    assert np.array_equal(np.asarray(sop_l(x32)), np.asarray(sop_g(x32)))
    y = sop_g(x32)
    g_g = jax.grad(lambda d: jnp.mean((sop_g(d) - y) ** 2))(x32)
    g_l = jax.grad(lambda d: jnp.mean((sop_l(d) - y) ** 2))(x32)
    assert np.array_equal(np.asarray(g_g), np.asarray(g_l))


def test_process_local_build_band_rows16(setup):
    """Process-local build at SRb=16 band height (and dummy empty shards:
    240 rays at G=128 fill only 2 of 8 devices)."""
    grid, geom, op, x = setup
    from sph_raytracer_tpu.config import TraceConfig

    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_band_rows=16, routed_bands=4)
    sop_g = ShardedOperator(grid, geom, mesh=make_mesh(),
                            config=cfg.replace(sharded_local_build=False))
    sop_l = ShardedOperator(grid, geom, mesh=make_mesh(),
                            config=cfg.replace(sharded_local_build=True))
    for k in sop_g._sb_ft:
        assert np.array_equal(np.asarray(sop_g._sb_ft[k]),
                              np.asarray(sop_l._sb_ft[k])), k
    for k in sop_g._sb_bt:
        assert np.array_equal(np.asarray(sop_g._sb_bt[k]),
                              np.asarray(sop_l._sb_bt[k])), k
    x32 = x.astype(jnp.float32)
    assert np.array_equal(np.asarray(sop_l(x32)), np.asarray(sop_g(x32)))


def test_sharded_banded_dynamic_4d():
    """4D dynamic volume through the band-compacted sharded engine
    (per-view time offsets baked into the routed lin tables)."""
    T = 3
    grid = SphericalGrid(shape=(T, 6, 6, 6))
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, T, endpoint=False)
    )
    from sph_raytracer_tpu.config import TraceConfig

    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    op32 = Operator(grid, geom)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    assert sop._sharded_routed == "banded"
    x = jnp.asarray(np.random.default_rng(5).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(sop(x)), np.asarray(op32(x)), atol=1e-4)
    y = op32(x)
    g_ref = jax.grad(lambda d: jnp.mean((op32(d) - y) ** 2))(x)
    g_sh = jax.grad(lambda d: jnp.mean((sop(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-4)


def test_mlem_with_sharded_operator(setup):
    """solve.mlem threads the sharded operator's payload through its
    compiled sweep (vjp psums the volume update across the mesh) and
    matches the single-device solver bit-near-identically."""
    from sph_raytracer_tpu.solve import mlem

    grid, geom, op, x = setup
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), ftype=jnp.float64)
    y = op(x)
    xs, _, _ = mlem(sop, y, num_iterations=10)
    xp, _, _ = mlem(op, y, num_iterations=10)
    assert np.allclose(np.asarray(xs), np.asarray(xp), atol=1e-12)


def test_sharded_view_times(setup):
    """Time-interpolated 4D through the sharded builds (shard_map table
    build doubles the crossing axis with lerp weights) matches the plain
    Operator bit-near-identically."""
    from sph_raytracer_tpu.config import TraceConfig

    T, V = 3, 5
    tgrid = SphericalGrid(shape=(T, 6, 6, 6), size_t=(0.0, 10.0))
    geom = sum(
        ConeRectGeom((4, 4), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, V, endpoint=False)
    )
    times = np.linspace(1.0, 9.0, V)
    vol = jnp.asarray(
        np.random.default_rng(0).random(tuple(tgrid.shape)), jnp.float64)
    op = Operator(tgrid, geom, ftype=jnp.float64, view_times=times)
    sop = ShardedOperator(tgrid, geom, mesh=make_mesh(),
                          ftype=jnp.float64, view_times=times)
    assert np.allclose(np.asarray(sop(vol)), np.asarray(op(vol)),
                       atol=1e-12)
    # gradient psum path
    y = op(vol)
    g = jax.grad(lambda v: jnp.sum((op(v) - y) ** 2))(vol)
    gs = jax.grad(lambda v: jnp.sum((sop(v) - y) ** 2))(vol)
    assert np.allclose(np.asarray(gs), np.asarray(g), atol=1e-10)

    # banded routed engine (interpret mode) with lerp-doubled tables
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    sop_r = ShardedOperator(tgrid, geom, mesh=make_mesh(), config=cfg,
                            view_times=times)
    v32 = vol.astype(jnp.float32)
    assert np.allclose(np.asarray(sop_r(v32)),
                       np.asarray(op(v32).astype(jnp.float32)), atol=1e-4)

    # process-local banded build applies the lerp per ray range
    sop_l = ShardedOperator(tgrid, geom, mesh=make_mesh(),
                            config=cfg.replace(sharded_local_build=True),
                            view_times=times)
    assert np.allclose(np.asarray(sop_l(v32)), np.asarray(sop_r(v32)),
                       atol=1e-6)


def test_sharded_device_build_matches_host_build(setup):
    """routed_build='device' ShardedOperator (device-routing core per
    shard) matches the host-built banded sharded engine and the
    single-device operator for forward, gradient (psum), and adjoint."""
    grid, geom, op, x = setup
    from sph_raytracer_tpu.config import TraceConfig

    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_build="device")
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    assert sop._sharded_routed == "banded" and sop.lin is None
    x32 = x.astype(jnp.float32)
    op32 = Operator(grid, geom)
    assert np.allclose(np.asarray(sop(x32)), np.asarray(op32(x32)),
                       atol=1e-4)
    y = op32(x32)
    g_ref = jax.grad(lambda d: jnp.mean((op32(d) - y) ** 2))(x32)
    g_sh = jax.grad(lambda d: jnp.mean((sop(d) - y) ** 2))(x32)
    assert np.allclose(np.asarray(g_sh), np.asarray(g_ref), atol=1e-4)
    assert np.allclose(np.asarray(sop.T(y)), np.asarray(op32.T(y)),
                       atol=1e-4)


def test_process_local_device_build_bit_identical(setup):
    """Multi-host DEVICE table build (VERDICT r3 #5): the process-local
    path with the device router enabled routes each local shard with the
    device-routing core — tables, metas, and results must be
    byte-identical to the single-process device build."""
    grid, geom, op, x = setup
    from sph_raytracer_tpu.config import TraceConfig

    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_build="device")
    sop_g = ShardedOperator(grid, geom, mesh=make_mesh(),
                            config=cfg.replace(sharded_local_build=False))
    sop_l = ShardedOperator(grid, geom, mesh=make_mesh(),
                            config=cfg.replace(sharded_local_build=True))
    assert sop_l._sharded_routed == "banded" and sop_l.lin is None
    assert sop_g._sb_meta == sop_l._sb_meta
    assert sop_g._sb_metab == sop_l._sb_metab
    for k in sop_g._sb_ft:
        a, b = np.asarray(sop_g._sb_ft[k]), np.asarray(sop_l._sb_ft[k])
        assert a.shape == b.shape and np.array_equal(a, b), k
    for k in sop_g._sb_bt:
        a, b = np.asarray(sop_g._sb_bt[k]), np.asarray(sop_l._sb_bt[k])
        assert a.shape == b.shape and np.array_equal(a, b), k
    x32 = x.astype(jnp.float32)
    assert np.array_equal(np.asarray(sop_l(x32)), np.asarray(sop_g(x32)))
    y = sop_g(x32)
    g_g = jax.grad(lambda d: jnp.mean((sop_g(d) - y) ** 2))(x32)
    g_l = jax.grad(lambda d: jnp.mean((sop_l(d) - y) ** 2))(x32)
    assert np.array_equal(np.asarray(g_g), np.asarray(g_l))


def test_cg_with_sharded_operator(setup):
    """solve.cg over the ray-sharded operator (VERDICT r4 #7): CGNR's
    forward/adjoint ride the shard_map engine (the adjoint comes from
    jax.vjp, whose psum crosses the mesh) and the solution matches the
    single-device solver."""
    from sph_raytracer_tpu.solve import cg

    grid, geom, op, x = setup
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), ftype=jnp.float64)
    y = op(x)
    xs, ys, is_ = cg(sop, y, num_iterations=30, damp=1e-6)
    xp, yp, ip_ = cg(op, y, num_iterations=30, damp=1e-6)
    # the mesh psum's reduction order differs from the single-device sum
    # by ULPs per iteration, which CG amplifies along the slow
    # (underdetermined) directions — compare iterates at solver
    # tolerance and the PROJECTIONS (the determined quantity) tightly
    assert np.allclose(np.asarray(xs), np.asarray(xp), atol=1e-4), \
        np.abs(np.asarray(xs) - np.asarray(xp)).max()
    rs, rp = np.asarray(is_["rnorm"]), np.asarray(ip_["rnorm"])
    assert rs[-1] < 0.05 * rs[0] and rp[-1] < 0.05 * rp[0]
    # early trajectory must track the single-device run tightly; the
    # semi-converged tail is chaotically ULP-sensitive (compare at the
    # plateau level instead)
    assert np.allclose(rs[:8], rp[:8], rtol=1e-6)
    assert np.allclose(np.asarray(ys), np.asarray(yp), atol=1e-4)


def test_osem_with_sharded_operator():
    """Ordered-subsets ML-EM (subsets=K) over the ray-sharded BANDED
    engine (interpret-mode kernels on the 8-device mesh): per-subset
    sweeps slice the view axis while the volume update psums across the
    ray mesh; matches the single-device OS-EM run to f32 accuracy."""
    from sph_raytracer_tpu.config import TraceConfig
    from sph_raytracer_tpu.solve import mlem

    grid = SphericalGrid(shape=(8, 8, 8))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 4, endpoint=False)
    )
    x = jnp.asarray(np.random.default_rng(3).random(tuple(grid.shape)),
                    jnp.float32)
    op = Operator(grid, geom)
    y = op(x)
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    xs, _, _ = mlem(sop, y, num_iterations=4, subsets=2)
    xp, _, _ = mlem(op, y, num_iterations=4, subsets=2)
    # engines differ (banded interpret kernels vs XLA gather), so the
    # match is f32-near, not bitwise
    assert np.allclose(np.asarray(xs), np.asarray(xp),
                       rtol=1e-4, atol=1e-5)


def test_sharded_banded_channels(setup):
    """Multi-channel __call__/T() through the BANDED sharded engine runs
    as one compiled scan dispatch (round 5) and matches per-channel
    calls bitwise (all math inside the shard_map'd kernels)."""
    from sph_raytracer_tpu.config import TraceConfig

    grid, geom, op, x = setup
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2)
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    assert sop._sharded_routed == "banded"
    xc = jnp.stack([x.astype(jnp.float32),
                    (x * 2).astype(jnp.float32),
                    (x + 1).astype(jnp.float32)])
    yb = np.asarray(sop(xc))
    yl = np.stack([np.asarray(sop(xc[i])) for i in range(3)])
    assert np.array_equal(yb, yl)
    tb = np.asarray(sop.T(yb))
    tl = np.stack([np.asarray(sop.T(yb[i])) for i in range(3)])
    assert np.array_equal(tb, tl)
