"""Lane-routed projection engine: router + kernel semantics vs the plain
table projection (the correctness oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, SphericalGrid
from sph_raytracer_tpu.ops.project import (
    backproject_table,
    precompute_table,
    project_table,
)
from sph_raytracer_tpu.ops.route import LANES, build_routed_tables
from sph_raytracer_tpu.ops.routed_project import (
    device_tables,
    routed_backproject_ref,
    routed_project,
    routed_project_ref,
)
from sph_raytracer_tpu.ops.trace import GridSpec


def make_problem(vshape=(10, 10, 12), det=(9, 13), nviews=3, seed=0):
    grid = SphericalGrid(shape=vshape)
    geom = sum(
        ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
    )
    gs = GridSpec.from_grid(grid, ftype=jnp.float32)
    lin, lens, n, _ = precompute_table(
        gs, np.broadcast_to(geom.ray_starts, (*geom.shape, 3)),
        np.broadcast_to(geom.rays, (*geom.shape, 3)), block=256)
    lin, lens = np.asarray(lin)[:n], np.asarray(lens)[:n]
    V = int(np.prod(vshape))
    rng = np.random.default_rng(seed)
    density = rng.random(V).astype(np.float32)
    return lin, lens, V, density, n


def y_oracle(density, lin, lens):
    return np.asarray(project_table(jnp.asarray(density), jnp.asarray(lin),
                                    jnp.asarray(lens)))


@pytest.mark.parametrize("G,SR,KD", [(128, 8, 2), (256, 32, 2), (512, 32, 3)])
def test_routed_forward_matches_oracle(G, SR, KD):
    lin, lens, V, density, n = make_problem()
    rt = build_routed_tables(lin, lens, V, G=G, SR=SR, KD=KD)
    dt, meta = device_tables(rt)
    d2 = rt.pad_density(jnp.asarray(density))
    y = np.asarray(routed_project_ref(d2, dt, meta)).reshape(-1)[:n]
    want = y_oracle(density, lin, lens)
    assert np.allclose(y, want, atol=1e-4), np.abs(y - want).max()


def test_routed_backward_is_transpose():
    lin, lens, V, density, n = make_problem()
    rt = build_routed_tables(lin, lens, V, G=256, SR=32, KD=2)
    dt, meta = device_tables(rt)
    rng = np.random.default_rng(1)
    dy_full = rng.random((meta.T, meta.HI, LANES)).astype(np.float32)
    # zero the pad-ray entries so the oracle comparison is exact
    flat = dy_full.reshape(-1)
    flat[n:] = 0
    dy = jnp.asarray(flat.reshape(meta.T, meta.HI, LANES))
    dD2 = np.asarray(routed_backproject_ref(dy, dt, meta))
    dD_flat = dD2.reshape(-1)[:V]
    want = np.asarray(backproject_table(
        jnp.asarray(flat[:n]), jnp.asarray(lin), jnp.asarray(lens),
        volume_size=V))
    assert np.allclose(dD_flat, want, atol=1e-4), np.abs(dD_flat - want).max()


def test_routed_custom_vjp_grad():
    lin, lens, V, density, n = make_problem(vshape=(8, 8, 8), det=(6, 6))
    rt = build_routed_tables(lin, lens, V, G=128, SR=16, KD=2)
    dt, meta = device_tables(rt)
    target = jnp.asarray(
        np.random.default_rng(2).random(meta.T * meta.HI * LANES)
        .astype(np.float32))

    def loss(d2):
        y = routed_project(d2, dt, meta, False).reshape(-1)
        return jnp.sum((y - target) ** 2)

    d2 = rt.pad_density(jnp.asarray(density))
    g = jax.grad(loss)(d2)

    # oracle gradient via plain table ops on the same masked objective
    def loss_oracle(dflat):
        y = project_table(dflat, jnp.asarray(lin), jnp.asarray(lens))
        yfull = jnp.zeros(meta.T * meta.HI * LANES).at[:n].set(y)
        return jnp.sum((yfull - target) ** 2)

    g_oracle = jax.grad(loss_oracle)(jnp.asarray(density, jnp.float32))
    got = np.asarray(rt.unpad_density(g))
    assert np.allclose(got, np.asarray(g_oracle), atol=1e-3), (
        np.abs(got - np.asarray(g_oracle)).max()
    )


def test_routed_pallas_interpret_matches_ref():
    """Pallas kernels in interpreter mode == reference implementation."""
    lin, lens, V, density, n = make_problem(vshape=(6, 6, 8), det=(5, 5),
                                            nviews=2)
    rt = build_routed_tables(lin, lens, V, G=128, SR=16, KD=2)
    dt, meta = device_tables(rt)
    d2 = rt.pad_density(jnp.asarray(density))

    from sph_raytracer_tpu.ops.routed_project import _bwd_pallas, _fwd_pallas

    y_ref = np.asarray(routed_project_ref(d2, dt, meta))
    y_pl = np.asarray(_fwd_pallas(d2, dt, meta, interpret=True))
    assert np.allclose(y_pl, y_ref, atol=1e-5), np.abs(y_pl - y_ref).max()

    rng = np.random.default_rng(3)
    dy = jnp.asarray(rng.random((meta.T, meta.HI, LANES)).astype(np.float32))
    b_ref = np.asarray(routed_backproject_ref(dy, dt, meta))
    b_pl = np.asarray(_bwd_pallas(dy, dt, meta, interpret=True))
    assert np.allclose(b_pl, b_ref, atol=1e-5), np.abs(b_pl - b_ref).max()


def test_router_stats():
    lin, lens, V, density, n = make_problem()
    rt = build_routed_tables(lin, lens, V, G=256, SR=32, KD=2)
    # every live crossing routed exactly once: total weight preserved
    assert np.isclose(rt.w.sum(), lens[lens > 0].sum(), rtol=1e-5)
    assert (rt.w > 0).sum() == rt.n_live
    # every reduce slot references a run end; dead slots are sentinel -1
    assert (rt.hik >= -1).all() and (rt.hik < rt.HI).all()
    # slot efficiency is worth tracking (fails loudly on layout regressions)
    eff = rt.n_live / (rt.NC * rt.SR * 128)
    assert eff > 0.05, eff


def test_operator_routed_mode_matches_precomputed():
    """Operator(mode='routed') (reference impl on CPU) == precomputed."""
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = sum(
        ConeRectGeom((6, 6), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False)
    )
    from sph_raytracer_tpu import Operator

    op_a = Operator(grid, geom)
    op_r = Operator(grid, geom, mode="routed")
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op_r(x)), np.asarray(op_a(x)), atol=1e-4)
    # channels
    xc = jnp.stack([x, 2 * x])
    assert np.allclose(np.asarray(op_r(xc)), np.asarray(op_a(xc)), atol=1e-4)
    # gradient through the custom VJP
    y = op_a(x)
    ga = jax.grad(lambda d: jnp.mean((op_a(d) - y) ** 2))(x)
    gr = jax.grad(lambda d: jnp.mean((op_r(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(gr), np.asarray(ga), atol=1e-4)


def test_operator_routed_dynamic():
    T = 3
    grid = SphericalGrid(shape=(T, 6, 6, 6))
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, np.pi, T, endpoint=False)
    )
    from sph_raytracer_tpu import Operator

    op_a = Operator(grid, geom, ftype=jnp.float64)
    op_r = Operator(grid, geom, ftype=jnp.float64, mode="routed")
    x = jnp.asarray(np.random.default_rng(1).random(tuple(grid.shape)))
    assert np.allclose(np.asarray(op_r(x)), np.asarray(op_a(x)), atol=1e-4)


def test_native_router_matches_numpy():
    """The C++ router core (native/router.cpp) must reproduce the numpy
    router's tables bit-for-bit."""
    from sph_raytracer_tpu.ops import native_router

    if not native_router.available():
        pytest.skip("native router not built")
    lin, lens, V, density, n = make_problem()
    for G, SR, KD in [(256, 32, 2), (512, 16, 2), (2048, 32, 3)]:
        a = build_routed_tables(lin, lens, V, G=G, SR=SR, KD=KD,
                                use_native=False)
        b = build_routed_tables(lin, lens, V, G=G, SR=SR, KD=KD,
                                use_native=True)
        assert a.NC == b.NC, (G, SR, KD)
        for fld in ("lvw", "w", "hi8", "lp8", "perm", "put", "putv",
                    "src", "hik", "sg", "tile", "fwd_first", "bwd_order",
                    "bwd_first"):
            av, bv = getattr(a, fld), getattr(b, fld)
            assert np.array_equal(av, bv), (fld, G, SR, KD)
        assert (a.scan_fwd, a.scan_bwd) == (b.scan_fwd, b.scan_bwd)


def test_operator_routed_adjoint():
    """op.T in routed mode == precomputed-mode adjoint (and the adjoint
    identity holds through the kernel path)."""
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = sum(
        ConeRectGeom((6, 6), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False)
    )
    from sph_raytracer_tpu import Operator

    op_a = Operator(grid, geom)
    op_r = Operator(grid, geom, mode="routed")
    rng = np.random.default_rng(7)
    y = jnp.asarray(rng.random(tuple(geom.shape)).astype(np.float32))
    bp_a = np.asarray(op_a.T(y))
    bp_r = np.asarray(op_r.T(y))
    assert np.allclose(bp_r, bp_a, atol=1e-4), np.abs(bp_r - bp_a).max()
    x = jnp.asarray(rng.random(tuple(grid.shape)).astype(np.float32))
    lhs = float(jnp.vdot(op_r(x), y))
    rhs = float(jnp.vdot(x, op_r.T(y)))
    assert np.isclose(lhs, rhs, rtol=1e-4)
    # channels
    yc = jnp.stack([y, 2 * y])
    assert np.allclose(np.asarray(op_r.T(yc)), np.asarray(op_a.T(yc)),
                       atol=1e-4)


def test_uncovered_tiles_and_windows_are_zeroed():
    """Rays that miss the volume entirely leave their tile's output block
    unvisited (uninitialized memory in a real kernel); the coverage masks
    must zero those tiles/windows.  Interpret mode surfaces uninitialized
    blocks as NaN, so this fails without the masks."""
    from sph_raytracer_tpu.ops import routed_project as rp
    from sph_raytracer_tpu.ops.project import precompute_table
    from sph_raytracer_tpu.ops.trace import GridSpec

    grid = SphericalGrid(shape=(16, 8, 8))
    # one detector looking at the volume, one aimed away (its rays miss);
    # 128 rays each = one tile each at G=128
    geom = (ConeRectGeom((8, 16), pos=(2.0, 0, 0), fov=(30, 30))
            + ConeRectGeom((8, 16), pos=(5.0, 0, 0), lookdir=(1.0, 0, 0),
                           fov=(10, 10)))
    gs = GridSpec.from_grid(grid, ftype=jnp.float32)
    lin, lens, n, _ = precompute_table(
        gs, np.asarray(geom.ray_starts, np.float32),
        np.asarray(geom.rays, np.float32), block=128, itype=jnp.int32)
    lin, lens = np.asarray(lin[:n]), np.asarray(lens[:n])
    assert (lens[128:] == 0).all()  # second detector misses
    V = 16 * 8 * 8
    rt = build_routed_tables(lin, lens, V, G=128, SR=8, KD=2)
    assert not rt.tiles_covered.all()  # the missing tile is uncovered
    dt, meta = rp.device_tables(rt)
    d2 = rt.pad_density(jnp.asarray(np.random.default_rng(0).random(V),
                                    jnp.float32))
    y = np.asarray(rp._fwd_pallas(d2, dt, meta, interpret=True))
    assert np.isfinite(y).all()
    assert (y[rt.tiles_covered == 0] == 0).all()
    dy = jnp.asarray(np.random.default_rng(1).random(y.shape), jnp.float32)
    dD2 = np.asarray(rp._bwd_pallas(dy, dt, meta, interpret=True))
    assert np.isfinite(dD2).all()


def test_sharded_tables_per_shard_window_coverage():
    """Each shard's wins_covered must reflect ONLY that shard's chunks: the
    Pallas backward leaves output blocks it never visits uninitialized, and
    a global mask would pass that garbage into the psum (regression)."""
    from sph_raytracer_tpu.ops.route import _covered
    from sph_raytracer_tpu.parallel.routed_sharded import shard_routed_tables

    # synthetic: each 128-ray tile touches only its own density region,
    # so different shards cover different windows
    R, M, V = 512, 4, 4096
    rng = np.random.default_rng(0)
    lin = np.zeros((R, M), np.int32)
    lens = rng.random((R, M)).astype(np.float32) + 0.1
    for r in range(R):
        lin[r] = (r // 128) * 1024 + rng.integers(0, 1024, M)
    rt = build_routed_tables(lin, lens, V, G=128, SR=8, KD=3)
    D = 4
    stacked, metas = shard_routed_tables(rt, D)
    H_sg = rt.wins_covered.shape[0]
    bounds = np.searchsorted(rt.tile, np.arange(D + 1) * (
        -(-rt.T // D)))
    any_partial = False
    for d in range(D):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        expect = _covered(rt.sg[lo:hi], H_sg) if hi > lo else np.zeros(
            H_sg, np.int8)
        got = stacked["wins_covered"][d]
        assert got.shape == expect.shape
        assert (got == expect).all(), d
        if hi > lo and not (expect == rt.wins_covered).all():
            any_partial = True
    # the test problem must actually exercise partial coverage
    assert any_partial


def test_select_chunks_and_split_reps_partition():
    """route.select_chunks/split_reps (round 4): the rep-capped split
    partitions the chunks, and the two parts' projections sum to the
    full projection (used by the window-major-forward study and any
    future hybrid layout)."""
    import numpy as np

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.ops.route import (
        band_pack,
        build_routed_tables,
        select_chunks,
        split_reps,
    )
    from sph_raytracer_tpu.ops.routed_project import (
        _fwd_banded_pallas,
        banded_device_fwd,
    )
    import jax.numpy as jnp

    grid = SphericalGrid(shape=(12, 8, 8))
    geom = sum(
        ConeRectGeom((6, 8), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 3, endpoint=False))
    op = Operator(grid, geom, _compute=False)
    lin, lens, n, _ = op._traced_tables(device=False)
    V = int(np.prod(grid.vshape))
    rt = build_routed_tables(np.asarray(lin[:n]), np.asarray(lens[:n]),
                             V, G=128, SR=8, KD=3)
    dm, om = split_reps(rt, 1)
    assert (dm | om).all() and not (dm & om).any()
    d2 = jnp.asarray(np.random.default_rng(0).random((rt.H, 128)),
                     jnp.float32)

    def fwd(sub):
        ft, meta = banded_device_fwd(
            band_pack(sub, B=4, by="tile", chunk_multiple=2))
        return np.asarray(_fwd_banded_pallas(d2, ft, meta, 4,
                                             interpret=True))

    y_full = fwd(rt)
    y_sum = fwd(select_chunks(rt, dm)) + fwd(select_chunks(rt, om))
    assert np.allclose(y_sum, y_full, atol=1e-5), \
        np.abs(y_sum - y_full).max()


def test_fill_dummy_ptrs():
    """route._fill_dummy_ptrs: dummies inherit the nearest real pointer
    at the same slot (forward fill; leading dummies take the next real;
    all-dummy slots stay 0)."""
    import numpy as np

    from sph_raytracer_tpu.ops.route import _fill_dummy_ptrs

    bp = np.array([[5, 0, 0, 7],
                   [0, 3, 0, 0],
                   [0, 0, 0, 0]], np.int32)
    dummy = np.array([[0, 1, 1, 0],
                      [1, 0, 1, 1],
                      [1, 1, 1, 1]], bool)
    out = _fill_dummy_ptrs(bp, dummy)
    assert out.tolist() == [[5, 5, 5, 7],
                            [3, 3, 3, 3],
                            [0, 0, 0, 0]]
    # no dummies: identity
    nb = np.arange(8, dtype=np.int32).reshape(2, 4)
    assert np.array_equal(_fill_dummy_ptrs(nb, np.zeros((2, 4), bool)), nb)
