"""On-device router (ops/route_device.py) vs the host router.

The device build must be BYTE-IDENTICAL to
``band_pack(build_routed_tables(...))`` given the same crossing tables
(``npad_multiple=1``), and the banded kernels must produce the same
projections from it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.ops.route import band_pack, build_routed_tables
from sph_raytracer_tpu.ops.route_device import build_banded_device
from sph_raytracer_tpu.ops.routed_project import (
    banded_device_bwd,
    banded_device_fwd,
)

G, SR, KD, B, CM = 128, 8, 3, 4, 2


def _tables(grid, geom):
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    return np.asarray(op.lin), np.asarray(op.lens), op


def _host_build(lin, lens, V):
    rt8 = build_routed_tables(lin, lens, V, G=G, SR=SR, KD=KD)
    ftH, metaH = banded_device_fwd(
        band_pack(rt8, B=B, by="tile", chunk_multiple=CM))
    btdH, metabH = banded_device_bwd(
        band_pack(rt8, B=B, by="window", chunk_multiple=CM))
    return ftH, metaH, btdH, metabH


def _assert_tables_equal(a, b, which):
    for k in a._fields:
        av, bv = np.asarray(getattr(a, k)), np.asarray(getattr(b, k))
        assert av.shape == bv.shape, (which, k, av.shape, bv.shape)
        assert np.array_equal(av, bv), (
            which, k, np.argwhere(av != bv)[:5])


@pytest.fixture(scope="module")
def setup():
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = sum(
        ConeRectGeom((6, 7), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 5, endpoint=False)
    )
    lin, lens, op = _tables(grid, geom)
    return grid, geom, lin, lens, op


@pytest.mark.parametrize("sr,b", [(SR, B), (16, 2)])
def test_device_router_bit_identical(setup, sr, b):
    grid, geom, lin, lens, op = setup
    V = int(np.prod(grid.vshape))
    rt8 = build_routed_tables(lin, lens, V, G=G, SR=sr, KD=KD)
    ftH, metaH = banded_device_fwd(
        band_pack(rt8, B=b, by="tile", chunk_multiple=CM))
    btdH, metabH = banded_device_bwd(
        band_pack(rt8, B=b, by="window", chunk_multiple=CM))
    ft, meta, btd, metab, helper, _ = build_banded_device(
        jnp.asarray(lin), jnp.asarray(lens), V, G=G, SR=sr, KD=KD, B=b,
        chunk_multiple=CM, npad_multiple=1)
    assert meta == metaH and metab == metabH
    _assert_tables_equal(ft, ftH, "fwd")
    _assert_tables_equal(btd, btdH, "bwd")
    assert helper.H == metaH.H and helper.volume_size == V


def test_device_router_projection(setup):
    """Interpret-mode banded kernels over device-built tables match the
    XLA precomputed oracle (forward + adjoint)."""
    from sph_raytracer_tpu.ops.routed_project import (
        _bwd_banded_pallas,
        banded_project,
    )

    grid, geom, lin, lens, op = setup
    V = int(np.prod(grid.vshape))
    ft, meta, btd, metab, helper, _ = build_banded_device(
        jnp.asarray(lin), jnp.asarray(lens), V, G=G, SR=SR, KD=KD, B=B,
        chunk_multiple=CM, npad_multiple=1)
    x = jnp.asarray(
        np.random.default_rng(0).random(tuple(grid.shape)), jnp.float32)
    d2 = helper.pad_density(x.reshape(-1))
    y = banded_project(d2, ft, btd, meta, metab, B, True)
    y = np.asarray(y).reshape(-1)[: meta.n_rays]
    ref = np.asarray(op(x)).reshape(-1)
    assert np.allclose(y, ref, atol=1e-5), np.abs(y - ref).max()

    yy = jnp.asarray(
        np.random.default_rng(1).random(tuple(geom.shape)), jnp.float32)
    pad = meta.T * meta.G - yy.size
    yt = jnp.concatenate([yy.reshape(-1),
                          jnp.zeros((pad,), jnp.float32)]).reshape(
        meta.T, meta.HI, 128)
    bp = helper.unpad_density(
        _bwd_banded_pallas(yt, btd, metab, B, interpret=True))
    ref_bp = np.asarray(op.T(yy)).reshape(-1)
    assert np.allclose(np.asarray(bp), ref_bp, atol=1e-5)


def test_device_router_padded_dead_entries(setup):
    """Production padding (npad_multiple > 1) adds only zero-weight
    slots: projections are unchanged."""
    from sph_raytracer_tpu.ops.routed_project import banded_project

    grid, geom, lin, lens, op = setup
    V = int(np.prod(grid.vshape))
    ft, meta, btd, metab, helper, _ = build_banded_device(
        jnp.asarray(lin), jnp.asarray(lens), V, G=G, SR=SR, KD=KD, B=B,
        chunk_multiple=CM, npad_multiple=4096)
    x = jnp.asarray(
        np.random.default_rng(2).random(tuple(grid.shape)), jnp.float32)
    d2 = helper.pad_density(x.reshape(-1))
    y = banded_project(d2, ft, btd, meta, metab, B, True)
    y = np.asarray(y).reshape(-1)[: meta.n_rays]
    ref = np.asarray(op(x)).reshape(-1)
    assert np.allclose(y, ref, atol=1e-5), np.abs(y - ref).max()


def test_operator_device_router(setup):
    """Operator(routed_build='device'): forward, adjoint, and gradient
    match the precomputed oracle; payload threading works."""
    from sph_raytracer_tpu import TraceConfig

    grid, geom, lin, lens, op = setup
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=G,
                      routed_bands=B, routed_chunk_multiple=CM,
                      routed_build="device")
    dop = Operator(grid, geom, config=cfg)
    assert dop._routed is not None and dop.lin is None
    x = jnp.asarray(
        np.random.default_rng(3).random(tuple(grid.shape)), jnp.float32)
    assert np.allclose(np.asarray(dop(x)), np.asarray(op(x)), atol=1e-5)
    y = op(x)
    assert np.allclose(np.asarray(dop.T(y)), np.asarray(op.T(y)),
                       atol=1e-5)
    g_ref = jax.grad(lambda d: jnp.mean((op(d) - y) ** 2))(x)
    g_dev = jax.grad(lambda d: jnp.mean((dop(d) - y) ** 2))(x)
    assert np.allclose(np.asarray(g_dev), np.asarray(g_ref), atol=1e-5)
    # payload threading (what gd() does)
    pl = dop.payload
    out = jax.jit(lambda d, p: dop.with_payload(p)(d))(x, pl)
    assert np.allclose(np.asarray(out), np.asarray(dop(x)), atol=1e-6)


def test_device_router_empty():
    grid = SphericalGrid(shape=(4, 4, 4))
    # rays that miss the volume entirely
    geom = ConeRectGeom((4, 4), pos=(50.0, 0, 0), lookdir=(1, 0, 0),
                        fov=(5, 5))
    lin, lens, op = _tables(grid, geom)
    assert (lens == 0).all()
    ft, meta, btd, metab, helper, _ = build_banded_device(
        jnp.asarray(lin), jnp.asarray(lens), 64, G=G, SR=SR, KD=KD, B=B,
        chunk_multiple=CM)
    assert int(np.asarray(ft.w).sum()) == 0


def test_sharded_device_build_bit_identical(setup):
    """build_banded_device_shards (npad_multiple=1) matches the host
    shard_banded_tables stacks byte-for-byte, shard by shard."""
    from sph_raytracer_tpu.parallel.routed_sharded import (
        build_banded_device_shards,
        shard_banded_tables,
    )

    grid, geom, lin, lens, op = setup
    V = int(np.prod(grid.vshape))
    D = 2
    rt8 = build_routed_tables(lin, lens, V, G=G, SR=SR, KD=KD)
    fstkH, bstkH, mfH, mbH = shard_banded_tables(
        rt8, D, B=B, chunk_multiple=CM)
    fstk, bstk, mf, mb, helper = build_banded_device_shards(
        jnp.asarray(lin), jnp.asarray(lens), V, D, G=G, SR=SR, KD=KD,
        B=B, chunk_multiple=CM, npad_multiple=1)
    assert mf == mfH and mb == mbH
    assert sorted(fstk) == sorted(fstkH) and sorted(bstk) == sorted(bstkH)
    for which, dev, host in (("fwd", fstk, fstkH), ("bwd", bstk, bstkH)):
        for k in host:
            av, bv = np.asarray(dev[k]), np.asarray(host[k])
            assert av.shape == bv.shape, (which, k, av.shape, bv.shape)
            assert np.array_equal(av, bv), (
                which, k, np.argwhere(av != bv)[:5])
    assert helper.H == mfH.H and helper.volume_size == V


def test_sharded_device_build_empty_shards(setup):
    """More devices than ray tiles: trailing shards are all-dummy but the
    stacked build still projects correctly (padded npad, D=4 over T=2)."""
    from sph_raytracer_tpu.parallel.routed_sharded import (
        build_banded_device_shards,
    )
    from sph_raytracer_tpu.ops.routed_project import banded_project
    from sph_raytracer_tpu.ops.routed_project import RoutedMeta  # noqa

    grid, geom, lin, lens, op = setup
    V = int(np.prod(grid.vshape))
    D = 4
    fstk, bstk, mf, mb, helper = build_banded_device_shards(
        jnp.asarray(lin), jnp.asarray(lens), V, D, G=G, SR=SR, KD=KD,
        B=B, chunk_multiple=CM, npad_multiple=4096)
    # simulate the per-shard kernels without a mesh: loop device rows
    from sph_raytracer_tpu.ops.routed_project import (
        BandedDeviceFwd,
        BandedDeviceBwd,
    )
    x = jnp.asarray(
        np.random.default_rng(5).random(tuple(grid.shape)), jnp.float32)
    d2 = helper.pad_density(x.reshape(-1))
    outs = []
    for d in range(D):
        p2f = (fstk["first"][d] | (fstk["kmax"][d] << 4)
               | (fstk["sdf"][d] << 8) | (fstk["keyp"][d] << 16))
        ft = BandedDeviceFwd(
            lvw=fstk["lvw"][d], w=fstk["w"][d], rposf=fstk["rposf"][d],
            src=fstk["src"][d], hik=fstk["hik"][d], bp=fstk["bp"][d],
            p2=p2f.astype(jnp.int32), covered=fstk["covered"][d])
        p2b = (bstk["first"][d] | (bstk["kmax"][d] << 4)
               | (bstk["sdb"][d] << 8) | (bstk["keyp"][d] << 16))
        btd = BandedDeviceBwd(
            rposb=bstk["rposb"][d], wp=bstk["wp"][d],
            lp8p=bstk["lp8p"][d], kcolp=bstk["kcolp"][d],
            hik=bstk["hik"][d], put=bstk["put"][d], putv=bstk["putv"][d],
            bp=bstk["bp"][d], p2=p2b.astype(jnp.int32),
            covered=bstk["covered"][d])
        y = banded_project(d2, ft, btd, mf, mb, B, True)
        outs.append(np.asarray(y).reshape(-1))
    y_all = np.concatenate(outs)[: int(np.prod(geom.shape))]
    ref = np.asarray(op(x)).reshape(-1)
    assert np.allclose(y_all, ref, atol=1e-5), np.abs(y_all - ref).max()
