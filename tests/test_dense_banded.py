"""Dense-slot banded layouts (route.band_pack_dense + the dense Pallas
kernels).

The dense forward places each tile's bands at slot = density window, so
the concatenated band windows ARE the (H, 128) density image — one
resident input replaces the per-band window BlockSpecs.  The dense
backward places each window's bands at slot = ray tile, so the whole
(T, HI, 128) dy array rides one resident input.  Both must match the
classic pointer-banded kernels and the XLA precomputed oracle, and the
device build must stay byte-identical to the host build.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.config import TraceConfig
from sph_raytracer_tpu.ops.route import (
    band_pack,
    band_pack_dense,
    build_routed_tables,
)
from sph_raytracer_tpu.ops.routed_project import (
    _bwd_banded_dense_pallas,
    _bwd_banded_pallas,
    _fwd_banded_dense_pallas,
    _fwd_banded_pallas,
    banded_device_bwd,
    banded_device_fwd,
)

G, SR, KD, B, CM = 128, 8, 3, 4, 2


@pytest.fixture(scope="module")
def setup():
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = sum(
        ConeRectGeom((6, 7), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 5, endpoint=False)
    )
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    lin, lens = np.asarray(op.lin), np.asarray(op.lens)
    V = int(np.prod(grid.vshape))
    rt8 = build_routed_tables(lin, lens, V, G=G, SR=SR, KD=KD)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    return grid, geom, rt8, op, x, lin, lens


def test_dense_layout_covers_every_band(setup):
    """Every live chunk appears exactly once, at the slot matching its
    (key, slot) coordinates."""
    _, _, rt8, _, _, _, _ = setup
    for by in ("tile", "window"):
        bt = band_pack_dense(rt8, by=by, chunk_multiple=CM)
        nslots = bt.B
        # reconstruct srcband from the packed w tables: each live band's
        # weights must equal its source chunk's
        key_c = rt8.tile if by == "tile" else rt8.sg
        slot_c = rt8.sg if by == "tile" else rt8.tile
        w_sc = bt.w.reshape(bt.NCB, nslots, SR, 128)
        seen = 0
        for c in range(rt8.NC):
            s = int(slot_c[c])
            cand = np.flatnonzero(
                (bt.keyp == key_c[c])
                & (w_sc[:, s].reshape(bt.NCB, -1)
                   == rt8.w.reshape(rt8.NC, -1)[c]).all(axis=1))
            assert len(cand) >= 1, (by, c)
            seen += 1
        assert seen == rt8.NC
        # total live weight is conserved
        assert np.isclose(bt.w.sum(), rt8.w.sum())


@pytest.mark.parametrize("side", ["fwd", "bwd"])
def test_dense_kernels_match_classic(setup, side):
    """Dense-slot kernels reproduce the classic banded kernels' output
    (same math, different slot layout/summation order)."""
    grid, geom, rt8, op, x, _, _ = setup
    d2 = band_pack(rt8, B=B, by="tile", chunk_multiple=CM).pad_density(
        x.reshape(-1))
    if side == "fwd":
        btF_c = band_pack(rt8, B=B, by="tile", chunk_multiple=CM)
        ft_c, meta_c = banded_device_fwd(btF_c)
        y_c = _fwd_banded_pallas(d2, ft_c, meta_c, B, interpret=True)
        btF_d = band_pack_dense(rt8, by="tile", chunk_multiple=CM)
        ft_d, meta_d = banded_device_fwd(btF_d)
        assert meta_d.SR == meta_d.H  # slots cover every window
        y_d = _fwd_banded_dense_pallas(d2, ft_d, meta_d, interpret=True)
        assert np.allclose(np.asarray(y_d), np.asarray(y_c), atol=1e-5)
    else:
        T, HI = rt8.T, rt8.HI
        rng = np.random.default_rng(1)
        dy = jnp.asarray(rng.random((T, HI, 128)), jnp.float32)
        btB_c = band_pack(rt8, B=B, by="window", chunk_multiple=CM)
        bt_c, metab_c = banded_device_bwd(btB_c)
        g_c = _bwd_banded_pallas(dy, bt_c, metab_c, B, interpret=True)
        btB_d = band_pack_dense(rt8, by="window", chunk_multiple=CM)
        bt_d, metab_d = banded_device_bwd(btB_d)
        assert metab_d.SR == SR * T  # slots cover every tile
        g_d = _bwd_banded_dense_pallas(dy, bt_d, metab_d, SR,
                                       interpret=True)
        assert np.allclose(np.asarray(g_d), np.asarray(g_c), atol=1e-5)


def test_dense_device_build_bit_identical(setup):
    """Device-built dense tables == host band_pack_dense tables
    (npad_multiple=1), both sides."""
    grid, geom, rt8, op, x, lin, lens = setup
    from sph_raytracer_tpu.ops.route_device import build_banded_device

    V = int(np.prod(grid.vshape))
    ftH, metaH = banded_device_fwd(
        band_pack_dense(rt8, by="tile", chunk_multiple=CM))
    btdH, metabH = banded_device_bwd(
        band_pack_dense(rt8, by="window", chunk_multiple=CM))
    ft, meta, btd, metab, helper, _ = build_banded_device(
        jnp.asarray(lin), jnp.asarray(lens), V, G=G, SR=SR, KD=KD, B=B,
        chunk_multiple=CM, npad_multiple=1, dense_fwd=True,
        dense_bwd=True)
    assert meta == metaH and metab == metabH
    for a, b, which in ((ft, ftH, "fwd"), (btd, btdH, "bwd")):
        for k in a._fields:
            av, bv = np.asarray(getattr(a, k)), np.asarray(getattr(b, k))
            assert av.shape == bv.shape, (which, k, av.shape, bv.shape)
            assert np.array_equal(av, bv), (which, k)


def test_dense_operator_transpose_and_grad(setup):
    """Full Operator with dense slots forced on both sides: forward,
    gradient, adjoint identity vs the XLA oracle."""
    grid, geom, _, op, x, _, _ = setup
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=G,
                      routed_chunk_multiple=CM, routed_dense="both")
    op_d = Operator(grid, geom, config=cfg)
    assert op_d._dense == (True, True)
    y_ref = op(x)
    assert np.allclose(np.asarray(op_d(x)), np.asarray(y_ref), atol=1e-4)
    g_ref = jax.grad(lambda d: jnp.mean((op(d) - y_ref) ** 2))(x)
    g_d = jax.grad(lambda d: jnp.mean((op_d(d) - y_ref) ** 2))(x)
    assert np.allclose(np.asarray(g_d), np.asarray(g_ref), atol=1e-5)
    assert np.isclose(float(jnp.vdot(op_d(x), y_ref)),
                      float(jnp.vdot(x, op_d.T(y_ref))), rtol=1e-4)


def test_dense_sharded_operator(setup):
    """ShardedOperator honors forced dense modes per shard (local tile
    count) and matches the XLA oracle on the 8-device CPU mesh; 'auto'
    stays classic for sharded builds."""
    from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh

    grid, geom, _, op, x, _, _ = setup
    auto = ShardedOperator(grid, geom, mesh=make_mesh(),
                           config=TraceConfig(mode="routed", interpret=True,
                                              routed_g=G,
                                              routed_chunk_multiple=CM))
    assert auto._sb_dense == (False, False)  # auto = classic when sharded
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=G,
                      routed_chunk_multiple=CM, routed_dense="both")
    sop = ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    assert getattr(sop, "_sb_dense", None) == (True, True)
    y_ref = op(x)
    assert np.allclose(np.asarray(sop(x)), np.asarray(y_ref), atol=1e-4)
    g_ref = jax.grad(lambda d: jnp.mean((op(d) - y_ref) ** 2))(x)
    g_s = jax.grad(lambda d: jnp.mean((sop(d) - y_ref) ** 2))(x)
    assert np.allclose(np.asarray(g_s), np.asarray(g_ref), atol=1e-5)
    assert np.allclose(np.asarray(sop.T(y_ref)), np.asarray(op.T(y_ref)),
                       atol=1e-4)


def test_dense_forced_empty_build():
    """Forced dense modes on an EMPTY build (rays miss the grid) keep
    dense-shaped tables AND dense flags, so kernel dispatch matches."""
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((4, 4), (100.0, 0.0, 0.0), lookdir=(1, 0, 0),
                        fov=(1, 1))  # aimed away: zero crossings
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=G,
                      routed_chunk_multiple=CM, routed_dense="both",
                      routed_build="device")
    op = Operator(grid, geom, config=cfg)
    assert op._dense == (True, True)
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op(x)), 0.0)
    assert np.allclose(np.asarray(op.T(op(x))), 0.0)


def test_dense_rows_gate():
    """dense_slot_rows_ok accepts rep-uniform layouts and rejects
    rep-skewed ones (the measured config5 failure mode)."""
    from sph_raytracer_tpu.ops.route import dense_slot_rows_ok

    key = np.repeat(np.arange(4), 3)
    slot = np.tile(np.arange(3), 4)
    assert dense_slot_rows_ok(key, slot, 4, 3, B=3)
    # one hot (key, slot) pair with 10 extra reps: every superchunk of
    # key 0 pads all 3 slots -> dense rows blow past 1.25x classic
    key2 = np.r_[key, np.zeros(10, np.int64)]
    slot2 = np.r_[slot, np.zeros(10, np.int64)]
    assert not dense_slot_rows_ok(key2, slot2, 4, 3, B=3)


def test_dense_cache_self_describes(tmp_path, monkeypatch):
    """The banded-table cache records the slot layout; a cache hit
    restores the dense decision without re-routing."""
    monkeypatch.setenv("SPH_TPU_TRACE_CACHE", str(tmp_path))
    grid = SphericalGrid(shape=(8, 8, 8))
    geom = ConeRectGeom((6, 7), (3.0, 0.5, 0.4), fov=(45, 45))
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=G,
                      routed_chunk_multiple=CM, routed_dense="both")
    op1 = Operator(grid, geom, config=cfg)
    assert op1._dense == (True, True)
    op2 = Operator(grid, geom, config=cfg)  # banded-table cache hit
    assert op2._dense == (True, True)
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    assert np.allclose(np.asarray(op1(x)), np.asarray(op2(x)))


def test_dense_resolution_envelopes():
    """_resolve_dense honors the VMEM envelopes and explicit modes."""
    from sph_raytracer_tpu.operator import _resolve_dense

    assert _resolve_dense(TraceConfig(), 10, 512, 8) == (False, True)
    assert _resolve_dense(TraceConfig(), 245, 984, 8) == (False, False)
    assert _resolve_dense(TraceConfig(), 10, 8192, 8) == (False, True)
    off = TraceConfig(routed_dense="off")
    assert _resolve_dense(off, 10, 512, 8) == (False, False)
    fwd = TraceConfig(routed_dense="fwd")
    assert _resolve_dense(fwd, 10, 512, 8) == (True, False)
    both = TraceConfig(routed_dense="both")
    assert _resolve_dense(both, 10, 512, 8) == (True, True)
    assert _resolve_dense(both, 245, 8192, 8) == (False, False)  # clamped
    with pytest.raises(ValueError):
        _resolve_dense(TraceConfig(routed_dense="bogus"), 1, 8, 8)


def test_dense_forced_fwd_warns_regression():
    """routed_dense='fwd'/'both' are measured regressions; forcing them
    must warn (VERDICT r3 weak #5)."""
    import pytest

    from sph_raytracer_tpu.operator import _resolve_dense

    with pytest.warns(UserWarning, match="measured REGRESSION"):
        _resolve_dense(TraceConfig(routed_dense="fwd"), T=4, H=64, SRb=8)


def test_dense_forced_envelope_clamp_warns():
    """A forced dense side silently downgraded by the VMEM envelope must
    warn (ADVICE r3: operator.py _resolve_dense)."""
    import pytest

    from sph_raytracer_tpu.operator import _resolve_dense

    with pytest.warns(UserWarning, match="VMEM envelope"):
        df, db = _resolve_dense(TraceConfig(routed_dense="bwd"),
                                T=200, H=64, SRb=8)
    assert (df, db) == (False, False)
    with pytest.warns(UserWarning, match="VMEM envelope"):
        df, db = _resolve_dense(TraceConfig(routed_dense="both"),
                                T=4, H=2048, SRb=8)
    assert db and not df
