"""Histogram-placement forward reduce (round 5, VERDICT r4 #1):
route.hist_pack_fwd + _fwd_banded_hist_pallas vs the classic masked
reduce.  Same math, different summation order — outputs agree to float
tolerance, the adjoint identity holds exactly across the pair (the
backward kernel is shared), and the placement-table invariants hold.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.config import TraceConfig


def _mk(nview, det, gshape):
    grid = SphericalGrid(shape=gshape)
    geom = sum(
        ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, nview, endpoint=False))
    return grid, geom


CASES = [
    # (G, nview, det, gshape) — G=2048 exercises OCT=2 octave routing;
    # G=128 the HI=1 sub-8-row y block; G=512 multi-tile + collisions
    (2048, 9, (16, 16), (16, 10, 12)),
    (128, 3, (6, 8), (12, 8, 8)),
    (512, 5, (10, 12), (14, 9, 9)),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_hist_matches_masks(case):
    G, nview, det, gshape = CASES[case]
    grid, geom = _mk(nview, det, gshape)
    x = jnp.asarray(np.random.default_rng(case).random(tuple(grid.shape)),
                    jnp.float32)
    base = dict(mode="routed", interpret=True, routed_g=G,
                routed_chunk_multiple=2, routed_bands=4,
                routed_build="host")
    opm = Operator(grid, geom, config=TraceConfig(**base))
    oph = Operator(grid, geom,
                   config=TraceConfig(**base, routed_fwd_reduce="hist"))
    ym, yh = np.asarray(opm(x)), np.asarray(oph(x))
    assert np.allclose(ym, yh, atol=1e-4), np.abs(ym - yh).max()
    # adjoint identity: the hist forward must be the exact partner of
    # the (shared) banded backward
    y0 = jnp.asarray(
        np.random.default_rng(10 + case).random(ym.shape), jnp.float32)
    lhs = float(jnp.vdot(oph(x), y0))
    rhs = float(jnp.vdot(x, oph.T(y0)))
    assert abs(lhs - rhs) <= 1e-4 * max(abs(lhs), 1.0), (lhs, rhs)
    gm = np.asarray(jax.grad(
        lambda d: jnp.mean((opm(d) - jnp.asarray(ym)) ** 2))(x))
    gh = np.asarray(jax.grad(
        lambda d: jnp.mean((oph(d) - jnp.asarray(ym)) ** 2))(x))
    assert np.allclose(gm, gh, atol=1e-5), np.abs(gm - gh).max()


def test_hist_tables_invariants():
    """Every live run-end appears exactly once in the placement tables,
    at its (h % 8, lane) destination with its octave; vpos positions
    are consistent with the hik runs they fold."""
    from sph_raytracer_tpu.ops.route import (
        band_pack,
        build_routed_tables,
        hist_pack_fwd,
    )

    grid, geom = _mk(9, (16, 16), (16, 10, 12))
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    lin = np.asarray(op.lin)
    lens = np.asarray(op.lens, np.float32)
    rt8 = build_routed_tables(lin, lens, int(np.prod(grid.vshape)),
                              G=2048, SR=8, KD=3)
    bt = band_pack(rt8, B=4, by="tile", chunk_multiple=2)
    h = hist_pack_fwd(bt)
    KD = bt.hik.shape[0]
    rows = bt.hik.shape[1]
    NB = rows // 8
    hik = bt.hik.reshape(KD, NB, 8, 128).astype(np.int32)
    hj = h.hj.reshape(KD, h.KV, NB, 8, 128).astype(np.int32)
    vpos = h.vpos.reshape(KD, NB, 8, 128).astype(np.int32)
    live = hik >= 0
    # vpos live exactly where hik is
    assert np.array_equal(vpos >= 0, live)
    # count placements == count of vertical run ends
    nxt = np.concatenate(
        [hik[:, :, 1:], np.full((KD, NB, 1, 128), -2, np.int32)], axis=2)
    ends = live & (hik != nxt)
    valid = (hj & 0x80) != 0
    assert valid.sum() == ends.sum()
    # each placement's srcrow points at a run end whose h matches the
    # destination row + octave
    k_i, j_i, b_i, i_i, l_i = np.nonzero(valid)
    srcrow = hj[k_i, j_i, b_i, i_i, l_i] & 7
    octv = (hj[k_i, j_i, b_i, i_i, l_i] >> 3) & 15
    h_src = hik[k_i, b_i, srcrow, l_i]
    assert np.array_equal(h_src % 8, i_i)
    assert np.array_equal(h_src >> 3, octv)
    assert ends[k_i, b_i, srcrow, l_i].all()
    # per-superchunk guard covers every used level
    used = np.zeros(NB, np.int64)
    np.maximum.at(used, b_i, j_i + 1)
    assert (used.reshape(bt.NCB, bt.B).max(axis=1) <= h.kv).all()


def test_hist_validation():
    grid, geom = _mk(3, (6, 8), (12, 8, 8))
    with pytest.raises(ValueError, match="routed_fwd_reduce"):
        Operator(grid, geom, config=TraceConfig(
            routed_fwd_reduce="bogus"), _compute=False)
    with pytest.raises(ValueError, match="band_rows"):
        Operator(grid, geom, config=TraceConfig(
            routed_fwd_reduce="hist", routed_band_rows=16),
            _compute=False)


def test_hist_ignored_paths_warn():
    """The hist opt-in must never degrade SILENTLY (round-5 review):
    the sharded builds run the masks reduce on every shard, and dense
    forward slots preclude the hist layout — each path warns."""
    from sph_raytracer_tpu.parallel import (
        ShardedOperator,
        VolShardedOperator,
        make_mesh,
    )

    grid, geom = _mk(3, (6, 8), (12, 8, 8))
    cfg = TraceConfig(mode="routed", interpret=True, routed_g=128,
                      routed_chunk_multiple=2, routed_fwd_reduce="hist")
    with pytest.warns(UserWarning, match="not .*plumbed|masks"):
        ShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    with pytest.warns(UserWarning, match="not .*plumbed|masks"):
        VolShardedOperator(grid, geom, mesh=make_mesh(), config=cfg)
    # dense forward slots force the masks reduce (warned, not silent)
    with pytest.warns(UserWarning, match="masks"):
        Operator(grid, geom, config=cfg.replace(routed_dense="fwd"))
