"""Lane-routed projection: Pallas TPU kernels over RoutedTables.

The hot path of the precomputed mode on TPU.  See ops/route.py for the
layout derivation.  Measured motivation (v5e, flagship 50³/250k-ray
config): XLA's gather/scatter projection runs ~440 ms per pass; here every
element access rides the hardware lane-gather (``take_along_axis(axis=1)``)
plus static window slices and segmented lane scans — dense vector work
only, no gather/scatter HLOs anywhere.

Two implementations with identical semantics:

* :func:`routed_project_ref` / :func:`routed_backproject_ref` — pure jnp
  reference (vectorized over chunks), used for correctness tests on CPU
  and as the non-TPU fallback.
* the Pallas kernels (:func:`_fwd_pallas` / :func:`_bwd_pallas`),
  dispatched through the ``jax.custom_vjp`` wrapper :func:`routed_project`.

Forward: ``y (T, HI, 128)`` from ``D2 (H, 128)``.  Backward computes
``dD2`` — the exact transpose by construction.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .route import LANES, RoutedTables

__all__ = [
    "DeviceTables",
    "device_tables",
    "routed_project",
    "routed_project_ref",
    "routed_backproject_ref",
]


class DeviceTables(NamedTuple):
    lvw: jax.Array      # (NC·SR, L) int8
    w: jax.Array        # (NC·SR, L) f32
    hi8: jax.Array      # (NC·SR, L) int8
    lp8: jax.Array      # (NC·SR, L) int8
    perm: jax.Array     # (NC·SR, L) int8
    put: jax.Array      # (NC·SR, L) int8
    putv: jax.Array     # (NC·SR, L) int8
    kcol: jax.Array     # (NC·SR, L) int8
    rposf: jax.Array    # (NC·SR, L) int8
    rposb: jax.Array    # (NC·SR, L) int8
    wp: jax.Array       # (NC·SR, L) f32  (w at permuted positions)
    lp8p: jax.Array     # (NC·SR, L) int8 (lp8 at permuted positions)
    kcolp: jax.Array    # (NC·SR, L) int8 (kcol at permuted positions)
    src: jax.Array      # (KD, NC·SR, L) int8
    hik: jax.Array      # (KD, NC·SR, L) int8
    sg: jax.Array       # (NC,) int32
    tile: jax.Array     # (NC,) int32
    kmax: jax.Array     # (NC,) int32
    sdf: jax.Array      # (NC,) int32
    sdb: jax.Array      # (NC,) int32
    fwd_first: jax.Array
    bwd_order: jax.Array
    bwd_first: jax.Array
    tiles_covered: jax.Array  # (T,) int8
    wins_covered: jax.Array   # (H//SR,) int8


class RoutedMeta(NamedTuple):
    NC: int
    SR: int
    KD: int
    G: int
    HI: int
    T: int
    H: int
    n_rays: int
    volume_size: int
    scan_fwd: int = 7
    scan_bwd: int = 7


def device_tables(rt: RoutedTables, slim: bool = False):
    """Upload routing tables; returns (DeviceTables, RoutedMeta).

    ``slim=True`` replaces the tables only the legacy 'hi' kernel and the
    jnp reference implementation read (hi8, lp8, kcol, perm) with 1-row
    dummies — 4 bytes/slot of HBM saved on the default Pallas path."""
    import numpy as np

    z = np.zeros((1, LANES), np.int8)

    def tbl(a):
        return jnp.asarray(z if slim else a)

    dt = DeviceTables(
        lvw=jnp.asarray(rt.lvw), w=jnp.asarray(rt.w),
        hi8=tbl(rt.hi8), lp8=tbl(rt.lp8),
        perm=tbl(rt.perm), put=jnp.asarray(rt.put),
        putv=jnp.asarray(rt.putv), kcol=tbl(rt.kcol),
        rposf=jnp.asarray(rt.rposf), rposb=jnp.asarray(rt.rposb),
        wp=jnp.asarray(rt.wp), lp8p=jnp.asarray(rt.lp8p),
        kcolp=jnp.asarray(rt.kcolp),
        src=jnp.asarray(rt.src),
        hik=jnp.asarray(rt.hik), sg=jnp.asarray(rt.sg),
        tile=jnp.asarray(rt.tile), kmax=jnp.asarray(rt.kmax),
        sdf=jnp.asarray(rt.sdf), sdb=jnp.asarray(rt.sdb),
        fwd_first=jnp.asarray(rt.fwd_first),
        bwd_order=jnp.asarray(rt.bwd_order),
        bwd_first=jnp.asarray(rt.bwd_first),
        tiles_covered=jnp.asarray(rt.tiles_covered),
        wins_covered=jnp.asarray(rt.wins_covered),
    )
    meta = RoutedMeta(rt.NC, rt.SR, rt.KD, rt.G, rt.HI, rt.T, rt.H,
                      rt.n_rays, rt.volume_size, rt.scan_fwd, rt.scan_bwd)
    return dt, meta


# ---------------------------------------------------------------------------
# pure-jnp reference (CPU fallback + oracle)
# ---------------------------------------------------------------------------

def _segscan_ref(x, key):
    """Inclusive segmented sum along lanes (runs of equal key)."""
    L = x.shape[-1]
    s = 1
    while s < L:
        xs = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(s, 0)])[..., :-s]
        ks = jnp.pad(key, [(0, 0)] * (key.ndim - 1) + [(s, 0)],
                     constant_values=-1)[..., :-s]
        x = x + jnp.where(ks == key, xs, 0.0)
        s *= 2
    return x


def routed_project_ref(d2, dt: DeviceTables, meta: RoutedMeta):
    """Forward projection (reference impl): (H,128) → (T, HI, 128)."""
    NC, SR, KD, HI, T = meta.NC, meta.SR, meta.KD, meta.HI, meta.T
    row0 = (dt.sg[:, None] * SR + jnp.arange(SR)[None, :]).reshape(-1)
    win = jnp.take(d2, row0, axis=0).reshape(NC, SR, LANES)
    lvw = dt.lvw.reshape(NC, SR, LANES).astype(jnp.int32)
    wv = dt.w.reshape(NC, SR, LANES)
    F = jnp.take_along_axis(win, lvw, axis=2) * wv

    hi32 = dt.hi8.reshape(NC, SR, LANES).astype(jnp.int32)
    lp32 = dt.lp8.reshape(NC, SR, LANES).astype(jnp.int32)
    rkey = jnp.where(wv > 0, hi32 * LANES + lp32, -1)
    scan = _segscan_ref(F, rkey)

    y = jnp.zeros((T, HI, LANES), d2.dtype)
    for k in range(KD):
        src = dt.src[k].reshape(NC, SR, LANES).astype(jnp.int32)
        hik = dt.hik[k].reshape(NC, SR, LANES).astype(jnp.int32)
        Rk = jnp.take_along_axis(scan, src, axis=2)
        for h in range(HI):
            part = jnp.where(hik == h, Rk, 0.0).sum(axis=1)  # (NC, L)
            y = y.at[dt.tile, h].add(part)
    return y


def routed_backproject_ref(dy, dt: DeviceTables, meta: RoutedMeta):
    """Transpose: dD2 (H, 128) from dy (T, HI, 128) (reference impl).

    g-fetch: each column's run has reduce pass k = kcol and reduce lane
    lp; by construction ``hik[k][row, lp]`` is that run's output bucket
    hi, so ``g = dy[hik[k][row, lp8], lp8]`` — a lane-aligned row-select
    per pass followed by one lane-gather, KD passes total (vs HI
    lane-gathers fetching by (hi, lp) coordinates directly)."""
    NC, SR, KD, HI, H = meta.NC, meta.SR, meta.KD, meta.HI, meta.H
    dyc = dy[dt.tile]  # (NC, HI, L)
    lp32 = dt.lp8.reshape(NC, SR, LANES).astype(jnp.int32)
    kc = dt.kcol.reshape(NC, SR, LANES).astype(jnp.int32)
    g = jnp.zeros((NC, SR, LANES), dy.dtype)
    for k in range(KD):
        hv = jnp.clip(
            dt.hik[k].reshape(NC, SR, LANES).astype(jnp.int32), 0, HI - 1)
        rk = jnp.take_along_axis(dyc, hv, axis=1)     # dy[hik[k], lane]
        gc = jnp.take_along_axis(rk, lp32, axis=2)    # at the reduce lane
        g = jnp.where(kc == k, gc, g)
    gw = g * dt.w.reshape(NC, SR, LANES)

    perm = dt.perm.reshape(NC, SR, LANES).astype(jnp.int32)
    gp = jnp.take_along_axis(gw, perm, axis=2)
    lvw = dt.lvw.reshape(NC, SR, LANES).astype(jnp.int32)
    key2 = jnp.take_along_axis(lvw, perm, axis=2)
    scan = _segscan_ref(gp, key2)
    put = dt.put.reshape(NC, SR, LANES).astype(jnp.int32)
    placed = jnp.take_along_axis(scan, put, axis=2)
    placed = placed * dt.putv.reshape(NC, SR, LANES)

    row0 = (dt.sg[:, None] * SR + jnp.arange(SR)[None, :]).reshape(-1)
    dD2 = jnp.zeros((H, LANES), dy.dtype)
    return dD2.at[row0].add(placed.reshape(NC * SR, LANES))


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

def _fwd_pallas(d2, dt: DeviceTables, meta: RoutedMeta, interpret=False,
                stage="full"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NC, SR, KD, HI, T = meta.NC, meta.SR, meta.KD, meta.HI, meta.T

    # per-chunk scalars are bit-packed: SMEM holds the whole prefetch
    # arrays, and at small SR the chunk count makes five separate int32
    # arrays overflow the ~1MB SMEM budget
    def kernel(p1_ref, p2_ref, lvw_ref,
               w_ref, rposf_ref, src_ref, hik_ref, d2_ref, y_ref, acc_scr):
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)  # first chunk of the tile
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        # the density window arrives via the d2 BlockSpec index_map
        # (scalar-prefetched sg): an in-kernel dynamic slice over a
        # full-VMEM d2 made Mosaic compile times explode (~430s at HI=8)
        W = d2_ref[:]
        wv = w_ref[:]
        F = jnp.take_along_axis(W, lvw_ref[:].astype(jnp.int32), axis=1) * wv
        if stage == "fetch":  # profiling-only truncated kernel
            y_ref[0, 0, :] += jnp.sum(F, axis=0)
            return
        # segmented sum over ray-runs: the step-s mask is just
        # rposf >= s (runs are contiguous, rposf = position in run), no
        # key comparison needed; each step is skipped per chunk when the
        # chunk's longest run (sdf scalar) doesn't reach it
        rp = rposf_ref[:].astype(jnp.int32)
        acc_scr[:] = F
        sd = (p2 >> 8) & 0xF
        for t in range(meta.scan_fwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                acc_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(acc_scr[:], s, 1), 0.0)

        acc = acc_scr[:]
        if stage == "scan":  # profiling-only truncated kernel
            y_ref[0, 0, :] += jnp.sum(acc, axis=0)
            return

        # run totals per pass (lane-gathers), then one masked row-sum per
        # output bucket h (folding the passes first saves (KD-1)·HI
        # row-reductions); per-chunk kmax skips unused passes (most chunks
        # have no reduce-lane collisions)
        def reduce_body(kd_eff):
            Rks = [jnp.take_along_axis(acc, src_ref[k].astype(jnp.int32),
                                       axis=1)
                   for k in range(kd_eff)]
            hiks = [hik_ref[k].astype(jnp.int32) for k in range(kd_eff)]
            for h in range(HI):
                z = jnp.where(hiks[0] == h, Rks[0], 0.0)
                for k in range(1, kd_eff):
                    z = z + jnp.where(hiks[k] == h, Rks[k], 0.0)
                y_ref[0, h, :] += jnp.sum(z, axis=0)

        if KD == 1:
            reduce_body(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _red(kd_eff=kd + 1):
                    reduce_body(kd_eff)

    p1 = (dt.sg.astype(jnp.int32) << 16) | dt.tile.astype(jnp.int32)
    p2 = (dt.fwd_first.astype(jnp.int32)
          | (dt.kmax.astype(jnp.int32) << 4)
          | (dt.sdf.astype(jnp.int32) << 8))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # packed sg|tile, first|kmax|sdf
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((SR, LANES), lambda b, p1, p2: (b, 0)),
            pl.BlockSpec((SR, LANES), lambda b, p1, p2: (b, 0)),
            pl.BlockSpec((SR, LANES), lambda b, p1, p2: (b, 0)),
            pl.BlockSpec((KD, SR, LANES), lambda b, p1, p2: (0, b, 0)),
            pl.BlockSpec((KD, SR, LANES), lambda b, p1, p2: (0, b, 0)),
            pl.BlockSpec((SR, LANES),
                         lambda b, p1, p2: (p1[b] >> 16, 0)),  # d2 window
        ],
        out_specs=pl.BlockSpec((1, HI, LANES),
                               lambda b, p1, p2: (p1[b] & 0xFFFF, 0, 0)),
        scratch_shapes=[pltpu.VMEM((SR, LANES), d2.dtype)],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, HI, LANES), d2.dtype),
        interpret=interpret,
    )(p1, p2, dt.lvw, dt.w, dt.rposf, dt.src, dt.hik, d2)
    # tiles no chunk ever visited hold uninitialized memory (where, not
    # multiply: 0 * uninit-NaN would stay NaN)
    return jnp.where(dt.tiles_covered[:, None, None] > 0, y, 0.0)


# "kpass-tree": KD lane-gathers, row-select as an HI-way select tree
#   (Mosaic rejects take_along_axis(axis=0) when the index is taller than
#   the 8-row sublane window, so the tree is the compiling form).
# "kpass": same but row-select via take_along_axis(axis=0) — interpret/CPU
#   only.  "hi": legacy HI-lane-gather fetch (1.72x fwd vs 1.29x, v5e).
BWD_G_FETCH = "kpass-tree"


def _bwd_pallas(dy, dt: DeviceTables, meta: RoutedMeta, interpret=False,
                g_fetch=None, stage="full"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NC, SR, KD, HI, H = meta.NC, meta.SR, meta.KD, meta.HI, meta.H
    g_fetch = BWD_G_FETCH if g_fetch is None else g_fetch

    def tail(gw, sd, rposb_ref, perm_ref, put_ref, putv_ref, out_ref,
             t_scr):
        """Shared pipeline after the g-fetch: segment-sum per voxel run
        (rposb mask — runs are contiguous in permuted order; steps past
        the chunk's longest run are skipped via the sdb scalar), place at
        the voxel lane.  ``perm_ref=None`` means gw already arrives in
        permuted order (the kpass g-fetch reads permuted tables)."""
        if perm_ref is None:
            t_scr[:] = gw
        else:
            perm = perm_ref[:].astype(jnp.int32)
            t_scr[:] = jnp.take_along_axis(gw, perm, axis=1)
        rp = rposb_ref[:].astype(jnp.int32)
        for t in range(meta.scan_bwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                t_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(t_scr[:], s, 1), 0.0)

        placed = jnp.take_along_axis(t_scr[:], put_ref[:].astype(jnp.int32),
                                     axis=1)
        placed = placed * putv_ref[:].astype(jnp.int32).astype(out_ref.dtype)
        out_ref[:] += placed

    def kernel_hi(order_ref, p1_ref, p2_ref,
                  rposb_ref, w_ref, hi_ref, lp_ref, perm_ref, put_ref,
                  putv_ref, dy_ref, out_ref, t_scr):
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        hi32 = hi_ref[:].astype(jnp.int32)
        lp32 = lp_ref[:].astype(jnp.int32)
        g = jnp.zeros((SR, LANES), out_ref.dtype)
        for h in range(HI):
            gh = jnp.take_along_axis(
                jnp.broadcast_to(dy_ref[0, h, :][None, :], (SR, LANES)),
                lp32, axis=1)
            g = jnp.where(hi32 == h, gh, g)
        tail(g * w_ref[:], (p2 >> 8) & 0xF, rposb_ref, perm_ref, put_ref,
             putv_ref, out_ref, t_scr)

    def kernel_kpass(order_ref, p1_ref, p2_ref,
                     rposb_ref, wp_ref, lp8p_ref, kcolp_ref,
                     hik_ref, put_ref, putv_ref, dy_ref, out_ref, g_scr,
                     t_scr):
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        # permuted-table g-fetch: lp/kcol/w are stored at permuted lane
        # positions, so g·w comes out directly in voxel-lane-sorted order
        # and the tail's PERM lane-gather disappears
        dyt = dy_ref[0]  # (HI, LANES)
        lp32 = lp8p_ref[:].astype(jnp.int32)
        kc = kcolp_ref[:].astype(jnp.int32)

        def gfetch(kd_eff):
            g = jnp.zeros((SR, LANES), out_ref.dtype)
            for k in range(kd_eff):
                hv = jnp.clip(hik_ref[k].astype(jnp.int32), 0, HI - 1)
                if g_fetch == "kpass-tree":
                    rk = jnp.broadcast_to(dyt[0][None, :], (SR, LANES))
                    for h in range(1, HI):
                        rk = jnp.where(hv == h, dyt[h][None, :], rk)
                else:
                    rk = jnp.take_along_axis(dyt, hv, axis=0)
                gc = jnp.take_along_axis(rk, lp32, axis=1)
                # single-pass chunks skip the pass select (dead columns
                # are zeroed by w anyway)
                g = gc if kd_eff == 1 else jnp.where(kc == k, gc, g)
            g_scr[:] = g

        if stage == "tail":  # profiling-only: skip the g-fetch
            g_scr[:] = jnp.broadcast_to(dyt[0][None, :], (SR, LANES))
        elif KD == 1:
            gfetch(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _g(kd_eff=kd + 1):
                    gfetch(kd_eff)

        if stage == "gfetch":  # profiling-only: skip the tail
            out_ref[:] += g_scr[:] * wp_ref[:]
            return
        tail(g_scr[:] * wp_ref[:], (p2 >> 8) & 0xF, rposb_ref, None,
             put_ref, putv_ref, out_ref, t_scr)

    col_spec = pl.BlockSpec((SR, LANES),
                            lambda b, o, p1, p2: (o[b], 0))
    dy_spec = pl.BlockSpec((1, HI, LANES),
                           lambda b, o, p1, p2: (p1[b] & 0xFFFF, 0, 0))
    scratch = [pltpu.VMEM((SR, LANES), dy.dtype)]
    if g_fetch == "hi":
        kernel = kernel_hi
        in_specs = [col_spec] * 7 + [dy_spec]
        assert dt.hi8.shape == dt.w.shape, (
            "legacy 'hi' g-fetch needs full tables; this DeviceTables was "
            "uploaded slim (device_tables(slim=True))")
        tables = (dt.rposb, dt.w, dt.hi8, dt.lp8, dt.perm, dt.put, dt.putv,
                  dy)
    else:
        kernel = kernel_kpass
        hik_spec = pl.BlockSpec((KD, SR, LANES),
                                lambda b, o, p1, p2: (0, o[b], 0))
        in_specs = [col_spec] * 4 + [hik_spec] + [col_spec] * 2 + [dy_spec]
        tables = (dt.rposb, dt.wp, dt.lp8p, dt.kcolp, dt.hik, dt.put,
                  dt.putv, dy)
        scratch = [pltpu.VMEM((SR, LANES), dy.dtype)] + scratch

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # order + packed sg|tile + first|kmax|sdb
        grid=(NC,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((SR, LANES),
                               lambda b, o, p1, p2: (p1[b] >> 16, 0)),
        scratch_shapes=scratch,
    )
    p1 = ((dt.sg.astype(jnp.int32) << 16)
          | dt.tile.astype(jnp.int32))[dt.bwd_order]
    p2 = (dt.bwd_first.astype(jnp.int32)
          | (dt.kmax.astype(jnp.int32) << 4)[dt.bwd_order]
          | (dt.sdb.astype(jnp.int32) << 8)[dt.bwd_order])
    dD2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, LANES), dy.dtype),
        interpret=interpret,
    )(dt.bwd_order, p1, p2, *tables)
    # density windows no chunk ever visited hold uninitialized memory
    return jnp.where(jnp.repeat(dt.wins_covered, SR)[:, None] > 0, dD2, 0.0)


# ---------------------------------------------------------------------------
# public entry: custom-vjp projection
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def routed_project(d2, dt: DeviceTables, meta: RoutedMeta,
                   use_pallas: bool = True):
    """y (T, HI, 128) = routed forward projection of d2 (H, 128)."""
    if use_pallas:
        return _fwd_pallas(d2, dt, meta)
    return routed_project_ref(d2, dt, meta)


def _rp_fwd(d2, dt, meta, use_pallas):
    return routed_project(d2, dt, meta, use_pallas), dt


def _rp_bwd(meta, use_pallas, dt, dy):
    if use_pallas:
        dD2 = _bwd_pallas(dy, dt, meta)
    else:
        dD2 = routed_backproject_ref(dy, dt, meta)
    return dD2, None


routed_project.defvjp(_rp_fwd, _rp_bwd)


# ---------------------------------------------------------------------------
# band-compacted kernels (see route.band_pack): same math on a slot grid
# holding only live 8-row bands — ~2x fewer slots at equal superchunk size
# ---------------------------------------------------------------------------

class BandedDeviceFwd(NamedTuple):
    lvw: jax.Array      # (NCB·8B, L) int8
    w: jax.Array        # (NCB·8B, L) f32
    rposf: jax.Array    # (NCB·8B, L) int8
    src: jax.Array      # (KD, NCB·8B, L) int8
    hik: jax.Array      # (KD, NCB·8B, L) int8
    bp: jax.Array       # (B, NCB) int32 — density-window pointer per band
    p2: jax.Array       # (NCB,) int32 — first | kmax<<4 | sdf<<8 |
    #                     (hist: kv<<12) | tile<<16
    covered: jax.Array  # (T,) int8 — tiles with real bands
    # histogram-reduce placement tables (route.hist_pack_fwd; None for
    # the classic masked reduce)
    vpos: Optional[jax.Array] = None  # (KD, NCB·8B, L) int8
    hj: Optional[jax.Array] = None    # (KD·KV, NCB·8B, L) int8


class BandedDeviceBwd(NamedTuple):
    rposb: jax.Array
    wp: jax.Array
    lp8p: jax.Array
    kcolp: jax.Array
    hik: jax.Array
    put: jax.Array
    putv: jax.Array
    bp: jax.Array       # (B, NCB) int32 — dy tile pointer per band
    p2: jax.Array       # (NCB,) int32 — first | kmax<<4 | sdb<<8 | window<<16
    covered: jax.Array  # (H//8,) int8 — windows with real bands


def banded_device_fwd(bt, w_dtype=None, hist=None):
    """Upload forward band tables (bt = band_pack(rt8, by='tile')).
    ``w_dtype`` optionally quantizes the weight table (config
    routed_w_dtype='bf16' — see config.py for the numerics contract).
    ``hist`` (route.hist_pack_fwd output) selects the histogram reduce:
    its placement tables ride along and hik is replaced by a 1-row
    dummy (the hist kernel never reads it)."""
    assert bt.by == "tile"
    p2 = (bt.first.astype(np.int32)
          | (bt.kmax.astype(np.int32) << 4)
          | (bt.sdf.astype(np.int32) << 8)
          | (bt.keyp.astype(np.int32) << 16))
    if hist is not None:
        p2 = p2 | (hist.kv.astype(np.int32) << 12)
    # cast on the HOST: uploading f32 then casting on-device would double
    # both the transfer bytes and the transient HBM (the capacity this
    # option exists to save)
    w = (jnp.asarray(bt.w) if w_dtype is None
         else jnp.asarray(np.asarray(bt.w, dtype=jnp.dtype(w_dtype))))
    hik = (jnp.asarray(bt.hik) if hist is None
           else jnp.asarray(np.zeros((bt.hik.shape[0], 1, LANES), np.int8)))
    ft = BandedDeviceFwd(
        lvw=jnp.asarray(bt.lvw), w=w,
        rposf=jnp.asarray(bt.rposf), src=jnp.asarray(bt.src),
        hik=hik, bp=jnp.asarray(bt.bp),
        p2=jnp.asarray(p2), covered=jnp.asarray(bt.covered),
        vpos=None if hist is None else jnp.asarray(hist.vpos),
        hj=None if hist is None else jnp.asarray(hist.hj))
    meta = RoutedMeta(bt.NCB, bt.SRb * bt.B, bt.KD, bt.G, bt.HI, bt.T,
                      bt.H, bt.n_rays, bt.volume_size, bt.scan_fwd,
                      bt.scan_bwd)
    return ft, meta


def banded_device_bwd(bt, w_dtype=None):
    """Upload backward band tables (bt = band_pack(rt8, by='window'))."""
    assert bt.by == "window"
    p2 = (bt.first.astype(np.int32)
          | (bt.kmax.astype(np.int32) << 4)
          | (bt.sdb.astype(np.int32) << 8)
          | (bt.keyp.astype(np.int32) << 16))
    wp = (jnp.asarray(bt.wp) if w_dtype is None
          else jnp.asarray(np.asarray(bt.wp, dtype=jnp.dtype(w_dtype))))
    btd = BandedDeviceBwd(
        rposb=jnp.asarray(bt.rposb), wp=wp,
        lp8p=jnp.asarray(bt.lp8p), kcolp=jnp.asarray(bt.kcolp),
        hik=jnp.asarray(bt.hik), put=jnp.asarray(bt.put),
        putv=jnp.asarray(bt.putv), bp=jnp.asarray(bt.bp),
        p2=jnp.asarray(p2), covered=jnp.asarray(bt.covered))
    meta = RoutedMeta(bt.NCB, bt.SRb * bt.B, bt.KD, bt.G, bt.HI, bt.T,
                      bt.H, bt.n_rays, bt.volume_size, bt.scan_fwd,
                      bt.scan_bwd)
    return btd, meta


def _fwd_banded_pallas(d2, ft: BandedDeviceFwd, meta: RoutedMeta, B: int,
                       interpret=False, stage="full"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCB, SRB, KD, HI, T = meta.NC, meta.SR, meta.KD, meta.HI, meta.T
    SRb = SRB // B  # rows per band

    def kernel(bp_ref, p2_ref, lvw_ref, w_ref, rposf_ref, src_ref, hik_ref,
               *rest):
        d2refs = rest[:B]
        y_ref = rest[B]
        acc_scr = rest[B + 1]
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        W = jnp.concatenate([r[:] for r in d2refs], axis=0)  # (SRB, L)
        wv = w_ref[:]
        F = jnp.take_along_axis(W, lvw_ref[:].astype(jnp.int32), axis=1) * wv
        if stage == "fetch":  # profiling-only truncated kernel
            y_ref[0, 0, :] += jnp.sum(F, axis=0)
            return
        rp = rposf_ref[:].astype(jnp.int32)
        acc_scr[:] = F
        sd = (p2 >> 8) & 0xF
        for t in range(meta.scan_fwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                acc_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(acc_scr[:], s, 1), 0.0)

        acc = acc_scr[:]
        if stage == "scan":  # profiling-only truncated kernel
            y_ref[0, 0, :] += jnp.sum(acc, axis=0)
            return

        def reduce_body(kd_eff):
            Rks = [jnp.take_along_axis(acc, src_ref[k].astype(jnp.int32),
                                       axis=1)
                   for k in range(kd_eff)]
            hiks = [hik_ref[k].astype(jnp.int32) for k in range(kd_eff)]
            for h in range(HI):
                z = jnp.where(hiks[0] == h, Rks[0], 0.0)
                for k in range(1, kd_eff):
                    z = z + jnp.where(hiks[k] == h, Rks[k], 0.0)
                y_ref[0, h, :] += jnp.sum(z, axis=0)

        if KD == 1:
            reduce_body(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _red(kd_eff=kd + 1):
                    reduce_body(kd_eff)

    col = pl.BlockSpec((SRB, LANES), lambda b, bp, p2: (b, 0))
    colk = pl.BlockSpec((KD, SRB, LANES), lambda b, bp, p2: (0, b, 0))

    def band_spec(k):
        return pl.BlockSpec((SRb, LANES),
                            lambda b, bp, p2, k=k: (bp[k, b], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # bp (B, NCB), packed p2
        grid=(NCB,),
        in_specs=[col, col, col, colk, colk]
        + [band_spec(k) for k in range(B)],
        out_specs=pl.BlockSpec((1, HI, LANES),
                               lambda b, bp, p2: (p2[b] >> 16, 0, 0)),
        scratch_shapes=[pltpu.VMEM((SRB, LANES), d2.dtype)],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, HI, LANES), d2.dtype),
        interpret=interpret,
    )(ft.bp, ft.p2, ft.lvw, ft.w, ft.rposf, ft.src, ft.hik, *([d2] * B))
    # tiles with no bands are never visited -> uninitialized output block
    return jnp.where(ft.covered[:, None, None] > 0, y, 0.0)


def _fwd_banded_hist_pallas(d2, ft: BandedDeviceFwd, meta: RoutedMeta,
                            B: int, KV: int, interpret=False,
                            stage="full"):
    """Histogram-placement forward reduce (route.hist_pack_fwd; round 5,
    VERDICT r4 #1).  Fetch and lane-scan stages are identical to
    :func:`_fwd_banded_pallas`; the reduce replaces the per-bucket
    masked row-sums (work ~ HI x rows) with

      1. the pass-k run-total gather (``src``, as before),
      2. a 3-step vertical fold of same-h totals in consecutive band
         rows (masked shift-adds keyed by ``vpos`` — full-height ops),
      3. per multiplicity level j < kv(chunk): an 8-row sublane gather
         placing each folded total at its (h % 8, lane) slot
         (``take_along_axis(axis=1)`` on the (B, 8, 128) view), and
      4. one masked (B, 8, 128) -> (8, 128) band reduction per octave
         o = h >> 3 accumulated into the y block,

    so per-chunk reduce work ~ rows x (kv + OCT/4), nearly independent
    of HI — the property that unlocks the G-ladder's fill gains (the
    rows law left this as the one live lever for 100^3)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCB, SRB, KD, HI, T = meta.NC, meta.SR, meta.KD, meta.HI, meta.T
    SRb = SRB // B
    assert SRb == 8, "histogram reduce needs 8-row bands"
    OCT = (HI + 7) // 8

    def kernel(bp_ref, p2_ref, lvw_ref, w_ref, rposf_ref, src_ref,
               vpos_ref, hj_ref, *rest):
        d2refs = rest[:B]
        y_ref = rest[B]
        acc_scr = rest[B + 1]
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        W = jnp.concatenate([r[:] for r in d2refs], axis=0)  # (SRB, L)
        wv = w_ref[:]
        F = jnp.take_along_axis(W, lvw_ref[:].astype(jnp.int32), axis=1) * wv
        if stage == "fetch":  # profiling-only truncated kernel
            y_ref[0, 0, :] += jnp.sum(F, axis=0)
            return
        rp = rposf_ref[:].astype(jnp.int32)
        acc_scr[:] = F
        sd = (p2 >> 8) & 0xF
        for t in range(meta.scan_fwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                acc_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(acc_scr[:], s, 1), 0.0)

        acc = acc_scr[:]
        if stage == "scan":  # profiling-only truncated kernel
            y_ref[0, 0, :] += jnp.sum(acc, axis=0)
            return

        kvc = (p2 >> 12) & 0xF

        def band_sum(x):
            """(SRB, L) -> (8, L): sum rows congruent mod 8 (pairwise
            halving of static 8-aligned slices — Mosaic-safe; 3-D
            reductions and gathers do not lower).  Handles any band
            count (B=96: 768 -> 384 -> 192 -> 96 -> 48 -> 24 -> 16 -> 8)."""
            h = x.shape[0]
            while h > 8:
                nb = h // 8
                k = ((nb + 1) // 2) * 8  # 8-aligned ceil half
                add = x[:h - k] + x[k:]
                x = (jnp.concatenate([add, x[h - k:k]], axis=0)
                     if k > h - k else add)
                h = k
            return x

        def reduce_body(kd_eff):
            for k in range(kd_eff):
                Rk = jnp.take_along_axis(
                    acc, src_ref[k].astype(jnp.int32), axis=1)
                vp = vpos_ref[k].astype(jnp.int32)
                Fk = jnp.where(vp >= 0, Rk, 0.0)
                # vertical fold: sum same-h runs down consecutive band
                # rows (vpos masks block pulls across run/band edges)
                for t in range(3):
                    s = 1 << t
                    shifted = jnp.concatenate(
                        [jnp.zeros((s, LANES), Fk.dtype), Fk[:-s]], axis=0)
                    Fk = Fk + jnp.where(vp >= s, shifted, 0.0)
                for j in range(KV):

                    @pl.when(kvc > j)
                    def _place(j=j, Fk=Fk, k=k):
                        tj = hj_ref[k * KV + j].astype(jnp.int32)
                        val = ((tj & 0x80) >> 7).astype(Fk.dtype)
                        srcrow = tj & 7
                        octv = (tj >> 3) & 15
                        # per-band 8-row sublane gather (the only
                        # Mosaic-legal vertical gather)
                        placed = jnp.concatenate([
                            jnp.take_along_axis(
                                Fk[8 * b:8 * b + 8],
                                srcrow[8 * b:8 * b + 8], axis=0)
                            for b in range(B)], axis=0) * val
                        for o in range(OCT):
                            ro = min(8, HI - 8 * o)
                            z = band_sum(
                                jnp.where(octv == o, placed, 0.0))
                            y_ref[0, 8 * o:8 * o + ro, :] += z[:ro, :]

        if KD == 1:
            reduce_body(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _red(kd_eff=kd + 1):
                    reduce_body(kd_eff)

    col = pl.BlockSpec((SRB, LANES), lambda b, bp, p2: (b, 0))
    colk = pl.BlockSpec((KD, SRB, LANES), lambda b, bp, p2: (0, b, 0))
    colkv = pl.BlockSpec((KD * KV, SRB, LANES), lambda b, bp, p2: (0, b, 0))

    def band_spec(k):
        return pl.BlockSpec((SRb, LANES),
                            lambda b, bp, p2, k=k: (bp[k, b], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # bp (B, NCB), packed p2
        grid=(NCB,),
        in_specs=[col, col, col, colk, colk, colkv]
        + [band_spec(k) for k in range(B)],
        out_specs=pl.BlockSpec((1, HI, LANES),
                               lambda b, bp, p2: (p2[b] >> 16, 0, 0)),
        scratch_shapes=[pltpu.VMEM((SRB, LANES), d2.dtype)],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, HI, LANES), d2.dtype),
        interpret=interpret,
    )(ft.bp, ft.p2, ft.lvw, ft.w, ft.rposf, ft.src, ft.vpos, ft.hj,
      *([d2] * B))
    return jnp.where(ft.covered[:, None, None] > 0, y, 0.0)


def _fwd_banded_dense_pallas(d2, ft: BandedDeviceFwd, meta: RoutedMeta,
                             interpret=False, stage="full"):
    """Dense-slot forward (route.band_pack_dense(by='tile')): slot w =
    the band of density window w, so the concatenated band windows ARE
    the density image — one resident (H, 128) input with a constant
    index map replaces the B per-band window BlockSpecs (and their
    ~30 ns × live-band DMA issues, the dominant forward fetch cost)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCB, SRB, KD, HI, T = meta.NC, meta.SR, meta.KD, meta.HI, meta.T
    assert SRB == meta.H, (SRB, meta.H)  # slots cover every window

    def kernel(p2_ref, lvw_ref, w_ref, rposf_ref, src_ref, hik_ref,
               d2_ref, y_ref, acc_scr):
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        W = d2_ref[:]  # (H, L): slot rows == density rows
        wv = w_ref[:]
        F = jnp.take_along_axis(W, lvw_ref[:].astype(jnp.int32), axis=1) * wv
        if stage == "fetch":
            y_ref[0, 0, :] += jnp.sum(F, axis=0)
            return
        rp = rposf_ref[:].astype(jnp.int32)
        acc_scr[:] = F
        sd = (p2 >> 8) & 0xF
        for t in range(meta.scan_fwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                acc_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(acc_scr[:], s, 1), 0.0)

        acc = acc_scr[:]
        if stage == "scan":
            y_ref[0, 0, :] += jnp.sum(acc, axis=0)
            return

        def reduce_body(kd_eff):
            Rks = [jnp.take_along_axis(acc, src_ref[k].astype(jnp.int32),
                                       axis=1)
                   for k in range(kd_eff)]
            hiks = [hik_ref[k].astype(jnp.int32) for k in range(kd_eff)]
            for h in range(HI):
                z = jnp.where(hiks[0] == h, Rks[0], 0.0)
                for k in range(1, kd_eff):
                    z = z + jnp.where(hiks[k] == h, Rks[k], 0.0)
                y_ref[0, h, :] += jnp.sum(z, axis=0)

        if KD == 1:
            reduce_body(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _red(kd_eff=kd + 1):
                    reduce_body(kd_eff)

    col = pl.BlockSpec((SRB, LANES), lambda b, p2: (b, 0))
    colk = pl.BlockSpec((KD, SRB, LANES), lambda b, p2: (0, b, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # packed p2 (no per-band pointers)
        grid=(NCB,),
        in_specs=[col, col, col, colk, colk,
                  pl.BlockSpec((meta.H, LANES), lambda b, p2: (0, 0))],
        out_specs=pl.BlockSpec((1, HI, LANES),
                               lambda b, p2: (p2[b] >> 16, 0, 0)),
        scratch_shapes=[pltpu.VMEM((SRB, LANES), d2.dtype)],
    )
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, HI, LANES), d2.dtype),
        interpret=interpret,
    )(ft.p2, ft.lvw, ft.w, ft.rposf, ft.src, ft.hik, d2)
    return jnp.where(ft.covered[:, None, None] > 0, y, 0.0)


def _bwd_banded_dense_pallas(dy, btd: BandedDeviceBwd, meta: RoutedMeta,
                             SRb: int, interpret=False, g_fetch=None,
                             stage="full"):
    """Dense-slot backward (route.band_pack_dense(by='window')): slot t =
    the band of ray tile t, so every slot's dy tile index is STATIC and
    the whole (T, HI, 128) dy array rides one resident input — no
    per-band dy blocks re-fetched once per (tile, window) pair (~1.4 GB
    and ~B BlockSpec issues/step at 100³)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCB, SRB, KD, HI, H = meta.NC, meta.SR, meta.KD, meta.HI, meta.H
    T = meta.T
    assert SRB == SRb * T, (SRB, SRb, T)  # slots cover every tile
    g_fetch = BWD_BANDED_G_FETCH if g_fetch is None else g_fetch
    grouped = g_fetch == "grouped8" and HI >= 8 and HI % 8 == 0

    def kernel(p2_ref, rposb_ref, wp_ref, lp8p_ref, kcolp_ref,
               hik_ref, put_ref, putv_ref, dy_ref, out_ref, g_scr,
               t_scr):
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        lp32 = lp8p_ref[:].astype(jnp.int32)
        kc = kcolp_ref[:].astype(jnp.int32)

        def gfetch(kd_eff):
            g = jnp.zeros((SRB, LANES), out_ref.dtype)
            for k in range(kd_eff):
                hv = jnp.clip(hik_ref[k].astype(jnp.int32), 0, HI - 1)
                parts = []
                for o in range(SRB // 8):
                    kb = o * 8 // SRb       # band = tile, statically
                    dyt = dy_ref[kb]        # (HI, L) static slice
                    hvb = hv[o * 8:(o + 1) * 8]
                    if grouped:
                        lo = hvb & 7
                        rkb = None
                        for gg in range(HI // 8):
                            sel = jnp.take_along_axis(
                                dyt[8 * gg:8 * gg + 8], lo, axis=0)
                            rkb = sel if rkb is None else jnp.where(
                                (hvb >> 3) == gg, sel, rkb)
                    else:
                        rkb = jnp.broadcast_to(dyt[0][None, :], (8, LANES))
                        for h in range(1, HI):
                            rkb = jnp.where(hvb == h, dyt[h][None, :], rkb)
                    parts.append(rkb)
                rk = jnp.concatenate(parts, axis=0)
                gc = jnp.take_along_axis(rk, lp32, axis=1)
                g = gc if kd_eff == 1 else jnp.where(kc == k, gc, g)
            g_scr[:] = g

        if stage == "tail":
            g_scr[:] = jnp.broadcast_to(
                dy_ref[0, 0, :][None, :], (SRB, LANES))
        elif KD == 1:
            gfetch(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _g(kd_eff=kd + 1):
                    gfetch(kd_eff)

        if stage == "gfetch":
            out_ref[:] += (g_scr[:] * wp_ref[:]).reshape(
                T, SRb, LANES).sum(axis=0)
            return
        t_scr[:] = g_scr[:] * wp_ref[:]
        rp = rposb_ref[:].astype(jnp.int32)
        sd = (p2 >> 8) & 0xF
        for t in range(meta.scan_bwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                t_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(t_scr[:], s, 1), 0.0)

        placed = jnp.take_along_axis(t_scr[:], put_ref[:].astype(jnp.int32),
                                     axis=1)
        placed = placed * putv_ref[:].astype(jnp.int32).astype(out_ref.dtype)
        out_ref[:] += placed.reshape(T, SRb, LANES).sum(axis=0)

    col = pl.BlockSpec((SRB, LANES), lambda b, p2: (b, 0))
    colk = pl.BlockSpec((KD, SRB, LANES), lambda b, p2: (0, b, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NCB,),
        in_specs=[col, col, col, col, colk, col, col,
                  pl.BlockSpec((T, HI, LANES), lambda b, p2: (0, 0, 0))],
        out_specs=pl.BlockSpec((SRb, LANES),
                               lambda b, p2: (p2[b] >> 16, 0)),
        scratch_shapes=[pltpu.VMEM((SRB, LANES), dy.dtype),
                        pltpu.VMEM((SRB, LANES), dy.dtype)],
    )
    dD2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, LANES), dy.dtype),
        interpret=interpret,
    )(btd.p2, btd.rposb, btd.wp, btd.lp8p, btd.kcolp, btd.hik,
      btd.put, btd.putv, dy)
    return jnp.where(jnp.repeat(btd.covered, SRb)[:, None] > 0, dD2, 0.0)


def banded_device_wfwd(bt, w_dtype=None):
    """Upload FORWARD tables from a by-'window' dense band packing —
    the window-major forward (see :func:`_fwd_banded_densew_pallas`)
    shares the dense backward's slot grid (superchunk = (window, rep),
    slot t = ray tile t), so the same band_pack_dense(by='window')
    tables carry both directions' per-column fields."""
    assert bt.by == "window" and bt.slots == "dense"
    p2 = (bt.first.astype(np.int32)
          | (bt.kmax.astype(np.int32) << 4)
          | (bt.sdf.astype(np.int32) << 8)
          | (bt.keyp.astype(np.int32) << 16))
    w = (jnp.asarray(bt.w) if w_dtype is None
         else jnp.asarray(np.asarray(bt.w, dtype=jnp.dtype(w_dtype))))
    ft = BandedDeviceFwd(
        lvw=jnp.asarray(bt.lvw), w=w,
        rposf=jnp.asarray(bt.rposf), src=jnp.asarray(bt.src),
        hik=jnp.asarray(bt.hik), bp=jnp.asarray(bt.bp),
        p2=jnp.asarray(p2), covered=jnp.asarray(bt.covered))
    meta = RoutedMeta(bt.NCB, bt.SRb * bt.B, bt.KD, bt.G, bt.HI, bt.T,
                      bt.H, bt.n_rays, bt.volume_size, bt.scan_fwd,
                      bt.scan_bwd)
    return ft, meta


def _fwd_banded_densew_pallas(d2, ft: BandedDeviceFwd, meta: RoutedMeta,
                              SRb: int, interpret=False, stage="full"):
    """Window-major dense-slot FORWARD: superchunk = (density window,
    rep), slot t = the band of ray tile t — the dense BACKWARD's slot
    grid, mirrored.  Structural DMA-count fix for the fetch stage: each
    superchunk fetches ONE (SRb, 128) density window through its p2
    pointer (vs B per-band window DMAs in the by-tile classic layout),
    and the whole y rides a single RESIDENT VMEM output block laid out
    ``(HI·Tp, 128)`` h-major (so every h-slice is a static Tp-row
    aligned write; Tp = slot count, 8-padded via band_pack_dense
    slot_pad).  Returns y as (Tp, HI, 128)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCB, SRB, KD, HI = meta.NC, meta.SR, meta.KD, meta.HI
    Tp = SRB // SRb
    assert Tp * SRb == SRB

    def kernel(p2_ref, lvw_ref, w_ref, rposf_ref, src_ref, hik_ref,
               d2_ref, y_ref, acc_scr):
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when(b == 0)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        W8 = d2_ref[:]                       # (SRb, L) shared window
        W = jnp.concatenate([W8] * Tp, axis=0)
        wv = w_ref[:]
        F = jnp.take_along_axis(W, lvw_ref[:].astype(jnp.int32), axis=1) * wv
        if stage == "fetch":
            y_ref[0:1, :] += jnp.sum(F, axis=0, keepdims=True)
            return
        rp = rposf_ref[:].astype(jnp.int32)
        acc_scr[:] = F
        sd = (p2 >> 8) & 0xF
        for t in range(meta.scan_fwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                acc_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(acc_scr[:], s, 1), 0.0)

        acc = acc_scr[:]
        if stage == "scan":
            y_ref[0:1, :] += jnp.sum(acc, axis=0, keepdims=True)
            return

        def reduce_body(kd_eff):
            Rks = [jnp.take_along_axis(acc, src_ref[k].astype(jnp.int32),
                                       axis=1)
                   for k in range(kd_eff)]
            hiks = [hik_ref[k].astype(jnp.int32) for k in range(kd_eff)]
            for h in range(HI):
                z = jnp.where(hiks[0] == h, Rks[0], 0.0)
                for k in range(1, kd_eff):
                    z = z + jnp.where(hiks[k] == h, Rks[k], 0.0)
                y_ref[h * Tp:(h + 1) * Tp, :] += z.reshape(
                    Tp, SRb, LANES).sum(axis=1)

        if KD == 1:
            reduce_body(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _red(kd_eff=kd + 1):
                    reduce_body(kd_eff)

    col = pl.BlockSpec((SRB, LANES), lambda b, p2: (b, 0))
    colk = pl.BlockSpec((KD, SRB, LANES), lambda b, p2: (0, b, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NCB,),
        in_specs=[col, col, col, colk, colk,
                  pl.BlockSpec((SRb, LANES),
                               lambda b, p2: (p2[b] >> 16, 0))],
        out_specs=pl.BlockSpec((HI * Tp, LANES), lambda b, p2: (0, 0)),
        scratch_shapes=[pltpu.VMEM((SRB, LANES), d2.dtype)],
    )
    y2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((HI * Tp, LANES), d2.dtype),
        interpret=interpret,
    )(ft.p2, ft.lvw, ft.w, ft.rposf, ft.src, ft.hik, d2)
    # (HI·Tp, 128) h-major -> (Tp, HI, 128); resident y is zero-inited,
    # so no covered mask is needed
    return y2.reshape(HI, Tp, LANES).transpose(1, 0, 2)


# banded backward dy row-select: "grouped8" = sublane gathers within
# 8-row groups + group select tree (4 gathers + 3 selects at HI=32;
# measured 1.35x on the whole bwd kernel vs "tree" on v5e, bit-identical);
# "tree" = HI-way select tree (fallback when HI is not a multiple of 8).
BWD_BANDED_G_FETCH = "grouped8"


def _bwd_banded_pallas(dy, btd: BandedDeviceBwd, meta: RoutedMeta, B: int,
                       interpret=False, g_fetch=None, stage="full"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NCB, SRB, KD, HI, H = meta.NC, meta.SR, meta.KD, meta.HI, meta.H
    SRb = SRB // B  # rows per band
    g_fetch = BWD_BANDED_G_FETCH if g_fetch is None else g_fetch
    # the grouped8 row-select needs 8-row groups of the (HI, L) dy tile
    grouped = g_fetch == "grouped8" and HI >= 8 and HI % 8 == 0

    def kernel(bp_ref, p2_ref, rposb_ref, wp_ref, lp8p_ref, kcolp_ref,
               hik_ref, put_ref, putv_ref, *rest):
        dyrefs = rest[:B]
        out_ref = rest[B]
        g_scr = rest[B + 1]
        t_scr = rest[B + 2]
        b = pl.program_id(0)
        p2 = p2_ref[b]

        @pl.when((p2 & 0xF) == 1)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        lp32 = lp8p_ref[:].astype(jnp.int32)
        kc = kcolp_ref[:].astype(jnp.int32)

        def gfetch(kd_eff):
            g = jnp.zeros((SRB, LANES), out_ref.dtype)
            for k in range(kd_eff):
                hv = jnp.clip(hik_ref[k].astype(jnp.int32), 0, HI - 1)
                parts = []
                for o in range(SRB // 8):  # 8-row sub-blocks of the
                    kb = o * 8 // SRb      # band owning this sub-block
                    dyt = dyrefs[kb][0]    # the band's dy tile, (HI, L)
                    hvb = hv[o * 8:(o + 1) * 8]
                    if grouped:
                        # sublane gather within each 8-row group of the
                        # dy tile (axis-0 take_along_axis compiles when
                        # arr AND index are both 8 rows), then a select
                        # tree over the HI//8 groups: 4 gathers + 3
                        # selects instead of HI-1 selects at HI=32
                        # (measured 1.35x on the whole bwd kernel, v5e)
                        lo = hvb & 7
                        rkb = None
                        for gg in range(HI // 8):
                            sel = jnp.take_along_axis(
                                dyt[8 * gg:8 * gg + 8], lo, axis=0)
                            rkb = sel if rkb is None else jnp.where(
                                (hvb >> 3) == gg, sel, rkb)
                    else:
                        rkb = jnp.broadcast_to(dyt[0][None, :], (8, LANES))
                        for h in range(1, HI):
                            rkb = jnp.where(hvb == h, dyt[h][None, :], rkb)
                    parts.append(rkb)
                rk = jnp.concatenate(parts, axis=0)  # (SRB, L)
                gc = jnp.take_along_axis(rk, lp32, axis=1)
                g = gc if kd_eff == 1 else jnp.where(kc == k, gc, g)
            g_scr[:] = g

        if stage == "tail":  # profiling-only: skip the g-fetch
            g_scr[:] = jnp.broadcast_to(
                dyrefs[0][0, 0, :][None, :], (SRB, LANES))
        elif KD == 1:
            gfetch(1)
        else:
            km = (p2 >> 4) & 0xF
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _g(kd_eff=kd + 1):
                    gfetch(kd_eff)

        if stage == "gfetch":  # profiling-only: skip the tail
            out_ref[:] += (g_scr[:] * wp_ref[:]).reshape(
                B, SRb, LANES).sum(axis=0)
            return
        t_scr[:] = g_scr[:] * wp_ref[:]
        rp = rposb_ref[:].astype(jnp.int32)
        sd = (p2 >> 8) & 0xF
        for t in range(meta.scan_bwd):

            @pl.when(sd > t)
            def _step(s=1 << t):
                t_scr[:] += jnp.where(
                    rp >= s, pltpu.roll(t_scr[:], s, 1), 0.0)

        placed = jnp.take_along_axis(t_scr[:], put_ref[:].astype(jnp.int32),
                                     axis=1)
        placed = placed * putv_ref[:].astype(jnp.int32).astype(out_ref.dtype)
        # all bands of this superchunk share one density window
        out_ref[:] += placed.reshape(B, SRb, LANES).sum(axis=0)

    col = pl.BlockSpec((SRB, LANES), lambda b, bp, p2: (b, 0))
    colk = pl.BlockSpec((KD, SRB, LANES), lambda b, bp, p2: (0, b, 0))

    def dy_spec(k):
        return pl.BlockSpec((1, HI, LANES),
                            lambda b, bp, p2, k=k: (bp[k, b], 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NCB,),
        in_specs=[col, col, col, col, colk, col, col]
        + [dy_spec(k) for k in range(B)],
        out_specs=pl.BlockSpec((SRb, LANES),
                               lambda b, bp, p2: (p2[b] >> 16, 0)),
        scratch_shapes=[pltpu.VMEM((SRB, LANES), dy.dtype),
                        pltpu.VMEM((SRB, LANES), dy.dtype)],
    )
    dD2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, LANES), dy.dtype),
        interpret=interpret,
    )(btd.bp, btd.p2, btd.rposb, btd.wp, btd.lp8p, btd.kcolp, btd.hik,
      btd.put, btd.putv, *([dy] * B))
    # windows with no bands are never visited -> uninitialized output block
    return jnp.where(jnp.repeat(btd.covered, SRb)[:, None] > 0, dD2, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def banded_project(d2, ft: BandedDeviceFwd, btd: BandedDeviceBwd,
                   meta: RoutedMeta, metab: RoutedMeta, B: int,
                   interpret: bool = False, dense_fwd: bool = False,
                   dense_bwd: bool = False, srb: int = 8,
                   hist_kv: int = 0):
    """y (T, HI, 128) = band-compacted routed forward projection.

    ``meta``/``metab`` are the forward (by-tile) and backward (by-window)
    groupings' metas — their superchunk counts differ in general.
    ``dense_fwd``/``dense_bwd`` select the dense-slot kernels (tables
    from route.band_pack_dense); ``B`` is the classic side's band count
    and ``srb`` the band height (needed by the dense backward);
    ``hist_kv > 0`` selects the histogram-reduce forward kernel with
    that placement depth (tables from route.hist_pack_fwd)."""
    if hist_kv:
        return _fwd_banded_hist_pallas(d2, ft, meta, B, hist_kv,
                                       interpret=interpret)
    if dense_fwd:
        return _fwd_banded_dense_pallas(d2, ft, meta, interpret=interpret)
    return _fwd_banded_pallas(d2, ft, meta, B, interpret=interpret)


def _bp_fwd(d2, ft, btd, meta, metab, B, interpret, dense_fwd, dense_bwd,
            srb, hist_kv):
    return banded_project(d2, ft, btd, meta, metab, B, interpret,
                          dense_fwd, dense_bwd, srb, hist_kv), btd


def _bp_bwd(meta, metab, B, interpret, dense_fwd, dense_bwd, srb, hist_kv,
            btd, dy):
    if dense_bwd:
        return (_bwd_banded_dense_pallas(dy, btd, metab, srb,
                                         interpret=interpret),
                None, None)
    return (_bwd_banded_pallas(dy, btd, metab, B, interpret=interpret),
            None, None)


banded_project.defvjp(_bp_fwd, _bp_bwd)
