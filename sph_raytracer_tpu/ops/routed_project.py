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
from typing import NamedTuple

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


def device_tables(rt: RoutedTables):
    """Upload routing tables; returns (DeviceTables, RoutedMeta)."""
    dt = DeviceTables(
        lvw=jnp.asarray(rt.lvw), w=jnp.asarray(rt.w),
        hi8=jnp.asarray(rt.hi8), lp8=jnp.asarray(rt.lp8),
        perm=jnp.asarray(rt.perm), put=jnp.asarray(rt.put),
        putv=jnp.asarray(rt.putv), kcol=jnp.asarray(rt.kcol),
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

    def kernel(sg_ref, tile_ref, first_ref, kmax_ref, sdf_ref, lvw_ref,
               w_ref, rposf_ref, src_ref, hik_ref, d2_ref, y_ref, acc_scr):
        b = pl.program_id(0)

        @pl.when(first_ref[b] == 1)
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
        sd = sdf_ref[b]
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
            km = kmax_ref[b]
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _red(kd_eff=kd + 1):
                    reduce_body(kd_eff)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,  # sg, tile, first, kmax, sdf
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((SR, LANES), lambda b, sg, t, f, km, sd: (b, 0)),
            pl.BlockSpec((SR, LANES), lambda b, sg, t, f, km, sd: (b, 0)),
            pl.BlockSpec((SR, LANES), lambda b, sg, t, f, km, sd: (b, 0)),
            pl.BlockSpec((KD, SR, LANES),
                         lambda b, sg, t, f, km, sd: (0, b, 0)),
            pl.BlockSpec((KD, SR, LANES),
                         lambda b, sg, t, f, km, sd: (0, b, 0)),
            pl.BlockSpec((SR, LANES),
                         lambda b, sg, t, f, km, sd: (sg[b], 0)),  # d2 window
        ],
        out_specs=pl.BlockSpec((1, HI, LANES),
                               lambda b, sg, t, f, km, sd: (t[b], 0, 0)),
        scratch_shapes=[pltpu.VMEM((SR, LANES), d2.dtype)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, HI, LANES), d2.dtype),
        interpret=interpret,
    )(dt.sg, dt.tile, dt.fwd_first, dt.kmax, dt.sdf,
      dt.lvw, dt.w, dt.rposf, dt.src, dt.hik, d2)


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

    def kernel_hi(order_ref, sg_ref, first_ref, tile_ref, kmax_ref, sdb_ref,
                  rposb_ref, w_ref, hi_ref, lp_ref, perm_ref, put_ref,
                  putv_ref, dy_ref, out_ref, t_scr):
        b = pl.program_id(0)

        @pl.when(first_ref[b] == 1)
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
        tail(g * w_ref[:], sdb_ref[b], rposb_ref, perm_ref, put_ref,
             putv_ref, out_ref, t_scr)

    def kernel_kpass(order_ref, sg_ref, first_ref, tile_ref, kmax_ref,
                     sdb_ref, rposb_ref, wp_ref, lp8p_ref, kcolp_ref,
                     hik_ref, put_ref, putv_ref, dy_ref, out_ref, g_scr,
                     t_scr):
        b = pl.program_id(0)

        @pl.when(first_ref[b] == 1)
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
            km = kmax_ref[b]
            for kd in range(KD):
                cond = (km == kd) if kd < KD - 1 else (km >= KD - 1)

                @pl.when(cond)
                def _g(kd_eff=kd + 1):
                    gfetch(kd_eff)

        if stage == "gfetch":  # profiling-only: skip the tail
            out_ref[:] += g_scr[:] * wp_ref[:]
            return
        tail(g_scr[:] * wp_ref[:], sdb_ref[b], rposb_ref, None, put_ref,
             putv_ref, out_ref, t_scr)

    col_spec = pl.BlockSpec((SR, LANES),
                            lambda b, o, sg, f, t, km, sd: (o[b], 0))
    dy_spec = pl.BlockSpec((1, HI, LANES),
                           lambda b, o, sg, f, t, km, sd: (t[b], 0, 0))
    scratch = [pltpu.VMEM((SR, LANES), dy.dtype)]
    if g_fetch == "hi":
        kernel = kernel_hi
        in_specs = [col_spec] * 7 + [dy_spec]
        tables = (dt.rposb, dt.w, dt.hi8, dt.lp8, dt.perm, dt.put, dt.putv,
                  dy)
    else:
        kernel = kernel_kpass
        hik_spec = pl.BlockSpec((KD, SR, LANES),
                                lambda b, o, sg, f, t, km, sd: (0, o[b], 0))
        in_specs = [col_spec] * 4 + [hik_spec] + [col_spec] * 2 + [dy_spec]
        tables = (dt.rposb, dt.wp, dt.lp8p, dt.kcolp, dt.hik, dt.put,
                  dt.putv, dy)
        scratch = [pltpu.VMEM((SR, LANES), dy.dtype)] + scratch

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,  # order + sg/first/tile/kmax/sdb (bwd-ordered)
        grid=(NC,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((SR, LANES),
                               lambda b, o, sg, f, t, km, sd: (sg[b], 0)),
        scratch_shapes=scratch,
    )
    sg_o = dt.sg[dt.bwd_order]
    tile_o = dt.tile[dt.bwd_order]
    km_o = dt.kmax[dt.bwd_order]
    sdb_o = dt.sdb[dt.bwd_order]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, LANES), dy.dtype),
        interpret=interpret,
    )(dt.bwd_order, sg_o, dt.bwd_first, tile_o, km_o, sdb_o, *tables)


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
