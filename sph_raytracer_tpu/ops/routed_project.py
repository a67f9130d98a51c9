"""Lane-routed projection: Pallas TPU kernels over RoutedTables.

The hot path of the precomputed mode on TPU.  See ops/route.py for the
layout derivation.  Measured motivation (v5e, flagship 50³/250k-ray
config): XLA's gather/scatter projection runs ~440 ms per pass; the
routing here replaces every element-level gather with hardware lane
gathers (``take_along_axis(axis=1)``, supported at any height) plus
static window slices, and every scatter with lane-run segment scans —
all dense vector work.

Two implementations with identical semantics:

* :func:`routed_project_ref` / :func:`routed_backproject_ref` — pure
  jnp reference (vectorized over chunks), used for correctness tests on
  CPU and as the non-TPU fallback.
* :func:`routed_project` — ``jax.custom_vjp`` wrapper dispatching to the
  Pallas kernels (or the reference when ``interpret`` / non-TPU).

The forward computes ``y (T·G,)`` from ``D2 (H, 128)``; the backward
computes ``dD2`` from ``dy`` — exact transposes by construction.
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
    """RoutedTables moved to device (arrays only; meta carried statically)."""

    lvw: jax.Array      # (NC·SR, L) int8
    src: jax.Array      # (KD, NC·SR, L) int8
    hi: jax.Array       # (KD, NC·SR, L) int8
    w: jax.Array        # (KD, NC·SR, L) f32
    invl: jax.Array     # (NC·SR, L) int8
    invp: jax.Array     # (NC·SR, L) int8
    put: jax.Array      # (NC·SR, L) int8
    putvalid: jax.Array  # (NC·SR, L) int8
    colvalid: jax.Array  # (NC·SR, L) int8
    sg: jax.Array       # (NC,) int32
    tile: jax.Array     # (NC,) int32
    fwd_first: jax.Array  # (NC,) int32
    bwd_order: jax.Array  # (NC,) int32
    bwd_first: jax.Array  # (NC,) int32


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


def device_tables(rt: RoutedTables):
    """Upload routing tables; returns (DeviceTables, RoutedMeta)."""
    dt = DeviceTables(
        lvw=jnp.asarray(rt.lvw), src=jnp.asarray(rt.src),
        hi=jnp.asarray(rt.hi), w=jnp.asarray(rt.w),
        invl=jnp.asarray(rt.invl), invp=jnp.asarray(rt.invp),
        put=jnp.asarray(rt.put), putvalid=jnp.asarray(rt.putvalid),
        colvalid=jnp.asarray(rt.colvalid),
        sg=jnp.asarray(rt.sg), tile=jnp.asarray(rt.tile),
        fwd_first=jnp.asarray(rt.fwd_first),
        bwd_order=jnp.asarray(rt.bwd_order),
        bwd_first=jnp.asarray(rt.bwd_first),
    )
    meta = RoutedMeta(rt.NC, rt.SR, rt.KD, rt.G, rt.HI, rt.T, rt.H,
                      rt.n_rays, rt.volume_size)
    return dt, meta


# ---------------------------------------------------------------------------
# pure-jnp reference (CPU fallback + oracle)
# ---------------------------------------------------------------------------

def _fetch_ref(d2, dt, meta):
    """Per-chunk fetched density values F (NC, SR, L)."""
    NC, SR = meta.NC, meta.SR
    # windows: (NC, SR, L) — rows sg·SR .. sg·SR+SR of d2
    row0 = dt.sg[:, None] * SR + jnp.arange(SR)[None, :]
    win = jnp.take(d2, row0.reshape(-1), axis=0).reshape(NC, SR, LANES)
    lvw = dt.lvw.reshape(NC, SR, LANES).astype(jnp.int32)
    return jnp.take_along_axis(win, lvw, axis=2)


def routed_project_ref(d2, dt: DeviceTables, meta: RoutedMeta):
    """Forward projection from routed tables (reference impl).

    Args:
        d2: (H, 128) lane-major density.
    Returns:
        y: (T, HI, 128) per-tile ray sums (flatten+trim to (R,) upstream).
    """
    NC, SR, KD, HI, T = meta.NC, meta.SR, meta.KD, meta.HI, meta.T
    F = _fetch_ref(d2, dt, meta)                  # (NC, SR, L)
    y = jnp.zeros((T, HI, LANES), d2.dtype)
    for k in range(KD):
        src = dt.src[k].reshape(NC, SR, LANES).astype(jnp.int32)
        Rk = jnp.take_along_axis(F, src, axis=2)  # (NC, SR, L)
        wk = dt.w[k].reshape(NC, SR, LANES)
        hik = dt.hi[k].reshape(NC, SR, LANES)
        contrib = Rk * wk                         # dead slots: w=0
        for h in range(HI):
            part = jnp.where(hik == h, contrib, 0.0).sum(axis=1)  # (NC, L)
            y = y.at[dt.tile, h].add(part)
    return y


def routed_backproject_ref(dy, dt: DeviceTables, meta: RoutedMeta):
    """Transpose: dD2 (H, 128) from dy (T, HI, 128) (reference impl)."""
    NC, SR, KD, HI, H = meta.NC, meta.SR, meta.KD, meta.HI, meta.H
    dyc = dy[dt.tile]                              # (NC, HI, L)
    # g at reduce slots, per pass
    gw = []
    for k in range(KD):
        hik = dt.hi[k].reshape(NC, SR, LANES).astype(jnp.int32)
        # select this pass's g by output bucket
        gsel = jnp.zeros((NC, SR, LANES), dy.dtype)
        for h in range(HI):
            gsel = jnp.where(hik == h, dyc[:, h, :][:, None, :], gsel)
        gw.append(gsel * dt.w[k].reshape(NC, SR, LANES))
    # route back to fetch columns
    invl = dt.invl.reshape(NC, SR, LANES).astype(jnp.int32)
    invp = dt.invp.reshape(NC, SR, LANES).astype(jnp.int32)
    gF = jnp.zeros((NC, SR, LANES), dy.dtype)
    for k in range(KD):
        cand = jnp.take_along_axis(gw[k], invl, axis=2)
        gF = jnp.where(invp == k, cand, gF)
    gF = gF * dt.colvalid.reshape(NC, SR, LANES)
    # segment-sum runs of equal voxel lane (columns are lv-sorted)
    lvw = dt.lvw.reshape(NC, SR, LANES).astype(jnp.int32)
    scan = _segscan_lanes_ref(gF, lvw)
    put = dt.put.reshape(NC, SR, LANES).astype(jnp.int32)
    placed = jnp.take_along_axis(scan, put, axis=2)
    placed = placed * dt.putvalid.reshape(NC, SR, LANES)
    # accumulate windows into dD2
    row0 = (dt.sg[:, None] * SR + jnp.arange(SR)[None, :]).reshape(-1)
    dD2 = jnp.zeros((H, LANES), dy.dtype)
    dD2 = dD2.at[row0].add(placed.reshape(NC * SR, LANES))
    return dD2


def _segscan_lanes_ref(x, key):
    """Inclusive segmented sum along the lane axis (runs of equal key)."""
    L = x.shape[-1]
    s = 1
    while s < L:
        xs = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(s, 0)])[..., :-s]
        ks = jnp.pad(key, [(0, 0)] * (key.ndim - 1) + [(s, 0)],
                     constant_values=-1)[..., :-s]
        x = x + jnp.where(ks == key, xs, 0.0)
        s *= 2
    return x


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

def _fwd_pallas(d2, dt: DeviceTables, meta: RoutedMeta, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NC, SR, KD, HI, T = meta.NC, meta.SR, meta.KD, meta.HI, meta.T
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # sg, tile, first
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((SR, LANES), lambda b, sg, t, f: (b, 0)),
            pl.BlockSpec((KD, SR, LANES), lambda b, sg, t, f: (0, b, 0)),
            pl.BlockSpec((KD, SR, LANES), lambda b, sg, t, f: (0, b, 0)),
            pl.BlockSpec((KD, SR, LANES), lambda b, sg, t, f: (0, b, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # d2 resident
        ],
        out_specs=pl.BlockSpec((1, HI, LANES), lambda b, sg, t, f: (t[b], 0, 0)),
    )
    kernel = _make_fwd_body(meta)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, HI, LANES), d2.dtype),
        interpret=interpret,
    )(dt.sg, dt.tile, dt.fwd_first, dt.lvw, dt.src, dt.hi, dt.w, d2)


def _make_fwd_body(meta: RoutedMeta):
    from jax.experimental import pallas as pl

    SR, KD, HI = meta.SR, meta.KD, meta.HI

    def kernel(sg_ref, tile_ref, first_ref, lvw_ref, src_ref, hi_ref,
               w_ref, d2_ref, y_ref):
        b = pl.program_id(0)

        @pl.when(first_ref[b] == 1)
        def _init():
            y_ref[:] = jnp.zeros_like(y_ref)

        sg = sg_ref[b]
        W = d2_ref[pl.ds(sg * SR, SR), :]
        F = jnp.take_along_axis(W, lvw_ref[:].astype(jnp.int32), axis=1)
        for k in range(KD):
            Rk = jnp.take_along_axis(F, src_ref[k].astype(jnp.int32), axis=1)
            contrib = Rk * w_ref[k]
            hik = hi_ref[k]
            for h in range(HI):
                y_ref[0, h, :] += jnp.sum(
                    jnp.where(hik == h, contrib, 0.0), axis=0)

    return kernel


def _bwd_pallas(dy, dt: DeviceTables, meta: RoutedMeta, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NC, SR, KD, HI, H = meta.NC, meta.SR, meta.KD, meta.HI, meta.H

    def kernel(order_ref, sg_ref, first_ref, tile_ref, lvw_ref, invl_ref,
               invp_ref, put_ref, putv_ref, colv_ref, hi_ref, w_ref,
               dy_ref, out_ref):
        b = pl.program_id(0)

        @pl.when(first_ref[b] == 1)
        def _init():
            out_ref[:] = jnp.zeros_like(out_ref)

        invl = invl_ref[:].astype(jnp.int32)
        invp = invp_ref[:].astype(jnp.int32)
        gF = jnp.zeros((SR, LANES), out_ref.dtype)
        for k in range(KD):
            hik = hi_ref[k]
            gsel = jnp.zeros((SR, LANES), out_ref.dtype)
            for h in range(HI):
                gsel = jnp.where(hik == h, dy_ref[0, h, :][None, :], gsel)
            gwk = gsel * w_ref[k]
            cand = jnp.take_along_axis(gwk, invl, axis=1)
            gF = jnp.where(invp == k, cand, gF)
        gF = gF * colv_ref[:].astype(out_ref.dtype)

        key = lvw_ref[:].astype(jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (SR, LANES), 1)
        acc = gF
        s = 1
        while s < LANES:
            acc_s = pltpu.roll(acc, s, 1)
            key_s = pltpu.roll(key, s, 1)
            ok = (lane >= s) & (key_s == key)
            acc = acc + jnp.where(ok, acc_s, 0.0)
            s *= 2
        placed = jnp.take_along_axis(acc, put_ref[:].astype(jnp.int32),
                                     axis=1)
        placed = placed * putv_ref[:].astype(out_ref.dtype)
        out_ref[:] += placed

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # order, sg(ordered), first(ordered), tile(ordered)
        grid=(NC,),
        in_specs=[
            pl.BlockSpec((SR, LANES), lambda b, o, sg, f, t: (o[b], 0)),
            pl.BlockSpec((SR, LANES), lambda b, o, sg, f, t: (o[b], 0)),
            pl.BlockSpec((SR, LANES), lambda b, o, sg, f, t: (o[b], 0)),
            pl.BlockSpec((SR, LANES), lambda b, o, sg, f, t: (o[b], 0)),
            pl.BlockSpec((SR, LANES), lambda b, o, sg, f, t: (o[b], 0)),
            pl.BlockSpec((SR, LANES), lambda b, o, sg, f, t: (o[b], 0)),
            pl.BlockSpec((KD, SR, LANES), lambda b, o, sg, f, t: (0, o[b], 0)),
            pl.BlockSpec((KD, SR, LANES), lambda b, o, sg, f, t: (0, o[b], 0)),
            pl.BlockSpec((1, HI, LANES), lambda b, o, sg, f, t: (t[b], 0, 0)),
        ],
        out_specs=pl.BlockSpec((meta.SR, LANES),
                               lambda b, o, sg, f, t: (sg[b], 0)),
    )
    # ordered scalar arrays
    sg_o = dt.sg[dt.bwd_order]
    tile_o = dt.tile[dt.bwd_order]
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, LANES), dy.dtype),
        interpret=interpret,
    )(dt.bwd_order, sg_o, dt.bwd_first, tile_o,
      dt.lvw, dt.invl, dt.invp, dt.put, dt.putvalid, dt.colvalid,
      dt.hi, dt.w, dy)
    return out


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
