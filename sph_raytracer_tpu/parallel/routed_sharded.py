"""Multi-device lane-routed projection: per-device table shards.

Rays are embarrassingly parallel, and routed tables are tiled by ray
blocks, so the multi-chip extension is a clean data split: device d holds
the chunks of its tile range, the density is replicated, and the backward
psums each device's density-gradient window accumulation (SURVEY N2/N3).
Tables are stacked on a leading device axis and sharded over the mesh;
``shard_map`` runs the single-device kernels (or the jnp reference
implementation off-TPU) on each shard.

Used by :class:`~sph_raytracer_tpu.parallel.sharded.ShardedOperator` when
``mode='routed'``/'auto' on TPU backends; validated on the fake-device CPU
mesh with the reference implementation.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.route import LANES, RoutedTables, pad_chunks
from ..ops.routed_project import (
    DeviceTables,
    RoutedMeta,
    _bwd_pallas,
    _fwd_pallas,
    routed_backproject_ref,
    routed_project_ref,
)
from .mesh import RAY_AXIS

__all__ = ["shard_routed_tables", "sharded_routed_project"]


def shard_routed_tables(rt: RoutedTables, n_devices: int):
    """Split routed tables into per-device shards by tile range.

    Tiles are contiguous ray blocks and chunks are tile-major, so device d
    takes the chunks of tiles [d·T/D, (d+1)·T/D); every shard is padded to
    a common chunk count and tile count.

    Returns (stacked numpy table dict (D, ...), per-shard RoutedMeta).
    """
    D = n_devices
    Tp = -(-rt.T // D) * D  # tiles padded to a device multiple
    tiles_per = Tp // D

    # split chunk ranges by tile
    bounds = np.searchsorted(rt.tile, np.arange(D + 1) * tiles_per)
    shards = []
    for d in range(D):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        sl = slice(lo * rt.SR, hi * rt.SR)
        shard = dataclasses.replace(
            rt,
            lvw=rt.lvw[sl], w=rt.w[sl], hi8=rt.hi8[sl], lp8=rt.lp8[sl],
            perm=rt.perm[sl], put=rt.put[sl], putv=rt.putv[sl],
            kcol=rt.kcol[sl], rposf=rt.rposf[sl], rposb=rt.rposb[sl],
            wp=rt.wp[sl], lp8p=rt.lp8p[sl], kcolp=rt.kcolp[sl],
            src=rt.src[:, sl], hik=rt.hik[:, sl],
            sg=rt.sg[lo:hi], tile=rt.tile[lo:hi] - d * tiles_per,
            kmax=rt.kmax[lo:hi], sdf=rt.sdf[lo:hi], sdb=rt.sdb[lo:hi],
            tiles_covered=_pad_to(
                rt.tiles_covered[d * tiles_per:(d + 1) * tiles_per],
                tiles_per),
            wins_covered=rt.wins_covered,
            fwd_first=_first_of(rt.tile[lo:hi]),
            bwd_order=np.zeros(max(hi - lo, 1), np.int32),
            bwd_first=np.zeros(max(hi - lo, 1), np.int32),
            NC=hi - lo, T=tiles_per,
        )
        if shard.NC == 0:
            shard = dataclasses.replace(
                shard,
                lvw=np.zeros((rt.SR, LANES), np.int8),
                w=np.zeros((rt.SR, LANES), np.float32),
                hi8=np.zeros((rt.SR, LANES), np.int8),
                lp8=np.zeros((rt.SR, LANES), np.int8),
                perm=np.broadcast_to(np.arange(LANES, dtype=np.int8),
                                     (rt.SR, LANES)).copy(),
                put=np.zeros((rt.SR, LANES), np.int8),
                putv=np.zeros((rt.SR, LANES), np.int8),
                kcol=np.zeros((rt.SR, LANES), np.int8),
                rposf=np.zeros((rt.SR, LANES), np.int8),
                rposb=np.zeros((rt.SR, LANES), np.int8),
                wp=np.zeros((rt.SR, LANES), np.float32),
                lp8p=np.zeros((rt.SR, LANES), np.int8),
                kcolp=np.zeros((rt.SR, LANES), np.int8),
                src=np.zeros((rt.KD, rt.SR, LANES), np.int8),
                hik=np.full((rt.KD, rt.SR, LANES), -1, np.int8),
                sg=np.zeros(1, np.int32), tile=np.zeros(1, np.int32),
                kmax=np.zeros(1, np.int32),
                sdf=np.zeros(1, np.int32), sdb=np.zeros(1, np.int32),
                tiles_covered=np.zeros(tiles_per, np.int8),
                wins_covered=np.zeros_like(rt.wins_covered),
                fwd_first=np.ones(1, np.int32), NC=1,
            )
        shards.append(shard)

    NCp = max(s.NC for s in shards)
    NCp = -(-NCp // 256) * 256
    shards = [pad_chunks(s, NCp) if s.NC != NCp else s for s in shards]
    for i, s in enumerate(shards):
        # rebuild bwd ordering per shard
        bwd_order = np.lexsort((s.tile, s.sg)).astype(np.int32)
        sg_sorted = s.sg[bwd_order]
        bwd_first = np.r_[
            1, (sg_sorted[1:] != sg_sorted[:-1]).astype(np.int32)]
        shards[i] = dataclasses.replace(
            s, bwd_order=bwd_order, bwd_first=bwd_first.astype(np.int32))

    fields = ("lvw", "w", "hi8", "lp8", "perm", "put", "putv", "kcol",
              "rposf", "rposb", "wp", "lp8p", "kcolp", "src", "hik", "sg",
              "tile", "kmax", "sdf", "sdb", "fwd_first", "bwd_order",
              "bwd_first", "tiles_covered", "wins_covered")
    stacked = {k: np.stack([getattr(s, k) for s in shards]) for k in fields}
    meta = RoutedMeta(NCp, rt.SR, rt.KD, rt.G, rt.HI, tiles_per, rt.H,
                      rt.n_rays, rt.volume_size, rt.scan_fwd, rt.scan_bwd)
    return stacked, meta


def _pad_to(a, n):
    if a.shape[0] >= n:
        return a[:n]
    return np.concatenate([a, np.zeros(n - a.shape[0], a.dtype)])


def _first_of(tiles):
    tiles = np.asarray(tiles)
    if tiles.size == 0:
        return np.ones(1, np.int32)
    return np.r_[1, (tiles[1:] != tiles[:-1]).astype(np.int32)]


def put_sharded_tables(stacked: dict, mesh: Mesh, axis: str = RAY_AXIS):
    """Device-put the stacked tables sharded on the leading device axis."""
    out = {}
    for k, v in stacked.items():
        spec = P(axis, *([None] * (v.ndim - 1)))
        out[k] = jax.device_put(v, NamedSharding(mesh, spec))
    return out


@partial(jax.jit, static_argnames=("mesh", "meta", "use_pallas", "axis"))
def sharded_routed_backproject(mesh, tables: dict, meta: RoutedMeta, dy,
                               use_pallas: bool, axis: str = RAY_AXIS):
    """Adjoint over the mesh: per-device backward kernel + psum."""
    def local(dy, *leaves):
        dt = _tables_of(leaves)
        if use_pallas:
            dD2 = _bwd_pallas(dy, dt, meta)
        else:
            dD2 = routed_backproject_ref(dy, dt, meta)
        return jax.lax.psum(dD2, axis)

    keys = sorted(tables)
    return jax.shard_map(
        lambda dy, *ls: local(dy, *[l[0] for l in ls]),
        mesh=mesh,
        in_specs=(P(axis),) + tuple(
            P(axis, *([None] * (tables[k].ndim - 1))) for k in keys),
        out_specs=P(),
    )(dy, *[tables[k] for k in keys])


@partial(jax.jit, static_argnames=("mesh", "meta", "use_pallas", "axis"))
def sharded_routed_project(mesh, tables: dict, meta: RoutedMeta, d2,
                           use_pallas: bool, axis: str = RAY_AXIS):
    """Forward projection over the mesh: rays (tiles) sharded, d2
    replicated.  Differentiable; the backward psums density gradients."""

    @jax.custom_vjp
    def project(d2, tables):
        return _fwd_local(d2, tables)

    def _fwd_local(d2, tables):
        def local(d2, *leaves):
            dt = _tables_of(leaves)
            if use_pallas:
                return _fwd_pallas(d2, dt, meta)
            return routed_project_ref(d2, dt, meta)

        keys = sorted(tables)
        return jax.shard_map(
            lambda d2, *ls: local(d2, *[l[0] for l in ls]),
            mesh=mesh,
            in_specs=(P(),) + tuple(
                P(axis, *([None] * (tables[k].ndim - 1))) for k in keys),
            out_specs=P(axis),
        )(d2, *[tables[k] for k in keys])

    def fwd(d2, tables):
        return _fwd_local(d2, tables), tables

    def bwd(tables, dy):
        def local(dy, *leaves):
            dt = _tables_of(leaves)
            if use_pallas:
                dD2 = _bwd_pallas(dy, dt, meta)
            else:
                dD2 = routed_backproject_ref(dy, dt, meta)
            return jax.lax.psum(dD2, RAY_AXIS)

        keys = sorted(tables)
        # dy is (D·T_local, HI, L) sharded on tiles → local (T_local, HI, L);
        # table leaves carry an explicit device-stack dim → local [0]
        dD2 = jax.shard_map(
            lambda dy, *ls: local(dy, *[l[0] for l in ls]),
            mesh=mesh,
            in_specs=(P(axis),) + tuple(
                P(axis, *([None] * (tables[k].ndim - 1))) for k in keys),
            out_specs=P(),
        )(dy, *[tables[k] for k in keys])
        return dD2, None

    project.defvjp(fwd, bwd)
    return project(d2, tables)


def _tables_of(leaves):
    keys = ["bwd_first", "bwd_order", "fwd_first", "hi8", "hik", "kcol",
            "kcolp", "kmax", "lp8", "lp8p", "lvw", "perm", "put", "putv",
            "rposb", "rposf", "sdb", "sdf", "sg", "src", "tile",
            "tiles_covered", "w", "wins_covered", "wp"]
    d = dict(zip(keys, leaves))
    return DeviceTables(**d)
