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

from ..ops.route import LANES, RoutedTables, _covered, pad_chunks
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
            # PER-SHARD window coverage: the Pallas backward only
            # initializes output blocks its own chunks visit — a global
            # mask would pass uninitialized VMEM for windows other
            # shards cover, and the psum would spread the garbage
            wins_covered=_covered(rt.sg[lo:hi],
                                  rt.wins_covered.shape[0]),
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
        check_vma=False,  # pallas_call has no vma annotations
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
            check_vma=False,  # pallas_call has no vma annotations
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
            return jax.lax.psum(dD2, axis)

        keys = sorted(tables)
        # dy is (D·T_local, HI, L) sharded on tiles → local (T_local, HI, L);
        # table leaves carry an explicit device-stack dim → local [0]
        dD2 = jax.shard_map(
            lambda dy, *ls: local(dy, *[l[0] for l in ls]),
            mesh=mesh,
            in_specs=(P(axis),) + tuple(
                P(axis, *([None] * (tables[k].ndim - 1))) for k in keys),
            out_specs=P(),
            check_vma=False,  # pallas_call has no vma annotations
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


# ---------------------------------------------------------------------------
# band-compacted sharding (the default TPU engine, ops/route.band_pack):
# device d owns the bands of its tile range; fwd groups them by tile, bwd
# by density window, exactly as single-chip — plus a psum in the backward
# ---------------------------------------------------------------------------

def _slice_rt8(rt, lo, hi, tiles_per, d):
    """Chunk-range slice of SR=8 tables for device d (tiles renumbered to
    the shard-local range)."""
    sl = slice(lo * rt.SR, hi * rt.SR)
    tile_l = rt.tile[lo:hi] - d * tiles_per
    sg_l = rt.sg[lo:hi]
    bwd_order = np.lexsort((tile_l, sg_l)).astype(np.int32)
    sgs = sg_l[bwd_order] if len(bwd_order) else sg_l
    return dataclasses.replace(
        rt,
        lvw=rt.lvw[sl], w=rt.w[sl], hi8=rt.hi8[sl], lp8=rt.lp8[sl],
        perm=rt.perm[sl], put=rt.put[sl], putv=rt.putv[sl],
        kcol=rt.kcol[sl], rposf=rt.rposf[sl], rposb=rt.rposb[sl],
        wp=rt.wp[sl], lp8p=rt.lp8p[sl], kcolp=rt.kcolp[sl],
        src=rt.src[:, sl], hik=rt.hik[:, sl],
        sg=sg_l, tile=tile_l,
        kmax=rt.kmax[lo:hi], sdf=rt.sdf[lo:hi], sdb=rt.sdb[lo:hi],
        tiles_covered=_pad_to(
            rt.tiles_covered[d * tiles_per:(d + 1) * tiles_per], tiles_per),
        wins_covered=rt.wins_covered,
        fwd_first=_first_of(tile_l),
        bwd_order=bwd_order,
        bwd_first=(np.r_[1, (sgs[1:] != sgs[:-1]).astype(np.int32)]
                   if len(sgs) else np.ones(1, np.int32)),
        NC=hi - lo, T=tiles_per,
    )


def _pad_banded(bt, NCBp):
    """Pad a BandedTables to NCBp superchunks (zero tables, first=0)."""
    e = NCBp - bt.NCB
    if e <= 0:
        return bt
    SRB = bt.SRb * bt.B

    def padrows(a):
        pad = np.zeros((e * SRB,) + a.shape[1:], a.dtype)
        return np.concatenate([a, pad], axis=0)

    def padk(a, fill):
        pad = np.full((a.shape[0], e * SRB) + a.shape[2:], fill, a.dtype)
        return np.concatenate([a, pad], axis=1)

    def padc(a, fill=0):
        return np.concatenate([a, np.full((e,) + a.shape[1:], fill, a.dtype)])

    last_key = int(bt.keyp[bt.NCB - 1]) if bt.NCB else 0
    return dataclasses.replace(
        bt,
        lvw=padrows(bt.lvw), w=padrows(bt.w), rposf=padrows(bt.rposf),
        src=padk(bt.src, 0), hik=padk(bt.hik, -1),
        wp=padrows(bt.wp), lp8p=padrows(bt.lp8p), kcolp=padrows(bt.kcolp),
        rposb=padrows(bt.rposb), put=padrows(bt.put), putv=padrows(bt.putv),
        keyp=padc(bt.keyp, last_key), bp=np.concatenate(
            [bt.bp, np.zeros((bt.B, e), bt.bp.dtype)], axis=1),
        kmax=padc(bt.kmax), sdf=padc(bt.sdf), sdb=padc(bt.sdb),
        first=padc(bt.first), NCB=NCBp,
    )


FWD_BANDED_FIELDS = ("lvw", "w", "rposf", "src", "hik", "bp", "keyp",
                     "kmax", "sdf", "first", "covered")
BWD_BANDED_FIELDS = ("rposb", "wp", "lp8p", "kcolp", "hik", "put", "putv",
                     "bp", "keyp", "kmax", "sdb", "first", "covered")


def stack_banded_shards(fts, bts, tiles_per: int, n_rays: int,
                        chunk_multiple: int = 256, ncf=None, ncb=None,
                        scan_fwd=None, scan_bwd=None):
    """Pad per-device banded shards to common superchunk counts and stack
    them on a leading device axis.

    ``ncf/ncb/scan_fwd/scan_bwd`` are externally-agreed global values
    (multi-host builds allgather-max them across processes so every host
    pads to the same shapes); default = maxima over the given shards.

    Returns (fwd stacked dict, bwd stacked dict, meta_fwd, meta_bwd).
    """
    s0 = fts[0]
    NCf = _round_up_mult(max(ft.NCB for ft in fts) if ncf is None else ncf,
                         chunk_multiple)
    NCb = _round_up_mult(max(bt.NCB for bt in bts) if ncb is None else ncb,
                         chunk_multiple)
    sf = max(t.scan_fwd for t in fts) if scan_fwd is None else scan_fwd
    sb = max(t.scan_bwd for t in bts) if scan_bwd is None else scan_bwd
    fts = [_pad_banded(ft, NCf) for ft in fts]
    bts = [_pad_banded(bt, NCb) for bt in bts]
    fstk = {k: np.stack([getattr(t, k) for t in fts])
            for k in FWD_BANDED_FIELDS}
    bstk = {k: np.stack([getattr(t, k) for t in bts])
            for k in BWD_BANDED_FIELDS}
    b0 = bts[0]  # the two sides' B differ under dense-slot layouts
    mf = RoutedMeta(NCf, s0.SRb * s0.B, s0.KD, s0.G, s0.HI, tiles_per,
                    s0.H, n_rays, s0.volume_size, sf, sb)
    mb = RoutedMeta(NCb, b0.SRb * b0.B, b0.KD, b0.G, b0.HI, tiles_per,
                    b0.H, n_rays, b0.volume_size, sf, sb)
    return fstk, bstk, mf, mb


def shard_banded_tables(rt8, n_devices: int, B: int = 8,
                        chunk_multiple: int = 256,
                        dense_fwd: bool = False, dense_bwd: bool = False):
    """Split routed tables by tile range and band-pack each shard.

    ``dense_fwd``/``dense_bwd`` select the dense-slot layouts per side
    (route.band_pack_dense) — every shard shares the same implied B
    (H//SRb resp. tiles_per), so stacking stays uniform.

    Returns (fwd stacked dict, bwd stacked dict, meta_fwd, meta_bwd) with
    all shards padded to common superchunk counts.
    """
    from ..ops.route import band_pack, band_pack_dense

    D = n_devices
    Tp = -(-rt8.T // D) * D
    tiles_per = Tp // D
    bounds = np.searchsorted(rt8.tile, np.arange(D + 1) * tiles_per)
    fts, bts = [], []
    for d in range(D):
        sub = _slice_rt8(rt8, int(bounds[d]), int(bounds[d + 1]),
                         tiles_per, d)
        fts.append(band_pack_dense(sub, by="tile", chunk_multiple=1)
                   if dense_fwd else
                   band_pack(sub, B=B, by="tile", chunk_multiple=1))
        bts.append(band_pack_dense(sub, by="window", chunk_multiple=1)
                   if dense_bwd else
                   band_pack(sub, B=B, by="window", chunk_multiple=1))
    return stack_banded_shards(
        fts, bts, tiles_per, rt8.n_rays, chunk_multiple,
        scan_fwd=rt8.scan_fwd, scan_bwd=rt8.scan_bwd)


def banded_shard_local(lin_h, lens_h, volume_size: int, tiles_per: int,
                       G: int, SR: int, KD: int, B: int,
                       dense_fwd: bool = False, dense_bwd: bool = False):
    """Route + band-pack ONE device's tile-aligned ray range independently
    of every other shard.

    This is the multi-host table build (SURVEY §7 "multi-host input
    pipeline"): each host traces and routes only the rays of its
    addressable devices, so host memory stays O(local shard) instead of
    O(full problem) — the full scaled config #5 needs ~70 GB of tables,
    more than one host holds.  Correctness: tiles are contiguous G-ray
    blocks (``tile = ray // G``, ops/route.py) and slot/chunk formation
    is local to a (tile, density-window) group, so a tile-aligned range
    routes bit-identically in isolation to its slice of the global
    routing (tested against :func:`shard_banded_tables`).

    Args:
        lin_h / lens_h: (R_local, M) packed crossing tables for the rays
            ``[d·tiles_per·G, min((d+1)·tiles_per·G, n))`` of device d.
        tiles_per: global tiles-per-device (the last shard may trace
            fewer rays; its tile space is padded up to this).

    Returns (fwd BandedTables, bwd BandedTables), unpadded (stack with
    :func:`stack_banded_shards`).
    """
    import dataclasses as _dc

    from ..ops.route import band_pack, band_pack_dense, build_routed_tables

    rt = build_routed_tables(lin_h, lens_h, volume_size, G=G, SR=SR, KD=KD)
    if rt.T < tiles_per:
        rt = _dc.replace(rt, T=tiles_per,
                         tiles_covered=_pad_to(rt.tiles_covered, tiles_per))
    ft = (band_pack_dense(rt, by="tile", chunk_multiple=1) if dense_fwd
          else band_pack(rt, B=B, by="tile", chunk_multiple=1))
    bt = (band_pack_dense(rt, by="window", chunk_multiple=1) if dense_bwd
          else band_pack(rt, B=B, by="window", chunk_multiple=1))
    return ft, bt


def build_banded_device_shards(lin, lens, volume_size: int,
                               n_devices: int, G: int, SR: int = 8,
                               KD: int = 3, B: int = 32,
                               chunk_multiple: int = 256,
                               npad_multiple: int = 1 << 20,
                               tiles_per: int = None, n_rays: int = None,
                               dense_fwd: bool = False,
                               dense_bwd: bool = False):
    """Per-device banded tables built ON THE DEVICE holding the trace.

    The sharded analog of :func:`~..ops.route_device.build_banded_device`
    (which covers single-device Operators): slice the traced crossing
    tables by tile-aligned ray ranges, run the device-routing core per
    shard, pad every shard to common superchunk counts, and stack on a
    leading device axis — the same stacked dicts / metas
    :func:`shard_banded_tables` produces from the host router, with no
    host routing pass and no table upload.  Given ``npad_multiple=1`` the
    result is byte-identical to the host path (routing is local to a
    (tile, density-window) group — see :func:`banded_shard_local`).

    Args:
        lin / lens: (R, M) traced crossing tables (device arrays).
        tiles_per / n_rays: externally-agreed tile range per device and
            global ray count (multi-host callers pass the global values;
            default = derived from ``lin`` over ``n_devices``).

    Returns (fwd stacked dict, bwd stacked dict, meta_fwd, meta_bwd,
    :class:`~..ops.route_device.DevicePadHelper`) — table values are
    device arrays on the build device; place them with
    :func:`put_sharded_tables` / :func:`put_sharded_tables_multihost`.
    """
    from ..ops.route_device import DevicePadHelper, _banded_device_core

    R = lin.shape[0] if n_rays is None else n_rays
    D = n_devices
    if tiles_per is None:
        T = -(-R // G)
        tiles_per = -(-T // D)
    rays_per = tiles_per * G

    from ..ops.route_device import _empty_core

    H_rows = _round_up_mult(max(1, -(-volume_size // 128)), SR)
    Bf = H_rows // SR if dense_fwd else B
    Bb = tiles_per if dense_bwd else B
    cores = []
    for d in range(D):
        lo = min(d * rays_per, lin.shape[0])
        hi = min((d + 1) * rays_per, lin.shape[0])
        if hi <= lo:  # past the last real ray: all-dummy shard
            cores.append(_empty_core(
                SR, KD, G, G // 128, tiles_per, H_rows, 0, volume_size,
                Bf, Bb, 1))
            continue
        cores.append(_banded_device_core(
            lin[lo:hi], lens[lo:hi], volume_size, G=G, SR=SR, KD=KD, B=B,
            chunk_multiple=1, npad_multiple=npad_multiple, T=tiles_per,
            dense_fwd=dense_fwd, dense_bwd=dense_bwd))

    return stack_device_cores(cores, chunk_multiple, SR, KD, G,
                              tiles_per, R, volume_size)


def stack_device_cores(cores, chunk_multiple, SR, KD, G, tiles_per, R,
                       volume_size, ncf=None, ncb=None, scan_fwd=None,
                       scan_bwd=None):
    """Pad per-shard device-core outputs to common superchunk counts and
    stack on a leading device axis (the tail of
    :func:`build_banded_device_shards`, reusable by multi-host callers
    that allgather the counts first).

    Args:
        ncf / ncb / scan_fwd / scan_bwd: externally-agreed maxima (raw,
            un-rounded); default = the local maxima.  Multi-host callers
            pass the process-allgathered values so every host pads its
            shards to identical shapes.
    """
    from ..ops.route_device import DevicePadHelper

    NCf = _round_up_mult(ncf if ncf is not None
                         else max(c["NCBf"] for c in cores), chunk_multiple)
    NCb = _round_up_mult(ncb if ncb is not None
                         else max(c["NCBb"] for c in cores), chunk_multiple)
    sf = (scan_fwd if scan_fwd is not None
          else max(c["scan_fwd"] for c in cores))
    sb = (scan_bwd if scan_bwd is not None
          else max(c["scan_bwd"] for c in cores))
    Bf = cores[0]["Bf"]
    Bb = cores[0]["Bb"]
    H, HI = cores[0]["H"], cores[0]["HI"]

    def pad_rows(a, n_rows, fill=0):
        e = n_rows - a.shape[-2]
        if e <= 0:
            return a
        pad_shape = a.shape[:-2] + (e, a.shape[-1])
        return jnp.concatenate(
            [a, jnp.full(pad_shape, fill, a.dtype)], axis=-2)

    def pad_sc(sc, NCB, sd_key):
        """Per-superchunk scalars padded like route._pad_banded: keyp
        carries the last key forward, everything else zero-fills."""
        e = NCB - len(sc["keyp"])
        if e <= 0:
            return {k: np.asarray(v) for k, v in sc.items()}
        out = {}
        out["bp"] = np.concatenate(
            [sc["bp"], np.zeros((sc["bp"].shape[0], e), sc["bp"].dtype)],
            axis=1)
        last_key = sc["keyp"][-1] if len(sc["keyp"]) else 0
        out["keyp"] = np.concatenate(
            [sc["keyp"], np.full(e, last_key, sc["keyp"].dtype)])
        for k in ("kmax", sd_key, "first"):
            out[k] = np.concatenate(
                [sc[k], np.zeros(e, sc[k].dtype)])
        return out

    fstk, bstk = {}, {}
    for key in ("lvw", "w", "rposf", "src", "hik"):
        fill = -1 if key == "hik" else 0
        fstk[key] = jnp.stack(
            [pad_rows(c["ftbl"][key], NCf * Bf * SR, fill) for c in cores])
    for key in ("rposb", "wp", "lp8p", "kcolp", "put", "putv", "hik"):
        fill = -1 if key == "hik" else 0
        bstk[key] = jnp.stack(
            [pad_rows(c["btbl"][key], NCb * Bb * SR, fill) for c in cores])
    fscs = [pad_sc(c["fsc"], NCf, "sdf") for c in cores]
    bscs = [pad_sc(c["bsc"], NCb, "sdb") for c in cores]
    for key in ("bp", "keyp", "kmax", "sdf", "first"):
        fstk[key] = jnp.asarray(np.stack([s[key] for s in fscs]))
    for key in ("bp", "keyp", "kmax", "sdb", "first"):
        bstk[key] = jnp.asarray(np.stack([s[key] for s in bscs]))
    fstk["covered"] = jnp.asarray(np.stack([c["cov_f"] for c in cores]))
    bstk["covered"] = jnp.asarray(np.stack([c["cov_b"] for c in cores]))

    mf = RoutedMeta(NCf, SR * Bf, KD, G, HI, tiles_per, H, R,
                    volume_size, sf, sb)
    mb = RoutedMeta(NCb, SR * Bb, KD, G, HI, tiles_per, H, R,
                    volume_size, sf, sb)
    return fstk, bstk, mf, mb, DevicePadHelper(H, volume_size)


def put_sharded_tables_multihost(local_fstk: dict, mesh: Mesh,
                                 axis: str = RAY_AXIS):
    """Place per-process table stacks as globally-sharded arrays.

    ``local_fstk`` holds each field stacked over THIS process's
    addressable devices only (in mesh order); the result is the same
    globally-sharded dict :func:`put_sharded_tables` produces, but no
    host ever materializes another host's shards
    (``jax.make_array_from_single_device_arrays``).
    """
    devs = mesh.devices.reshape(-1)
    pid = jax.process_index()
    local = [d for d in devs if d.process_index == pid]
    D = devs.size
    out = {}
    for k, v in local_fstk.items():
        assert v.shape[0] == len(local), (k, v.shape, len(local))
        spec = P(axis, *([None] * (v.ndim - 1)))
        sh = NamedSharding(mesh, spec)
        shards = [jax.device_put(v[i:i + 1], d) for i, d in enumerate(local)]
        out[k] = jax.make_array_from_single_device_arrays(
            (D,) + v.shape[1:], sh, shards)
    return out


def _round_up_mult(x, m):
    return -(-max(x, 1) // m) * m


def _ft_of(leaves, keys):
    from ..ops.routed_project import BandedDeviceFwd

    d = dict(zip(keys, leaves))
    p2 = ((d.pop("first") | (d.pop("kmax") << 4) | (d.pop("sdf") << 8)
           | (d.pop("keyp") << 16)).astype(jnp.int32))
    return BandedDeviceFwd(p2=p2, **d)


def _btd_of(leaves, keys):
    from ..ops.routed_project import BandedDeviceBwd

    d = dict(zip(keys, leaves))
    p2 = ((d.pop("first") | (d.pop("kmax") << 4) | (d.pop("sdb") << 8)
           | (d.pop("keyp") << 16)).astype(jnp.int32))
    return BandedDeviceBwd(p2=p2, **d)


@partial(jax.jit, static_argnames=("mesh", "meta", "metab", "B",
                                   "interpret", "axis", "dense_fwd",
                                   "dense_bwd", "srb"))
def sharded_banded_project(mesh, ftables: dict, btables: dict,
                           meta: RoutedMeta, metab: RoutedMeta, B: int, d2,
                           interpret: bool = False, axis: str = RAY_AXIS,
                           dense_fwd: bool = False,
                           dense_bwd: bool = False, srb: int = 8):
    """Band-compacted forward over the mesh (differentiable; the backward
    runs the banded transpose kernel per shard and psums).
    ``dense_fwd``/``dense_bwd`` select the dense-slot kernels (tables
    from the dense shard builds); ``B`` is the classic side's band count
    and ``srb`` the band height."""
    from ..ops.routed_project import (
        _bwd_banded_dense_pallas,
        _bwd_banded_pallas,
        _fwd_banded_dense_pallas,
        _fwd_banded_pallas,
    )

    fkeys = sorted(ftables)
    bkeys = sorted(btables)

    @jax.custom_vjp
    def project(d2, ftables, btables):
        return _fwd_local(d2, ftables)

    def _fwd_local(d2, ftables):
        def local(d2, *ls):
            ft = _ft_of([l[0] for l in ls], fkeys)
            if dense_fwd:
                return _fwd_banded_dense_pallas(d2, ft, meta,
                                                interpret=interpret)
            return _fwd_banded_pallas(d2, ft, meta, B, interpret=interpret)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(),) + tuple(
                P(axis, *([None] * (ftables[k].ndim - 1))) for k in fkeys),
            out_specs=P(axis),
            check_vma=False,  # pallas_call has no vma annotations
        )(d2, *[ftables[k] for k in fkeys])

    def fwd(d2, ftables, btables):
        return _fwd_local(d2, ftables), btables

    def bwd(btables, dy):
        def local(dy, *ls):
            btd = _btd_of([l[0] for l in ls], bkeys)
            if dense_bwd:
                dD2 = _bwd_banded_dense_pallas(dy, btd, metab, srb,
                                               interpret=interpret)
            else:
                dD2 = _bwd_banded_pallas(dy, btd, metab, B,
                                         interpret=interpret)
            return jax.lax.psum(dD2, RAY_AXIS)

        dD2 = jax.shard_map(
            lambda dy, *ls: local(dy, *ls),
            mesh=mesh,
            in_specs=(P(axis),) + tuple(
                P(axis, *([None] * (btables[k].ndim - 1))) for k in bkeys),
            out_specs=P(),
            check_vma=False,
        )(dy, *[btables[k] for k in bkeys])
        return dD2, None, None

    project.defvjp(fwd, bwd)
    return project(d2, ftables, btables)


@partial(jax.jit, static_argnames=("mesh", "metab", "B", "interpret",
                                   "axis", "dense_bwd", "srb"))
def sharded_banded_backproject(mesh, btables: dict, metab: RoutedMeta,
                               B: int, dy, interpret: bool = False,
                               axis: str = RAY_AXIS,
                               dense_bwd: bool = False, srb: int = 8):
    """Adjoint over the mesh with the banded transpose kernel."""
    from ..ops.routed_project import (
        _bwd_banded_dense_pallas,
        _bwd_banded_pallas,
    )

    bkeys = sorted(btables)

    def local(dy, *ls):
        btd = _btd_of([l[0] for l in ls], bkeys)
        if dense_bwd:
            dD2 = _bwd_banded_dense_pallas(dy, btd, metab, srb,
                                           interpret=interpret)
        else:
            dD2 = _bwd_banded_pallas(dy, btd, metab, B, interpret=interpret)
        return jax.lax.psum(dD2, axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis),) + tuple(
            P(axis, *([None] * (btables[k].ndim - 1))) for k in bkeys),
        out_specs=P(),
        check_vma=False,
    )(dy, *[btables[k] for k in bkeys])
