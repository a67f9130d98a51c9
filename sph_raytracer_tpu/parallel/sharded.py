"""Ray-sharded projection: the distributed operator (SURVEY N2/N3).

Rays (detector pixels × vantages, flattened) are sharded across the mesh;
the density volume is replicated.  The forward pass is embarrassingly
parallel — each chip traces only its ray shard (fused mode) or gathers
from its slice of the precomputed tables.  The backward pass scatter-adds
each chip's partial density gradient and ``psum``s it across the mesh;
``shard_map`` autodiff inserts that psum automatically from the replicated
in_spec.  This is the TPU-native replacement for the reference's
single-device design (reference raytracer.py:662-713 threads a ``device=``
string; there is no multi-device path to mirror).
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import TraceConfig
from ..operator import Operator
from ..ops.project import project_fused, project_table
from ..ops.trace import GridSpec
from .mesh import RAY_AXIS, make_mesh

__all__ = ["ShardedOperator", "shard_rays", "sharded_project"]


def shard_rays(mesh: Mesh, xs, rays, axis: str = RAY_AXIS, block: int = 1):
    """Flatten + pad ray arrays to a multiple of (mesh size × block) and
    place them sharded over ``axis``.

    Padding rays start far outside the grid pointing away, so they trace to
    all-zero lengths and contribute nothing (same trick as
    ``ops.project._pad_rays``).

    Returns (xs (Rp,3), rays (Rp,3), n_real, ray_shape), device-placed.
    """
    xs = np.asarray(xs, dtype=np.float64)
    rays = np.asarray(rays, dtype=np.float64)
    shape = np.broadcast_shapes(xs.shape, rays.shape)
    xs = np.broadcast_to(xs, shape).reshape(-1, 3)
    rays = np.broadcast_to(rays, shape).reshape(-1, 3)
    n = xs.shape[0]
    mult = mesh.shape[axis] * block
    pad = (-n) % mult
    if pad:
        xs = np.concatenate([xs, np.tile([[1e30, 0.0, 0.0]], (pad, 1))])
        rays = np.concatenate([rays, np.tile([[1.0, 0.0, 0.0]], (pad, 1))])
    sharding = NamedSharding(mesh, P(axis, None))
    return (
        jax.device_put(xs, sharding),
        jax.device_put(rays, sharding),
        n,
        shape[:-1],
    )


@partial(
    jax.jit,
    static_argnames=("mesh", "gs", "block", "itype_name", "axis",
                     "pallas", "interpret"),
)
def sharded_project(mesh, gs: GridSpec, flat2, xs, rays, off, block,
                    itype_name, axis=RAY_AXIS, pallas=False,
                    interpret=False, off2=None, w=None):
    """Fused projection under shard_map: rays sharded, volume replicated.

    Args:
        flat2: (C, V) volume, channels flattened to one leading axis.
        xs / rays: (Rp, 3) padded ray shards.
        off: (Rp,) per-ray time offsets (dynamic grids) or zeros.
        pallas: run the in-kernel fused engine (ops/fused_pallas.py) per
            shard instead of the XLA blockwise re-trace.
        off2 / w: time-interpolated 4D second-bin offsets and lerp
            weights (Pallas path only — callers demote to precomputed
            when lerp is needed without the Pallas engine).

    Returns (C, Rp) line integrals, sharded over rays.
    """
    lerp = w is not None
    assert not lerp or pallas, "lerp needs the in-kernel Pallas engine"

    def local(flat2, xs_s, rays_s, off_s, off2_s, w_s):
        if pallas:
            from ..ops.fused_pallas import fused_pallas_project

            return jnp.stack([
                fused_pallas_project(
                    gs, flat2[i], xs_s, rays_s, jnp.dtype(itype_name),
                    interpret, view_offsets=off_s,
                    view_offsets2=off2_s if lerp else None,
                    view_w=w_s if lerp else None)
                for i in range(flat2.shape[0])
            ])
        return project_fused(
            gs, flat2, xs_s, rays_s, view_offsets=off_s,
            block=block, itype=jnp.dtype(itype_name),
        )

    # without lerp the extra operands are traced but unused — feed the
    # (already ray-sharded) offset array as a placeholder
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None), P(axis), P(axis),
                  P(axis)),
        out_specs=P(None, axis),
        # pallas_call has no vma annotations (same as routed_sharded)
        check_vma=not pallas,
    )(flat2, xs, rays, off, off2 if lerp else off,
      w if lerp else off)


@partial(jax.jit, static_argnames=("mesh", "axis"))
def _sharded_project_table(mesh, flat2, lin, lens, axis=RAY_AXIS):
    """Precomputed-table projection under shard_map (tables ray-sharded)."""
    def local(flat2, lin_s, lens_s):
        return project_table(flat2, lin_s, lens_s)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(axis, None), P(axis, None)),
        out_specs=P(None, axis),
    )(flat2, lin, lens)


@partial(jax.jit, static_argnames=("mesh", "volume_size", "axis"))
def _sharded_backproject(mesh, y2, lin, lens, volume_size, axis=RAY_AXIS):
    """Adjoint under shard_map: per-shard scatter-add + psum (SURVEY N3)."""
    def local(y2_s, lin_s, lens_s):
        w = y2_s[..., None] * lens_s.astype(y2_s.dtype)  # (C, Rs, M)
        idx = lin_s.reshape(-1)

        def scatter(wc):
            return jnp.zeros((volume_size,), wc.dtype).at[idx].add(wc.reshape(-1))

        out = jax.vmap(scatter)(w)
        return jax.lax.psum(out, axis)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(axis, None), P(axis, None)),
        out_specs=P(),
    )(y2, lin, lens)


class ShardedOperator(Operator):
    """Drop-in :class:`Operator` that shards rays across a device mesh.

    Args:
        grid / geom: as :class:`Operator`.
        mesh: :class:`jax.sharding.Mesh` (default: all devices on one
            ``rays`` axis).
        config / mode / ftype / itype: as :class:`Operator`; in
            ``precomputed`` mode the (lin, lens) tables are built sharded
            and stay resident one shard per chip.

    Usage::

        mesh = make_mesh()
        op = ShardedOperator(grid, geom, mesh=mesh)
        image = op(density)            # rays computed where they live
        grads = jax.grad(lambda d: ((op(d) - y)**2).sum())(density)  # psum'd
    """

    def __init__(self, grid, geom, mesh: Optional[Mesh] = None, dynamic=None,
                 config: Optional[TraceConfig] = None, **kw):
        self.mesh = mesh if mesh is not None else make_mesh()
        super().__init__(grid, geom, dynamic=dynamic, config=config,
                         _compute=False, **kw)
        # mode (incl. the routed-f32 fallback, with its warning) was
        # already resolved by Operator.__init__; the fused/view_times
        # decision is re-made below against the SHARDED Pallas envelope
        mode = self._mode
        self._sharded_routed = None
        if mode == "routed":
            if self.config.routed_fwd_reduce != "masks":
                import warnings

                warnings.warn(
                    f"routed_fwd_reduce={self.config.routed_fwd_reduce!r}"
                    " is not plumbed through the ray-sharded table "
                    "build; the masks reduce runs on every shard",
                    stacklevel=2)
            self._build_sharded_routed()
            return
        cfg = self.config

        block = min(cfg.block_rays, _pow2_at_most(
            max(1, self._nrays // self.mesh.shape[RAY_AXIS])))
        self._block = block
        self._xs, self._rays, self._n, _ = shard_rays(
            self.mesh,
            self._xs_np.astype(np.dtype(cfg.ftype)),
            self._rays_np.astype(np.dtype(cfg.ftype)),
            block=block,
        )
        self._xs = self._xs.astype(cfg.ftype)
        self._rays = self._rays.astype(cfg.ftype)
        npad = self._xs.shape[0]

        def _pad_sharded(vals, dtype):
            a = np.zeros((npad,), dtype=dtype)
            if vals is not None:
                a[: self._nrays] = (np.asarray(vals).reshape(-1)
                                    if np.ndim(vals) else vals)
            return jax.device_put(
                a, NamedSharding(self.mesh, P(RAY_AXIS)))

        self._off = _pad_sharded(self._view_offsets, np.int32)
        if self._time_w is not None:
            self._off2 = _pad_sharded(self._time_off2, np.int32)
            self._wt = _pad_sharded(self._time_w,
                                    np.dtype(self.config.ftype))
        else:
            self._off2 = self._wt = None

        # fused + fractional view_times: the per-shard Pallas engine
        # lerps in-kernel (same as single-device); the XLA blockwise
        # fallback has no doubled-table analog, so outside the Pallas
        # envelope demote to precomputed (doubled tables) — silently
        # dropping the lerp would be WRONG, not just slow
        if (self._mode == "fused" and self._time_w is not None
                and not self._fused_pallas_sharded()):
            import warnings

            warnings.warn(
                "sharded fused mode supports view_times only in the "
                "in-kernel Pallas engine (unavailable here); falling "
                "back to mode='precomputed'")
            self._mode = "precomputed"

        self.lin = self.lens = None
        if self._mode == "precomputed":
            lin, lens = self._build_sharded_tables()
            self.lin, self.lens = lin, lens

    def _fused_pallas_sharded(self) -> bool:
        """Whether fused mode runs the in-kernel Pallas engine per shard
        (same policy as Operator._fused_pallas; time-interpolated 4D
        runs in-kernel as a second density stream)."""
        if self._mode != "fused":
            return False
        be = self.config.fused_backend
        if be == "xla":
            return False
        from ..ops.fused_pallas import supported

        ok = supported(self.gs, self._flat_size)
        if be == "pallas":
            if not ok:
                raise ValueError(
                    "fused_backend='pallas' but this grid is outside the "
                    "in-kernel fused engine's envelope")
            return True
        return ok and (jax.default_backend() == "tpu"
                       or bool(self.config.interpret))

    def _build_sharded_tables(self):
        gs, cfg, mesh = self.gs, self.config, self.mesh
        lerp = self._wt is not None

        @partial(jax.jit, static_argnames=("block",))
        def build(xs, rays, off, off2, w, block):
            def local(xs_s, rays_s, off_s, off2_s, w_s):
                lin, lens, _, _ = _trace_tables(
                    gs, xs_s, rays_s, block, cfg.itype)
                lin0 = lin + off_s[:, None].astype(cfg.itype)
                if not lerp:
                    return lin0, lens
                # time-interpolated 4D: doubled crossings with
                # lerp-weighted lengths (see Operator._apply_offsets)
                lin1 = lin + off2_s[:, None].astype(cfg.itype)
                wl = w_s[:, None].astype(lens.dtype)
                return (jnp.concatenate([lin0, lin1], axis=-1),
                        jnp.concatenate([lens * (1 - wl), lens * wl],
                                        axis=-1))

            return jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(RAY_AXIS, None), P(RAY_AXIS, None),
                          P(RAY_AXIS), P(RAY_AXIS), P(RAY_AXIS)),
                out_specs=(P(RAY_AXIS, None), P(RAY_AXIS, None)),
            )(xs, rays, off, off2, w)

        # without lerp the extra operands are traced but unused — feed
        # the (already ray-sharded) offset array as a placeholder
        off2 = self._off2 if lerp else self._off
        w = self._wt if lerp else self._off
        return build(self._xs, self._rays, self._off, off2, w,
                     self._block)

    def _cast_w_stacks(self, fstk, bstk, mf, mb):
        """Apply routed_w_dtype to stacked shard tables in place (the
        sharded analog of banded_device_fwd/bwd's w_dtype): cast BEFORE
        device placement so only the small tables cross the wire."""
        wdt = self._w_dtype(mf.SR, mb.SR)
        if wdt is None:
            return
        dt = jnp.dtype(wdt)
        w, wp = fstk["w"], bstk["wp"]
        fstk["w"] = (np.asarray(w, dtype=dt) if isinstance(w, np.ndarray)
                     else w.astype(dt))
        bstk["wp"] = (np.asarray(wp, dtype=dt) if isinstance(wp, np.ndarray)
                      else wp.astype(dt))

    def _sharded_dense(self):
        """Per-shard dense-slot resolution (forced modes only): the
        envelope sees the LOCAL tile count (tiles_per).  Under 'auto'
        sharded builds stay CLASSIC: the single-device rep-skew gate
        (route.dense_slot_rows_ok) needs the routed chunk stats, which
        per-shard multi-host builds cannot agree on without an extra
        collective, and few-view shards are exactly the skewed case the
        gate exists to reject (measured config5: 3.26x table rows,
        17.5 vs 11.75 ms/step)."""
        if self.config.routed_dense == "auto":
            return False, False
        D = int(self.mesh.devices.size)
        T = -(-self._nrays // self.config.routed_g)
        return self._dense_flags(tile_count=-(-T // D))

    def _build_sharded_routed(self):
        """Route the crossing tables and split them across the mesh by
        tile range (see parallel/routed_sharded.py)."""
        from ..ops.route import build_routed_tables
        from .routed_sharded import put_sharded_tables, shard_routed_tables

        cfg = self.config
        # host tables only (the router is numpy): device=False keeps the
        # trace on the host CPU backend instead of pulling 0.5 GB back
        # through a relayed TPU
        local_build = cfg.sharded_local_build
        if local_build is None:
            local_build = jax.process_count() > 1
        if (local_build and cfg.routed_banded
                and (jax.default_backend() == "tpu" or cfg.interpret)):
            self._use_pallas = jax.default_backend() == "tpu"
            self._build_banded_process_local()
            return
        if (cfg.routed_banded and self._use_device_router()
                and (jax.default_backend() == "tpu" or cfg.interpret)):
            # single-process device build: route each shard ON the
            # accelerator (no host router, no table upload), then place
            # the stacked tables over the mesh — the sharded analog of
            # Operator._build_routed_device
            self._use_pallas = jax.default_backend() == "tpu"
            self._build_sharded_routed_device()
            return
        lin, lens, n, _ = self._traced_tables(device=False)
        lin, lens = lin[:n], lens[:n]
        lin_h = getattr(self, "_lin_host", None)
        if lin_h is None or lin_h.shape[0] != n:
            lin_h = np.asarray(lin)
            lens_h = np.asarray(lens)
        else:
            lin_h = self._lin_host[:n]
            lens_h = self._lens_host[:n]
        lin_h, lens_h = self._apply_offsets(lin_h, lens_h)
        from ..ops.trace import voxel_order_lin

        lin_h = voxel_order_lin(lin_h, self.grid.vshape, self._vorder)
        D = int(self.mesh.devices.size)
        self._use_pallas = jax.default_backend() == "tpu"
        if cfg.routed_banded and (self._use_pallas or cfg.interpret):
            from .routed_sharded import shard_banded_tables

            df, db = self._sharded_dense()
            self._sb_dense = (df, db)
            rt8 = build_routed_tables(
                lin_h, lens_h, self._flat_size,
                G=cfg.routed_g, SR=cfg.routed_band_rows, KD=cfg.routed_kd)
            fstk, bstk, mf, mb = shard_banded_tables(
                rt8, D, B=cfg.routed_bands, dense_fwd=df, dense_bwd=db)
            self._cast_w_stacks(fstk, bstk, mf, mb)
            self._sb_ft = put_sharded_tables(fstk, self.mesh)
            self._sb_bt = put_sharded_tables(bstk, self.mesh)
            self._sb_meta, self._sb_metab = mf, mb
            self._sb_B = cfg.routed_bands
            self._sb_rt8 = rt8
            self._sharded_routed = "banded"
            self.lin, self.lens = lin, lens
            return
        rt = build_routed_tables(
            lin_h, lens_h, self._flat_size,
            G=cfg.routed_g, SR=cfg.routed_sr, KD=cfg.routed_kd)
        stacked, meta = shard_routed_tables(rt, D)
        self._srt_tables = put_sharded_tables(stacked, self.mesh)
        self._srt_meta = meta
        self._srt_rt = rt
        self._sharded_routed = True
        # keep host mirrors for .T / debugging
        self.lin, self.lens = lin, lens

    def _build_sharded_routed_device(self):
        """Banded table shards built on the accelerator
        (ops/route_device.py core per tile range) and placed over the
        mesh — byte-identical tables to :func:`shard_banded_tables`
        given the same trace (tested at ``npad_multiple=1``)."""
        import os
        import time

        from .routed_sharded import (
            build_banded_device_shards,
            put_sharded_tables,
        )

        cfg = self.config
        timing = os.environ.get("SPH_TPU_TIMING")
        lin, lens, n, _ = self._traced_tables_device()
        lin, lens = self._apply_offsets(lin[:n], lens[:n])
        from ..ops.trace import voxel_order_lin

        lin = voxel_order_lin(lin, self.grid.vshape, self._vorder)
        t0 = time.time()
        D = int(self.mesh.devices.size)
        df, db = self._sharded_dense()
        self._sb_dense = (df, db)
        fstk, bstk, mf, mb, helper = build_banded_device_shards(
            lin, lens, self._flat_size, D, G=cfg.routed_g,
            SR=cfg.routed_band_rows, KD=cfg.routed_kd,
            B=cfg.routed_bands, dense_fwd=df, dense_bwd=db)
        del lin, lens
        if timing:
            import sys

            from ..utils.profiling import fetch_sync

            fetch_sync(fstk["w"])
            print(f"[timing] sharded device router {time.time() - t0:.1f}s"
                  f" (NCB={mf.NC}/{mb.NC}, D={D})", file=sys.stderr)
        self._cast_w_stacks(fstk, bstk, mf, mb)
        self._sb_ft = put_sharded_tables(fstk, self.mesh)
        self._sb_bt = put_sharded_tables(bstk, self.mesh)
        self._sb_meta, self._sb_metab = mf, mb
        self._sb_B = cfg.routed_bands
        self._sb_rt8 = helper
        self._sharded_routed = "banded"
        self.lin = self.lens = None

    def _build_banded_process_local(self):
        """Multi-host banded-table build (SURVEY §7 "multi-host input
        pipeline"): trace + route only this process's addressable ray
        ranges, so host memory stays O(local shard) — no host ever holds
        the full problem's tables (scaled config #5 needs ~70 GB).

        Bit-identical to the global :func:`shard_banded_tables` path
        (tested on the CPU mesh): tiles are contiguous G-ray blocks and
        routing is local to a (tile, density-window) group.
        """
        import contextlib
        import os

        from ..ops.project import precompute_table
        from ..operator import _round_block
        from .routed_sharded import (
            banded_shard_local,
            put_sharded_tables_multihost,
            stack_banded_shards,
        )

        cfg = self.config
        G, B = cfg.routed_g, cfg.routed_bands
        n = self._nrays
        D = int(self.mesh.devices.size)
        T = -(-n // G)  # global tiles
        tiles_per = -(-T // D)
        rays_per = tiles_per * G
        devs = self.mesh.devices.reshape(-1)
        pid = jax.process_index()
        local_ids = [i for i, dv in enumerate(devs)
                     if dv.process_index == pid]

        ft_np = np.dtype(cfg.ftype)
        shape = np.broadcast_shapes(self._xs_np.shape, self._rays_np.shape)
        xs_f = np.broadcast_to(self._xs_np, shape).reshape(-1, 3)
        rays_f = np.broadcast_to(self._rays_np, shape).reshape(-1, 3)
        has_offs = self._view_offsets is not None

        dev = self._pdevice(need_host=True)
        ctx = (jax.default_device(dev) if dev is not None
               else contextlib.nullcontext())
        M = self.gs.num_crossings
        df, db = self._sharded_dense()
        self._sb_dense = (df, db)
        # multi-host DEVICE build (VERDICT r3 #5): when the device router
        # is enabled, each process routes its local shards on its own
        # accelerator (ops/route_device.py core per tile range) instead
        # of paying the host router per process; only the superchunk
        # maxima are allgathered.  Tables are byte-identical to the
        # single-process device build given the same trace (tested).
        use_dev = self._use_device_router()
        from ..ops.route import _round_up as _ru

        SRb = cfg.routed_band_rows
        H_rows = _ru(max(1, -(-self._flat_size // 128)), SRb)
        Bf = H_rows // SRb if df else B
        Bb = tiles_per if db else B
        fts, bts = [], []
        cores = []
        for d in local_ids:
            lo, hi = d * rays_per, min((d + 1) * rays_per, n)
            if lo >= n:
                M2 = M * (2 if self._time_w is not None else 1)
                lin_d = np.zeros((0, M2), np.dtype(cfg.itype))
                lens_d = np.zeros((0, M2), np.float32)
            else:
                cache = self._trace_cache_path(suffix=f"range{lo}-{hi}")
                if cache is not None and os.path.exists(cache):
                    z = np.load(cache)
                    lin_d, lens_d = z["lin"], z["lens"]
                else:
                    with ctx:
                        lin, lens, nn, _ = precompute_table(
                            self.gs, xs_f[lo:hi].astype(ft_np),
                            rays_f[lo:hi].astype(ft_np),
                            block=min(cfg.precompute_block_rays,
                                      _round_block(hi - lo)),
                            itype=cfg.itype)
                    lin_d = np.asarray(lin)[:nn]
                    lens_d = np.asarray(lens)[:nn]
                    if cache is not None:
                        # atomic write: hosts share the cache dir
                        tmp = cache + f".{os.getpid()}.tmp.npz"
                        np.savez(tmp, lin=lin_d, lens=lens_d)
                        os.replace(tmp, cache)
                if has_offs:
                    lin_d, lens_d = self._apply_offsets(
                        lin_d, lens_d, rows=slice(lo, hi))
                from ..ops.trace import voxel_order_lin

                lin_d = voxel_order_lin(lin_d, self.grid.vshape,
                                        self._vorder)
            if use_dev:
                import jax.numpy as jnp

                from ..ops.route_device import (
                    _banded_device_core,
                    _empty_core,
                )

                if lin_d.shape[0] == 0:
                    cores.append(_empty_core(
                        SRb, cfg.routed_kd, G, G // 128, tiles_per,
                        H_rows, 0, self._flat_size, Bf, Bb, 1,
                        df is True, db is True))
                else:
                    cores.append(_banded_device_core(
                        jnp.asarray(lin_d), jnp.asarray(lens_d),
                        self._flat_size, G=G, SR=SRb, KD=cfg.routed_kd,
                        B=B, chunk_multiple=1, T=tiles_per,
                        dense_fwd=df, dense_bwd=db))
                continue
            ft, bt = banded_shard_local(
                lin_d, lens_d, self._flat_size, tiles_per,
                G=G, SR=cfg.routed_band_rows, KD=cfg.routed_kd, B=B,
                dense_fwd=df, dense_bwd=db)
            fts.append(ft)
            bts.append(bt)

        if use_dev:
            ncf = max(c["NCBf"] for c in cores)
            ncb = max(c["NCBb"] for c in cores)
            sf = max(c["scan_fwd"] for c in cores)
            sb = max(c["scan_bwd"] for c in cores)
        else:
            ncf = max(t.NCB for t in fts)
            ncb = max(t.NCB for t in bts)
            sf = max(t.scan_fwd for t in fts)
            sb = max(t.scan_bwd for t in bts)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            g = multihost_utils.process_allgather(
                np.asarray([ncf, ncb, sf, sb], np.int64))
            ncf, ncb, sf, sb = (
                int(x) for x in np.asarray(g).reshape(-1, 4).max(axis=0))
        if use_dev:
            from .routed_sharded import stack_device_cores

            fstk, bstk, mf, mb, helper = stack_device_cores(
                cores, 256, SRb, cfg.routed_kd, G, tiles_per, n,
                self._flat_size, ncf=ncf, ncb=ncb,
                scan_fwd=sf, scan_bwd=sb)
            self._cast_w_stacks(fstk, bstk, mf, mb)
            self._sb_ft = put_sharded_tables_multihost(fstk, self.mesh)
            self._sb_bt = put_sharded_tables_multihost(bstk, self.mesh)
            self._sb_meta, self._sb_metab = mf, mb
            self._sb_B = B
            self._sb_rt8 = helper
            self._sharded_routed = "banded"
            self.lin = self.lens = None
            return
        fstk, bstk, mf, mb = stack_banded_shards(
            fts, bts, tiles_per, n, ncf=ncf, ncb=ncb,
            scan_fwd=sf, scan_bwd=sb)
        self._cast_w_stacks(fstk, bstk, mf, mb)
        self._sb_ft = put_sharded_tables_multihost(fstk, self.mesh)
        self._sb_bt = put_sharded_tables_multihost(bstk, self.mesh)
        self._sb_meta, self._sb_metab = mf, mb
        self._sb_B = B
        # pad_density/unpad_density provider (H / volume_size are global)
        self._sb_rt8 = fts[0]
        self._sharded_routed = "banded"
        self.lin = self.lens = None

    # ------------------------------------------------------------------
    @property
    def payload(self):
        """Device-array state to thread through jit boundaries as
        arguments (see :attr:`Operator.payload`).  The sharded routed
        engines keep their tables in ``_sb_ft/_sb_bt`` (banded) or
        ``_srt_tables`` — without this override those multi-GB dicts
        would be baked into callers' traces as constants."""
        if self._sharded_routed == "banded":
            return {"sb_ft": self._sb_ft, "sb_bt": self._sb_bt}
        if self._sharded_routed:
            return {"srt": self._srt_tables}
        return Operator.payload.fget(self)

    def with_payload(self, payload):
        import copy

        if "sb_ft" in payload or "srt" in payload:
            new = copy.copy(self)
            if "sb_ft" in payload:
                new._sb_ft = payload["sb_ft"]
                new._sb_bt = payload["sb_bt"]
            else:
                new._srt_tables = payload["srt"]
            return new
        return super().with_payload(payload)

    def __call__(self, density):
        density = jnp.asarray(density)
        gshape = tuple(self.grid.shape)
        if density.shape[-len(gshape):] != gshape:
            raise ValueError(
                f"density shape {density.shape} does not end with grid "
                f"shape {gshape}"
            )
        chan = density.shape[: -len(gshape)]
        flat2 = density.reshape(-1, self._flat_size)

        if self._sharded_routed == "banded":
            from ..operator import _over_channels

            fn = getattr(self, "_sb_chan_fn", None)
            if fn is None:
                from ..ops.trace import voxel_order_flat
                from .routed_sharded import sharded_banded_project

                df, db = getattr(self, "_sb_dense", (False, False))
                rt8, mesh = self._sb_rt8, self.mesh
                meta, metab, B = self._sb_meta, self._sb_metab, self._sb_B
                vshape, vo = tuple(self.grid.vshape), self._vorder
                interp = bool(self.config.interpret)
                srb, nrays = self.config.routed_band_rows, self._nrays

                def fn(f, ft, bt):
                    d2 = rt8.pad_density(voxel_order_flat(f, vshape, vo))
                    y = sharded_banded_project(
                        mesh, ft, bt, meta, metab, B, d2,
                        interpret=interp, dense_fwd=df, dense_bwd=db,
                        srb=srb)
                    return y.reshape(-1)[:nrays]

                # memoized so _chan_scan's static-fn jit cache hits
                self._sb_chan_fn = fn
            out = _over_channels(fn, flat2, self._sb_ft, self._sb_bt)
        elif self._sharded_routed:
            from ..operator import _over_channels

            fn = getattr(self, "_srt_chan_fn", None)
            if fn is None:
                from ..ops.trace import voxel_order_flat
                from .routed_sharded import sharded_routed_project

                rt, meta = self._srt_rt, self._srt_meta
                mesh, use_pallas = self.mesh, self._use_pallas
                vshape, vo = tuple(self.grid.vshape), self._vorder
                nrays = self._nrays

                def fn(f, tables):
                    d2 = rt.pad_density(voxel_order_flat(f, vshape, vo))
                    y = sharded_routed_project(mesh, tables, meta, d2,
                                               use_pallas)
                    return y.reshape(-1)[:nrays]

                self._srt_chan_fn = fn
            out = _over_channels(fn, flat2, self._srt_tables)
        elif self._mode == "precomputed":
            out = _sharded_project_table(self.mesh, flat2, self.lin, self.lens)
        else:
            out = sharded_project(
                self.mesh, self.gs, flat2, self._xs, self._rays, self._off,
                self._block, jnp.dtype(self.config.itype).name,
                pallas=self._fused_pallas_sharded(),
                interpret=bool(self.config.interpret),
                off2=self._off2, w=self._wt,
            )
        out = out[:, : self._nrays]
        return out.reshape(*chan, *self._rshape)

    def T(self, line_integrations):
        y = jnp.asarray(line_integrations)
        nlead = y.ndim - len(self._rshape)
        chan = y.shape[:nlead]
        y2 = y.reshape(-1, self._nrays)
        if self._sharded_routed == "banded":
            from ..operator import _over_channels

            fn = getattr(self, "_sb_adj_fn", None)
            if fn is None:
                from ..ops.route import LANES
                from ..ops.trace import voxel_order_unflat
                from .routed_sharded import sharded_banded_backproject

                meta = self._sb_metab
                D = int(self.mesh.devices.size)
                total = D * meta.T * meta.G
                mesh, B = self.mesh, self._sb_B
                interp = bool(self.config.interpret)
                db = getattr(self, "_sb_dense", (False, False))[1]
                srb, nrays = self.config.routed_band_rows, self._nrays
                rt8 = self._sb_rt8
                vshape, vo = tuple(self.grid.vshape), self._vorder

                def fn(yflat, bt):
                    yf = jnp.concatenate(
                        [yflat, jnp.zeros((total - nrays,), yflat.dtype)]
                    ).reshape(D * meta.T, meta.HI, LANES)
                    d2 = sharded_banded_backproject(
                        mesh, bt, meta, B, yf, interpret=interp,
                        dense_bwd=db, srb=srb)
                    return voxel_order_unflat(
                        rt8.unpad_density(d2), vshape, vo)

                self._sb_adj_fn = fn
            out = _over_channels(fn, y2, self._sb_bt)
            return out.reshape(*chan, *self.grid.shape)
        if self._sharded_routed:
            from ..operator import _over_channels

            fn = getattr(self, "_srt_adj_fn", None)
            if fn is None:
                from ..ops.route import LANES
                from ..ops.trace import voxel_order_unflat
                from .routed_sharded import sharded_routed_backproject

                rt, meta = self._srt_rt, self._srt_meta
                D = int(self.mesh.devices.size)
                total = D * meta.T * meta.G
                mesh, use_pallas = self.mesh, self._use_pallas
                nrays = self._nrays
                vshape, vo = tuple(self.grid.vshape), self._vorder

                def fn(yflat, tables):
                    yf = jnp.concatenate(
                        [yflat, jnp.zeros((total - nrays,), yflat.dtype)]
                    ).reshape(D * meta.T, meta.HI, LANES)
                    d2 = sharded_routed_backproject(
                        mesh, tables, meta, yf, use_pallas)
                    return voxel_order_unflat(
                        rt.unpad_density(d2), vshape, vo)

                self._srt_adj_fn = fn
            out = _over_channels(fn, y2, self._srt_tables)
            return out.reshape(*chan, *self.grid.shape)
        pad = self._xs.shape[0] - self._nrays
        if pad:
            y2 = jnp.concatenate(
                [y2, jnp.zeros((y2.shape[0], pad), y2.dtype)], axis=-1)
        lin, lens = self.lin, self.lens
        if lin is None:
            lin, lens = self._build_sharded_tables()
        out = _sharded_backproject(
            self.mesh, y2, lin, lens, volume_size=self._flat_size)
        return out.reshape(*chan, *self.grid.shape)


def _pow2_at_most(n: int) -> int:
    """Largest power of two ≤ n."""
    return 1 << max(0, n.bit_length() - 1)


def _trace_tables(gs, xs, rays, block, itype):
    """Blocked (lin, lens) table build for one ray shard (local, unjitted —
    callers jit)."""
    from ..ops.project import _precompute_blocks

    n = xs.shape[0]
    pad = (-n) % block
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.broadcast_to(jnp.asarray([1e30, 0.0, 0.0], xs.dtype), (pad, 3))])
        rays = jnp.concatenate(
            [rays, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], rays.dtype), (pad, 3))])
    lin, lens = _precompute_blocks(gs, xs, rays, block, jnp.dtype(itype).name)
    return lin[:n], lens[:n], n, None
