"""Volume-sharded banded operator (SURVEY §5.7's second half).

:class:`~.sharded.ShardedOperator` shards the RAY axis (the DP of this
workload) and replicates the volume — but its per-chip table memory is
the full table set divided only by rays.  For table-bound problems
(BASELINE config #5 needs ~27 GB of banded tables even at bf16 — more
than one v5e holds), the other axis is the VOLUME: this module shards
the density rows (8-row windows) across the mesh.

Layout: device d owns density windows ``sg ∈ [d·wins_per, (d+1)·wins_per)``
— a row-range of the packed ``(H, 128)`` density image — and exactly
the routed bands whose windows fall in that range (routing is local to
a (tile, window) chunk, so a window-range slice of the global routing
is the routing of the slice; same argument as the tile slicing in
routed_sharded.py).  Per-chip table memory is the total divided by D.

Collectives (the mirror image of the ray sharding):

* forward: every device computes a PARTIAL image from its density slab
  (all rays), summed with one ``psum`` of the (T·G,) image — rays
  through a volume are a sum over segments, and segments partition by
  window.
* backward/adjoint: dy is replicated; each device's banded transpose
  writes only ITS density rows — the gradient comes out naturally
  sharded (``out_specs=P(axis, None)``), no collective at all.

The per-step collective is therefore one image-sized psum (MBs over
ICI) instead of the ray sharding's volume-gradient psum — pick the
axis that makes the per-step collective the small tensor.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.route import LANES, band_pack
from ..ops.routed_project import RoutedMeta
from .mesh import RAY_AXIS, Mesh, make_mesh
from .routed_sharded import (
    BWD_BANDED_FIELDS,
    FWD_BANDED_FIELDS,
    _btd_of,
    _ft_of,
    _pad_banded,
    put_sharded_tables,
)

__all__ = ["VolShardedOperator", "shard_banded_tables_vol"]


def _slice_rt8_vol(rt, wlo, whi, wins_per):
    """Window-range slice of SR=8 routed tables, windows renumbered to
    the shard-local range (``route.select_chunks`` does the chunk-mask
    subsetting; the global (tile, sg, rep) chunk order is preserved, so
    per-tile band order — and the forward's consecutive-output-revisit
    invariant — holds).  ``volume_size`` becomes the slab's row count:
    it is only consumed by pad/unpad helpers, which the sharded
    operator handles globally."""
    from ..ops.route import _covered, select_chunks

    sub = select_chunks(rt, (rt.sg >= wlo) & (rt.sg < whi))
    sg_l = sub.sg - wlo
    H_local = wins_per * rt.SR
    return dataclasses.replace(
        sub, sg=sg_l, H=H_local, volume_size=H_local * LANES,
        wins_covered=_covered(sg_l, wins_per))


def shard_banded_tables_vol(rt8, n_devices: int, B: int = 8,
                            chunk_multiple: int = 256):
    """Split routed tables by density-WINDOW range and band-pack each
    shard (the volume axis of SURVEY §5.7; tile-range splitting is
    :func:`~.routed_sharded.shard_banded_tables`).

    Returns (fwd stacked dict, bwd stacked dict, meta_fwd, meta_bwd,
    wins_per) with all shards padded to common superchunk counts;
    per-device H is ``wins_per·SR`` rows of the global density image.
    """
    D = n_devices
    NSG = rt8.H // rt8.SR
    wins_per = -(-NSG // D)
    fts, bts = [], []
    for d in range(D):
        sub = _slice_rt8_vol(rt8, d * wins_per,
                             min((d + 1) * wins_per, NSG), wins_per)
        fts.append(band_pack(sub, B=B, by="tile", chunk_multiple=1))
        bts.append(band_pack(sub, B=B, by="window", chunk_multiple=1))
    from .routed_sharded import _round_up_mult

    NCf = _round_up_mult(max(t.NCB for t in fts), chunk_multiple)
    NCb = _round_up_mult(max(t.NCB for t in bts), chunk_multiple)
    sf, sb = rt8.scan_fwd, rt8.scan_bwd
    fts = [_pad_banded(t, NCf) for t in fts]
    bts = [_pad_banded(t, NCb) for t in bts]
    fstk = {k: np.stack([getattr(t, k) for t in fts])
            for k in FWD_BANDED_FIELDS}
    bstk = {k: np.stack([getattr(t, k) for t in bts])
            for k in BWD_BANDED_FIELDS}
    s0, b0 = fts[0], bts[0]
    mf = RoutedMeta(NCf, s0.SRb * s0.B, s0.KD, s0.G, s0.HI, rt8.T,
                    s0.H, rt8.n_rays, rt8.volume_size, sf, sb)
    mb = RoutedMeta(NCb, b0.SRb * b0.B, b0.KD, b0.G, b0.HI, rt8.T,
                    b0.H, rt8.n_rays, rt8.volume_size, sf, sb)
    return fstk, bstk, mf, mb, wins_per


@partial(jax.jit, static_argnames=("mesh", "meta", "metab", "B",
                                   "interpret", "axis"))
def vol_sharded_banded_project(mesh, ftables, btables, meta: RoutedMeta,
                               metab: RoutedMeta, d2, B: int,
                               interpret: bool = False,
                               axis: str = RAY_AXIS):
    """Forward projection over volume-sharded banded tables.

    ``d2`` is the (D·H_local, 128) density image, row-sharded over the
    mesh.  Forward psums the per-slab partial images; the VJP's density
    gradient comes out row-sharded with no collective."""
    from ..ops.routed_project import _fwd_banded_pallas

    fkeys = sorted(ftables)

    @jax.custom_vjp
    def project(d2, ftables, btables):
        return _fwd_local(d2, ftables)

    def _fwd_local(d2, ftables):
        def local(d2, *ls):
            ft = _ft_of([l[0] for l in ls], fkeys)
            y = _fwd_banded_pallas(d2, ft, meta, B, interpret=interpret)
            return jax.lax.psum(y, axis)

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis, None),) + tuple(
                P(axis, *([None] * (ftables[k].ndim - 1))) for k in fkeys),
            out_specs=P(),
            check_vma=False,
        )(d2, *[ftables[k] for k in fkeys])

    def fwd(d2, ftables, btables):
        return _fwd_local(d2, ftables), btables

    def bwd(btables, dy):
        dD2 = vol_sharded_banded_backproject(
            mesh, btables, metab, B, dy, interpret=interpret, axis=axis)
        return dD2, None, None

    project.defvjp(fwd, bwd)
    return project(d2, ftables, btables)


@partial(jax.jit, static_argnames=("mesh", "metab", "B", "interpret",
                                   "axis"))
def vol_sharded_banded_backproject(mesh, btables, metab: RoutedMeta,
                                   B: int, dy, interpret: bool = False,
                                   axis: str = RAY_AXIS):
    """Adjoint: replicated dy → row-sharded density (no collective)."""
    from ..ops.routed_project import _bwd_banded_pallas

    bkeys = sorted(btables)

    def local(dy, *ls):
        btd = _btd_of([l[0] for l in ls], bkeys)
        return _bwd_banded_pallas(dy, btd, metab, B, interpret=interpret)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(),) + tuple(
            P(axis, *([None] * (btables[k].ndim - 1))) for k in bkeys),
        out_specs=P(axis, None),
        check_vma=False,
    )(dy, *[btables[k] for k in bkeys])


class VolShardedOperator:
    """Operator with the DENSITY sharded across the mesh (row-ranges of
    the packed (H, 128) image; tables split by window range).

    The per-chip table memory is the single-chip total divided by the
    device count — the axis that makes table-bound problems (config #5:
    ~27 GB banded tables at bf16) fit a small mesh.  API mirrors
    :class:`~.sharded.ShardedOperator`: ``__call__``, ``T``,
    ``payload``/``with_payload`` for jit threading.

    Static and binned/interpolated 4D grids supported (offsets ride the
    crossing tables before routing, exactly as single-chip)."""

    def __init__(self, grid, geom, mesh: Mesh = None, config=None,
                 ftype=None, view_times=None, dynamic=None):
        from ..config import TraceConfig
        from ..operator import Operator
        from ..ops.route import build_routed_tables
        from ..ops.trace import voxel_order_lin

        self.mesh = mesh if mesh is not None else make_mesh()
        cfg = config or TraceConfig()
        if ftype is not None:
            cfg = cfg.replace(ftype=ftype)
        cfg = cfg.replace(mode="routed")
        self.config = cfg
        if cfg.routed_fwd_reduce != "masks":
            import warnings

            warnings.warn(
                f"routed_fwd_reduce={cfg.routed_fwd_reduce!r} is not "
                "plumbed through the volume-sharded table build; the "
                "masks reduce runs on every shard", stacklevel=2)
        kwargs = {}
        if view_times is not None:
            kwargs["view_times"] = view_times
        if dynamic is not None:
            kwargs["dynamic"] = dynamic
        # mode='routed' (not built: _compute=False) so dtype/knob
        # validation matches the banded engine this operator drives
        base = Operator(grid, geom, config=cfg, _compute=False, **kwargs)
        self._base = base
        self.grid, self.geom = grid, geom
        self.gs = base.gs
        self.dynamic = base.dynamic
        self._rshape = base._rshape
        self._nrays = base._nrays
        self._flat_size = base._flat_size

        lin, lens, n, _ = base._traced_tables(device=False)
        lin_h = np.asarray(lin[:n])
        lens_h = np.asarray(lens[:n])
        lin_h, lens_h = base._apply_offsets(lin_h, lens_h)
        vorder = cfg.routed_voxel_order
        self._vorder = vorder
        lin_h = voxel_order_lin(lin_h, grid.vshape, vorder)
        rt8 = build_routed_tables(
            lin_h, lens_h, self._flat_size, G=cfg.routed_g,
            SR=cfg.routed_band_rows, KD=cfg.routed_kd)
        D = int(self.mesh.devices.size)
        fstk, bstk, mf, mb, wins_per = shard_banded_tables_vol(
            rt8, D, B=cfg.routed_bands)
        wdt = base._w_dtype(mf.SR, mb.SR)
        if wdt is not None:
            fstk["w"] = fstk["w"].astype(wdt)
            bstk["wp"] = bstk["wp"].astype(wdt)
        self._ft = put_sharded_tables(fstk, self.mesh)
        self._bt = put_sharded_tables(bstk, self.mesh)
        self._mf, self._mb = mf, mb
        self._wins_per = wins_per
        self._D = D
        self._Hpad = D * wins_per * cfg.routed_band_rows  # global rows
        self._use_pallas = jax.default_backend() == "tpu"
        self._interp = bool(cfg.interpret) or not self._use_pallas

    # ------------------------------------------------------------------
    def _pad_d2(self, flat):
        """(flat_size,) → row-sharded (Hpad, 128) density image."""
        from ..ops.trace import voxel_order_flat

        flat = voxel_order_flat(flat, tuple(self.grid.vshape),
                                self._vorder)
        pad = self._Hpad * LANES - flat.shape[-1]
        # no explicit sharding constraint: the projection's shard_map
        # in_specs=P(axis, None) reshard the image as needed (and under
        # gd's outer jit GSPMD propagates the row sharding backwards)
        return jnp.concatenate(
            [flat, jnp.zeros((pad,), flat.dtype)]).reshape(-1, LANES)

    def _unpad_d2(self, d2):
        from ..ops.trace import voxel_order_unflat

        flat = d2.reshape(-1)[: self._flat_size]
        return voxel_order_unflat(flat, tuple(self.grid.vshape),
                                  self._vorder)

    def _fwd_one(self, flat, ft, bt):
        d2 = self._pad_d2(flat.astype(jnp.float32))
        y = vol_sharded_banded_project(
            self.mesh, ft, bt, self._mf, self._mb, d2,
            self.config.routed_bands, interpret=self._interp)
        return y.reshape(-1)[: self._nrays]

    def __call__(self, density):
        from ..operator import _over_channels

        density = jnp.asarray(density)
        gshape = tuple(self.grid.shape)
        chan = density.shape[: -len(gshape)]
        flat = density.reshape(-1, self._flat_size)
        fn = getattr(self, "_fwd_chan_fn", None)
        if fn is None:
            # memoized so _chan_scan's static-fn jit cache hits
            fn = self._fwd_chan_fn = self._fwd_one
        out = _over_channels(fn, flat, self._ft, self._bt)
        return out.reshape(*chan, *self._rshape)

    def _adj_one(self, yflat, bt):
        pad = self._mf.T * self._mf.G - self._nrays
        yt = jnp.concatenate(
            [yflat.astype(jnp.float32),
             jnp.zeros((pad,), jnp.float32)]).reshape(
                 self._mf.T, self._mf.HI, LANES)
        d2 = vol_sharded_banded_backproject(
            self.mesh, bt, self._mb, self.config.routed_bands,
            yt, interpret=self._interp)
        return self._unpad_d2(d2)

    def T(self, line_integrations):
        from ..operator import _over_channels

        y = jnp.asarray(line_integrations)
        nlead = y.ndim - len(self._rshape)
        chan = y.shape[:nlead]
        yf = y.reshape(-1, self._nrays)
        fn = getattr(self, "_adj_chan_fn", None)
        if fn is None:
            fn = self._adj_chan_fn = self._adj_one
        out = _over_channels(fn, yf, self._bt)
        return out.astype(y.dtype).reshape(*chan, *self.grid.shape)

    # ------------------------------------------------------------------
    @property
    def payload(self):
        return {"vft": self._ft, "vbt": self._bt}

    def with_payload(self, payload):
        import copy

        new = copy.copy(self)
        if "vft" in payload:
            new._ft = payload["vft"]
            new._bt = payload["vbt"]
        return new

    def __repr__(self):
        return (f"VolShardedOperator({tuple(self.grid.shape)} → "
                f"{tuple(self.geom.shape)}, D={self._D}, "
                f"rows/device={self._wins_per * self.config.routed_band_rows})")
