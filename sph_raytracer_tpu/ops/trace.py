"""Crossing assembly: sort, midpoint voxel labels, segment lengths.

TPU-native re-design of the reference ``trace_indices`` pipeline
(/root/reference/sph_raytracer/raytracer.py:48-230).

Pipeline, per ray (all rays vectorized, all shapes static):
  1. r/e/a crossing kernels (:mod:`.intersect`)          → M-1 candidates
  2. ray-start pseudo-crossing at t=0 (splits any segment straddling the
     start, so behind-the-start exclusion is a per-segment `t ≥ 0` test)
  3. single-key ``lax.sort`` by distance (the reference co-sorts three
     region tensors via torch sort + take_along_dim, raytracer.py:131-137;
     we need only the distances)
  4. segment lengths = diff of sorted distances, +inf appended for the
     final segment
  5. segment voxel labels by midpoint classification (:func:`_bin_segments`)
     — NOT the reference's entered-region forward fill (raytracer.py:17-45,
     109-230), which FP-fragile shadow classification near the polar axis
     can derail for the rest of the ray (its FIXME, raytracer.py:534) and
     which mislabels all behind-the-start path of interior viewers

``M = 2(N_r+1) + 2(N_e+1) + (N_a+1) + 1`` is compile-time static
(raytracer.py:72, examples/memory_usage.py:23-24).

``forward_fill`` (the log₂M associative-scan equivalent of the
reference's sequential TorchScript fill) is kept as a utility.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import (
    INVALID,
    OUTSIDE,
    cone_crossings,
    plane_crossings,
    sphere_crossings,
)

__all__ = ["GridSpec", "trace_crossings", "trace_crossings_ranked",
           "forward_fill", "pack_linear", "voxel_order_lin",
           "voxel_order_flat", "voxel_order_unflat"]


@dataclasses.dataclass(frozen=True)
class GridSpec:
    """Fully-static grid spec for jit: boundary values as hashable float
    tuples + shape facts.

    Grids are tiny (≤ a few hundred boundaries) and fixed per operator, so
    boundaries are compile-time constants: the spec is a hashable static
    jit argument and XLA const-folds the boundary math (cos²e, plane
    normals, …) into the compiled program.
    """

    r_b: Tuple[float, ...]
    e_b: Tuple[float, ...]
    a_b: Tuple[float, ...]
    full_azimuth: bool
    ftype_name: str = "float32"

    @property
    def ftype(self):
        return jnp.dtype(self.ftype_name)

    @property
    def nr(self) -> int:
        return len(self.r_b) - 1

    @property
    def ne(self) -> int:
        return len(self.e_b) - 1

    @property
    def na(self) -> int:
        return len(self.a_b) - 1

    @property
    def vshape(self) -> Tuple[int, int, int]:
        return (self.nr, self.ne, self.na)

    @property
    def num_crossings(self) -> int:
        return 2 * (self.nr + 1) + 2 * (self.ne + 1) + (self.na + 1) + 1

    def arrays(self):
        ft = self.ftype
        return (
            jnp.asarray(self.r_b, dtype=ft),
            jnp.asarray(self.e_b, dtype=ft),
            jnp.asarray(self.a_b, dtype=ft),
        )

    @classmethod
    def from_grid(cls, grid, ftype=jnp.float32) -> "GridSpec":
        return cls(
            r_b=tuple(float(x) for x in grid.r_b),
            e_b=tuple(float(x) for x in grid.e_b),
            a_b=tuple(float(x) for x in grid.a_b),
            full_azimuth=grid.full_azimuth,
            ftype_name=jnp.dtype(ftype).name,
        )


def forward_fill(x, initial, fill_what: int = INVALID, axis: int = -1):
    """Replace ``fill_what`` entries with the last valid value along ``axis``.

    Log-depth replacement for the reference's sequential TorchScript scan
    (raytracer.py:17-45): the "last valid value" operator
    ``a ⊕ b = b if b != fill else a`` is associative, so
    ``lax.associative_scan`` computes the fill in O(log M) vector steps.

    Args:
        x: integer array.
        initial: seed for positions before the first valid entry; shape of
            ``x`` without ``axis``.
    """
    def combine(a, b):
        return jnp.where(b == fill_what, a, b)

    filled = jax.lax.associative_scan(combine, x, axis=axis)
    return jnp.where(filled == fill_what, jnp.expand_dims(initial, axis), filled)


def _bin_segments(gs: GridSpec, xs, rays_n, ts, lens_raw, itype,
                  platform=None):
    """Label segments by the voxel containing their midpoint.

    Classifying ``xs + (t + len/2)·ray`` directly (instead of forward-
    filling per-crossing "region entered" codes like the reference,
    raytracer.py:109-230) makes labels geometrically correct by
    construction: near-axis passages, where several azimuth half-plane
    crossings nearly coincide and the shadow classification of each is
    decided by FP noise, mislabel the rest of the ray under event-fill
    (the reference's acknowledged FIXME, raytracer.py:534; its fill also
    dumps all path *behind* an interior ray start into the start voxel
    despite marking those crossings invalid, raytracer.py:125-137).
    Midpoint labels are also deterministic across backends and program
    shapes — equal-`t` sort ties can reorder, but they only move
    zero-length segments.

    Returns (regs (3, …, M) int, valid (…, M) bool); ``valid`` is True
    for forward (t ≥ 0), finite, positive-length, in-grid segments.
    """
    live = jnp.isfinite(lens_raw) & (lens_raw > 0) & (ts >= 0)
    t_mid = jnp.where(live, ts + lens_raw * 0.5, -1.0)
    p = xs[..., None, :] + t_mid[..., None] * rays_n[..., None, :]
    px, py, pz = p[..., 0], p[..., 1], p[..., 2]
    xy = jnp.hypot(px, py)
    vals = (jnp.sqrt(px**2 + py**2 + pz**2), jnp.arctan2(xy, pz),
            jnp.arctan2(py, px))

    # O(B) compare_all wins on TPU vector units; O(log B) scan wins on
    # CPU.  `platform` is the device the trace actually runs on (the
    # caller may trace on the host CPU beside a TPU default backend).
    platform = platform or jax.default_backend()
    method = "compare_all" if platform == "tpu" else "scan"
    out = []
    statics = (gs.r_b, gs.e_b, gs.a_b)  # hashable host-side tuples
    for axis, (b_host, bounds, v) in enumerate(zip(statics, gs.arrays(),
                                                   vals)):
        if axis == 2 and (b_host[0] < -np.pi - 1e-12
                          or b_host[-1] > np.pi + 1e-12):
            # azimuth grid extends beyond atan2's (-π, π] range: wrap the
            # angle into one period starting at the first boundary
            v = bounds[0] + jnp.mod(v - bounds[0], 2 * np.pi)
        n = bounds.shape[0] - 1
        reg = jnp.searchsorted(bounds, v, side="right",
                               method=method).astype(itype) - 1
        # exactly on the outer boundary counts as the last voxel
        # (same convention as find_starts, reference raytracer.py:605-644)
        reg = jnp.where(v == bounds[-1], n - 1, reg)
        out.append(jnp.where(live, reg, jnp.array(OUTSIDE, itype)))

    reg_r, reg_e, reg_a = out
    valid = (
        live
        & (reg_r >= 0) & (reg_r <= gs.nr - 1)
        & (reg_e >= 0) & (reg_e <= gs.ne - 1)
        & (reg_a >= 0) & (reg_a <= gs.na - 1)
    )
    return jnp.stack([reg_r, reg_e, reg_a], axis=0), valid


def _trace_prep(gs: GridSpec, xs, rays, itype, ftype):
    """Shared prep for both trace pipelines: broadcast, normalize, run
    the three crossing kernels, and prepend the t=0 ray-start
    pseudo-crossing that splits any segment straddling the start
    (reference raytracer.py:77-122)."""
    xs = jnp.asarray(xs, dtype=ftype)
    rays = jnp.asarray(rays, dtype=ftype)
    shape = jnp.broadcast_shapes(xs.shape, rays.shape)
    xs = jnp.broadcast_to(xs, shape)
    rays = jnp.broadcast_to(rays, shape)
    rays_n = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)

    r_b, e_b, a_b = gs.arrays()
    r_t, _, _, _ = sphere_crossings(r_b, xs, rays, itype=itype, ftype=ftype)
    e_t, _, _, _ = cone_crossings(e_b, xs, rays, itype=itype, ftype=ftype)
    a_t, _, _, _ = plane_crossings(
        a_b, xs, rays, full_azimuth=gs.full_azimuth, itype=itype,
        ftype=ftype)
    ts = jnp.concatenate(
        [jnp.zeros((*shape[:-1], 1), dtype=ftype), r_t, e_t, a_t], axis=-1
    )
    return xs, rays_n, ts


def trace_crossings(gs: GridSpec, xs, rays, itype=jnp.int32, ftype=None,
                    platform=None):
    """Full crossing trace for a batch of rays.

    Boundary crossing distances come from the intersection kernels
    (reference r/e/a_torch, raytracer.py:248-552); a single-key
    ``lax.sort`` orders them, and each segment between consecutive
    crossings is labeled with the voxel containing its midpoint (see
    :func:`_bin_segments` for why midpoint labels beat the reference's
    entered-region forward fill).

    Args:
        gs: device grid spec.
        xs: ray start positions (*rays, 3) (broadcastable against rays).
        rays: ray directions (*rays, 3).

    Returns:
        regs: (3, *rays, M) voxel index triplet per sorted crossing
            (-1 where the segment is outside the grid or invalid).
        lens: (*rays, M) segment length per crossing; zero where invalid.
        ts: (*rays, M) sorted crossing distances (debugging / adjoint reuse).
    """
    ftype = ftype or gs.ftype
    xs, rays_n, ts = _trace_prep(gs, xs, rays, itype, ftype)
    ts_s = jax.lax.sort(ts, dimension=-1)

    # segment lengths; the final segment extends to infinity
    lens_raw = jnp.diff(
        ts_s, axis=-1,
        append=jnp.full((*ts_s.shape[:-1], 1), jnp.inf, ftype)
    )
    regs, valid = _bin_segments(gs, xs, rays_n, ts_s, lens_raw, itype,
                                platform=platform)
    lens = jnp.where(valid, lens_raw, 0.0)
    return regs, lens, ts_s


def trace_crossings_ranked(gs: GridSpec, xs, rays, itype=jnp.int32,
                           ftype=None, platform=None):
    """Sort-free crossing trace: same (regs, lens) pairs as
    :func:`trace_crossings`, in UNSORTED (concatenation) order.

    XLA's variadic sort is ~15x slower on TPU than CPU, which made the
    sorted pipeline precompute-bound on device.  This formulation never
    sorts: the segment opened by crossing i ends at

        min over j of {t_j : (t_i, i) <lex (t_j, j)}

    — all-pairs comparisons (M x M per ray, M static) instead of a sort,
    which compile to dense batched reductions.  Tie-breaking by
    concatenation index gives each duplicate-`t` group one full segment
    and zero-length rest, exactly like the sorted pipeline.  Segment
    voxel labels come from :func:`_bin_segments` midpoint classification,
    identical to the sorted pipeline's.

    Returns:
        regs: (3, *rays, M) voxel triplets per crossing-opened segment.
        lens: (*rays, M) segment lengths (zero where invalid).
        ts:   (*rays, M) crossing distances (unsorted).
    """
    ftype = ftype or gs.ftype
    xs, rays_n, ts = _trace_prep(gs, xs, rays, itype, ftype)
    M = ts.shape[-1]

    idx = jnp.arange(M, dtype=itype)
    ti = ts[..., :, None]
    tj = ts[..., None, :]
    le = (tj < ti) | ((tj == ti) & (idx[None, :] <= idx[:, None]))

    # segment length: distance to the lexicographically-next crossing
    nxt = jnp.min(jnp.where(~le, tj, jnp.inf), axis=-1)
    lens_raw = nxt - ts

    regs, valid = _bin_segments(gs, xs, rays_n, ts, lens_raw, itype,
                                platform=platform)
    lens = jnp.where(valid, lens_raw, 0.0)
    return regs, lens, ts


def voxel_order_lin(lin, vshape, order: str):
    """Relabel packed voxel ids from the canonical azimuth-innermost
    C-order (:func:`pack_linear`) into ``order``'s linearization.

    ``order='r'`` is radius-innermost: ``v' = (e·na + a)·nr + r``.  4D ids
    (``t·V`` offsets already added) are relabelled per time slice.  Works
    on numpy and jax arrays alike; a no-op for ``order='a'``.
    """
    if order == "a":
        return lin
    if order != "r":
        raise ValueError(f"unknown voxel order {order!r} (want 'a' or 'r')")
    nr, ne, na = (int(s) for s in vshape)
    V = nr * ne * na
    t = lin // V
    v = lin - t * V
    r = v // (ne * na)
    rem = v - r * (ne * na)
    return (t * V + rem * nr + r).astype(lin.dtype)


def voxel_order_flat(flat, vshape, order: str):
    """Reorder a ``(..., T·V)`` flat density from canonical order into
    ``order``'s linearization — a transpose (one XLA copy), never a
    gather.  Inverse: :func:`voxel_order_unflat`."""
    if order == "a":
        return flat
    nr, ne, na = (int(s) for s in vshape)
    lead = flat.shape[:-1]
    T = flat.shape[-1] // (nr * ne * na)
    x = flat.reshape(*lead, T, nr, ne, na)
    x = jnp.moveaxis(x, -3, -1)  # (..., T, ne, na, nr)
    return x.reshape(*lead, flat.shape[-1])


def voxel_order_unflat(flat, vshape, order: str):
    """Inverse of :func:`voxel_order_flat`."""
    if order == "a":
        return flat
    nr, ne, na = (int(s) for s in vshape)
    lead = flat.shape[:-1]
    T = flat.shape[-1] // (nr * ne * na)
    x = flat.reshape(*lead, T, ne, na, nr)
    x = jnp.moveaxis(x, -1, -3)  # (..., T, nr, ne, na)
    return x.reshape(*lead, flat.shape[-1])


def pack_linear(regs, gs: GridSpec, itype=jnp.int32):
    """Pack a (3, …, M) region triplet into flat voxel indices (…, M).

    Out-of-grid triplets (which always carry zero length) are clamped into
    range so gathers stay in-bounds — the reference instead relies on torch
    negative-index wraparound being masked by the zero lengths
    (raytracer.py:155-173); JAX clamps OOB gathers, we make it explicit.
    """
    r = jnp.clip(regs[0], 0, gs.nr - 1)
    e = jnp.clip(regs[1], 0, gs.ne - 1)
    a = jnp.clip(regs[2], 0, gs.na - 1)
    return ((r * gs.ne + e) * gs.na + a).astype(itype)
