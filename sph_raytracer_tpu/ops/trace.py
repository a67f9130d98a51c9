"""Crossing assembly: sort, forward-fill, segment lengths.

TPU-native re-design of the reference ``trace_indices`` pipeline
(/root/reference/sph_raytracer/raytracer.py:48-230) and its sequential
TorchScript forward-fill kernel (raytracer.py:17-45).

Pipeline, per ray (all rays vectorized, all shapes static):
  1. r/e/a crossing kernels (:mod:`.intersect`)          → M-1 candidates
  2. ray-start pseudo-crossing at t=0 with the start voxel triplet
  3. crossings behind the start (t<0) invalidated to -2
  4. multi-operand ``lax.sort`` by distance (replaces torch sort +
     take_along_dim, raytracer.py:131-137)
  5. per-axis forward fill of the -2 holes with ``lax.associative_scan``
     (a log₂M "last valid value" scan replacing the reference's M-step
     sequential loop) seeded with the start voxel
  6. segment lengths = diff of sorted distances, +inf appended for the
     final segment; non-finite or out-of-grid segments zeroed
     (raytracer.py:148-173 — region ids are *kept* negative, lengths are
     what masks them, exactly like the reference)

``M = 2(N_r+1) + 2(N_e+1) + (N_a+1) + 1`` is compile-time static
(raytracer.py:72, examples/memory_usage.py:23-24).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .intersect import (
    INVALID,
    cone_crossings,
    find_starts,
    find_starts_raw,
    plane_crossings,
    sphere_crossings,
)

__all__ = ["GridSpec", "trace_crossings", "trace_crossings_ranked",
           "forward_fill", "pack_linear"]


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


def trace_crossings(gs: GridSpec, xs, rays, itype=jnp.int32, ftype=None):
    """Full crossing trace for a batch of rays.

    Args:
        gs: device grid spec.
        xs: ray start positions (*rays, 3) (broadcastable against rays).
        rays: ray directions (*rays, 3).

    Returns:
        regs: (3, *rays, M) voxel index triplet per sorted crossing
            (negatives kept, exactly like reference raytracer.py:230).
        lens: (*rays, M) segment length per crossing; zero where invalid.
        ts: (*rays, M) sorted crossing distances (debugging / adjoint reuse).
    """
    ftype = ftype or gs.ftype
    xs = jnp.asarray(xs, dtype=ftype)
    rays = jnp.asarray(rays, dtype=ftype)
    shape = jnp.broadcast_shapes(xs.shape, rays.shape)
    xs = jnp.broadcast_to(xs, shape)
    rays = jnp.broadcast_to(rays, shape)

    r_b, e_b, a_b = gs.arrays()
    r_t, r_reg, _, _ = sphere_crossings(r_b, xs, rays, itype=itype, ftype=ftype)
    e_t, e_reg, _, _ = cone_crossings(e_b, xs, rays, itype=itype, ftype=ftype)
    a_t, a_reg, _, _ = plane_crossings(
        a_b, xs, rays, full_azimuth=gs.full_azimuth, itype=itype, ftype=ftype
    )
    start_reg = find_starts(r_b, e_b, a_b, xs, itype=itype, ftype=ftype)

    inv = jnp.array(INVALID, dtype=itype)
    nr2, ne2, na1 = r_t.shape[-1], e_t.shape[-1], a_t.shape[-1]

    # the ray-start pseudo-crossing goes FIRST: lax.sort is stable, so a
    # real crossing at exactly t=0 (ray starting on a boundary) sorts after
    # the seed and wins the forward fill — the region *entered* along the
    # ray direction beats the ambiguous boundary bin of the start point
    # (the reference's unstable torch sort resolves this tie arbitrarily,
    # raytracer.py:109-137)
    ts = jnp.concatenate(
        [jnp.zeros((*shape[:-1], 1), dtype=ftype), r_t, e_t, a_t], axis=-1
    )

    def row(reg, offset, start_axis_reg):
        """One axis row of the (3, …, M) region tensor: start region in the
        t=0 slot, this axis's regions in its own column block, -2
        elsewhere."""
        parts = [
            start_axis_reg[..., None].astype(itype),
            jnp.full((*shape[:-1], nr2), inv),
            jnp.full((*shape[:-1], ne2), inv),
            jnp.full((*shape[:-1], na1), inv),
        ]
        parts[1 + offset] = reg.astype(itype)
        return jnp.concatenate(parts, axis=-1)

    reg_r = row(r_reg, 0, start_reg[0])
    reg_e = row(e_reg, 1, start_reg[1])
    reg_a = row(a_reg, 2, start_reg[2])

    # crossings behind the ray start are invalid (reference raytracer.py:125-126)
    behind = ts < 0
    reg_r = jnp.where(behind, inv, reg_r)
    reg_e = jnp.where(behind, inv, reg_e)
    reg_a = jnp.where(behind, inv, reg_a)

    # sort by distance, co-sorting all three region rows in one pass
    ts_s, reg_r, reg_e, reg_a = jax.lax.sort(
        (ts, reg_r, reg_e, reg_a), dimension=-1, num_keys=1
    )

    # forward-fill the -2 holes, seeded with the start voxel
    reg_r = forward_fill(reg_r, start_reg[0])
    reg_e = forward_fill(reg_e, start_reg[1])
    reg_a = forward_fill(reg_a, start_reg[2])

    # segment lengths; the final segment extends to infinity
    lens = jnp.diff(ts_s, axis=-1, append=jnp.full((*shape[:-1], 1), jnp.inf, ftype))

    valid = (
        jnp.isfinite(lens)
        & (reg_r >= 0) & (reg_r <= gs.nr - 1)
        & (reg_e >= 0) & (reg_e <= gs.ne - 1)
        & (reg_a >= 0) & (reg_a <= gs.na - 1)
    )
    lens = jnp.where(valid, lens, 0.0)

    regs = jnp.stack([reg_r, reg_e, reg_a], axis=0)
    return regs, lens, ts_s


def trace_crossings_ranked(gs: GridSpec, xs, rays, itype=jnp.int32,
                           ftype=None):
    """Sort-free crossing trace: same (regs, lens) pairs as
    :func:`trace_crossings`, in UNSORTED (concatenation) order.

    XLA's variadic sort is ~15x slower on TPU than CPU, which made the
    sorted pipeline precompute-bound on device.  This formulation never
    sorts: each boundary crossing changes exactly one voxel coordinate by
    ±1, so the voxel triplet of the segment *starting* at crossing i is

        region_axis(i) = start_axis + sum_j delta_axis[j] * [(t_j, j) <=lex (t_i, i), t_j >= 0]

    and the segment length is ``min over j of {t_j : (t_i,i) <lex (t_j,j)} - t_i``
    — all-pairs comparisons (M x M per ray, M static) instead of a sort,
    which compiles to dense batched matmuls/reductions.  Tie-breaking by
    concatenation index reproduces the sorted pipeline's stable-sort
    semantics exactly (including the ray-start pseudo-crossing at index 0
    winning/losing ties the same way), and segments behind the ray start
    keep the start voxel (the reference's interior-start quirk).

    Returns:
        regs: (3, *rays, M) voxel triplets per crossing-opened segment.
        lens: (*rays, M) segment lengths (zero where invalid).
        ts:   (*rays, M) crossing distances (unsorted).
    """
    ftype = ftype or gs.ftype
    xs = jnp.asarray(xs, dtype=ftype)
    rays = jnp.asarray(rays, dtype=ftype)
    shape = jnp.broadcast_shapes(xs.shape, rays.shape)
    xs = jnp.broadcast_to(xs, shape)
    rays = jnp.broadcast_to(rays, shape)
    lead = shape[:-1]

    r_b, e_b, a_b = gs.arrays()
    r_t, r_reg, r_ind, r_neg = sphere_crossings(r_b, xs, rays, itype=itype,
                                                ftype=ftype)
    e_t, e_reg, e_ind, e_neg = cone_crossings(e_b, xs, rays, itype=itype,
                                              ftype=ftype)
    a_t, a_reg, a_ind, a_neg = plane_crossings(
        a_b, xs, rays, full_azimuth=gs.full_azimuth, itype=itype,
        ftype=ftype)
    start = find_starts_raw(r_b, e_b, a_b, xs, itype=itype, ftype=ftype)

    one = jnp.ones((), itype)

    # per-crossing coordinate deltas (0 where the crossing is a no-op)
    dr = one - 2 * r_neg
    # sphere double roots are tangencies (radius grazes the boundary):
    # net bin change is zero, but both roots get the same sign — zero both
    Br = gs.nr + 1
    r_dup = jnp.isfinite(r_t[..., :Br]) & (r_t[..., :Br] == r_t[..., Br:])
    dr = jnp.where(jnp.concatenate([r_dup, r_dup], axis=-1), 0, dr)

    # Cone deltas need care around the degenerate cases the absolute
    # (sorted) pipeline shrugs off:
    #  * a root flagged glancing (prod≈0 → reference region -2) may be one
    #    half of a TRANSVERSAL pair whose other half is real — its true
    #    direction is the opposite of its partner's (the sign from prod is
    #    unreliable there, which is why the reference invalidates it);
    #  * both roots glancing = true tangency → net zero;
    #  * exactly-equal double roots: the e=pi/2 equator plane always
    #    degenerates to a double root but is a single transversal crossing
    #    (count the near root only); on any other boundary an equal pair
    #    is a snapped tangency (same sign twice) → zero both.
    Be = gs.ne + 1
    de_raw = one - 2 * e_neg
    glanc = e_reg == INVALID
    gn, gf = glanc[..., :Be], glanc[..., Be:]
    dn, df = de_raw[..., :Be], de_raw[..., Be:]
    dn = jnp.where(gn & ~gf, -df, dn)
    df = jnp.where(gf & ~gn, -de_raw[..., :Be], df)
    both_g = gn & gf
    dn = jnp.where(both_g, 0, dn)
    df = jnp.where(both_g, 0, df)
    e_dup = jnp.isfinite(e_t[..., :Be]) & (e_t[..., :Be] == e_t[..., Be:])
    is_equator = jnp.asarray(
        np.isclose(np.cos(np.asarray(gs.e_b, np.float64)), 0.0, atol=1e-9))
    dn = jnp.where(e_dup & ~is_equator, 0, dn)
    df = jnp.where(e_dup, 0, df)
    de = jnp.concatenate([dn, df], axis=-1)

    da = one - 2 * a_neg
    if gs.full_azimuth:
        # the -pi and +pi half-planes are the same plane: count only one
        da = jnp.where(a_ind == gs.na, 0, da)

    nr2, ne2, na1 = r_t.shape[-1], e_t.shape[-1], a_t.shape[-1]
    zero_t = jnp.zeros((*lead, 1), dtype=ftype)
    zero_d = jnp.zeros((*lead, 1), dtype=itype)
    # pseudo-crossing first — same tie order as the sorted pipeline
    ts = jnp.concatenate([zero_t, r_t, e_t, a_t], axis=-1)
    dR = jnp.concatenate([zero_d, dr, jnp.zeros_like(de), jnp.zeros_like(da)],
                         axis=-1)
    dE = jnp.concatenate([zero_d, jnp.zeros_like(dr), de, jnp.zeros_like(da)],
                         axis=-1)
    dA = jnp.concatenate([zero_d, jnp.zeros_like(dr), jnp.zeros_like(de), da],
                         axis=-1)
    M = ts.shape[-1]

    # deltas of crossings behind the start never count
    counted = ts >= 0
    dR = jnp.where(counted, dR, 0)
    dE = jnp.where(counted, dE, 0)
    dA = jnp.where(counted, dA, 0)

    idx = jnp.arange(M, dtype=itype)
    ti = ts[..., :, None]
    tj = ts[..., None, :]
    le = (tj < ti) | ((tj == ti) & (idx[None, :] <= idx[:, None]))
    # matmul-shaped accumulation: (…, M, M) @ (…, M, 3) on the MXU
    deltas = jnp.stack([dR, dE, dA], axis=-1).astype(ftype)
    sums = jnp.einsum("...ij,...jk->...ik", le.astype(ftype), deltas)
    reg_r = start[0][..., None] + sums[..., 0].astype(itype)
    reg_e = start[1][..., None] + sums[..., 1].astype(itype)
    reg_a = start[2][..., None] + sums[..., 2].astype(itype)
    if gs.full_azimuth:
        reg_a = jnp.mod(reg_a, gs.na)

    # segment length: distance to the lexicographically-next crossing
    gt = ~le
    nxt = jnp.min(jnp.where(gt, tj, jnp.inf), axis=-1)
    lens = nxt - ts

    valid = (
        jnp.isfinite(lens)
        & (reg_r >= 0) & (reg_r <= gs.nr - 1)
        & (reg_e >= 0) & (reg_e <= gs.ne - 1)
        & (reg_a >= 0) & (reg_a <= gs.na - 1)
    )
    lens = jnp.where(valid, lens, 0.0)
    regs = jnp.stack([reg_r, reg_e, reg_a], axis=0)
    return regs, lens, ts


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
