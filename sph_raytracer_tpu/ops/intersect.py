"""Ray / spherical-boundary intersection kernels (pure JAX, branchless).

TPU-native re-implementations of the reference intersection kernels
``r_torch`` / ``e_torch`` / ``a_torch`` / ``find_starts``
(/root/reference/sph_raytracer/raytracer.py:248-644).  Semantics —
region-index conventions, shadow-cone and shadow-half-plane filtering,
glancing-hit invalidation (-2), outside-outermost invalidation (-1),
periodic azimuth wrap, NaN→inf distances — are preserved exactly, but the
implementation is branchless ``where``-select code with static shapes so
it compiles to fused VPU ops under jit, and numerically-sensitive terms
use stable formulations (e.g. the ray-to-origin distance is computed from
|xs × ray|² instead of the cancellation-prone |xs|² − t_c², cf.
raytracer.py:289).

Region-index conventions (reference geometry.py:77-104):
  * ``regions[i]`` is the voxel index *entered* at crossing i along the ray
    (boundary index minus one for inward crossings).
  * -1 = outside the grid (beyond the outermost boundary / inside an
    excluded region).
  * -2 = invalid / "no change on this axis" sentinel consumed by the
    forward fill in :mod:`.trace`.

All kernels accept ``xs``/``rays`` with arbitrary matching leading
(ray) dimensions and return distances ``t`` plus integer ``regions``
(and, for debugging parity, boundary indices and crossing signs).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

__all__ = [
    "isclose",
    "sphere_crossings",
    "cone_crossings",
    "plane_crossings",
    "find_starts",
    "cart2sph",
    "sph2cart",
]

INVALID = -2  # "no region change on this axis" / invalid crossing
OUTSIDE = -1  # outside the grid


def isclose(a, b, factor: int = 3):
    """Dtype-scaled closeness test (reference ``isclose``,
    raytracer.py:233-246): |a-b| < resolution(dtype)**(1/factor).
    """
    dtype = jnp.result_type(a, b)
    tol = float(np.finfo(dtype).resolution) ** (1.0 / factor)
    return jnp.abs(a - b) < tol


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _normalize(v):
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def _prep(xs, rays, bounds, ftype):
    xs = jnp.asarray(xs, dtype=ftype)
    rays = jnp.asarray(rays, dtype=ftype)
    shape = jnp.broadcast_shapes(xs.shape, rays.shape)
    xs = jnp.broadcast_to(xs, shape)
    rays = _normalize(jnp.broadcast_to(rays, shape))
    bounds = jnp.asarray(bounds, dtype=ftype)
    return xs, rays, bounds


# ---------------------------------------------------------------------------
# concentric spheres  (reference r_torch, raytracer.py:248-325)
# ---------------------------------------------------------------------------

def sphere_crossings(r_b, xs, rays, itype=jnp.int32, ftype=None):
    """Ray crossings with concentric spheres of radii ``r_b``.

    Returns:
        t: (*rays, 2B) crossing distances (near hits then far hits);
            misses are +inf, values may be negative (behind the start).
        regions: (*rays, 2B) voxel region entered at each crossing.
        inds: (*rays, 2B) boundary index of each crossing (debug parity).
        neg: (*rays, 2B) 1 where the crossing is inward (debug parity).
    """
    ftype = ftype or jnp.result_type(jnp.asarray(xs).dtype, jnp.float32)
    xs, rays, r_b = _prep(xs, rays, r_b, ftype)
    B = r_b.shape[0]

    tc = -_dot(xs, rays)  # distance along ray to closest approach
    # stable |closest-approach|²: |xs × ray|² has no cancellation, unlike
    # |xs|² - tc² (reference raytracer.py:289) which loses all precision
    # in f32 when the start is far from the origin.
    d2 = jnp.sum(jnp.cross(xs, rays) ** 2, axis=-1)

    t1c = jnp.sqrt(r_b**2 - d2[..., None])  # NaN where the sphere is missed
    t = jnp.concatenate([tc[..., None] - t1c, tc[..., None] + t1c], axis=-1)

    # sign of ray·point at the crossing is exactly ∓t1c (unit rays), so the
    # near hit is an inward (negative) crossing iff t1c > 0.
    ind = jnp.arange(B, dtype=itype)
    neg_near = (t1c > 0).astype(itype)
    neg = jnp.concatenate([neg_near, jnp.zeros_like(neg_near)], axis=-1)
    inds = jnp.broadcast_to(jnp.concatenate([ind, ind]), t.shape).astype(itype)
    regions = inds - neg

    regions = jnp.where(regions == B - 1, OUTSIDE, regions)
    t = jnp.where(jnp.isnan(t), jnp.inf, t)
    return t, regions, inds, neg


# ---------------------------------------------------------------------------
# coaxial elevation cones  (reference e_torch, raytracer.py:328-468)
# ---------------------------------------------------------------------------

def cone_crossings(e_b, xs, rays, itype=jnp.int32, ftype=None):
    """Ray crossings with coaxial cones of half-angle ``e_b`` from +Z.

    Handles the quadratic two-root case, the single-root case (ray parallel
    to the cone surface), rays lying on a cone (→ inf), glancing hits
    (region -2), and shadow-cone filtering with the e=π/2 exemption
    (reference raytracer.py:448-461).
    """
    ftype = ftype or jnp.result_type(jnp.asarray(xs).dtype, jnp.float32)
    xs, rays, e_b = _prep(xs, rays, e_b, ftype)
    B = e_b.shape[0]
    zero = jnp.zeros((), dtype=ftype)

    cos2 = jnp.cos(e_b) ** 2  # (B,)
    rz = rays[..., 2:3]
    xz = xs[..., 2:3]
    rx = _dot(rays, xs)[..., None]
    xx = _dot(xs, xs)[..., None]

    aa = rz**2 - cos2
    bb = 2 * (rz * xz - rx * cos2)
    cc = xz**2 - xx * cos2
    aa = jnp.where(isclose(aa, zero), 0.0, aa)

    # NB: tighter snap than the reference (factor 2 → tol ≈ resolution^1/2
    # vs its factor-3 tol ≈ resolution^1/3 ≈ 1e-5 at f64): the fat snap
    # merges clearly-distinct root pairs (observed: roots 0.038 apart) and
    # can then classify the merged midpoint as shadow, silently dropping a
    # real crossing — a reference bug we do not replicate.
    delta = bb**2 - 4 * aa * cc
    delta = jnp.where(isclose(delta, zero, factor=2), 0.0, delta)
    sq = jnp.sqrt(delta)  # NaN where no real intersection

    t1 = (-bb + sq) / (2 * aa)
    t2 = (-bb - sq) / (2 * aa)

    # ray parallel to the cone surface → single linear root
    is_single = isclose(aa, zero) & ~isclose(bb, zero)
    th_near = jnp.where(is_single, -cc / bb, t1)
    th_far = jnp.where(is_single, jnp.inf, t2)

    # ray lying exactly on the cone → no crossing
    on_cone = (aa == 0) & (bb == 0) & (cc == 0)
    th_near = jnp.where(on_cone, jnp.inf, th_near)
    th_far = jnp.where(on_cone, jnp.inf, th_far)

    t = jnp.concatenate([th_near, th_far], axis=-1)  # (*rays, 2B)

    # crossing sign from rays · cross(p, (-p_y, p_x, 0)) at p = xs + t·ray,
    # reduced to scalars (no (…, 2B, 3) point tensor is materialized):
    # prod = -p_z (r_x p_x + r_y p_y) + r_z (p_x² + p_y²)
    px = xs[..., 0:1] + t * rays[..., 0:1]
    py = xs[..., 1:2] + t * rays[..., 1:2]
    pz = xz + t * rz
    prod = -pz * (rays[..., 0:1] * px + rays[..., 1:2] * py) + rz * (px**2 + py**2)

    neg = (prod > 0).astype(itype)
    ind = jnp.arange(B, dtype=itype)
    inds = jnp.broadcast_to(jnp.concatenate([ind, ind]), t.shape).astype(itype)
    regions = inds - neg
    # glancing hit: keep out of the forward fill entirely
    regions = jnp.where(isclose(prod, zero), INVALID, regions)

    # shadow-cone filtering: a real hit must lie on the same z-side as the
    # cone opening; e=π/2 is exempt (sign unreliable, masking unnecessary)
    e2 = jnp.concatenate([e_b, e_b])
    cone_up = jnp.cos(e2) >= 0
    shadow = (pz >= 0) != cone_up
    shadow = shadow & ~isclose(e2, jnp.asarray(np.pi / 2, dtype=ftype))
    t = jnp.where(shadow, jnp.inf, t)

    regions = jnp.where(regions == B - 1, OUTSIDE, regions)
    t = jnp.where(jnp.isnan(t), jnp.inf, t)
    return t, regions, inds, neg


# ---------------------------------------------------------------------------
# azimuth half-planes  (reference a_torch, raytracer.py:471-552)
# ---------------------------------------------------------------------------

def plane_crossings(a_b, xs, rays, full_azimuth: bool = False,
                    itype=jnp.int32, ftype=None):
    """Ray crossings with azimuth half-planes at angles ``a_b``.

    Args:
        full_azimuth: static flag — if the grid spans the full [-π, π],
            region indices wrap periodically (reference raytracer.py:528-532).
    """
    ftype = ftype or jnp.result_type(jnp.asarray(xs).dtype, jnp.float32)
    xs, rays, a_b = _prep(xs, rays, a_b, ftype)
    B = a_b.shape[0]

    sin_a = jnp.sin(a_b)
    cos_a = jnp.cos(a_b)

    # plane normal n = (-sin a, cos a, 0); t = -(n·x)/(n·r)
    nx = -sin_a * xs[..., 0:1] + cos_a * xs[..., 1:2]
    nr = -sin_a * rays[..., 0:1] + cos_a * rays[..., 1:2]
    t = -nx / nr  # (*rays, B)

    # crossing direction from z-component of (plane dir) × ray
    cross_z = cos_a * rays[..., 1:2] - sin_a * rays[..., 0:1]
    # parallel: strict dtype-resolution tolerance (reference uses
    # tr.isclose(cross, 0, atol=resolution), raytracer.py:521)
    is_parallel = jnp.abs(cross_z) <= float(np.finfo(ftype).resolution)
    t = jnp.where(is_parallel, jnp.inf, t)

    neg = (cross_z < 0).astype(itype)
    ind = jnp.arange(B, dtype=itype)
    inds = jnp.broadcast_to(ind, t.shape).astype(itype)
    regions = inds - neg

    if full_azimuth:
        regions = jnp.mod(regions, B - 1)
    else:
        regions = jnp.where(regions == B - 1, OUTSIDE, regions)

    # shadow half-plane: hit must be on the +plane side (cos a, sin a)
    px = xs[..., 0:1] + t * rays[..., 0:1]
    py = xs[..., 1:2] + t * rays[..., 1:2]
    shadow = cos_a * px + sin_a * py < 0
    t = jnp.where(shadow, jnp.inf, t)

    t = jnp.where(jnp.isnan(t), jnp.inf, t)
    return t, regions, inds, neg


# ---------------------------------------------------------------------------
# coordinate transforms + start-voxel binning
# ---------------------------------------------------------------------------

def cart2sph(xyz):
    """Cartesian → spherical (radius, elevation from +Z in [0,π], azimuth
    from +X in [-π,π]) (reference raytracer.py:555-578)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    xy_sq = x**2 + y**2
    r = jnp.sqrt(xy_sq + z**2)
    e = jnp.arctan2(jnp.sqrt(xy_sq), z)
    a = jnp.arctan2(y, x)
    return jnp.stack([r, e, a], axis=-1)


def sph2cart(rea):
    """Spherical → cartesian (reference raytracer.py:581-602)."""
    r, e, a = rea[..., 0], rea[..., 1], rea[..., 2]
    return jnp.stack(
        [r * jnp.sin(e) * jnp.cos(a), r * jnp.sin(e) * jnp.sin(a), r * jnp.cos(e)],
        axis=-1,
    )


def find_starts_raw(r_b, e_b, a_b, xs, itype=jnp.int32, ftype=None):
    """Unclamped start bins for the rank-based trace: -1 below the first
    boundary, N above the last (no OUTSIDE remap), so that per-crossing
    ±1 deltas accumulate arithmetically.  Points exactly on the outer
    boundary still count as the last voxel."""
    ftype = ftype or jnp.result_type(jnp.asarray(xs).dtype, jnp.float32)
    xs = jnp.asarray(xs, dtype=ftype)
    r_b, e_b, a_b = (jnp.asarray(b, dtype=ftype) for b in (r_b, e_b, a_b))
    sph = cart2sph(xs)

    def bin_axis(bounds, vals):
        n = bounds.shape[0] - 1
        reg = jnp.searchsorted(bounds, vals, side="right").astype(itype) - 1
        return jnp.where(vals == bounds[-1], n - 1, reg)

    return jnp.stack(
        [
            bin_axis(r_b, sph[..., 0]),
            bin_axis(e_b, sph[..., 1]),
            bin_axis(a_b, sph[..., 2]),
        ],
        axis=0,
    )


def find_starts(r_b, e_b, a_b, xs, itype=jnp.int32, ftype=None):
    """Voxel region triplet containing each ray start
    (reference find_starts, raytracer.py:605-644).

    Returns (3, *rays) int array; -1 where the start is outside the grid.
    Points exactly on the outer boundary count as the last voxel.
    """
    ftype = ftype or jnp.result_type(jnp.asarray(xs).dtype, jnp.float32)
    xs = jnp.asarray(xs, dtype=ftype)
    r_b, e_b, a_b = (jnp.asarray(b, dtype=ftype) for b in (r_b, e_b, a_b))
    sph = cart2sph(xs)

    def bin_axis(bounds, vals):
        n = bounds.shape[0] - 1
        reg = jnp.searchsorted(bounds, vals, side="right").astype(itype) - 1
        reg = jnp.where(vals == bounds[-1], n - 1, reg)
        reg = jnp.where(reg == n, OUTSIDE, reg)
        return reg

    return jnp.stack(
        [
            bin_axis(r_b, sph[..., 0]),
            bin_axis(e_b, sph[..., 1]),
            bin_axis(a_b, sph[..., 2]),
        ],
        axis=0,
    )
