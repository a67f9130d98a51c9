"""Intersection-kernel oracles: hand-derived closed-form geometry cases
(the reference validates r_torch/e_torch/a_torch the same way,
test_all.py:18-173; cases here are derived independently)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu.ops.intersect import (
    INVALID,
    OUTSIDE,
    cart2sph,
    cone_crossings,
    find_starts,
    plane_crossings,
    sph2cart,
    sphere_crossings,
)

F64 = jnp.float64


def valid_sorted(t, regions):
    """Finite crossings sorted by distance, as (t, region) pairs."""
    t = np.asarray(t).ravel()
    regions = np.asarray(regions).ravel()
    keep = np.isfinite(t)
    order = np.argsort(t[keep])
    return list(zip(t[keep][order].tolist(), regions[keep][order].tolist()))


# ---------------------------------------------------------------- spheres

def test_sphere_through_center():
    # shells at r=0.5, 1.0; ray along +x from (-2, 0, 0)
    t, reg, _, _ = sphere_crossings(
        jnp.array([0.5, 1.0], F64), jnp.array([-2.0, 0, 0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    got = valid_sorted(t, reg)
    want = [(1.0, 0), (1.5, -1), (2.5, 0), (3.0, OUTSIDE)]
    for (gt, gr), (wt, wr) in zip(got, want):
        assert np.isclose(gt, wt) and gr == wr


def test_sphere_miss():
    t, reg, _, _ = sphere_crossings(
        jnp.array([1.0], F64), jnp.array([-2.0, 0, 5.0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    assert np.all(np.isinf(np.asarray(t)))


def test_sphere_behind():
    # crossings behind the start are still reported with negative t
    # (invalidations happen in trace_crossings, reference raytracer.py:125-126)
    t, reg, _, _ = sphere_crossings(
        jnp.array([1.0], F64), jnp.array([2.0, 0, 0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    got = valid_sorted(t, reg)
    assert np.isclose(got[0][0], -3.0) and np.isclose(got[1][0], -1.0)


def test_sphere_offset_chord():
    # impact parameter 0.6 against r=1: half-chord = 0.8
    t, reg, _, _ = sphere_crossings(
        jnp.array([1.0], F64), jnp.array([-3.0, 0.6, 0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    got = valid_sorted(t, reg)
    assert np.isclose(got[0][0], 3 - 0.8) and np.isclose(got[1][0], 3 + 0.8)
    assert got[0][1] == -1        # entering inside innermost boundary
    assert got[1][1] == OUTSIDE   # exiting outermost


# ------------------------------------------------------------------ cones

def test_cone_horizontal_ray():
    # cone half-angle 45°: surface sqrt(x²+y²)=z. Ray y=0, z=1, along +x
    # from x=-2 crosses at x=∓1 → t=1 (entering inner region), t=3 (exiting)
    t, reg, _, _ = cone_crossings(
        jnp.array([np.pi / 4], F64), jnp.array([-2.0, 0, 1.0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    got = valid_sorted(t, reg)
    assert np.isclose(got[0][0], 1.0) and np.isclose(got[1][0], 3.0)
    # entering the cone from outside (e > π/4 side): region = ind - 1 = -1
    assert got[0][1] == -1
    # leaving: region = ind = 0 → B-1 = 0 → OUTSIDE for a single boundary
    assert got[1][1] == OUTSIDE


def test_cone_shadow_filtered():
    # same 45° cone: ray at z=-1 hits only the shadow cone → no real crossing
    t, _, _, _ = cone_crossings(
        jnp.array([np.pi / 4], F64), jnp.array([-2.0, 0, -1.0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    assert np.all(np.isinf(np.asarray(t)))


def test_cone_downward_shadow():
    # 135° cone opens downward; ray at z=-1 now hits the real cone
    t, _, _, _ = cone_crossings(
        jnp.array([3 * np.pi / 4], F64), jnp.array([-2.0, 0, -1.0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    got = [v for v in np.asarray(t).ravel() if np.isfinite(v)]
    assert np.allclose(sorted(got), [1.0, 3.0])


def test_cone_equator_plane():
    # e=π/2 degenerates to the z=0 plane: vertical ray crosses at t=1
    # (the quadratic has a double root there — both entries land at t=1,
    # matching the reference's e_torch on snapped-zero discriminants)
    t, reg, _, _ = cone_crossings(
        jnp.array([np.pi / 2], F64), jnp.array([1.0, 0, -1.0], F64),
        jnp.array([0.0, 0, 1.0], F64), ftype=F64)
    got = valid_sorted(t, reg)
    assert len(got) >= 1
    assert all(np.isclose(gt, 1.0) for gt, _ in got)


def test_cone_parallel_single_root():
    # ray parallel to a 45° cone surface: exactly one crossing
    d = np.array([1.0, 0, 1.0]) / np.sqrt(2)
    t, _, _, _ = cone_crossings(
        jnp.array([np.pi / 4], F64), jnp.array([-1.0, 0, 0.5], F64),
        jnp.asarray(d, F64), ftype=F64)
    finite = np.isfinite(np.asarray(t)).sum()
    assert finite == 1


def test_cone_axis_ray():
    # ray along the z axis from below crosses the 45° upward cone only at
    # the apex (tangentially at origin)
    t, reg, _, _ = cone_crossings(
        jnp.array([np.pi / 4], F64), jnp.array([0.0, 0, -2.0], F64),
        jnp.array([0.0, 0, 1.0], F64), ftype=F64)
    got = valid_sorted(t, reg)
    for gt, _ in got:
        assert np.isclose(gt, 2.0)


# ----------------------------------------------------------------- planes

def test_plane_simple_crossing():
    # half-plane at a=0 (the +x half of y=0); ray along +y from (1,-1,0)
    t, reg, _, _ = plane_crossings(
        jnp.array([0.0], F64), jnp.array([1.0, -1.0, 0], F64),
        jnp.array([0.0, 1.0, 0], F64), ftype=F64)
    got = valid_sorted(t, reg)
    assert len(got) == 1 and np.isclose(got[0][0], 1.0)


def test_plane_parallel():
    t, _, _, _ = plane_crossings(
        jnp.array([0.0], F64), jnp.array([1.0, -1.0, 0], F64),
        jnp.array([1.0, 0, 0], F64), ftype=F64)
    assert np.all(np.isinf(np.asarray(t)))


def test_plane_shadow_half():
    # half-plane at a=0 is x>0 only; ray crossing y=0 at x=-1 must not count
    t, _, _, _ = plane_crossings(
        jnp.array([0.0], F64), jnp.array([-1.0, -1.0, 0], F64),
        jnp.array([0.0, 1.0, 0], F64), ftype=F64)
    assert np.all(np.isinf(np.asarray(t)))


def test_plane_direction_regions():
    # boundaries at a=0 and a=π/2; CCW ray (crossing a=0 upward) enters
    # region 0; crossing direction flips the region
    a_b = jnp.array([0.0, np.pi / 2], F64)
    t_up, reg_up, _, _ = plane_crossings(
        a_b, jnp.array([1.0, -0.5, 0], F64), jnp.array([0.0, 1.0, 0], F64),
        ftype=F64)
    got = valid_sorted(t_up, reg_up)
    # crosses a=0 at t=0.5 entering region 0, then a=π/2 at... x=1 plane
    # a=π/2 is x=0 half-plane y>0: ray stays at x=1 → parallel? no:
    # n=(-1,0,0), r=(0,1,0) → n·r=0 → inf. only one crossing.
    assert len(got) == 1
    assert np.isclose(got[0][0], 0.5) and got[0][1] == 0


def test_plane_periodic_wrap():
    # full-circle azimuth grid: crossing the -π/π seam wraps the region
    a_b = jnp.array([-np.pi, 0.0, np.pi], F64)
    # ray crossing the -x axis (a=±π seam) moving CCW (from below, y<0 → y>0)
    t, reg, _, _ = plane_crossings(
        a_b, jnp.array([-1.0, -0.5, 0], F64), jnp.array([0.0, 1.0, 0], F64),
        full_azimuth=True, ftype=F64)
    got = valid_sorted(t, reg)
    # the seam counts for boundary index 0 (a=-π) and 2 (a=π), same t=0.5,
    # both wrapping into valid region ids {0, 1}
    assert len(got) == 2
    assert all(np.isclose(gt, 0.5) for gt, _ in got)
    assert {gr for _, gr in got} <= {0, 1}


# -------------------------------------------------- transforms and starts

def test_cart_sph_roundtrip():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(64, 3))
    sph = cart2sph(jnp.asarray(pts, F64))
    back = sph2cart(sph)
    assert np.allclose(np.asarray(back), pts, atol=1e-12)
    s = np.asarray(sph)
    assert (s[:, 1] >= 0).all() and (s[:, 1] <= np.pi).all()
    assert (s[:, 2] >= -np.pi).all() and (s[:, 2] <= np.pi).all()


def test_find_starts():
    r_b = jnp.array([0.0, 1.0, 2.0], F64)
    e_b = jnp.array([0.0, np.pi / 2, np.pi], F64)
    a_b = jnp.array([-np.pi, 0.0, np.pi], F64)
    pts = jnp.asarray(
        np.array([
            [0.5, 0.1, 0.5],    # r≈0.7<1 → 0; e<π/2 → 0; a>0 → 1
            [1.5, 0.0, -0.5],   # r≈1.58 → 1; e>π/2 → 1; a=0 edge → 1
            [5.0, 0.0, 0.0],    # outside
            [0.0, 0.0, 2.0],    # exactly on outer boundary → last voxel
        ]), F64)
    reg = np.asarray(find_starts(r_b, e_b, a_b, pts))
    assert reg.shape == (3, 4)
    assert reg[0].tolist() == [0, 1, -1, 1]   # radial bins
    assert reg[1].tolist() == [0, 1, 1, 0]    # elevation bins
    assert reg[2].tolist() == [1, 1, 1, 1]    # azimuth bins
