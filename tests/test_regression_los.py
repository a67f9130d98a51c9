"""Regression LOS bank: specific (grid, line-of-sight) pairs that have
produced wrong integrals historically (reference test_raytracer.py:85-116),
plus cases found while building this framework."""
import jax.numpy as jnp
import numpy as np

from sph_raytracer_tpu import Operator, SphericalGrid, ViewGeom

F64 = jnp.float64


def check_case(grid, density, ray_start, ray, expected, atol=1e-2):
    geom = ViewGeom(np.asarray([ray_start], np.float64),
                    np.asarray([ray], np.float64))
    op = Operator(grid, geom, ftype=F64)
    result = float(op(jnp.asarray(density, F64))[0])
    assert np.isclose(result, expected, atol=atol), (result, expected)


def test_hemisphere_off_axis_ray():
    """Reference regression: (1,2,1) grid, upper hemisphere filled, ray
    slightly above the equator plane → half the diameter
    (reference test_raytracer.py:87-111)."""
    grid = SphericalGrid(shape=(1, 2, 1), size_r=(0, 25))
    d = np.zeros((1, 2, 1))
    d[0, 0, 0] = 1.0  # upper hemisphere
    u = 0.001
    check_case(grid, d, [-200, u, u], [1, 0, 0], 50.0)


def test_hollow_sphere_center_ray():
    """Ray through the center of a hollow sphere: chord = 2·(r_out−r_in)
    (reference test_raytracer.py:113-116)."""
    grid = SphericalGrid(shape=(25, 25, 25), size_r=(5, 10))
    d = np.ones(tuple(grid.shape))
    check_case(grid, d, [-100, 1e-4, 1e-4], [1, 0, 0], 10.0)


def test_lower_hemisphere_ray():
    """Mirror of the hemisphere case: ray below the equator."""
    grid = SphericalGrid(shape=(1, 2, 1), size_r=(0, 25))
    d = np.zeros((1, 2, 1))
    d[0, 1, 0] = 1.0  # lower hemisphere
    u = 0.001
    check_case(grid, d, [-200, -u, -u], [1, 0, 0], 50.0)


def test_azimuth_half_ray():
    """Half-azimuth filled volume: ray along +y sees only the +y half."""
    grid = SphericalGrid(shape=(1, 1, 2), size_r=(0, 10))
    d = np.zeros((1, 1, 2))
    # azimuth bin 1 spans [0, pi] (a_b = [-pi, 0, pi])
    d[0, 0, 1] = 1.0
    check_case(grid, d, [1e-4, -50, 1e-4], [0, 1, 0], 10.0)


def test_grazing_shell_ray():
    """Ray tangent to the inner shell of a hollow sphere: chord through
    the shell material only."""
    grid = SphericalGrid(shape=(2, 8, 8), size_r=(0, 10))
    d = np.zeros(tuple(grid.shape))
    d[1] = 1.0  # outer shell r in [5, 10]
    b = 5.0 + 1e-6
    expected = 2 * np.sqrt(10.0**2 - b**2)
    check_case(grid, d, [-100, b, 1e-5], [1, 0, 0], expected, atol=2e-2)


def test_diagonal_ray_full_sphere():
    grid = SphericalGrid(shape=(10, 10, 10), size_r=(0, 3))
    d = np.ones(tuple(grid.shape))
    dirv = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    check_case(grid, d, list(-20 * dirv + np.array([0, 1e-4, -1e-4])),
               list(dirv), 6.0)


# ---------------------------------------------------------------------------
# Reference-documented failure signatures (VERDICT r3 missing #3): each case
# below is an LOS the reference KNOWS it gets wrong — dev/newbug.py:59-78's
# mislabeled near-axis ray and the commented-out FIXME expectations at
# test_all.py:119-128 and 171-173 (on-cone / through-origin / on-plane rays).
# We assert the geometric truth.
# ---------------------------------------------------------------------------

def test_reference_newbug_near_axis_ray():
    """dev/newbug.py:30-78: shell grid (1,2,1) r=(3,25), ray from
    (200,1e-12,4e-12) along (-1,3.1e-5,-3.1e-3).  Both shell chords have
    z<0 (closest approach at t≈200 → z≈-0.62), so the whole path length
    lies in the LOWER elevation bin; the reference assigns the full
    44.119 to the UPPER bin (its printed y: tensor(44.1188) with
    x[:,0,:]=1 — the documented mislabeling)."""
    grid = SphericalGrid(shape=(1, 2, 1), size_r=(3, 25))
    start = np.array([200.0, 1e-12, 4e-12])
    ray = np.array([-1.0, 3.1e-5, -3.1e-3])
    d = ray / np.linalg.norm(ray)
    b = np.linalg.norm(np.cross(start, d))  # impact parameter
    chord = 2 * (np.sqrt(25.0**2 - b**2) - np.sqrt(3.0**2 - b**2))

    upper = np.zeros((1, 2, 1))
    upper[0, 0, 0] = 1.0
    check_case(grid, upper, start, ray, 0.0)
    lower = np.zeros((1, 2, 1))
    lower[0, 1, 0] = 1.0
    check_case(grid, lower, start, ray, chord)


def test_reference_through_origin_equator_ray():
    """Reference test_all.py:119-122 (FIXME'd regions) at operator level:
    an x-axis ray exactly on the e=π/2 cone AND the azimuth seam, through
    the origin.  Uniform density must still integrate to the diameter."""
    grid = SphericalGrid(shape=(1, 2, 1), size_r=(0, 1))
    d = np.ones((1, 2, 1))
    check_case(grid, d, [-2, 0, 0], [1, 0, 0], 2.0)


def test_reference_through_origin_degenerate_cones():
    """Reference test_all.py:123-128 (FIXME'd): e boundaries at exactly
    0 and π (degenerate cones = the ±z axis) with a through-origin
    x-ray.  Chord = diameter."""
    grid = SphericalGrid(shape=(1, 1, 1), size_r=(0, 1))
    d = np.ones((1, 1, 1))
    check_case(grid, d, [-2, 0, 0], [1, 0, 0], 2.0)


def test_reference_on_plane_ray():
    """Reference test_all.py:166-173 (FIXME'd): a ray lying ON an
    azimuth half-plane boundary (start (0,1,0), direction (0,-1,0) with
    a boundary at π/2).  Uniform density → diameter."""
    grid = SphericalGrid(r_b=np.array([0.0, 1.0]),
                         e_b=np.array([0.0, np.pi]),
                         a_b=np.array([-np.pi, np.pi / 2, np.pi]))
    d = np.ones((1, 1, 2))
    check_case(grid, d, [0, 2, 0], [0, -1, 0], 2.0)
