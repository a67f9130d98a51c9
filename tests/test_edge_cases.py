"""Edge-case behavior: rays near the polar axis, boundary starts, seams.

The reference's azimuth kernel has an acknowledged broken edge case for
rays passing (nearly) through the Z-axis (reference raytracer.py:534
FIXME; its own tests carry commented-out known-failing asserts,
test_all.py:119-128, 171-173).  We do better: every positive-length
segment's voxel label must equal the true geometric bin of the segment's
midpoint.  These tests pin that property where the reference fails, and
the golden configs (tests/goldens) deliberately keep rays > 1e-3 from the
axis so reference parity stays meaningful.
"""
import jax.numpy as jnp
import numpy as np

from sph_raytracer_tpu import SphericalGrid
from sph_raytracer_tpu.ops.trace import GridSpec, trace_crossings

F64 = jnp.float64


def segment_midpoint_bins_match(grid, xs, rays):
    """Assert every positive-length segment is labeled with the voxel that
    actually contains its midpoint."""
    gs = GridSpec.from_grid(grid, ftype=jnp.float64)
    xs_j = jnp.asarray(xs, F64)
    rays_j = jnp.asarray(rays, F64)
    regs, lens, ts = trace_crossings(gs, xs_j, rays_j)
    regs, lens, ts = np.asarray(regs), np.asarray(lens), np.asarray(ts)
    rays_n = np.asarray(rays) / np.linalg.norm(rays, axis=-1, keepdims=True)

    n_checked = 0
    it = np.ndindex(lens.shape[:-1])
    for idx in it:
        for k in np.where(lens[idx] > 1e-9)[0]:
            t_mid = ts[idx][k] + lens[idx][k] / 2
            if not np.isfinite(t_mid):
                continue
            p = np.asarray(xs)[idx] + t_mid * rays_n[idx]
            r = np.linalg.norm(p)
            e = np.arctan2(np.hypot(p[0], p[1]), p[2])
            a = np.arctan2(p[1], p[0])
            want = (
                np.searchsorted(grid.r_b, r, side="right") - 1,
                np.searchsorted(grid.e_b, e, side="right") - 1,
                np.searchsorted(grid.a_b, a, side="right") - 1,
            )
            got = tuple(regs[(slice(None),) + idx + (k,)])
            assert got == want, (idx, k, got, want, p)
            n_checked += 1
    return n_checked


def test_near_axis_ray_labels():
    """Ray passing within 1e-5 of the Z-axis: our labels stay geometrically
    correct (the reference mislabels azimuth after the axis passage)."""
    grid = SphericalGrid(shape=(6, 6, 8))
    xs = np.array([[2.0, 1e-5, 0.1]])
    rays = np.array([[-1.0, 0.0, 0.0]])
    n = segment_midpoint_bins_match(grid, xs, rays)
    assert n >= 8  # crosses many shells both sides of the axis


def test_boundary_start_labels():
    """Ray starting exactly on an azimuth half-plane boundary moving into
    the lower bin: the t=0 real crossing (not the ambiguous start bin)
    decides the region — deterministic under our stable sort."""
    grid = SphericalGrid(shape=(6, 6, 8))
    xs = np.array([[2.0, 0.0, 0.5]])
    rays = np.array([[-0.776, -0.131, -0.617]])
    segment_midpoint_bins_match(grid, xs, rays)


def test_seam_crossing_labels():
    """Crossing the -pi/pi azimuth seam wraps periodically."""
    grid = SphericalGrid(shape=(5, 5, 8))
    xs = np.array([[-2.0, -0.3, 0.05]])
    rays = np.array([[0.9, 0.435, 0.0]])
    segment_midpoint_bins_match(grid, xs, rays)


def test_polar_grid_partial_elevation():
    """Partial elevation grid (no pole): rays above/below leave the grid."""
    grid = SphericalGrid(
        r_b=np.linspace(0, 1, 6),
        e_b=np.linspace(0.5, 2.5, 6),
        a_b=np.linspace(-np.pi, np.pi, 9),
    )
    xs = np.array([[-3.0, 0.01, 0.2], [-3.0, 0.01, 0.0]])
    rays = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
    segment_midpoint_bins_match(grid, xs, rays)


def test_tangent_ray():
    """Ray exactly tangent to a shell: zero-length or consistent labels."""
    grid = SphericalGrid(shape=(4, 4, 4))
    # tangent to r=0.5 shell (boundary index 2 of r_b=[0,.25,.5,.75,1])
    xs = np.array([[-3.0, 0.5, 0.0]])
    rays = np.array([[1.0, 0.0, 0.0]])
    segment_midpoint_bins_match(grid, xs, rays)


def test_near_axis_inside_nonunit_grid():
    """Near-axis passage INSIDE the grid at r≈2.7 (needs r_max>2.7; on unit
    grids the passage is outside and invisible, which hid this case).  The
    entered-region event fill (reference pipeline) picks up a spurious
    half-plane crossing there — the shadow test of several nearly-coincident
    azimuth-plane crossings is decided by FP noise — and mislabels azimuth
    for the REST of the ray (observed: off by two bins on CPU, correct on
    TPU, for the same f64 inputs).  Midpoint labels stay geometrically
    correct regardless of FP tie order."""
    grid = SphericalGrid(shape=(8, 8, 8), size_r=(0, 5))
    xs = np.broadcast_to(np.array([10.0, 1e-3, 2e-3]), (4, 3))
    rays = np.array(
        [
            [-0.96592583, 0.0, 0.25881905],       # exactly in the y=0 plane
            [-0.96592583, -1e-5, 0.25881905],     # grazing the -y side
            [-0.96592583, +1e-5, 0.25881905],     # grazing the +y side
            [-0.96592583, -1.3e-4, 0.25881905],   # the observed failure
        ]
    )
    n = segment_midpoint_bins_match(grid, xs, rays)
    assert n >= 40


def test_hollow_inner_boundary_labels():
    """Non-zero inner radius: segments on both sides of the hollow core."""
    grid = SphericalGrid(shape=(8, 8, 8), size_r=(1, 5))
    xs = np.broadcast_to(np.array([10.0, 1e-3, 2e-3]), (2, 3))
    rays = np.array([[-0.99, 0.012, 0.11], [-1.0, 0.0, 0.0]])
    segment_midpoint_bins_match(grid, xs, rays)
