"""Crossing-assembly tests: forward fill, chord-length invariant
(the reference's core integration check, test_raytracer.py:8-52)."""
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import SphericalGrid
from sph_raytracer_tpu.ops.trace import (
    GridSpec,
    forward_fill,
    pack_linear,
    trace_crossings,
)

F64 = jnp.float64


def test_forward_fill_basic():
    x = jnp.array([[-2, 5, -2, -2, 7, -2]])
    init = jnp.array([9])
    out = np.asarray(forward_fill(x, init))
    assert out.tolist() == [[9, 5, 5, 5, 7, 7]]


def test_forward_fill_no_valid():
    x = jnp.full((3, 4), -2)
    init = jnp.array([1, 2, 3])
    out = np.asarray(forward_fill(x, init))
    assert (out == np.array([[1], [2], [3]])).all()


def test_forward_fill_matches_sequential():
    rng = np.random.default_rng(1)
    x = rng.integers(-2, 5, size=(16, 33))
    x[x < 0] = -2
    init = rng.integers(0, 5, size=(16,))
    got = np.asarray(forward_fill(jnp.asarray(x), jnp.asarray(init)))
    want = np.empty_like(x)
    for i in range(16):
        last = init[i]
        for j in range(33):
            last = x[i, j] if x[i, j] != -2 else last
            want[i, j] = last
    assert (got == want).all()


GRIDS = [
    SphericalGrid(shape=(25, 25, 25)),
    SphericalGrid(shape=(10, 10, 10), size_r=(0.5, 1.0)),
    SphericalGrid(shape=(1, 1, 1)),
    SphericalGrid(shape=(8, 1, 1)),
    SphericalGrid(shape=(1, 8, 1)),
    SphericalGrid(shape=(1, 1, 8)),
    SphericalGrid(shape=(6, 7, 8), size_r=(0.1, 2.0), spacing="log"),
]


@pytest.mark.parametrize("grid", GRIDS, ids=[str(tuple(g.shape)) for g in GRIDS])
def test_chord_invariant(grid):
    """Line integral of the unit-density sphere equals the known chord
    2·(r_max − r_min) for rays through the center, from every axis
    direction, with ±ε offsets to provoke boundary rounding."""
    gs = GridSpec.from_grid(grid, ftype=jnp.float64)
    eps = 1e-5
    starts, dirs = [], []
    for axis in range(3):
        for sign in (1.0, -1.0):
            for off in (0.0, eps, -eps):
                s = np.zeros(3)
                s[axis] = 5.0 * sign
                s[(axis + 1) % 3] = off
                d = np.zeros(3)
                d[axis] = -sign
                starts.append(s)
                dirs.append(d)
    xs = jnp.asarray(np.array(starts), F64)
    rays = jnp.asarray(np.array(dirs), F64)
    regs, lens, _ = trace_crossings(gs, xs, rays)
    total = np.asarray(lens.sum(axis=-1))
    rmin, rmax = grid.size.r
    expect = 2 * (rmax - rmin)
    assert np.allclose(total, expect, atol=1e-2), (total, expect)


def test_chord_off_center():
    """Ray at impact parameter b through a full sphere: chord = 2√(R²−b²)."""
    grid = SphericalGrid(shape=(20, 20, 20))
    gs = GridSpec.from_grid(grid, ftype=jnp.float64)
    b = 0.6
    xs = jnp.asarray([[-4.0, b, 0.1]], F64)
    rays = jnp.asarray([[1.0, 0, 0]], F64)
    _, lens, _ = trace_crossings(gs, xs, rays)
    b_eff = np.hypot(b, 0.1)
    expect = 2 * np.sqrt(1 - b_eff**2)
    assert np.isclose(float(lens.sum()), expect, atol=1e-2)


def test_start_inside_grid():
    """Documented divergence: a ray starting *inside* the grid integrates
    only the forward half-line.  The reference marks behind-the-start
    crossings invalid (raytracer.py:125-126) but its forward fill then
    relabels every pre-start segment with the START voxel and counts it
    (raytracer.py:17-45 seeds holes with find_starts), so it integrates
    the whole line — with all behind-path length dumped into one voxel.
    We honor the reference's stated intent instead: t<0 segments are
    excluded, so a center start through the unit sphere yields the radius
    1.0, not the diameter."""
    grid = SphericalGrid(shape=(10, 10, 10))
    gs = GridSpec.from_grid(grid, ftype=jnp.float64)
    xs = jnp.asarray([[0.0, 0.0, 0.0]], F64)
    rays = jnp.asarray([[0.0, 1.0, 0.0]], F64)
    _, lens, _ = trace_crossings(gs, xs, rays)
    assert np.isclose(float(lens.sum()), 1.0, atol=1e-2)


def test_miss_zero_length():
    grid = SphericalGrid(shape=(5, 5, 5))
    gs = GridSpec.from_grid(grid, ftype=jnp.float64)
    xs = jnp.asarray([[-5.0, 3.0, 0.0]], F64)
    rays = jnp.asarray([[1.0, 0, 0]], F64)
    _, lens, _ = trace_crossings(gs, xs, rays)
    assert float(lens.sum()) == 0.0


def test_pack_linear_bounds():
    grid = SphericalGrid(shape=(4, 5, 6))
    gs = GridSpec.from_grid(grid)
    regs = jnp.array([[[-2, 0, 3, 9]], [[0, 4, -1, 2]], [[5, 5, 0, -2]]])
    lin = np.asarray(pack_linear(regs, gs))
    assert (lin >= 0).all() and (lin < 4 * 5 * 6).all()
    # in-range triplet packs exactly
    assert lin[0, 2] == (3 * 5 + 0) * 6 + 0


def test_f32_chord_accuracy():
    """f32 tracing keeps the chord invariant within 1e-2 (the reference's
    own tolerance at f64, test_raytracer.py:48-52)."""
    grid = SphericalGrid(shape=(25, 25, 25))
    gs = GridSpec.from_grid(grid, ftype=jnp.float32)
    xs = jnp.asarray([[-3.0, 1e-5, 1e-5]], jnp.float32)
    rays = jnp.asarray([[1.0, 0, 0]], jnp.float32)
    _, lens, _ = trace_crossings(gs, xs, rays)
    assert np.isclose(float(lens.sum()), 2.0, atol=1e-2)


def test_ranked_trace_matches_sorted():
    """The sort-free ranked trace produces the same (voxel, length) pairs
    as the sorted pipeline (order-independent comparison via voxel-level
    accumulation), across grids including partial + log + full-azimuth."""
    from sph_raytracer_tpu.ops.trace import trace_crossings_ranked

    rng = np.random.default_rng(11)
    grids = [
        SphericalGrid(shape=(8, 8, 8)),
        SphericalGrid(shape=(6, 7, 8), size_r=(0.1, 2.0), spacing="log"),
        SphericalGrid(
            r_b=np.linspace(0, 1, 7),
            e_b=np.linspace(0.3, 2.8, 7),
            a_b=np.linspace(-2.0, 2.5, 9),
        ),
        SphericalGrid(shape=(1, 2, 1), size_r=(0, 25)),
    ]
    for grid in grids:
        gs = GridSpec.from_grid(grid, ftype=jnp.float64)
        n = 40
        xs = rng.normal(size=(n, 3)) * 3
        xs[np.linalg.norm(xs, axis=1) < 1.2] += 2.0
        dirs = rng.normal(size=(n, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        xs_j = jnp.asarray(xs)
        d_j = jnp.asarray(dirs)
        regs_a, lens_a, _ = trace_crossings(gs, xs_j, d_j)
        regs_b, lens_b, _ = trace_crossings_ranked(gs, xs_j, d_j)

        def vol_of(regs, lens):
            regs, lens = np.asarray(regs), np.asarray(lens)
            out = np.zeros((n, *grid.vshape))
            keep = lens > 0
            ridx = np.broadcast_to(np.arange(n)[:, None], lens.shape)
            np.add.at(
                out,
                (ridx[keep], regs[0][keep], regs[1][keep], regs[2][keep]),
                lens[keep],
            )
            return out

        va, vb = vol_of(regs_a, lens_a), vol_of(regs_b, lens_b)
        assert np.allclose(va, vb, atol=1e-8), (
            tuple(grid.shape), np.abs(va - vb).max())


def test_ranked_trace_interior_start():
    """Interior starts integrate the forward half-line only, matching the
    sorted pipeline (see test_start_inside_grid for the divergence from
    the reference's behind-path-into-start-voxel fill)."""
    from sph_raytracer_tpu.ops.trace import trace_crossings_ranked

    grid = SphericalGrid(shape=(10, 10, 10))
    gs = GridSpec.from_grid(grid, ftype=jnp.float64)
    _, lens, _ = trace_crossings_ranked(
        gs, jnp.asarray([[0.0, 0.0, 0.0]], jnp.float64),
        jnp.asarray([[0.0, 1.0, 0.0]], jnp.float64))
    assert np.isclose(float(lens.sum()), 1.0, atol=1e-2)
