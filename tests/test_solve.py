"""Matrix-free CGNR solver (sph_raytracer_tpu/solve.py).

Oracle: a dense matrix built by applying the operator to voxel basis
vectors, solved with numpy on the same damped normal equations.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.models import SphHarmModel
from sph_raytracer_tpu.solve import cg, mlem, sart_preconditioner


@pytest.fixture(scope="module")
def small():
    grid = SphericalGrid(shape=(4, 4, 4))
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(50, 50))
        for t in np.linspace(0, 2 * np.pi, 5, endpoint=False)
    )
    op = Operator(grid, geom, ftype=jnp.float64)
    truth = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)))
    return grid, op, truth, op(truth)


def dense_matrix(op, grid):
    n = int(np.prod(grid.shape))
    basis = jnp.eye(n, dtype=jnp.float64).reshape(
        (n,) + tuple(grid.shape))
    cols = jax.vmap(op)(basis)  # (n, *proj_shape) — leading-dim batching
    return np.asarray(cols.reshape(n, -1)).T  # (m, n)


def test_cg_matches_dense_solve(small):
    grid, op, truth, y = small
    damp = 1e-3
    A = dense_matrix(op, grid)
    b = np.asarray(y, np.float64).ravel()
    n = A.shape[1]
    x_ref = np.linalg.solve(A.T @ A + damp * np.eye(n), A.T @ b)

    x, reproj, info = cg(op, y, x0=jnp.zeros(tuple(grid.shape),
                                             jnp.float64),
                         num_iterations=300, damp=damp, tol=1e-12)
    assert np.allclose(np.asarray(x).ravel(), x_ref, atol=1e-6)
    assert reproj.shape == y.shape
    # residual history is monotone-ish and shrinks by orders of magnitude
    assert info["rnorm"][-1] < 1e-8 * info["rnorm"][0]


def test_cg_recovers_consistent_solution(small):
    grid, op, truth, y = small
    x, reproj, info = cg(op, y, num_iterations=200, damp=0.0)
    # the system is underdetermined in the unseen voxels; the *projection*
    # must match the measurements
    assert np.allclose(np.asarray(reproj), np.asarray(y), atol=1e-5)


def test_cg_projection_mask(small):
    grid, op, truth, y = small
    mask = np.zeros(y.shape, np.float64)
    mask[::2] = 1.0  # keep alternate views only
    damp = 1e-3
    A = dense_matrix(op, grid) * mask.reshape(-1, 1)
    b = (np.asarray(y, np.float64) * mask).ravel()
    n = A.shape[1]
    x_ref = np.linalg.solve(A.T @ A + damp * np.eye(n), A.T @ b)

    x, _, _ = cg(op, y, x0=jnp.zeros(tuple(grid.shape), jnp.float64),
                 num_iterations=300, damp=damp, projection_mask=mask)
    assert np.allclose(np.asarray(x).ravel(), x_ref, atol=1e-6)


def test_cg_sphharm_coeff_space(small):
    grid, op, truth, y = small
    model = SphHarmModel(grid, lmax=1, dtype=jnp.float64)
    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=model.coeffs_shape))
    ym = op(model(ct))
    x, reproj, info = cg(op, ym, model=model, num_iterations=200,
                         damp=1e-9)
    # coeff-space system is tiny (K*Nr unknowns) and well determined here
    assert np.allclose(np.asarray(reproj), np.asarray(ym), atol=1e-6)


def test_cg_sart_preconditioner(small):
    grid, op, truth, y = small
    damp = 1e-3
    A = dense_matrix(op, grid)
    b = np.asarray(y, np.float64).ravel()
    n = A.shape[1]
    x_ref = np.linalg.solve(A.T @ A + damp * np.eye(n), A.T @ b)

    pre = sart_preconditioner(op)
    # the diagonal is a positive grid-shaped array matching Aᵀ(A·1)
    d_ref = np.abs(A.T @ (A @ np.ones(n)))
    d = np.asarray(pre).ravel()
    touched = d_ref > 1e-6 * d_ref.max()
    assert np.allclose(d[touched], d_ref[touched], rtol=1e-5)
    assert (d > 0).all()

    x, _, info = cg(op, y, x0=jnp.zeros(tuple(grid.shape), jnp.float64),
                    num_iterations=300, damp=damp, precond=pre)
    assert np.allclose(np.asarray(x).ravel(), x_ref, atol=1e-6)

    # preconditioning must not slow convergence to a fixed tolerance
    _, _, info_plain = cg(op, y, num_iterations=300, damp=damp,
                          tol=1e-8, chunk=10)
    _, _, info_pre = cg(op, y, num_iterations=300, damp=damp,
                        tol=1e-8, chunk=10, precond=pre)
    assert info_pre["iterations"] <= info_plain["iterations"] + 5


def test_cg_sart_preconditioner_model_space(small):
    grid, op, truth, y = small
    model = SphHarmModel(grid, lmax=1, dtype=jnp.float64)
    ct = jnp.asarray(
        np.random.default_rng(1).normal(size=model.coeffs_shape))
    ym = op(model(ct))
    pre = sart_preconditioner(op, model=model)
    x, reproj, info = cg(op, ym, model=model, num_iterations=200,
                         damp=1e-9, precond=pre)
    assert np.allclose(np.asarray(reproj), np.asarray(ym), atol=1e-6)


def test_cg_tol_freeze(small):
    grid, op, truth, y = small
    x, _, info = cg(op, y, num_iterations=400, damp=1e-3, tol=1e-10,
                    chunk=25)
    # the freeze must have triggered well before the iteration budget
    assert info["iterations"] < 400
    assert len(info["rnorm"]) <= 400
    # frozen iterations don't change the iterate: rerun longer, same x
    x2, _, _ = cg(op, y, num_iterations=info["iterations"] + 60,
                  damp=1e-3, tol=1e-10, chunk=25)
    assert np.allclose(np.asarray(x), np.asarray(x2), atol=1e-7)


def test_mlem_fits_noiseless_counts(small):
    grid, op, truth, y = small
    # strictly positive truth -> strictly positive counts
    x, reproj, info = mlem(op, y, num_iterations=500)
    # EM monotonically decreases the Poisson NLL (Shepp & Vardi 1982)
    nll = info["nll"]
    assert (np.diff(nll) <= 1e-10 * np.abs(nll[:-1]).max() + 1e-12).all()
    # noiseless consistent data: the reprojection converges to y
    rel = np.abs(np.asarray(reproj) - np.asarray(y)) / np.asarray(y).max()
    assert rel.max() < 5e-3
    # nonnegativity by construction
    assert (np.asarray(x) >= 0).all()
    # untouched voxels are forced to zero
    s = np.asarray(info["sensitivity"])
    assert (np.asarray(x)[s <= 0] == 0).all()


def test_mlem_scale_invariance(small):
    grid, op, truth, y = small
    # scale converts line integrals to counts; solving the scaled problem
    # recovers the same volume
    x1, _, _ = mlem(op, y, num_iterations=100)
    x2, _, _ = mlem(op, 7.5 * np.asarray(y), num_iterations=100, scale=7.5)
    assert np.allclose(np.asarray(x1), np.asarray(x2), rtol=1e-5, atol=1e-8)


def test_mlem_projection_mask(small):
    grid, op, truth, y = small
    mask = np.zeros(y.shape, np.float64)
    mask[::2] = 1.0
    x, reproj, info = mlem(op, y, num_iterations=400,
                           projection_mask=mask)
    # kept rows are fit; dropped rows are unconstrained
    rel = (np.abs(np.asarray(reproj) - np.asarray(y)) * mask
           ) / np.asarray(y).max()
    assert rel.max() < 5e-3
    # sensitivity only counts kept rows
    s_ref = np.asarray(op.T(jnp.asarray(mask, jnp.float64)))
    assert np.allclose(np.asarray(info["sensitivity"]), s_ref, rtol=1e-6)


def test_osem_matches_mlem_solution():
    # OS-EM with K subsets converges to the same ML fixed point in
    # roughly K× fewer sweeps (Hudson & Larkin 1994).  Needs several
    # views per subset — single-view subsets limit-cycle (the known
    # too-many-subsets regime).
    grid = SphericalGrid(shape=(4, 4, 4))
    geom = sum(
        ConeRectGeom((5, 5), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(50, 50))
        for t in np.linspace(0, 2 * np.pi, 12, endpoint=False)
    )
    op = Operator(grid, geom, ftype=jnp.float64)
    truth = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)))
    y = op(truth)
    ymax = np.asarray(y).max()
    x1, reproj1, i1 = mlem(op, y, num_iterations=300)
    x3, reproj3, i3 = mlem(op, y, num_iterations=100, subsets=3)
    rel1 = np.abs(np.asarray(reproj1) - np.asarray(y)).max() / ymax
    rel3 = np.abs(np.asarray(reproj3) - np.asarray(y)).max() / ymax
    assert rel3 < 6e-3
    # 100 3-subset sweeps fit at least as well as 300 plain sweeps
    assert rel3 <= rel1 * 1.5
    # total sensitivity equals the full operator's Aᵀ1
    s_ref = np.asarray(op.T(jnp.ones(y.shape, jnp.float64)))
    assert np.allclose(np.asarray(i3["sensitivity"]), s_ref, rtol=1e-6)
    assert (np.asarray(x3) >= 0).all()


def test_osem_requires_collection(small):
    grid, op, truth, y = small
    single = ConeRectGeom((5, 5), pos=(2.0, 0, 0.4), fov=(50, 50))
    op1 = Operator(grid, single, ftype=jnp.float64)
    with pytest.raises(ValueError):
        mlem(op1, op1(truth), num_iterations=2, subsets=3)
