"""Model framework tests (reference test_model.py:7-15 equivalents)."""
import jax.numpy as jnp
import numpy as np

from sph_raytracer_tpu import SphericalGrid
from sph_raytracer_tpu.models import (
    AxisAlignmentModel,
    CubesModel,
    FullyDenseModel,
)


def test_models_emit_grid_shaped_volumes():
    grid = SphericalGrid(shape=(10, 12, 14))
    for cls in (FullyDenseModel, CubesModel, AxisAlignmentModel):
        m = cls(grid)
        coeffs = jnp.ones(m.coeffs_shape)
        vol = m(coeffs)
        assert tuple(vol.shape) == tuple(grid.shape), cls.__name__


def test_fully_dense_identity():
    grid = SphericalGrid(shape=(4, 4, 4))
    m = FullyDenseModel(grid)
    c = jnp.arange(4 * 4 * 4, dtype=jnp.float32).reshape(4, 4, 4)
    assert (np.asarray(m(c)) == np.asarray(c)).all()


def test_cubes_phantom_nonempty():
    grid = SphericalGrid(shape=(12, 10, 10))
    m = CubesModel(grid)
    v = np.asarray(m(None))
    assert v.sum() > 0
    assert set(np.unique(v)) <= {0.0, 1.0}
    # boxes sit in the stored slab bounds
    assert v[: m.r0].sum() == 0 and v[m.r1:].sum() == 0


def test_axis_model_markers():
    grid = SphericalGrid(shape=(9, 8, 8))
    v = np.asarray(AxisAlignmentModel(grid)(None))
    assert (v[:, 0, :] == 1).all()          # Z polar cap
    assert v[: 9 // 3, 4, 0].all()          # X bar
    assert v[: 9 // 2, 4, 6].all()          # Y bar


def test_repr():
    grid = SphericalGrid(shape=(4, 4, 4))
    assert "FullyDenseModel" in repr(FullyDenseModel(grid))


# ---------------------------------------------------------------------------
# SphHarmModel (TPU-first model family; no reference analog)

def test_sph_harm_basis_orthonormal():
    """integral(Y_i Y_j sin e de da) == delta_ij on a fine midpoint grid."""
    from sph_raytracer_tpu.models import real_sph_harm_basis

    ne, na, lmax = 400, 800, 3
    e = (np.arange(ne) + 0.5) * np.pi / ne
    a = -np.pi + (np.arange(na) + 0.5) * 2 * np.pi / na
    Y = real_sph_harm_basis(lmax, e, a)  # (K, Ne, Na)
    w = np.sin(e)[:, None] * (np.pi / ne) * (2 * np.pi / na)
    G = np.einsum("iea,jea,ea->ij", Y, Y, np.broadcast_to(w, Y.shape[1:]))
    assert np.allclose(G, np.eye((lmax + 1) ** 2), atol=1e-3), \
        np.abs(G - np.eye((lmax + 1) ** 2)).max()


def test_sph_harm_model_l0_is_uniform():
    from sph_raytracer_tpu.models import SphHarmModel

    grid = SphericalGrid(shape=(6, 8, 10))
    m = SphHarmModel(grid, lmax=0)
    assert m.coeffs_shape == (1, 6)
    c = jnp.ones(m.coeffs_shape)
    vol = np.asarray(m(c))
    assert vol.shape == tuple(grid.shape)
    assert np.allclose(vol, 1 / np.sqrt(4 * np.pi), atol=1e-6)


def test_sph_harm_model_fit_roundtrip():
    """fit() recovers the coefficients of a model-generated volume."""
    from sph_raytracer_tpu.models import SphHarmModel

    grid = SphericalGrid(shape=(5, 12, 16))
    m = SphHarmModel(grid, lmax=3, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    c0 = jnp.asarray(rng.standard_normal(m.coeffs_shape))
    vol = m(c0)
    c1 = m.fit(vol)
    assert np.allclose(np.asarray(c1), np.asarray(c0), atol=1e-8), \
        np.abs(np.asarray(c1) - np.asarray(c0)).max()


def test_sph_harm_model_dynamic_grid():
    from sph_raytracer_tpu.models import SphHarmModel

    grid = SphericalGrid(shape=(4, 5, 6, 8), size_t=(0, 3))
    m = SphHarmModel(grid, lmax=1)
    assert m.coeffs_shape == (4, 4, 5)
    vol = m(jnp.ones(m.coeffs_shape))
    assert vol.shape == tuple(grid.shape)


def test_sph_harm_retrieval_converges():
    """gd() with SphHarmModel drives SquareLoss down on a bandlimited
    truth (the model's intended use: conditioned low-dim retrievals)."""
    import jax

    from sph_raytracer_tpu import ConeRectGeom, Operator
    from sph_raytracer_tpu.loss import SquareLoss
    from sph_raytracer_tpu.models import SphHarmModel
    from sph_raytracer_tpu.retrieval import gd

    grid = SphericalGrid(shape=(6, 8, 10), size_r=(1, 5))
    geom = sum(
        ConeRectGeom((8, 8), (8 * np.cos(t), 8 * np.sin(t), 1), fov=(40, 40))
        for t in np.linspace(0, 2 * np.pi, 4, endpoint=False)
    )
    op = Operator(grid, geom, ftype=jnp.float32)
    m = SphHarmModel(grid, lmax=1)
    rng = np.random.default_rng(1)
    truth = jnp.asarray(0.1 * rng.standard_normal(m.coeffs_shape) + 0.5,
                        jnp.float32)
    meas = op(m(truth))
    coeffs, reproj, losses = gd(op, meas, m, num_iterations=60, lr=0.05)
    hist = losses[next(iter(losses))]
    assert hist[-1] < 0.05 * hist[0], (hist[0], hist[-1])
