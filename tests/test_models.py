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
