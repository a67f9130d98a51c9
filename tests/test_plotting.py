"""Plotting smoke tests (reference test_plotting.py:9-37 equivalents),
run under the Agg backend."""
import matplotlib

matplotlib.use("Agg")

import jax.numpy as jnp
import numpy as np
import pytest

from sph_raytracer_tpu import (
    ConeCircGeom,
    ConeRectGeom,
    Operator,
    SphericalGrid,
)
from sph_raytracer_tpu.plotting import (
    color_negative,
    image_stack,
    preview3d,
    sph2cart,
)
from sph_raytracer_tpu.utils.debug import debug_trace


def test_preview3d_shapes():
    grid = SphericalGrid(shape=(6, 6, 8))
    vol = np.random.default_rng(0).random(tuple(grid.shape))
    out = preview3d(vol, grid, shape=(12, 12), ftype=jnp.float64)
    assert out.shape == (8, 12, 12)
    # RGB channels
    rgb = np.stack([vol] * 3, axis=-1)
    out = preview3d(rgb, grid, shape=(12, 12), ftype=jnp.float64)
    assert out.shape == (8, 12, 12, 3)


def test_preview3d_dynamic():
    grid = SphericalGrid(shape=(3, 6, 6, 8))
    vol = np.random.default_rng(0).random(tuple(grid.shape))
    out = preview3d(vol, grid, shape=(10, 10), ftype=jnp.float64)
    assert out.shape == (3, 10, 10)


def test_image_stack_single_and_animated(tmp_path):
    grid = SphericalGrid(shape=(5, 5, 5))
    geom = ConeRectGeom((6, 6), pos=(2.0, 0.1, 0.2))
    img = np.asarray(Operator(grid, geom)(jnp.ones((5, 5, 5))))
    fig = image_stack(img, geom, colorbar=True)
    assert fig is not None

    stack = np.stack([img, img * 2, img * 3])
    ani = image_stack(stack, geom)
    ani.save(tmp_path / "t.gif", writer="pillow", fps=5)


def test_image_stack_polar():
    geom = ConeCircGeom((4, 8), pos=(0, 0.1, 3.0), fov=(5, 30))
    img = np.random.default_rng(0).random((4, 8))
    fig = image_stack(img, geom)
    assert fig.axes[0].name == "polar"


def test_image_stack_bad_shape():
    with pytest.raises(ValueError):
        image_stack(np.zeros((2, 3, 4, 5)))


def test_color_negative():
    x = np.array([[1.0, -2.0], [0.0, 3.0]])
    rgb = color_negative(x)
    assert rgb.shape == (2, 2, 3)
    assert rgb[0, 1, 1] == 2.0 and rgb[0, 1, 0] == 0.0
    assert (rgb[..., 2] == 0).all()


def test_sph2cart_numpy():
    pts = sph2cart(np.array([[1.0, np.pi / 2, 0.0]]))
    assert np.allclose(pts, [[1.0, 0.0, 0.0]], atol=1e-12)


def test_geometry_plots():
    grid = SphericalGrid(shape=(4, 4, 4))
    geoms = [
        ConeRectGeom((4, 4), pos=(2.0, 0.1, 0.2)),
        ConeCircGeom((4, 4), pos=(0, 0.1, 3.0), fov=(5, 30)),
    ]
    grid.plot()
    for g in geoms:
        g.plot()
    col = sum(geoms)
    col.plot()
    op = Operator(grid, geoms[0])
    op.plot()


def test_debug_trace(capsys):
    grid = SphericalGrid(shape=(4, 4, 4))
    op = Operator(grid, ConeRectGeom((3, 3), pos=(2.0, 0.1, 0.2)))
    regs, lens, ts = debug_trace(op)
    assert regs.shape[0] == 3
    out = capsys.readouterr().out
    assert "contributing segments" in out
