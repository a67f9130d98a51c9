#!/usr/bin/env python3
"""Tomographic retrieval of a static volume from a 50-view orbit.

TPU-native analog of reference examples/static_retrieval.py:17-90: same
two-shell phantom, 50 circular-detector orbit, SquareLoss+NegRegularizer
retrieval — driven by the optax-based ``gd`` with a compiled scan loop.
"""
import os

import matplotlib

matplotlib.use("Agg")
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from sph_raytracer_tpu import ConeCircGeom, Operator, SphericalGrid
from sph_raytracer_tpu.loss import NegRegularizer, SquareLoss
from sph_raytracer_tpu.models import FullyDenseModel
from sph_raytracer_tpu.plotting import image_stack, preview3d
from sph_raytracer_tpu.retrieval import gd

# SPH_TPU_EXAMPLE_* shrink the config so CI can exec this script end to
# end (tests/test_examples.py); unset, it runs the full reference-scale
# problem (reference examples/static_retrieval.py:17-38)
N = int(os.environ.get("SPH_TPU_EXAMPLE_GRID", 50))      # volume N^3
NVIEW = int(os.environ.get("SPH_TPU_EXAMPLE_VIEWS", 50))  # orbit vantages
ITERS = int(os.environ.get("SPH_TPU_EXAMPLE_ITERS", 100))
PREV = int(os.environ.get("SPH_TPU_EXAMPLE_PREVIEW", 256))

# ----- Setup -----
grid = SphericalGrid(shape=(N, N, N))

# two-shell phantom
x = np.zeros(tuple(grid.shape), np.float32)
x[:, N // 2:, :N // 2] = 1
x[:, :N // 2, N // 2:] = 1
x = jnp.asarray(x)

# circular orbit of circular detectors aimed at origin
geoms = sum(
    ConeCircGeom(shape=(2 * N, N),
                 pos=(5 * np.cos(th), 5 * np.sin(th), 1),
                 fov=(0, 45))
    for th in np.linspace(0, 2 * np.pi, NVIEW)
)

op = Operator(grid, geoms)
meas = op(x)

# ----- Retrieval -----
m = FullyDenseModel(grid)
loss_fns = [1 * SquareLoss(), 1 * NegRegularizer()]
coeffs, reproj, losses = gd(op, meas, m, lr=1e-1, loss_fns=loss_fns,
                            num_iterations=ITERS)

# ----- Plotting -----
plt.close("all")
print("plotting...")
fig1 = plt.figure(figsize=(8, 4))
ax1 = fig1.add_subplot(1, 2, 1)
ax2 = fig1.add_subplot(1, 2, 2)

ax1.set_title("Truth")
ani1 = image_stack(preview3d(x, grid, shape=(PREV, PREV)), ax=ax1,
                   colorbar=True)
ax2.set_title("Retrieved")
ani2 = image_stack(preview3d(coeffs, grid, shape=(PREV, PREV)), ax=ax2,
                   colorbar=True)
ani2.event_source = ani1.event_source
ani1.save("static_retrieval1.gif", extra_anim=[ani2])

fig2 = plt.figure(figsize=(8, 4))
ax3 = fig2.add_subplot(1, 2, 1, polar=True)
ax4 = fig2.add_subplot(1, 2, 2, projection="3d")
ax3.set_title("Measurements")
ani3 = image_stack(np.asarray(meas), geoms, ax=ax3, colorbar=True)
ax4.set_title("View Geometry")
ani4 = op.plot(ax=ax4)
ani4.save("static_retrieval2.gif", fps=30, extra_anim=[ani3])
print("saved static_retrieval[12].gif")
