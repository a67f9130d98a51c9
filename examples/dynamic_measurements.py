#!/usr/bin/env python3
"""Tomographic measurements of a time-varying (4D) volume.

TPU-native analog of reference examples/dynamic_measurements.py:17-80:
20-time-bin dynamic grid, one view per time bin, forward projection and
animated plots.
"""
import os

import matplotlib

matplotlib.use("Agg")
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from sph_raytracer_tpu import ConeCircGeom, Operator, SphericalGrid
from sph_raytracer_tpu.plotting import image_stack, preview3d

# SPH_TPU_EXAMPLE_* shrink the config so CI can exec this script end to
# end (tests/test_examples.py); unset, it runs the full reference-scale
# problem (reference examples/dynamic_measurements.py:17-38)
N = int(os.environ.get("SPH_TPU_EXAMPLE_GRID", 50))    # volume N^3
T = int(os.environ.get("SPH_TPU_EXAMPLE_TBINS", 20))   # time bins
PREV = int(os.environ.get("SPH_TPU_EXAMPLE_PREVIEW", 256))

# ----- Setup -----
grid = SphericalGrid(shape=(T, N, N, N))

# two static shells + a moving elevation element
x = np.zeros(tuple(grid.shape), np.float32)
x[:, :, N // 2:, :N // 2] = 1
x[:, :, :N // 2, N // 2:] = 1
for time in range(grid.shape.t):
    x[time, :, min(time * 2, N - 1), :] += 1
x = jnp.asarray(x)

# one orbit vantage per time bin
geoms = sum(
    ConeCircGeom(shape=(2 * N, N),
                 pos=(5 * np.cos(th), 5 * np.sin(th), 1),
                 fov=(0, 45))
    for th in np.linspace(0, 2 * np.pi, grid.shape.t)
)

op = Operator(grid, geoms)
meas = op(x)

# ----- Plotting -----
plt.close("all")
print("plotting...")
fig = plt.figure(figsize=(12, 4))
ax1 = fig.add_subplot(1, 3, 1)
ax2 = fig.add_subplot(1, 3, 2, projection="3d")
ax3 = fig.add_subplot(1, 3, 3, polar=True)

ani1 = image_stack(preview3d(np.asarray(x), grid, azim=-45, orbit=False,
                             shape=(PREV, PREV)),
                   ax=ax1)
ax1.set_title("Dynamic Volume Preview")
ax2.set_title("View Geometry")
ani2 = op.plot(ax=ax2)
ani3 = image_stack(np.asarray(meas), geom=geoms, ax=ax3)
ax3.set_title("Measurements")

ani3.event_source = ani2.event_source = ani1.event_source
ani1.save("dynamic.gif", fps=15, extra_anim=[ani2, ani3])
print("saved dynamic.gif")

# ----- Beyond parity: views at arbitrary times -----
# The reference binds exactly one view to each time bin (nearest-bin
# lookup, raytracer.py:705-710).  `view_times=` decouples the two: here
# 2x-oversampled vantages observe the same volume, each seeing it
# linearly interpolated between its bracketing time bins.
V = 2 * grid.shape.t
geoms_ct = sum(
    ConeCircGeom(shape=(2 * N, N),
                 pos=(5 * np.cos(th), 5 * np.sin(th), 1),
                 fov=(0, 45))
    for th in np.linspace(0, 2 * np.pi, V)
)
times = np.linspace(float(grid.t[0]), float(grid.t[-1]), V)
op_ct = Operator(grid, geoms_ct, view_times=times)
meas_ct = op_ct(x)
print(f"continuous-time measurements: {meas_ct.shape} "
      f"({V} views over {grid.shape.t} time bins)")
