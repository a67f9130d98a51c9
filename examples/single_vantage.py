#!/usr/bin/env python3
"""Forward raytracing from a single vantage point.

TPU-native analog of reference examples/single_vantage.py:10-44 — same
nested-shell volume and detector, but device selection is automatic (runs
on TPU when present, CPU otherwise; the reference hardcodes 'cuda').
"""
import matplotlib

matplotlib.use("Agg")
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid

# spherical grid and a rectilinear detector with 45° FOV aimed at origin
grid = SphericalGrid(shape=(50, 50, 50))
geom = ConeRectGeom(shape=(256, 256), pos=(5, 0, 0), fov=(45, 45))

op = Operator(grid, geom)

# static test volume with two nested shells
x = np.zeros(tuple(grid.shape), np.float32)
x[-1, :, :] += 1
x[-10, :, :] += 1

result = op(jnp.asarray(x))

# ----- Plotting -----
plt.close("all")
fig = plt.figure()
ax1 = fig.add_subplot(1, 2, 1)
ax2 = fig.add_subplot(1, 2, 2, projection="3d")

ax1.set_title("Nested Shells")
ax1.imshow(np.asarray(result))

ax2.set_title("View Geometry")
ani = op.plot(ax=ax2)

fig.savefig("single_vantage.png", dpi=80)
print("saved single_vantage.png")
