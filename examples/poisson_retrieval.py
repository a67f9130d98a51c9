#!/usr/bin/env python3
"""Photon-counting retrieval: Poisson noise, ML-EM / OS-EM solver.

The reference's application domain is UV-photometer exosphere tomography
(reference README.md:3-12), where detectors count photons and the noise
is Poisson — but it ships only Gaussian-type losses and a first-order
Adam driver (reference loss.py:87-124, retrieval.py:24-127).  This
example simulates counts at a realistic sensitivity, then reconstructs
with the multiplicative ML-EM solver (and its ordered-subsets
acceleration), comparing against the Gaussian-model CGNR solver on the
same data.
"""
import matplotlib

matplotlib.use("Agg")
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.solve import cg, mlem, sart_preconditioner

# ----- Setup: smooth positive phantom, 12-view orbit -----
grid = SphericalGrid(shape=(16, 16, 16), size_r=(0.5, 4.0))
r = np.asarray(grid.r)[:, None, None]
e = np.asarray(grid.e)[None, :, None]
truth = jnp.asarray(
    (1.0 + 0.5 * np.sin(2 * e)) * np.exp(-(r - 1.5) ** 2) + 0.05,
    jnp.float32,
) * jnp.ones(tuple(grid.shape), jnp.float32)

geom = sum(
    ConeRectGeom((24, 24), pos=(8 * np.cos(t), 8 * np.sin(t), 2 * np.sin(2 * t)),
                 fov=(35, 35))
    for t in np.linspace(0, 2 * np.pi, 12, endpoint=False)
)
op = Operator(grid, geom)

# ----- Simulate photon counts -----
SCALE = 500.0  # expected counts per unit column density (sensitivity × exposure)
rate = SCALE * np.asarray(op(truth), np.float64)
counts = np.random.default_rng(0).poisson(rate).astype(np.float64)
print(f"mean counts/pixel: {counts.mean():.1f}")

# ----- ML-EM (the physically matched solver) -----
x_em, reproj_em, info_em = mlem(op, counts, num_iterations=30, scale=SCALE,
                                subsets=3)

# ----- Gaussian-model CGNR on the same counts, for comparison -----
y_gauss = jnp.asarray(counts / SCALE, jnp.float32)
x_cg, _, _ = cg(op, y_gauss, num_iterations=30, damp=1e-3,
                precond=sart_preconditioner(op))

s = np.asarray(info_em["sensitivity"])
seen = s > 0.05 * s.max()
t_np = np.asarray(truth)
for name, x in [("ML-EM", x_em), ("CGNR", x_cg)]:
    err = np.abs(np.asarray(x) - t_np)[seen].mean() / t_np[seen].mean()
    print(f"{name} relative volume error: {err:.3f}")

# ----- Plot a mid-elevation slice -----
fig, axs = plt.subplots(1, 3, figsize=(10, 3.2))
for ax, (title, vol) in zip(
    axs, [("Truth", t_np), ("ML-EM", np.asarray(x_em)),
          ("CGNR", np.asarray(x_cg))]):
    im = ax.imshow(vol[:, 8, :], vmin=0, vmax=t_np.max())
    ax.set_title(title)
    ax.set_xlabel("azimuth bin")
axs[0].set_ylabel("radial bin")
fig.colorbar(im, ax=axs, shrink=0.85)
fig.savefig("poisson_retrieval.png", dpi=110)
print("OK")
