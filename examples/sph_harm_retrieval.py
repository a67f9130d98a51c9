#!/usr/bin/env python3
"""Bandlimited (spherical-harmonic) retrieval — a TPU-first model family.

No reference analog: instead of retrieving every voxel
(examples/static_retrieval.py), parameterize the volume as lmax-bandlimited
angular structure with free radial profiles (the standard regularization in
exosphere tomography, the reference's application domain).  The coefficient
space shrinks from Nr*Ne*Na to (lmax+1)^2 * Nr, so the retrieval is
better-conditioned and each step is one extra MXU matmul.
"""
import matplotlib

matplotlib.use("Agg")
import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.loss import SquareLoss
from sph_raytracer_tpu.models import SphHarmModel
from sph_raytracer_tpu.retrieval import gd

# ----- Setup -----
grid = SphericalGrid(shape=(24, 24, 24), size_r=(1, 8))
model = SphHarmModel(grid, lmax=3)

# ground truth: a bandlimited volume the model can represent exactly
rng = np.random.default_rng(0)
truth_coeffs = jnp.asarray(
    0.2 * rng.standard_normal(model.coeffs_shape) + 1.0, jnp.float32)
truth = model(truth_coeffs)

geoms = sum(
    ConeRectGeom((24, 24), pos=(16 * np.cos(t), 16 * np.sin(t), 3),
                 fov=(35, 35))
    for t in np.linspace(0, 2 * np.pi, 12, endpoint=False)
)
op = Operator(grid, geoms)
meas = op(truth)

# ----- Retrieval -----
coeffs, reproj, losses = gd(op, meas, model, lr=5e-2,
                            loss_fns=[SquareLoss()], num_iterations=200)

vol = model(coeffs)
rel = float(jnp.linalg.norm(vol - truth) / jnp.linalg.norm(truth))
print(f"relative volume error: {rel:.4f}")

# ----- Plotting -----
fig, axs = plt.subplots(1, 3, figsize=(12, 4))
mid = tuple(grid.shape)[-3] // 2
axs[0].imshow(np.asarray(truth)[mid])
axs[0].set_title("truth (r slice)")
axs[1].imshow(np.asarray(vol)[mid])
axs[1].set_title("retrieved")
hist = losses[next(iter(losses))]
axs[2].semilogy(hist)
axs[2].set_title("SquareLoss")
fig.savefig("sph_harm_retrieval.png", dpi=90)
print("saved sph_harm_retrieval.png")
