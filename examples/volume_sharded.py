#!/usr/bin/env python3
"""Volume-axis sharding: split the DENSITY (and routing tables) across
the mesh instead of the rays.

The ray axis (``examples/multichip_scaling.py``) divides work but
replicates tables per chip; the volume axis divides the TABLES — per-chip
table memory is the single-chip total / D, which is what lets
table-bound problems (BASELINE config #5 needs ~27 GB of banded tables
even at bf16) fit a small mesh.  Forward psums per-slab partial images;
the backward's density gradient emerges row-sharded with no collective.

Without TPUs, emulate a mesh with::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/volume_sharded.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_raytracer_tpu import ConeRectGeom, SphericalGrid, TraceConfig
from sph_raytracer_tpu.parallel import VolShardedOperator, make_mesh

N = int(os.environ.get("SPH_TPU_EXAMPLE_GRID", 48))
NVIEW = int(os.environ.get("SPH_TPU_EXAMPLE_VIEWS", 12))
grid = SphericalGrid(shape=(N, N, N))
views = sum(
    ConeRectGeom((N, N), pos=(3 * np.cos(t), 3 * np.sin(t), 0.4),
                 fov=(45, 45))
    for t in np.linspace(0, 2 * np.pi, NVIEW, endpoint=False)
)

mesh = make_mesh()
interp = jax.default_backend() != "tpu"
cfg = TraceConfig(interpret=interp,
                  routed_g=int(os.environ.get("SPH_TPU_EXAMPLE_G", 4096)),
                  routed_bands=8, routed_chunk_multiple=2)
op = VolShardedOperator(grid, views, mesh=mesh, config=cfg)
print(repr(op))

x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                jnp.float32)
y = op(x)

loss_grad = jax.jit(jax.value_and_grad(
    lambda d: jnp.mean((op(d) - y) ** 2)))
loss, g = loss_grad(x)
jax.block_until_ready(g)

t0 = time.time()
iters = 3
for _ in range(iters):
    loss, g = loss_grad(x)
jax.block_until_ready(g)
dt = (time.time() - t0) / iters
nrays = int(np.prod(views.shape))
print(f"fwd+bwd {dt * 1e3:.1f} ms/iter, {nrays / dt:,.0f} rays/s — "
      f"density rows and tables split over {mesh.devices.size} devices")
