#!/usr/bin/env python3
"""Multi-chip scaled retrieval (BASELINE.json config #5).

Shards the ray axis of a large orbit across every available device
(ICI within a slice; run under a multi-host launcher with
``parallel.distributed_init()`` for pods).  Without TPUs, emulate a mesh
with::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_scaling.py
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from sph_raytracer_tpu import ConeRectGeom, SphericalGrid
from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh

# scaled config: 100^3 volume, 20 views of 100x200 rays (trimmed from the
# 200-view flagship so the demo runs quickly; scale freely — CI shrinks
# further via SPH_TPU_EXAMPLE_* (tests/test_examples.py))
N = int(os.environ.get("SPH_TPU_EXAMPLE_GRID", 100))
NVIEW = int(os.environ.get("SPH_TPU_EXAMPLE_VIEWS", 20))
grid = SphericalGrid(shape=(N, N, N))
views = sum(
    ConeRectGeom((N, 2 * N), pos=(3 * np.cos(t), 3 * np.sin(t), 0.4),
                 fov=(45, 45))
    for t in np.linspace(0, 2 * np.pi, NVIEW, endpoint=False)
)

mesh = make_mesh()
print(f"mesh: {mesh.devices.size} devices over axis 'rays'")

op = ShardedOperator(grid, views, mesh=mesh, mode="fused")
x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                jnp.float32)
y = op(x)

# one full gradient step: forward + backward with psum'd volume gradient
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
print(f"fwd+bwd {dt * 1e3:.1f} ms/iter, {nrays / dt:,.0f} rays/s "
      f"on {mesh.devices.size} devices")
