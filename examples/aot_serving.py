#!/usr/bin/env python3
"""Ahead-of-time export for serving.

No reference analog (the reference has no deployment story; SURVEY §5).
A production service should not re-trace geometry or rebuild routing
tables at process start: export the compiled operator programs once,
then serve from the archive — no geometry code, no trace, no router on
the serving path.

Programs are portable across processes/machines of the same platform
(export on the platform you serve on).
"""
import os
import tempfile

import jax.numpy as jnp
import numpy as np

from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
from sph_raytracer_tpu.utils import export_operator, load_exported

grid = SphericalGrid(shape=(24, 24, 24))
geom = ConeRectGeom(shape=(32, 32), pos=(4, 0, 0), fov=(40, 40))

# ---- offline: build once, export the compiled programs ----------------
op = Operator(grid, geom)
outdir = tempfile.mkdtemp(prefix="sph_serving_")
fwd_path = os.path.join(outdir, "forward.zip")
grd_path = os.path.join(outdir, "grad_step.zip")

export_operator(op, fwd_path, what="forward")
y_example = op(jnp.ones(tuple(grid.shape), jnp.float32))
export_operator(op, grd_path, what="grad_step", loss_y=y_example)
print(f"exported: {fwd_path} ({os.path.getsize(fwd_path)/1e6:.1f} MB), "
      f"{grd_path}")

# ---- serving process: restore callables, no Operator construction -----
serve_fwd = load_exported(fwd_path)
serve_grad = load_exported(grd_path)

density = jnp.asarray(
    np.random.default_rng(0).random(tuple(grid.shape)), jnp.float32)
image = serve_fwd(density)
grad = serve_grad(density, image)

# the restored programs match the live operator exactly
assert np.allclose(np.asarray(image), np.asarray(op(density)), atol=1e-6)
print(f"served image {image.shape}, grad {grad.shape}: OK")
