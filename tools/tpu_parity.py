#!/usr/bin/env python
"""On-device parity: routed Pallas kernels (real TPU Mosaic compile) vs the
XLA precomputed operator.  The CPU test suite exercises the same math in
interpret mode; this catches Mosaic-specific lowering differences
(roll/gather semantics) on actual hardware."""
import os
import sys

if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid

    assert jax.default_backend() == "tpu", jax.default_backend()
    grid = SphericalGrid(shape=(16, 16, 16))
    geom = sum(
        ConeRectGeom((24, 24), pos=(2 * np.cos(t), 2 * np.sin(t), 0.4),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 4, endpoint=False)
    )
    op_a = Operator(grid, geom, mode="precomputed")
    op_r = Operator(grid, geom, mode="routed")
    assert op_r._routed is not None
    x = jnp.asarray(np.random.default_rng(0).random(tuple(grid.shape)),
                    jnp.float32)
    ya, yr = np.asarray(op_a(x)), np.asarray(op_r(x))
    d1 = np.abs(ya - yr).max()
    print(f"fwd  max|routed - xla| = {d1:.3e}")
    y = op_a(x)
    ga = jax.grad(lambda d: jnp.mean((op_a(d) - y) ** 2))(x)
    gr = jax.grad(lambda d: jnp.mean((op_r(d) - y) ** 2))(x)
    d2 = np.abs(np.asarray(ga) - np.asarray(gr)).max()
    print(f"grad max|routed - xla| = {d2:.3e}")
    ba, br = np.asarray(op_a.T(y)), np.asarray(op_r.T(y))
    d3 = np.abs(ba - br).max()
    print(f"adj  max|routed - xla| = {d3:.3e}")
    assert d1 < 1e-3 and d2 < 1e-5 and d3 < 1e-2, (d1, d2, d3)
    print("TPU parity OK")


if __name__ == "__main__":
    main()
