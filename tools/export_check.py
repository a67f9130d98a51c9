#!/usr/bin/env python
"""On-device check of the AOT serving export (utils/export.py).

Exports the routed-engine forward + grad-step programs on the current
backend (TPU: Mosaic custom calls serialize through jax.export for
same-platform serving), reloads them, and compares against the live
Operator.  Run on the real chip; CPU works too (XLA precomputed mode).
"""
import os
import sys
import tempfile

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.utils.export import export_operator, load_exported

    grid = SphericalGrid(shape=(24, 24, 24))
    geom = ConeRectGeom((32, 48), (2.0, 0.4, 0.3), fov=(45, 45))
    op = Operator(grid, geom, mode="auto", ftype=jnp.float32)
    print(f"[export_check] backend={jax.default_backend()} mode={op._mode}",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    y = op(x)

    with tempfile.TemporaryDirectory() as d:
        pf = os.path.join(d, "fwd.zip")
        export_operator(op, pf, what="forward")
        served = load_exported(pf)
        df = np.abs(np.asarray(served(x)) - np.asarray(y)).max()
        print(f"[export_check] forward roundtrip maxerr {df:.3e} "
              f"({os.path.getsize(pf)/1e6:.1f} MB archive)", file=sys.stderr)
        assert df < 1e-5

        pg = os.path.join(d, "step.zip")
        export_operator(op, pg, what="grad_step", loss_y=y)
        servedg = load_exported(pg)
        g_ref = jax.grad(lambda v: jnp.mean((op(v) - y) ** 2))(x)
        dg = np.abs(np.asarray(servedg(x, y)) - np.asarray(g_ref)).max()
        print(f"[export_check] grad-step roundtrip maxerr {dg:.3e}",
              file=sys.stderr)
        assert dg < 1e-5
    print("[export_check] OK", file=sys.stderr)


if __name__ == "__main__":
    main()
