#!/usr/bin/env python
"""Benchmark: fwd+bwd raytracing throughput on the flagship config.

Config (BASELINE.json primary metric): 50³ static spherical volume,
50-vantage orbit of 50×100 cone-beam detectors = 250k rays; one training
step = forward projection + SquareLoss + gradient w.r.t. the volume.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the PyTorch reference on CPU measured on
this machine (4-core, torch 2.x, f64 precomputed mode — the reference's
only execution mode): 351,129 rays/s fwd+bwd (1.09M fwd-only, 14.9s
precompute).  Reproduce with the reference's Operator on the same config.
"""
import json
import os
import sys
import time

# make a host CPU backend available next to the TPU for the one-time
# crossing trace (XLA's variadic sort is ~15x slower on TPU than CPU)
if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"

import numpy as np

REF_CPU_RAYS_PER_S = 351129.0  # reference fwd+bwd, measured on this host


def main():
    import jax
    import jax.numpy as jnp

    from sph_raytracer_tpu import ConeRectGeom, SphericalGrid
    from sph_raytracer_tpu.operator import Operator

    grid = SphericalGrid(shape=(50, 50, 50))
    geom = sum(
        ConeRectGeom((50, 100), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 50, endpoint=False)
    )
    nrays = int(np.prod(geom.shape))
    print(f"[bench] devices={jax.devices()}", file=sys.stderr)

    t0 = time.time()
    op = Operator(grid, geom, mode="precomputed", ftype=jnp.float32)
    lin, lens = op.lin, op.lens
    jax.block_until_ready(lens)
    print(f"[bench] precompute {time.time() - t0:.2f}s "
          f"(tables {lin.nbytes / 1e9:.2f}+{lens.nbytes / 1e9:.2f} GB)",
          file=sys.stderr)

    from sph_raytracer_tpu.ops.project import project_table

    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    flat = density.reshape(-1)

    @jax.jit
    def fwd(flat, lin, lens):
        return project_table(flat, lin, lens)

    y = fwd(flat, lin, lens)

    @jax.jit
    def step(flat, y, lin, lens):
        def loss_fn(d):
            return jnp.mean((project_table(d, lin, lens) - y) ** 2)

        return jax.value_and_grad(loss_fn)(flat)

    # warmup / compile
    t0 = time.time()
    loss, g = step(flat, y, lin, lens)
    jax.block_until_ready(g)
    print(f"[bench] compile+first step {time.time() - t0:.2f}s "
          f"loss={float(loss):.3e}", file=sys.stderr)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        loss, g = step(flat, y, lin, lens)
    jax.block_until_ready(g)
    dt = (time.time() - t0) / iters
    rays_per_s = nrays / dt

    # forward-only, for the record
    t0 = time.time()
    for _ in range(iters):
        out = fwd(flat, lin, lens)
    jax.block_until_ready(out)
    dtf = (time.time() - t0) / iters
    print(f"[bench] fwd+bwd {dt * 1e3:.2f} ms/iter ({rays_per_s:,.0f} rays/s); "
          f"fwd-only {dtf * 1e3:.2f} ms/iter ({nrays / dtf:,.0f} rays/s)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "rays/s/chip fwd+bwd (50^3 vol, 50x(50,100) views)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REF_CPU_RAYS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
