#!/usr/bin/env python
"""Scaling sweep: flagship-style step throughput across volume/detector
sizes on one chip.  Prints one line per config; run configs selectively
via argv (names below), default all.
"""
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TIMING", "1")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    # name: (vol_shape, n_views, det_shape)
    "flagship": ((50, 50, 50), 50, (50, 100)),
    "views2x": ((50, 50, 50), 100, (50, 100)),
    "vol64": ((64, 64, 64), 50, (50, 100)),
    "vol100": ((100, 100, 100), 50, (50, 100)),
    "det2x": ((50, 50, 50), 50, (100, 100)),
    # BASELINE.json config #5 is 100^3, 200 views, (100,200) det = 4M rays
    # sharded across a pod; one chip's shard is 200/16 ≈ 13 views.  The
    # per-step collective a real pod adds is a psum of the 4 MB volume
    # gradient — microseconds over ICI — so the per-chip shard throughput
    # IS the expected pod per-chip number.
    "config5_shard": ((100, 100, 100), 13, (100, 200)),
}


def run(name):
    import jax
    import jax.numpy as jnp

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.utils.profiling import time_fn

    vshape, nviews, det = CONFIGS[name]
    grid = SphericalGrid(shape=vshape)
    geom = sum(
        ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
    )
    nrays = int(np.prod(geom.shape))
    t0 = time.time()
    # pick up a previously swept layout (tools/density_sweep.py) if one
    # is cached for this config — never measure candidates here
    from sph_raytracer_tpu import TraceConfig, autotune

    cfg = autotune(grid, geom, config=TraceConfig(mode="auto"),
                   cached_only=True, verbose=True).replace(mode="auto")
    op = Operator(grid, geom, config=cfg, ftype=jnp.float32)
    setup = time.time() - t0
    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    y = op(density)
    np.asarray(y.ravel()[:4])
    step = jax.grad(lambda d: jnp.mean((op(d) - y) ** 2))
    t0 = time.time()
    np.asarray(step(density).ravel()[:4])
    compile_s = time.time() - t0
    dt = time_fn(step, density)
    dtf = time_fn(op, density)

    # the production training step (as retrieval.gd runs it): one jitted
    # lax.scan chunk with payload-threaded tables — no per-kernel relay
    # dispatch latency (~1-2 ms/dispatch) in the measurement
    K = 10
    payload = op.payload

    @jax.jit
    def step_chunk(d, pl):
        fx = op.with_payload(pl)

        def one(c, _):
            g = jax.grad(lambda v: jnp.mean((fx(v) - y) ** 2))(c)
            return c - 1e-3 * g, ()

        return jax.lax.scan(one, d, None, length=K)[0]

    np.asarray(step_chunk(density, payload).ravel()[:4])
    dts = time_fn(step_chunk, density, payload) / K
    print(f"[scale] {name:10s} vol={vshape} views={nviews} det={det} "
          f"rays={nrays/1e3:.0f}k | setup {setup:.0f}s compile "
          f"{compile_s:.0f}s | fwd {dtf*1e3:.2f} ms "
          f"({nrays/dtf/1e6:.1f}M rays/s) | step {dt*1e3:.2f} ms "
          f"({nrays/dt/1e6:.1f}M rays/s) | scan-step {dts*1e3:.2f} ms "
          f"({nrays/dts/1e6:.1f}M rays/s)", flush=True)


def main():
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        run(name)


if __name__ == "__main__":
    main()
