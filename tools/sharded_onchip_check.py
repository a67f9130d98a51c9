#!/usr/bin/env python
"""Run the pod code path (ShardedOperator: shard_map + banded Pallas +
psum) on the real TPU chip with a 1-device mesh and check it against the
single-device Operator.

The CPU-mesh tests (tests/test_sharded.py) validate the sharding logic on
8 virtual devices; this tool validates that the same shard_map program
compiles and runs on actual TPU hardware, and measures its steady-state
step time so the shard_map wrapper's overhead vs the plain operator is a
known quantity.

Usage:
    python tools/sharded_onchip_check.py              # small correctness run
    python tools/sharded_onchip_check.py --flagship   # 50^3/250k-ray timing
"""
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def fetch_sync(x):
    return np.asarray(x.ravel()[:4])


def slope_time(f, args, n1=2, n2=6):
    def run(n):
        o = None
        for _ in range(n):
            o = f(*args)
        fetch_sync(o)
    run(1)
    t0 = time.time(); run(n1); T1 = time.time() - t0
    t0 = time.time(); run(n2); T2 = time.time() - t0
    return max(0.0, (T2 - T1) / (n2 - n1))


def main():
    import jax
    import jax.numpy as jnp

    import sph_raytracer_tpu as srt
    from sph_raytracer_tpu.parallel import ShardedOperator, make_mesh

    flagship = "--flagship" in sys.argv
    if flagship:
        grid = srt.SphericalGrid(shape=(50, 50, 50))
        positions = [(2 * np.cos(t), 2 * np.sin(t), 0.3)
                     for t in np.linspace(0, 2 * np.pi, 50, endpoint=False)]
        geom = sum(srt.ConeRectGeom((50, 100), pos, fov=(45, 45))
                   for pos in positions)
    else:
        grid = srt.SphericalGrid(shape=(24, 24, 24))
        positions = [(4 * np.cos(t), 4 * np.sin(t), 0.3)
                     for t in np.linspace(0, 2 * np.pi, 8, endpoint=False)]
        geom = sum(srt.ConeRectGeom((20, 40), pos, fov=(30, 30))
                   for pos in positions)
    nrays = int(np.prod(geom.shape))
    print(f"[check] devices={jax.devices()} rays={nrays}", file=sys.stderr)

    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)

    t0 = time.time()
    # routed_build='host': the sharded build below routes on the host,
    # and the bit-identity claim needs both sides consuming the SAME
    # trace (the default device build traces on-chip with the ranked
    # method — f32 rounding/order differ from the host trace).
    # routed_dense='off': the sharded build uses the classic pointer-
    # banded layout; the dense-slot default would change summation order.
    op = srt.Operator(grid, geom,
                      config=srt.TraceConfig(mode="routed",
                                             routed_build="host",
                                             routed_dense="off"))
    img_ref = np.asarray(op(vol))
    y = jnp.asarray(img_ref + 0.1)
    print(f"[check] single-device setup {time.time() - t0:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    # routed_dense='off' pinned on BOTH sides (sharded 'auto' already
    # resolves classic, but the pin documents that the bit-identity
    # premise requires it — the single-device side's 'auto' picks the
    # dense backward, which sums in a different slot order).
    # routed_build='host' likewise: since round 2 the sharded build also
    # routes on the accelerator by default, and its on-chip ranked trace
    # rounds f32 differently from the reference's host trace — the
    # bit-identity claim is about the KERNELS/collectives, so both sides
    # must consume the same trace.
    sop = ShardedOperator(grid, geom, mesh=make_mesh(1),
                          config=srt.TraceConfig(mode="routed",
                                                 routed_build="host",
                                                 routed_dense="off"))
    img = np.asarray(sop(vol))
    print(f"[check] sharded setup {time.time() - t0:.1f}s", file=sys.stderr)
    dfwd = float(np.abs(img - img_ref).max())
    print(f"fwd max abs diff: {dfwd}")

    spl, pl = sop.payload, op.payload

    def loss_sh(d, p):
        return ((sop.with_payload(p)(d) - y) ** 2).sum()

    def loss_1d(d, p):
        return ((op.with_payload(p)(d) - y) ** 2).sum()

    g = np.asarray(jax.jit(jax.grad(loss_sh))(vol, spl))
    g_ref = np.asarray(jax.jit(jax.grad(loss_1d))(vol, pl))
    dgrad = float(np.abs(g - g_ref).max() / max(1e-30, np.abs(g_ref).max()))
    print(f"grad max rel diff: {dgrad}")
    assert dfwd == 0.0 and dgrad == 0.0, "sharded path diverged on chip"

    # steady-state step comparison, scan-chained like bench.py / gd()
    K = 10

    def chunk_of(opx, plx):
        def one(d, _):
            fx = opx.with_payload(plx)
            gg = jax.grad(lambda v: jnp.mean((fx(v) - y) ** 2))(d)
            return d - 1e-3 * gg, ()
        return jax.lax.scan(one, vol, None, length=K)[0]

    step_sh = jax.jit(lambda d, p: jax.lax.scan(
        lambda c, _: (c - 1e-3 * jax.grad(
            lambda v: jnp.mean((sop.with_payload(p)(v) - y) ** 2))(c), ()),
        d, None, length=K)[0])
    step_1d = jax.jit(lambda d, p: jax.lax.scan(
        lambda c, _: (c - 1e-3 * jax.grad(
            lambda v: jnp.mean((op.with_payload(p)(v) - y) ** 2))(c), ()),
        d, None, length=K)[0])
    t0 = time.time(); fetch_sync(step_sh(vol, spl))
    print(f"[check] sharded compile+first {time.time() - t0:.1f}s",
          file=sys.stderr)
    t0 = time.time(); fetch_sync(step_1d(vol, pl))
    print(f"[check] single compile+first {time.time() - t0:.1f}s",
          file=sys.stderr)
    dt_sh = slope_time(step_sh, (vol, spl)) / K
    dt_1d = slope_time(step_1d, (vol, pl)) / K
    print(f"step (scan x{K}): sharded(1-dev mesh) {dt_sh * 1e3:.2f} ms, "
          f"plain {dt_1d * 1e3:.2f} ms "
          f"({nrays / dt_sh / 1e6:.1f} vs {nrays / dt_1d / 1e6:.1f} M rays/s)")
    print("OK: ShardedOperator routed fwd+grad+step ran on", jax.devices())


if __name__ == "__main__":
    main()
