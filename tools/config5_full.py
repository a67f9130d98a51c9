#!/usr/bin/env python
"""Full BASELINE config #5 — 100³ volume, 200 views × (100,200) = 4M
rays, ~550M live crossings — fwd+bwd on ONE chip (VERDICT r3 item 2).

The full routed table set (~27 GB even at bf16) exceeds v5e HBM, so a
resident single-chip routed build is impossible (that is why config #5
is a pod workload).  This tool demonstrates the STREAMED single-chip
pass enabled by round 4's fused-fwd + routed-bwd hybrid: rays are
processed in view shards; each shard's BACKWARD banded tables are
device-routed on the fly (bwd_only — no forward tables ever exist),
used for one fwd+bwd, and freed.  Peak HBM stays O(shard tables)
≈ 1-2 GB; the fused forward is O(tile) with zero tables.

Per shard it reports fwd time (in-kernel fused Pallas, streamed-window
sweep), bwd time (banded kernel), build time, and an adjoint dot-check
<Ax, y> vs <x, A'y> through the two different engines.

Usage: tools/config5_full.py [n_shards] [--quick]   (--quick = 2 shards)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TIMING", "1")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VOL = (100, 100, 100)
NVIEW, DET = 200, (100, 200)


def main():
    import jax
    import jax.numpy as jnp

    from sph_raytracer_tpu import (
        ConeRectGeom,
        Operator,
        SphericalGrid,
        TraceConfig,
    )
    from sph_raytracer_tpu.utils.profiling import fetch_sync

    quick = "--quick" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_shards = int(args[0]) if args else 16
    views_per = -(-NVIEW // n_shards)
    run_shards = 2 if quick else n_shards

    grid = SphericalGrid(shape=VOL)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(VOL), jnp.float32)
    angles = np.linspace(0, 2 * np.pi, NVIEW, endpoint=False)

    cfg = TraceConfig(mode="fused", fused_bwd="routed",
                      routed_g=4096, routed_kd=2, routed_bands=64,
                      routed_w_dtype="bf16")
    dD = jnp.zeros((int(np.prod(VOL)),), jnp.float32)
    tot_fwd = tot_bwd = tot_build = 0.0
    nrays_done = 0
    t_all = time.time()
    for s in range(run_shards):
        vlo, vhi = s * views_per, min((s + 1) * views_per, NVIEW)
        geom = sum(
            ConeRectGeom(DET, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                         fov=(45, 45))
            for t in angles[vlo:vhi])
        t0 = time.time()
        op = Operator(grid, geom, config=cfg)
        assert op._fused_btd is not None, "hybrid bwd tables missing"
        build = time.time() - t0
        nrays = int(np.prod(geom.shape))

        t0 = time.time()
        y = op(x)
        fetch_sync(y)
        fwd = time.time() - t0

        yf = jnp.asarray(
            rng.random(nrays).astype(np.float32)).reshape(y.shape)
        t0 = time.time()
        bp = op.T(yf)
        fetch_sync(bp)
        bwd = time.time() - t0
        dD = dD + bp.reshape(-1)

        # adjoint identity across the two engines (fused fwd vs banded
        # adjoint): <Ax, y> == <x, A'y> within bf16 weight rounding
        lhs = float(jnp.vdot(y, yf))
        rhs = float(jnp.vdot(x.reshape(-1), bp.reshape(-1)))
        rel = abs(lhs - rhs) / max(abs(lhs), 1e-9)
        tot_fwd += fwd
        tot_bwd += bwd
        tot_build += build
        nrays_done += nrays
        print(f"[config5] shard {s}: {nrays} rays build {build:.1f}s "
              f"fwd {fwd:.2f}s bwd {bwd:.3f}s adjoint rel-err {rel:.2e}",
              file=sys.stderr, flush=True)
        assert rel < 5e-3, rel
        del op, y, bp

    wall = time.time() - t_all
    # warm extrapolation from the LAST shard (the first pays the
    # one-time kernel/router compiles, which persist in the compile
    # cache and are not a per-pass cost)
    warm = build + fwd + bwd
    print(f"[config5] {nrays_done} rays in {run_shards} shards: "
          f"fwd {tot_fwd:.1f}s bwd {tot_bwd:.2f}s build {tot_build:.1f}s "
          f"wall {wall:.1f}s (warm extrapolation ×{n_shards}: "
          f"~{warm * n_shards:.0f}s/full-pass)", file=sys.stderr)
    print('{"metric": "config5 full 4M-ray fwd+bwd single-chip", '
          f'"rays": {nrays_done}, "fwd_s": {tot_fwd:.2f}, '
          f'"bwd_s": {tot_bwd:.3f}, "build_s": {tot_build:.1f}, '
          f'"wall_s": {wall:.1f}, "shards_run": {run_shards}, '
          f'"warm_full_pass_s": {warm * n_shards:.0f}}}')


if __name__ == "__main__":
    main()
