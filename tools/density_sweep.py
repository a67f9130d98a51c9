#!/usr/bin/env python
"""(G, KD, B) autotune sweep on the crossing-dense configs (VERDICT r1
item 5): vol100 and config5_shard fall ~2.7x below the flagship's
rays/s; this measures whether G/KD (reduce-collision capacity) or B
(superchunk size) is the lever, using the generalized autotuner.

Run on the TPU:  python tools/density_sweep.py [vol100 config5_shard]
Results also land in the autotune sidecar, so scalebench/bench pick the
winners up automatically via autotune(cached_only=True).
"""
import os
import sys

if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "vol100": ((100, 100, 100), 50, (50, 100)),
    "config5_shard": ((100, 100, 100), 13, (100, 200)),
    "det2x": ((50, 50, 50), 50, (100, 100)),
}

# targeted slice of tune.GRID_CANDIDATES: one axis at a time around the
# flagship optimum (G=4096, KD=3, B=32), plus the round-3 winners —
# B=64 (pointer-constant bwd dy slots at B >= T) and the r-inner voxel
# order (~12% fewer table bytes at 100^3); taller bands (SRb=16)
# measured a regression on every dense config and are not re-swept
CANDIDATES = [
    {"routed_g": 4096, "routed_kd": 3, "routed_bands": 32},   # baseline
    {"routed_g": 4096, "routed_kd": 3, "routed_bands": 64},
    {"routed_g": 4096, "routed_kd": 2, "routed_bands": 32},
    {"routed_g": 4096, "routed_kd": 2, "routed_bands": 64},
    {"routed_g": 4096, "routed_kd": 4, "routed_bands": 32},
    {"routed_g": 4096, "routed_kd": 2, "routed_bands": 64,
     "routed_voxel_order": "r"},                    # vol100/config5 winner
    {"routed_g": 4096, "routed_kd": 3, "routed_bands": 32,
     "routed_voxel_order": "r"},
    # round-4 queue: the scan-step-metric re-tune moved the flagship
    # optimum from B=32 to B=96 (pointer-constant dy slots once B >= T);
    # probe whether the dense configs follow (B=96/128 at the vol100
    # winner's KD=2, vo='r' context)
    {"routed_g": 4096, "routed_kd": 2, "routed_bands": 96,
     "routed_voxel_order": "r"},
    {"routed_g": 4096, "routed_kd": 2, "routed_bands": 128,
     "routed_voxel_order": "r"},
]


def main():
    import jax  # noqa: F401
    import jax.numpy as jnp  # noqa: F401

    from sph_raytracer_tpu import ConeRectGeom, SphericalGrid, autotune

    force = "--force" in sys.argv[1:]
    names = [a for a in sys.argv[1:] if a != "--force"] or list(CONFIGS)
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        sys.exit(f"unknown config(s) {unknown}; valid: {sorted(CONFIGS)} "
                 "(plus --force to re-measure past the sidecar)")
    for name in names:
        vshape, nviews, det = CONFIGS[name]
        grid = SphericalGrid(shape=vshape)
        geom = sum(
            ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                         fov=(45, 45))
            for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
        )
        nrays = int(np.prod(geom.shape))
        print(f"=== {name}: vol={vshape} views={nviews} det={det} "
              f"({nrays} rays) ===", flush=True)
        cfg = autotune(grid, geom, candidates=CANDIDATES, verbose=True,
                       force=force)
        print(f"[{name}] winner: G={cfg.routed_g} KD={cfg.routed_kd} "
              f"B={cfg.routed_bands}", flush=True)


if __name__ == "__main__":
    main()
