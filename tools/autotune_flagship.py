#!/usr/bin/env python
"""Run the routed-layout autotuner on the flagship benchmark geometry.

Measures DEFAULT_CANDIDATES on the attached device and persists the
winner to the tune JSON sidecar (beside the trace cache), which bench.py
then picks up via ``autotune(cached_only=True)``.
"""
import os
import sys

if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TIMING", "1")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from sph_raytracer_tpu import ConeRectGeom, SphericalGrid, autotune

    grid = SphericalGrid(shape=(50, 50, 50))
    geom = sum(
        ConeRectGeom((50, 100), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 50, endpoint=False)
    )
    cfg = autotune(grid, geom, verbose=True)
    print(f"[autotune] winner: B={cfg.routed_bands} "
          f"SRb={cfg.routed_band_rows}")


if __name__ == "__main__":
    main()
