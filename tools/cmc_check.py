#!/usr/bin/env python
"""Count actual BlockSpec pointer coincidence in band_pack tables: a
band DMA is pipeline-skipped when bp[k, b] == bp[k, b-1].  Reports the
non-skipped issue count before/after the column-major (CMC) layout.

Usage: tools/cmc_check.py [config ...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def issues(bp):
    """Non-coincident fetches across the superchunk axis (axis 1)."""
    return int(np.sum(bp[:, 1:] != bp[:, :-1])) + bp.shape[0]


def main():
    from tools.scalebench import CONFIGS

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.ops.route import band_pack, build_routed_tables
    from sph_raytracer_tpu.ops.trace import voxel_order_lin

    for name in sys.argv[1:] or ["flagship", "vol100"]:
        vshape, nviews, det = CONFIGS[name]
        grid = SphericalGrid(shape=vshape)
        geom = sum(
            ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                         fov=(45, 45))
            for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
        )
        op = Operator(grid, geom, _compute=False)
        lin, lens, n, _ = op._traced_tables(device=False)
        lin = voxel_order_lin(np.asarray(lin[:n]), vshape, "r")
        B = 64 if "100" in str(vshape[0]) else 32
        rt = build_routed_tables(lin, lens[:n], int(np.prod(vshape)),
                                 G=4096, SR=8, KD=2 if vshape[0] >= 100
                                 else 3)
        for by in ("tile", "window"):
            bt = band_pack(rt, B=B, by=by)
            tot = bt.B * bt.NCB
            print(f"{name:14s} by={by:6s} B={bt.B} NCB={bt.NCB} "
                  f"slots={tot} real-DMA-issues={issues(bt.bp)} "
                  f"({issues(bt.bp) / tot:.2f} of slots)")


if __name__ == "__main__":
    main()
