#!/usr/bin/env python
"""Host-side study: how ray→tile assignment shapes the banded engine's
live-band count (the per-band DMA issues that are 71% of the 100³
forward, PERFORMANCE.md round-3 stage split).

For each candidate detector patch tiling (pa, pb), reorder rays so a
tile of G rays covers a compact (pa, pb) detector patch instead of the
current row-major strip, then count, from the REAL crossing trace:

  * live (tile, window) pairs  — lower bound on band count (= band DMAs)
  * capacity reps              — ceil(max row occupancy / 128) per pair
  * projected table rows       — live bands × 8 (the kernels' stream)

Usage: tools/locality_study.py [config] [patch_a,patch_b ...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def band_stats(lin, lens, n_rays, perm, G, H, vshape, order="r"):
    """(live_bands, cap_bands, rows_classic_fill) under ray order perm."""
    from sph_raytracer_tpu.ops.trace import voxel_order_lin

    lin = voxel_order_lin(np.asarray(lin), vshape, order)
    lens = np.asarray(lens)
    keep = lens > 0
    ray, _ = np.nonzero(keep)
    inv = np.empty(n_rays, np.int64)
    inv[perm] = np.arange(n_rays)
    ray = inv[ray]  # new ray id after permutation
    v = lin[keep].astype(np.int64)
    tile = ray // G
    row = v // 128
    win = row // 8
    key = tile * (H // 8 + 1) + win
    # live (tile, window) pairs
    upair = np.unique(key)
    live = len(upair)
    # capacity reps: per (tile, win, row) count -> per pair max over rows
    rkey = key * 8 + (row % 8)
    urow, rc = np.unique(rkey, return_counts=True)
    need = -(-rc // 128)  # ceil(count/128) reps forced by this row
    repmax = np.zeros(upair.max() + 1, np.int64)
    np.maximum.at(repmax, urow // 8, need)
    cap = int(repmax[upair].sum())
    return live, cap, int(v.shape[0])


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "vol100"
    from tools.scalebench import CONFIGS

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.ops.route import _round_up

    vshape, nviews, det = CONFIGS[name]
    grid = SphericalGrid(shape=vshape)
    geom = sum(
        ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
    )
    op = Operator(grid, geom, _compute=False)
    lin, lens, n, _ = op._traced_tables(device=False)
    lin, lens = lin[:n], lens[:n]
    n_rays = int(np.prod(geom.shape))
    G = 4096
    H = _round_up(max(1, -(-int(np.prod(vshape)) // 128)), 8)
    A, Bc = det

    cands = [("strip(current)", None)]
    if len(sys.argv) > 2:
        pats = [tuple(map(int, a.split(","))) for a in sys.argv[2:]]
    else:
        pats = [(pa, pb) for pa in (10, 20, 25, 50, 100)
                for pb in (10, 20, 25, 40, 50, 80, 100, 200)
                if A % pa == 0 and Bc % pb == 0
                and G // 2 <= pa * pb <= 2 * G]
    for pa, pb in pats:
        idx = np.arange(nviews * A * Bc).reshape(
            nviews, A // pa, pa, Bc // pb, pb)
        perm = idx.transpose(0, 1, 3, 2, 4).reshape(-1)
        cands.append((f"patch {pa}x{pb}", perm))

    for label, perm in cands:
        if perm is None:
            perm = np.arange(n_rays)
        live, cap, ncr = band_stats(lin, lens, n_rays, perm, G, H, vshape)
        print(f"{name:14s} {label:16s} live(tile,win)={live:7d} "
              f"cap_bands={cap:7d} rows={cap * 8:8d} "
              f"fill={ncr / (cap * 8 * 128):.2f}")


if __name__ == "__main__":
    main()
