#!/usr/bin/env python
"""Dense-by-window FORWARD layout study (round 4): for each config,
compute from the real trace

  * classic by-tile rows (the current fwd table stream) and band count
    (its per-band DMA issues);
  * dense by-window rows (slot t = ray tile; superchunk = (window, rep))
    — the layout the dense BWD already uses, now proposed for the fwd;
  * the overflow split: capping per-(window, tile) reps at RP and
    sending the remainder to classic chunks — rows and DMA issues of
    the hybrid, as a function of RP.

Usage: tools/densew_study.py [config ...]
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def study(name, B=64):
    from tools.scalebench import CONFIGS

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.ops.route import _round_up
    from sph_raytracer_tpu.ops.trace import voxel_order_lin

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
    G = 4096
    V = int(np.prod(vshape))
    H = _round_up(max(1, -(-V // 128)), 8)
    lin = voxel_order_lin(np.asarray(lin), vshape, "r")
    lens = np.asarray(lens)
    keep = lens > 0
    ray, _ = np.nonzero(keep)
    v = lin[keep].astype(np.int64)
    tile = ray // G
    row = v // 128
    win = row // 8
    T = int(tile.max()) + 1
    NW = H // 8
    ncr = len(v)

    # reps per (tile, win): max over the 8 rows of ceil(rowcount/128)
    rkey = (tile * NW + win) * 8 + (row % 8)
    urow, rc = np.unique(rkey, return_counts=True)
    need = -(-rc // 128)
    pairkey = urow // 8
    upair = np.unique(pairkey)
    rep = np.zeros(int(upair.max()) + 1, np.int64)
    np.maximum.at(rep, pairkey, need)
    reps = rep[upair]                       # per live (tile,win) pair
    pw = upair % NW                         # window of each pair
    bands = int(reps.sum())

    # classic by-tile: group pairs per tile, pad band count to B
    pt = upair // NW
    cnt_t = np.bincount(pt, weights=reps, minlength=T)
    classic_rows = int((-(-cnt_t // B) * B).sum()) * 8
    print(f"{name:14s} classic: bands={bands} (DMA issues/pass) "
          f"rows={classic_rows} fill={ncr / (classic_rows * 128):.2f}")

    # dense by-window: superchunks per window = max_tile reps
    repmax_w = np.zeros(NW, np.int64)
    np.maximum.at(repmax_w, pw, reps)
    ncb_dense = int(repmax_w.sum())
    dense_rows = ncb_dense * T * 8
    print(f"{name:14s} densew:  NCB={ncb_dense} (DMA ~{ncb_dense * 7}) "
          f"rows={dense_rows} ({dense_rows / max(classic_rows, 1):.2f}x "
          f"classic) fill={ncr / (dense_rows * 128):.2f}")

    # hybrid: reps capped at RP in the dense part, remainder classic
    for RP in (1, 2, 3, 4):
        dn = np.minimum(reps, RP)
        ov = reps - dn
        repmax_c = np.zeros(NW, np.int64)
        np.maximum.at(repmax_c, pw, dn)
        ncb_d = int(repmax_c.sum())
        drows = ncb_d * T * 8
        ov_bands = int(ov.sum())
        ov_t = np.bincount(pt, weights=ov, minlength=T)
        orows = int((-(-ov_t // B) * B).sum()) * 8
        tot = drows + orows
        issues = ncb_d * 7 + ov_bands + (orows // (8 * B)) * 7
        print(f"    cap RP={RP}: dense NCB={ncb_d} overflow bands="
              f"{ov_bands} rows={tot} ({tot / max(classic_rows, 1):.2f}x)"
              f" DMA~{issues}")


if __name__ == "__main__":
    names = sys.argv[1:] or ["flagship", "vol100", "config5_shard"]
    for nm in names:
        study(nm)
