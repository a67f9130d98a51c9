#!/usr/bin/env python
"""Round-5 study: RAY-ORDER LOCALITY for the 100^3 forward.

The rows law (PERFORMANCE.md round 4) says banded-kernel time ~ table
rows; the 100^3 falloff tracks crossings/ray because fill is capped by
crossings per (tile, density-row) under the DETECTOR-MAJOR ray order: a
G=4096 tile is ~41 full-width detector rows of one view, whose rays
spread over many (e,a) cells.  This script measures whether a STRUCTURED
ray permutation — 2-D detector patches, optionally interleaved across
consecutive views — concentrates each tile's crossings into fewer
density rows (higher fill -> fewer rows -> faster kernels).

Structured matters: a patch permutation is a reshape+transpose, so the
production path could apply it (and its inverse on y / dy) as free XLA
transposes — no element gathers anywhere (the 100x-off-roofline trap).

Usage: python tools/rayorder_stats.py [vol100|config5_shard|flagship]
Host-side only (numpy router); self-scrubs the device tunnel.
"""
import os
import sys

_SCRUB = ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
          "AXON_POOL_SVC_OVERRIDE", "AXON_LOOPBACK_RELAY")
if any(os.environ.get(k) for k in _SCRUB) and \
        os.environ.get("_SPH_RAYORDER_REEXEC") != "1":
    env = dict(os.environ)
    for k in _SCRUB:
        env.pop(k, None)
    pyp = [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
           if p and "axon_site" not in p]
    env["PYTHONPATH"] = os.pathsep.join(pyp) if pyp else ""
    env["JAX_PLATFORMS"] = "cpu"
    env["_SPH_RAYORDER_REEXEC"] = "1"
    os.execve(sys.executable, [sys.executable, *sys.argv], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

CONFIGS = {
    "flagship": ((50, 50, 50), 50, (50, 100)),
    "vol100": ((100, 100, 100), 50, (50, 100)),
    "config5_shard": ((100, 100, 100), 13, (100, 200)),
}


def patch_perm(nviews, dr, dc, pr, pc, nv=1):
    """Ray permutation: per-view detector patches of (pr, pc) pixels,
    patch-major; with nv>1, the same patch index of nv consecutive views
    is emitted together (view-interleaved patches).

    Pure reshape+transpose — invertible by the transpose of the inverse
    axis order (free on device).
    """
    assert dr % pr == 0 and dc % pc == 0 and nviews % nv == 0
    idx = np.arange(nviews * dr * dc).reshape(
        nviews // nv, nv, dr // pr, pr, dc // pc, pc)
    # -> (view-group, patch-row, patch-col, view-in-group, pr, pc)
    return idx.transpose(0, 2, 4, 1, 3, 5).reshape(-1)


def stats(rt8, label):
    NC, SR = rt8.NC, rt8.SR
    live = (np.asarray(rt8.w).reshape(NC * SR, 128) > 0)
    live_rows = int(live.any(axis=1).sum())
    rows = NC * SR
    fill = rt8.n_live / (rows * 128)
    kmax = np.asarray(rt8.kmax)
    sdf = np.asarray(rt8.sdf)
    print(f"  {label:28s} NC={NC:7d} rows={rows:8d} live={live_rows:8d} "
          f"fill={fill:.3f} kmax-mean={kmax.mean():.2f} "
          f"sdf-mean={sdf.mean():.2f}", flush=True)
    return rows


def main():
    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.ops.route import build_routed_tables
    from sph_raytracer_tpu.ops.trace import voxel_order_lin

    name = sys.argv[1] if len(sys.argv) > 1 else "vol100"
    vshape, nviews, det = CONFIGS[name]
    dr, dc = det
    grid = SphericalGrid(shape=vshape)
    geom = sum(
        ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
    )
    t0 = time.time()
    op = Operator(grid, geom, mode="precomputed")
    lin = np.asarray(op.lin)
    lens = np.asarray(op.lens, np.float32)
    print(f"[trace] {time.time() - t0:.1f}s R={lin.shape[0]} "
          f"M={lin.shape[1]}", flush=True)
    lin = voxel_order_lin(lin, grid.vshape, "r")
    V = int(np.prod(grid.vshape))

    # candidate (pr, pc, nv) patch layouts (must divide det / nviews)
    cands = [("identity", None)]
    seen = set()
    for pr, pc, nv in [(dr, dc, 1),          # whole view (sanity: = id)
                       (dr // 2, dc // 2, 1),
                       (dr // 5, dc // 5, 1),
                       (dr // 5, dc // 4, 1),
                       (dr // 2, dc // 2, 2),
                       (dr // 5, dc // 5, 5),
                       (dr // 10, dc // 10, 5),
                       (dr, dc, 5)]:
        if nviews % nv:  # nv must divide the view count
            nv = 1
        if (pr, pc, nv) in seen or dr % pr or dc % pc:
            continue
        seen.add((pr, pc, nv))
        cands.append((f"patch{pr}x{pc}nv{nv}",
                      patch_perm(nviews, dr, dc, pr, pc, nv)))

    for G in (4096, 2048):
        print(f"[G={G} KD=2 SR=8 vo=r]", flush=True)
        base = None
        for label, perm in cands:
            li = lin if perm is None else lin[perm]
            le = lens if perm is None else lens[perm]
            t0 = time.time()
            rt8 = build_routed_tables(li, le, V, G=G, SR=8, KD=2)
            rows = stats(rt8, f"{label} ({time.time() - t0:.0f}s)")
            if base is None:
                base = rows
            else:
                print(f"    -> rows vs identity: {rows / base:.3f}x",
                      flush=True)


if __name__ == "__main__":
    main()
