#!/usr/bin/env python
"""Round-5 study: feasibility stats for the PLACEMENT REDUCE — the one
lever the round-4 "rows law" left alive for the 100^3 forward (VERDICT
r4 next-round #1).

Current banded-forward reduce (ops/routed_project.py::reduce_body): for
every output bucket h < HI it masks + row-sums the whole (SRB, L) chunk
-> per-chunk work ~ HI * rows, which is what re-pays the -14% row win of
G=8192 (HI doubles).  The candidate redesign places each pass-k run
total DIRECTLY at its (h % 8, lane) position inside its 8-row band with
ONE sublane-gather per multiplicity level j (take_along_axis(axis=0)
within 8 rows — hardware-supported, see CLAUDE.md Mosaic notes), then
accumulates bands into y with OCT = HI/8 octave-masked adds:

    per pass k:  Rk = take_along_axis(acc, src[k], 1)      (existing)
                 for j < KV: placed_j = tga0(Rk, plc8[k,j]) (new table)
                 y[oct*8:(oct+1)*8] += select(oct8 == oct, sum_j placed_j)

so per-chunk work ~ rows * (KV + OCT/4) instead of rows * HI.  KV = max
contributions per (band, h, lane) per pass = runs of one ray inside one
band — THIS script measures its distribution (plus fill/row scaling at
G = 4096/8192/16384) from real routed tables to decide build vs reject.

Usage:  python tools/reduce_stats.py [vol100|config5_shard|flagship]
(CPU; run under a scrubbed environment — see tests/conftest.py)
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CONFIGS = {
    "flagship": ((50, 50, 50), 50, (50, 100)),
    "vol100": ((100, 100, 100), 50, (50, 100)),
    "config5_shard": ((100, 100, 100), 13, (100, 200)),
}


def band_stats(rt8, name):
    """KV distribution: contributions per (band, h, dest-lane, pass)."""
    NC, SR, KD, HI = rt8.NC, rt8.SR, rt8.KD, rt8.HI
    assert SR == 8, "band-level stats need SR=8 routing"
    hik = rt8.hik.reshape(KD, NC, SR, 128)
    live_rows = (rt8.w.reshape(NC, SR, 128) > 0).any(axis=2).sum()
    kv_hist = np.zeros(10, np.int64)
    kv_per_band = np.zeros(NC, np.int64)
    # vectorized: for each (k, band, lane), count rows with each h value
    for k in range(KD):
        hv = hik[k]  # (NC, 8, 128)
        # bincount over (band, lane, h) triples
        live = hv >= 0
        b_idx, r_idx, l_idx = np.nonzero(live)
        h_val = hv[b_idx, r_idx, l_idx]
        key = (b_idx.astype(np.int64) * 128 + l_idx) * HI + h_val
        ukey, counts = np.unique(key, return_counts=True)
        cc = np.minimum(counts, 9)
        kv_hist += np.bincount(cc, minlength=10)
        # per-band max multiplicity (same unique serves both uses)
        band_of = (ukey // HI) // 128
        np.maximum.at(kv_per_band, band_of, counts)
    n_pairs = kv_hist.sum()
    print(f"[{name}] G={rt8.G} KD={KD} HI={HI}: bands(NC)={NC} "
          f"live rows={live_rows} slots rows={NC * SR} "
          f"fill={rt8.n_live / (NC * SR * 128):.3f}")
    print(f"  (band,h,lane) contribution multiplicity histogram "
          f"(KV): {dict((i, int(c)) for i, c in enumerate(kv_hist) if c)}")
    print(f"  KV=1 fraction {kv_hist[1] / max(1, n_pairs):.4f}; "
          f"per-band max-KV histogram: "
          f"{dict((int(v), int(c)) for v, c in zip(*np.unique(kv_per_band, return_counts=True)))}")
    # predicted per-chunk reduce op-units (x rows x 128 lanes):
    # old: HI * (kd_eff selects + add) ~ 2*HI per pass-equivalent;
    # new: per pass (1 src gather + KV*(gather+mask+add)) + 2*OCT/8
    kd_eff = 1 + (rt8.kmax > 0).mean()
    kv_typ = np.quantile(kv_per_band, 0.95)
    old = 2.0 * HI * kd_eff
    new = kd_eff * (1 + 3 * kv_typ) + 2 * (HI // 8)
    print(f"  kd_eff~{kd_eff:.2f} KV95={kv_typ:.0f} -> reduce op-units "
          f"old~{old:.0f} new~{new:.0f} ({old / new:.1f}x less)")
    return dict(NC=NC, fill=rt8.n_live / (NC * SR * 128), kv95=kv_typ)


def main():
    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.ops.route import build_routed_tables
    from sph_raytracer_tpu.ops.trace import voxel_order_lin

    name = sys.argv[1] if len(sys.argv) > 1 else "vol100"
    vshape, nviews, det = CONFIGS[name]
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
    print(f"[trace] {time.time() - t0:.1f}s  R={lin.shape[0]} "
          f"M={lin.shape[1]}", flush=True)
    lin = voxel_order_lin(lin, grid.vshape, "r")
    V = int(np.prod(grid.vshape))
    for G in (4096, 8192, 16384):
        t0 = time.time()
        rt8 = build_routed_tables(lin, lens, V, G=G, SR=8,
                                  KD=2, use_native=G <= 4096)
        print(f"[router] G={G} {time.time() - t0:.1f}s", flush=True)
        band_stats(rt8, name)


if __name__ == "__main__":
    main()
