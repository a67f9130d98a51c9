#!/usr/bin/env python
"""On-chip probe: window-major dense forward (+ RP-capped hybrid) vs
the classic by-tile banded forward, at a real config.

Builds tables on the HOST (one-off; the device builder is only ported
if this wins) and times per-call jitted kernels with fetch-synced slope
timing.  Usage: tools/wfwd_probe.py [config] [RP ...]
"""
import os
import sys
from functools import partial

if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from tools.scalebench import CONFIGS

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.ops.route import (
        band_pack,
        band_pack_dense,
        build_routed_tables,
        select_chunks,
        split_reps,
    )
    from sph_raytracer_tpu.ops.routed_project import (
        _fwd_banded_densew_pallas,
        _fwd_banded_pallas,
        banded_device_fwd,
        banded_device_wfwd,
    )
    from sph_raytracer_tpu.ops.trace import voxel_order_lin
    from sph_raytracer_tpu.utils.profiling import time_fn

    name = sys.argv[1] if len(sys.argv) > 1 else "vol100"
    rps = [int(a) for a in sys.argv[2:]] or [1, 2]
    vshape, nviews, det = CONFIGS[name]
    G = 4096
    KD = 2 if vshape[0] >= 100 else 3
    B = 64 if vshape[0] >= 100 else 32

    grid = SphericalGrid(shape=vshape)
    geom = sum(
        ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
    )
    op = Operator(grid, geom, _compute=False)
    lin, lens, n, _ = op._traced_tables(device=False)
    lin = voxel_order_lin(np.asarray(lin[:n]), vshape, "r")
    V = int(np.prod(vshape))
    rt = build_routed_tables(lin, np.asarray(lens[:n]), V, G=G, SR=8,
                             KD=KD)
    print(f"[probe] {name}: NC={rt.NC} T={rt.T} H={rt.H} "
          f"nlive={rt.n_live}", file=sys.stderr)
    rng = np.random.default_rng(0)
    d2 = jnp.asarray(rng.random((rt.H, 128)), jnp.float32)

    def run(label, fn, *args):
        # tables ride as jit ARGUMENTS (baking them in as constants
        # breaks the relay's remote compile — CLAUDE.md landmine)
        f = jax.jit(fn)
        y = f(*args)
        np.asarray(y.ravel()[:4])
        t = time_fn(f, *args)
        print(f"[probe] {label}: {t * 1e3:.2f} ms", file=sys.stderr)
        return np.asarray(y)

    def f_classic(d, ft, meta=None):
        return _fwd_banded_pallas(d, ft, meta, B)

    def f_wfwd(d, ft, meta=None):
        return _fwd_banded_densew_pallas(d, ft, meta, 8)

    btF = band_pack(rt, B=B, by="tile")
    ftc, metac = banded_device_fwd(btF)
    rows_c = btF.lvw.shape[0]
    y_ref = run(f"classic  B={B} NCB={btF.NCB} rows={rows_c}",
                partial(f_classic, meta=metac), d2, ftc)
    del ftc

    btW = band_pack_dense(rt, by="window", slot_pad=8)
    ftw, metaw = banded_device_wfwd(btW)
    y = run(f"wfwd     NCB={btW.NCB} rows={btW.lvw.shape[0]} "
            f"({btW.lvw.shape[0] / rows_c:.2f}x)",
            partial(f_wfwd, meta=metaw), d2, ftw)
    print(f"[probe] wfwd maxdiff {np.abs(y[:rt.T] - y_ref).max():.2e}",
          file=sys.stderr)
    del ftw

    for RP in rps:
        dm, om = split_reps(rt, RP)
        rt_d = select_chunks(rt, dm)
        rt_o = select_chunks(rt, om)
        btd = band_pack_dense(rt_d, by="window", slot_pad=8)
        ftd, metad = banded_device_wfwd(btd)
        bto = band_pack(rt_o, B=B, by="tile")
        fto, metao = banded_device_fwd(bto)
        rows = btd.lvw.shape[0] + bto.lvw.shape[0]

        def hyb(d, ftd, fto, metad=metad, metao=metao):
            yd = _fwd_banded_densew_pallas(d, ftd, metad, 8)
            yo = _fwd_banded_pallas(d, fto, metao, B)
            return yd[: metao.T] + yo

        y = run(f"hyb RP={RP} NCBd={btd.NCB} NCBo={bto.NCB} "
                f"rows={rows} ({rows / rows_c:.2f}x)", hyb, d2, ftd, fto)
        print(f"[probe] hyb RP={RP} maxdiff "
              f"{np.abs(y - y_ref).max():.2e}", file=sys.stderr)
        del ftd, fto


if __name__ == "__main__":
    main()
