#!/usr/bin/env python
"""Microbenchmark: routed fwd vs bwd kernel times (flagship config by
default; SPH_CONFIG=vol100|config5_shard for the crossing-dense ones).
Layout via env: SPH_G/SR/KD/BANDS/BR/CM, SPH_VO (voxel order),
SPH_DENSE (routed_dense), SPH_WDT (routed_w_dtype); SPH_STAGES=1 adds
the truncated-kernel stage split (classic layouts only)."""
import os
import sys
import time

if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TIMING", "1")
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid
    from sph_raytracer_tpu.utils.profiling import time_fn

    configs = {
        "flagship": ((50, 50, 50), 50, (50, 100)),
        "vol100": ((100, 100, 100), 50, (50, 100)),
        "config5_shard": ((100, 100, 100), 13, (100, 200)),
    }
    vshape, nviews, det = configs[os.environ.get("SPH_CONFIG", "flagship")]
    grid = SphericalGrid(shape=vshape)
    geom = sum(
        ConeRectGeom(det, pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, nviews, endpoint=False)
    )
    nrays = int(np.prod(geom.shape))

    from sph_raytracer_tpu.config import TraceConfig

    cfg = TraceConfig(
        mode="auto",
        routed_g=int(os.environ.get("SPH_G", 4096)),
        routed_sr=int(os.environ.get("SPH_SR", 64)),
        routed_kd=int(os.environ.get("SPH_KD", 3)),
        routed_banded=os.environ.get("SPH_BANDED", "1") == "1",
        routed_bands=int(os.environ.get("SPH_BANDS", 32)),
        routed_band_rows=int(os.environ.get("SPH_BR", 8)),
        routed_chunk_multiple=(
            "auto" if os.environ.get("SPH_CM", "auto") == "auto"
            else int(os.environ["SPH_CM"])),
        routed_voxel_order=os.environ.get("SPH_VO", "a"),
        routed_dense=os.environ.get("SPH_DENSE", "auto"),
        routed_w_dtype=os.environ.get("SPH_WDT", "f32"),
        routed_fwd_reduce=os.environ.get("SPH_FR", "masks"),
        routed_build=os.environ.get("SPH_BUILD", "auto"),
    )
    t0 = time.time()
    op = Operator(grid, geom, config=cfg, ftype=jnp.float32)
    print(f"[kbench] setup {time.time() - t0:.1f}s mode={op._mode}",
          file=sys.stderr)
    assert op._mode == "routed"
    meta = op._rmeta
    print(f"[kbench] NC={meta.NC} SR={meta.SR} KD={meta.KD} G={meta.G} "
          f"HI={meta.HI} T={meta.T} H={meta.H} scan_fwd={meta.scan_fwd} "
          f"scan_bwd={meta.scan_bwd}", file=sys.stderr)

    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.random(grid.vshape).ravel(), jnp.float32)
    yf = jnp.asarray(rng.random(nrays), jnp.float32)

    import functools

    from sph_raytracer_tpu.ops import routed_project as rp

    tf = time_fn(op._routed, density, op._dt)
    print(f"[kbench] fwd {tf*1e3:.2f} ms ({nrays/tf/1e6:.1f}M rays/s)",
          file=sys.stderr)

    if isinstance(op._dt, tuple):  # banded engine
        ft_tbl, btd = op._dt
        metab = op._rmeta_bwd
        B = cfg.routed_bands
        yf = jnp.asarray(rng.random(nrays), jnp.float32)
        tb = time_fn(op._routed_adj, yf, op._dt)
        print(f"[kbench] bwd[banded] {tb*1e3:.2f} ms "
              f"({nrays/tb/1e6:.1f}M rays/s, {tb/tf:.2f}x fwd)",
              file=sys.stderr)

        if any(getattr(op, "_dense", (False, False))):
            # the variant/stage sections below drive the CLASSIC kernels
            # with B=routed_bands — meaningless on dense tables on
            # EITHER side (dense fwd tables have meta.SR == H, which
            # mis-derives SRb below)
            print("[kbench] fwd or bwd is dense-slot; skipping variant/"
                  "stage split (set SPH_DENSE=off for the classic "
                  "analysis)", file=sys.stderr)
            return
        pad = meta.T * meta.G - nrays
        yt = jnp.concatenate([yf, jnp.zeros((pad,), yf.dtype)]).reshape(
            meta.T, meta.HI, 128)
        outs = {}
        for variant in os.environ.get("SPH_BGF", "").split(","):
            if not variant:
                continue
            f = jax.jit(functools.partial(
                rp._bwd_banded_pallas, meta=metab, B=B, g_fetch=variant))
            try:
                o = f(yt, btd)
                np.asarray(o.ravel()[:4])
                t = time_fn(f, yt, btd)
                outs[variant] = np.asarray(o)
                print(f"[kbench] bwd[banded:{variant}] {t*1e3:.2f} ms "
                      f"({nrays/t/1e6:.1f}M rays/s)", file=sys.stderr)
            except Exception as e:
                print(f"[kbench] bwd[banded:{variant}] FAILED: "
                      f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
        ks = list(outs)
        for k2 in ks[1:]:
            d = np.abs(outs[ks[0]] - outs[k2]).max()
            print(f"[kbench] max|{ks[0]} - {k2}| = {d:.3e}", file=sys.stderr)

        if os.environ.get("SPH_STAGES"):
            d2 = op._rt.pad_density(density)
            for st in ("fetch", "scan"):
                f = jax.jit(functools.partial(
                    rp._fwd_banded_pallas, meta=meta, B=B, stage=st))
                t = time_fn(f, d2, ft_tbl)
                print(f"[kbench] fwd[{st}] {t*1e3:.2f} ms", file=sys.stderr)
            for st in ("gfetch", "tail"):
                f = jax.jit(functools.partial(
                    rp._bwd_banded_pallas, meta=metab, B=B, stage=st))
                t = time_fn(f, yt, btd)
                print(f"[kbench] bwd[{st}] {t*1e3:.2f} ms", file=sys.stderr)
        return

    pad = meta.T * meta.G - nrays
    yt = jnp.concatenate([yf, jnp.zeros((pad,), yf.dtype)]).reshape(
        meta.T, meta.HI, 128)
    outs = {}
    variants = sys.argv[1:] or ["hi", "kpass", "kpass-tree"]
    for variant in variants:
        f = jax.jit(functools.partial(
            rp._bwd_pallas, meta=meta, g_fetch=variant))
        try:
            t0 = time.time()
            o = f(yt, op._dt)
            np.asarray(o.ravel()[:4])
            tc = time.time() - t0
            tb = time_fn(f, yt, op._dt)
            outs[variant] = np.asarray(o)
            print(f"[kbench] bwd[{variant}] {tb*1e3:.2f} ms "
                  f"({nrays/tb/1e6:.1f}M rays/s, {tb/tf:.2f}x fwd; "
                  f"compile {tc:.0f}s)", file=sys.stderr)
        except Exception as e:
            print(f"[kbench] bwd[{variant}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", file=sys.stderr)
    ks = list(outs)
    for k2 in ks[1:]:
        d = np.abs(outs[ks[0]] - outs[k2]).max()
        print(f"[kbench] max|{ks[0]} - {k2}| = {d:.3e}", file=sys.stderr)

    if os.environ.get("SPH_STAGES"):
        d2 = op._rt.pad_density(density)
        for st in ("fetch", "scan"):
            f = jax.jit(functools.partial(
                rp._fwd_pallas, meta=meta, stage=st))
            t = time_fn(f, d2, op._dt)
            print(f"[kbench] fwd[{st}] {t*1e3:.2f} ms", file=sys.stderr)
        for st in ("gfetch", "tail"):
            f = jax.jit(functools.partial(
                rp._bwd_pallas, meta=meta, stage=st))
            t = time_fn(f, yt, op._dt)
            print(f"[kbench] bwd[{st}] {t*1e3:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
