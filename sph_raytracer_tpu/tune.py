"""Routed-layout autotuner.

The banded engine's throughput depends on layout parameters — superchunk
band count ``B``, band height ``SRb``, tile size ``G`` — whose optimum
shifts with problem shape (measured on v5e: B=32 beats B=16 by ~20% on
the flagship, while tiny problems want small B).  ``autotune`` measures a
small candidate set end-to-end on the current backend (fetch-synced slope
timing, the only honest clock through relayed TPUs) and returns the
fastest :class:`~sph_raytracer_tpu.config.TraceConfig`.

Costs one table build + kernel compile per candidate on first run — the
crossing trace is shared across candidates via the trace cache, and each
layout's tables land in the banded-table cache — and ~nothing afterwards:
results persist to a JSON sidecar keyed by (backend, grid, geometry).

Usage::

    cfg = autotune(grid, geom)          # measures once, then cached
    op = Operator(grid, geom, config=cfg)
"""
from __future__ import annotations

import json
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from .config import TraceConfig

__all__ = ["autotune", "DEFAULT_CANDIDATES"]

# (routed_bands, routed_band_rows); G/KD default to their measured
# flagship optima (G=4096 is the packed-key ceiling, KD=3 covers all
# spills there).  Candidates may also be dicts replacing ANY layout
# fields, e.g. {"routed_g": 2048, "routed_kd": 2, "routed_bands": 16} —
# see GRID_CANDIDATES for a wider sweep used on dense configs.
DEFAULT_CANDIDATES: Tuple[Tuple[int, int], ...] = (
    (16, 8), (32, 8), (64, 8), (96, 8), (128, 8), (32, 16),
)

# wider (KD, B) sweep for crossing-dense problems (vol100 /
# config5_shard): per-ray crossing counts double at 100^3, shifting the
# collision/occupancy balance KD controls.  voxel_order='r' rides along
# (measured ~12% at 100^3, free in-graph transpose; a no-op at 50^3).
# G stays 4096: G=2048 loses occupancy and G≥8192 was measured on-chip
# (round 4) to REGRESS at 100^3 — the fill gain (rows -14..-24%) is
# outvoted by the HI-proportional reduce cost (fwd 6.17 -> 8.34 ms at
# G=8192 KD=2).
GRID_CANDIDATES: Tuple[dict, ...] = tuple(
    {"routed_g": 4096, "routed_kd": kd, "routed_bands": b,
     "routed_band_rows": 8, "routed_voxel_order": vo}
    for kd in (2, 3)
    for b in (64, 96)
    for vo in ("a", "r")
)


def _norm_candidate(c) -> dict:
    """A candidate is either a legacy (bands, band_rows) pair or a dict of
    TraceConfig layout fields to replace."""
    if isinstance(c, dict):
        return dict(c)
    b, r = c
    return {"routed_bands": int(b), "routed_band_rows": int(r)}


def _sig(grid, geom, backend: str, config: TraceConfig) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(repr(tuple(grid.shape)).encode())
    for a in (grid.r_b, grid.e_b, grid.a_b):
        h.update(np.asarray(a, np.float64).tobytes())
    h.update(np.asarray(geom.ray_starts, np.float64).tobytes())
    h.update(np.asarray(geom.rays, np.float64).tobytes())
    h.update(f"{backend}/{config.routed_g}/{config.routed_kd}/v1".encode())
    # NB: G/KD stay in the signature so results saved before they became
    # tunable stay valid (they key the BASE config; tuned fields may
    # override them)
    return h.hexdigest()[:24]


def autotune(grid, geom, candidates: Optional[Sequence] = None,
             config: Optional[TraceConfig] = None, ftype=None,
             iters: int = 6, cache: bool = True, cached_only: bool = False,
             verbose: bool = False, force: bool = False) -> TraceConfig:
    """Measure candidate routed layouts and return the fastest config.

    Args:
        grid / geom: as :class:`~sph_raytracer_tpu.operator.Operator`.
        candidates: iterable of ``(routed_bands, routed_band_rows)``
            (default :data:`DEFAULT_CANDIDATES`).
        config: base config; tuned fields are replaced.
        iters: timing iterations per candidate (slope timing).
        cache: persist/reuse the result (JSON in ``SPH_TPU_TUNE_CACHE``,
            default ``~/.cache/sph_raytracer_tpu`` — NOT the trace cache:
            that often lives on RAM-backed storage and a reboot must not
            lose measured layouts, only re-derivable bulk data).
        cached_only: never measure — return the cached result if one
            exists, else the base config unchanged.  Lets latency-bounded
            callers (benchmarks, serving startup) opportunistically use a
            previously measured layout.
        verbose: print per-candidate times to stderr.
        force: ignore an existing sidecar entry and re-measure (the
            result still overwrites the cache) — for re-sweeps after
            metric or engine changes.

    Returns:
        The base config with ``mode='routed'`` and the fastest
        ``(routed_bands, routed_band_rows)``.
    """
    import sys

    import jax
    import jax.numpy as jnp

    from .operator import Operator
    from .utils.profiling import time_fn

    base = (config or TraceConfig()).replace(mode="routed")
    if ftype is not None:
        base = base.replace(ftype=ftype)
    candidates = list(candidates or DEFAULT_CANDIDATES)

    K = 6  # scan-chain length of the production metric (see below)
    backend = jax.default_backend()
    cdir = os.environ.get("SPH_TPU_TUNE_CACHE") or os.path.expanduser(
        "~/.cache/sph_raytracer_tpu")
    fname = f"tune_{_sig(grid, geom, backend, base)}.json"
    cpath = os.path.join(cdir, fname)
    read_path = cpath
    if force:
        cached_only = False
    if cache and not force and not os.path.exists(read_path):
        # accept sidecars written by older versions into the trace-cache
        # dir (often RAM-backed — wiped on reboot — hence the move)
        legacy_dir = os.environ.get("SPH_TPU_TRACE_CACHE")
        if legacy_dir and os.path.exists(os.path.join(legacy_dir, fname)):
            read_path = os.path.join(legacy_dir, fname)
    if cache and not force and os.path.exists(read_path):
        with open(read_path) as fh:
            saved = json.load(fh)
        # entries measured under the old per-call metric are stale for a
        # MEASURING call (the rankings were observed to disagree with
        # scan-step); cached_only callers still use them opportunistically
        # (a per-call-tuned layout beats untuned defaults)
        if (saved.get("metric") != f"scan-step-x{K}"
                and not cached_only):
            saved = None
    else:
        saved = None
    if saved is not None:
        fields = saved.get("fields") or {
            "routed_bands": int(saved["bands"]),
            "routed_band_rows": int(saved["band_rows"])}
        if read_path != cpath:  # migrate legacy sidecar to persistent dir
            try:
                os.makedirs(cdir, exist_ok=True)
                with open(cpath, "w") as fh:
                    json.dump(saved, fh)
            except OSError:
                pass
        if verbose:
            print(f"[autotune] cached: {fields}", file=sys.stderr)
        return base.replace(**fields)
    if cached_only:
        return base

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random(tuple(grid.shape)),
                    jnp.dtype(base.ftype))
    # Candidates are measured on the PRODUCTION metric: a jitted
    # lax.scan chunk of K fwd+bwd steps with the tables payload-threaded
    # — exactly what retrieval.gd and bench.py run.  Round 3 measured
    # per-call and scan-step rankings DISAGREEING (vol100 KD=2: 8.5 vs
    # 12.3 ms per-call but 11.6 vs 12.0 scan-step — per-call runs fwd
    # and bwd as separate dispatches with different critical paths), so
    # the tuner must time what gd runs (VERDICT r3 weak #4).
    def measure(fields):
        cfg = base.replace(**fields)
        op = Operator(grid, geom, config=cfg)
        y = op(x)

        def one_step(d, _, pl, _op=op, _y=y):
            fx = _op.with_payload(pl)
            g = jax.grad(
                lambda v: jnp.mean((fx(v) - _y) ** 2))(d)
            return d - 1e-3 * g, ()

        @jax.jit
        def step_chunk(d, pl, _one=one_step):
            return jax.lax.scan(lambda c, s: _one(c, s, pl), d,
                                None, length=K)[0]

        return time_fn(step_chunk, x, op.payload,
                       iters=max(2, iters // 2)) / K

    results = []
    for cand in candidates:
        fields = _norm_candidate(cand)
        try:
            t = measure(fields)
        except Exception as e:  # layout infeasible (e.g. VMEM) — skip
            if verbose:
                print(f"[autotune] {fields}: FAILED "
                      f"{type(e).__name__}: {str(e)[:120]}", file=sys.stderr)
            continue
        results.append((t, fields))
        if verbose:
            print(f"[autotune] {fields}: {t*1e3:.2f} ms/step "
                  f"[scan-chained x{K}]", file=sys.stderr)
    if not results:
        raise RuntimeError("autotune: every candidate failed")
    results.sort(key=lambda r: r[0])
    # confirm the winner: relayed-device slope timing occasionally
    # glitches to a nonsense-low figure (observed: 0.70 ms for a layout
    # whose forward alone is ~3.5 ms); re-measure the leader and keep
    # the SLOWER of the two readings, re-sorting until the leader's
    # confirmation agrees within 1.4x (tables are cached, so a
    # confirmation costs one timing run, not a rebuild)
    for _ in range(min(3, len(results))):
        t, fields = results[0]
        try:
            t2 = measure(fields)
        except Exception:
            t2 = float("inf")
        if verbose and abs(t2 - t) > 0.4 * t:
            print(f"[autotune] confirm {fields}: {t*1e3:.2f} -> "
                  f"{t2*1e3:.2f} ms/step", file=sys.stderr)
        results[0] = (max(t, t2), fields)
        results.sort(key=lambda r: r[0])
        if results[0][1] is fields and t2 <= 1.4 * t:
            break
    t, fields = results[0]
    if cache:
        os.makedirs(cdir, exist_ok=True)
        with open(cpath, "w") as fh:
            json.dump({"fields": fields, "ms_per_step": t * 1e3,
                       "metric": f"scan-step-x{K}",
                       "all": [{"fields": f, "ms": tt * 1e3}
                               for tt, f in results]}, fh)
    return base.replace(**fields)
