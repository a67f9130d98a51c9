#!/usr/bin/env python
"""Benchmark: fwd+bwd raytracing throughput on the flagship config.

Config (BASELINE.json primary metric): 50³ static spherical volume,
50-vantage orbit of 50×100 cone-beam detectors = 250k rays; one training
step = forward projection + SquareLoss + gradient w.r.t. the volume.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` compares against the PyTorch reference on CPU measured on
this host (4-core, torch 2.x, f64 precomputed mode — the reference's only
execution mode): 351,129 rays/s fwd+bwd (1.09M fwd-only, 14.9s
precompute).  Reproduce with the reference's Operator on the same config.

Pipeline measured: the lane-routed Pallas engine (Operator mode='auto' →
'routed' on TPU; ops/route.py).  The one-time setup — since round 2 an
ON-DEVICE pipeline (ops/route_device.py): crossing trace on the chip +
XLA routing, no host router, no table upload — is reported to stderr but
not part of the steady-state metric, mirroring how the reference's
README treats its precompute.
"""
import json
import os
import sys
import time

# host CPU backend beside the TPU for the one-time crossing trace
if os.environ.get("JAX_PLATFORMS") and \
        "cpu" not in os.environ["JAX_PLATFORMS"]:
    os.environ["JAX_PLATFORMS"] += ",cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("SPH_TPU_TIMING", "1")
# cache traced crossing tables on disk (the trace is deterministic; the
# axon relay's remote-compile cache is unreliable, costing 80-500s/run)
os.environ.setdefault("SPH_TPU_TRACE_CACHE", "/dev/shm/sph_trace_cache")

import numpy as np

REF_CPU_RAYS_PER_S = 351129.0  # reference fwd+bwd, measured on this host


def wait_for_device(max_wait_s: float = None):
    """The relayed TPU occasionally wedges (all backend calls hang) and
    also dislikes a new client attaching immediately after the previous
    one exits.  Probe it from a THROWAWAY subprocess until it answers,
    then settle 60s before this process attaches (the wedge trigger is a
    new client attaching right after the previous one exits — which is
    exactly what probe-then-attach does, so the settle is unconditional)."""
    import subprocess

    if max_wait_s is None:
        max_wait_s = float(os.environ.get("SPH_TPU_BENCH_PROBE_WAIT", 1800))

    if (os.environ.get("JAX_PLATFORMS") or "").startswith("cpu"):
        return
    probe = ("import jax, numpy as np, jax.numpy as jnp;"
             "x = jnp.ones((64, 64)); y = x @ x;"
             "np.asarray(y.ravel()[:2])")
    t0 = time.time()
    while True:
        try:
            subprocess.run([sys.executable, "-c", probe], timeout=180,
                           check=True, capture_output=True)
            break
        except Exception:
            waited = time.time() - t0
            if waited > max_wait_s:
                # attaching to a wedged relay hangs in native code forever;
                # exiting non-zero is strictly better than stalling the
                # caller (rerun when the relay recovers)
                print(f"[bench] device probe still failing after "
                      f"{waited:.0f}s — giving up (relay wedged)",
                      file=sys.stderr)
                sys.exit(1)
            print(f"[bench] device probe failed ({waited:.0f}s elapsed); "
                  "retrying in 120s", file=sys.stderr)
            time.sleep(120)
    time.sleep(60)  # settle: relay wedges on immediate re-attach


def watchdog(limit_s: float = 5400.0):
    """Hard exit if the whole bench exceeds ``limit_s`` — the relay can
    wedge *mid-run* (every backend call hangs in native code, so no
    Python exception ever surfaces; a daemon thread is the only escape)."""
    import threading

    def bomb():
        print(f"[bench] exceeded {limit_s:.0f}s — relay likely wedged "
              "mid-run; aborting", file=sys.stderr)
        sys.stderr.flush()
        os._exit(3)

    t = threading.Timer(limit_s, bomb)
    t.daemon = True
    t.start()


def fetch_sync(x):
    """Force completion: block_until_ready is unreliable through device
    relays — fetching data is the only true sync."""
    return np.asarray(x.ravel()[:4])


def slope_time(f, args, n1=2, n2=12):
    """Per-iteration time via two chained runs (removes fetch overhead)."""
    def run(n):
        o = None
        for _ in range(n):
            o = f(*args)
        fetch_sync(o)
    run(1)
    t0 = time.time(); run(n1); T1 = time.time() - t0
    t0 = time.time(); run(n2); T2 = time.time() - t0
    return (T2 - T1) / (n2 - n1)


def main():
    wait_for_device()
    # armed only after the device answers: probe time (up to 30 min of a
    # recovering relay) must not eat the measurement budget
    watchdog(float(os.environ.get("SPH_TPU_BENCH_TIMEOUT", 5400)))
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
    except Exception:
        pass

    from sph_raytracer_tpu import ConeRectGeom, Operator, SphericalGrid

    grid = SphericalGrid(shape=(50, 50, 50))
    geom = sum(
        ConeRectGeom((50, 100), pos=(2 * np.cos(t), 2 * np.sin(t), 0.3),
                     fov=(45, 45))
        for t in np.linspace(0, 2 * np.pi, 50, endpoint=False)
    )
    nrays = int(np.prod(geom.shape))
    print(f"[bench] devices={jax.devices()}", file=sys.stderr)

    t0 = time.time()
    # use a previously autotuned layout if one is cached for this config
    # (never measure here — the sweep belongs to tools/fullbench.sh)
    from sph_raytracer_tpu import TraceConfig, autotune

    cfg = autotune(grid, geom, config=TraceConfig(mode="auto"),
                   cached_only=True, verbose=True).replace(mode="auto")
    op = Operator(grid, geom, config=cfg, ftype=jnp.float32)
    build = ("on-device trace+route"
             if getattr(op, "_rt", None).__class__.__name__
             == "DevicePadHelper" else "trace+route+upload")
    print(f"[bench] setup ({build}) {time.time() - t0:.1f}s "
          f"mode={op._mode}", file=sys.stderr)
    # second build in the same process: the first may pay one-time kernel
    # compiles through the relay's remote-compile endpoint, whose cache
    # evicts unpredictably (measured 0.3 s .. 19 min for the SAME stage in
    # one day) — the warm number is the setup capability, the cold one is
    # environment luck
    del op  # free the first build's tables before the rebuild — holding
    # both would double peak HBM on capacity-tight configs
    t0 = time.time()
    op = Operator(grid, geom, config=cfg, ftype=jnp.float32)
    print(f"[bench] setup warm ({build}) {time.time() - t0:.1f}s",
          file=sys.stderr)

    rng = np.random.default_rng(0)
    density = jnp.asarray(rng.random(tuple(grid.shape)), jnp.float32)
    y = op(density)
    fetch_sync(y)

    # The production training step, exactly as retrieval.gd runs it: one
    # jitted lax.scan chunk of K steps with the operator's device tables
    # threaded as an ARGUMENT (op.payload / with_payload — baking the
    # multi-GB tables into the trace as constants would break the
    # relay's remote-compile).  Chaining steps inside one dispatch is the
    # honest steady-state number: per-call dispatch through a relayed
    # TPU costs ~1-2 ms that a local chip does not pay, and the gd()
    # driver amortizes it over its scan chunks anyway.
    K = 10
    payload = op.payload

    def one_step(d, _, pl):
        fx = op.with_payload(pl)
        g = jax.grad(lambda v: jnp.mean((fx(v) - y) ** 2))(d)
        return d - 1e-3 * g, ()

    @jax.jit
    def step_chunk(d, pl):
        return jax.lax.scan(lambda c, x: one_step(c, x, pl), d, None,
                            length=K)[0]

    t0 = time.time()
    fetch_sync(step_chunk(density, payload))
    print(f"[bench] compile+first chunk {time.time() - t0:.1f}s",
          file=sys.stderr)

    # best of 3 slope measurements: relay hiccups (dispatch stalls,
    # remote-compile cache churn) only ever ADD time to a chained run,
    # so the minimum is the least-biased steady-state estimate — the
    # same step measured 3.30-3.91 ms across relay sessions on
    # identical code (PERFORMANCE.md headline note)
    dts = [slope_time(step_chunk, (density, payload), n1=2, n2=6) / K
           for _ in range(3)]
    dt = min(dts)
    print(f"[bench] chunk slope samples {[f'{d*1e3:.2f}' for d in dts]} ms",
          file=sys.stderr)
    rays_per_s = nrays / dt

    # per-call (eager-composition) numbers, for reference: these include
    # one relay dispatch per kernel launch
    step = jax.grad(lambda d: jnp.mean((op(d) - y) ** 2))
    dte = slope_time(step, (density,))
    dtf = slope_time(lambda d: op(d), (density,))
    print(f"[bench] fwd+bwd {dt * 1e3:.2f} ms/step ({rays_per_s:,.0f} rays/s)"
          f" [scan-chained x{K}]; per-call fwd+bwd {dte * 1e3:.2f} ms,"
          f" fwd-only {dtf * 1e3:.2f} ms ({nrays / dtf:,.0f} rays/s)",
          file=sys.stderr)

    print(json.dumps({
        "metric": "rays/s/chip fwd+bwd (50^3 vol, 50x(50,100) views)",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / REF_CPU_RAYS_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
