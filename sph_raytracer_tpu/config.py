"""Global configuration for the TPU-native spherical raytracer.

The reference library (raytracer.py:12-15) uses module-level constants
``FTYPE=float64 / ITYPE=int64 / DEVICE / PDEVICE``.  On TPU, float64 is
software-emulated and int64 doubles index memory for no benefit, so the
native defaults here are float32 compute / int32 indices, overridable
per-operator.  A ``TraceConfig`` dataclass replaces the reference's loose
kwargs threading (raytracer.py:48-49, 662-665).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp

__all__ = ["TraceConfig", "default_config"]


@dataclasses.dataclass(frozen=True)
class TraceConfig:
    """Static configuration for tracing / projection.

    Attributes:
        ftype: float dtype for geometry math. float32 is TPU-native; float64
            requires ``jax.config.update('jax_enable_x64', True)`` and is the
            parity-testing dtype (matches reference FTYPE, raytracer.py:14).
        itype: integer dtype for voxel region indices (reference uses int64,
            raytracer.py:15; int32 halves HBM traffic and suffices for any
            realistic grid).
        mode: 'precomputed' caches (linear-index, length) tables like the
            reference Operator (raytracer.py:675-679); 'fused' recomputes ray
            crossings block-by-block inside jit so the O(rays*M) tensor is
            never materialized; 'routed' additionally compiles the tables
            into the lane-routed Pallas engine (ops/route.py) — the fast
            path on TPU, where XLA's element gathers are ~100x off
            roofline; 'auto' picks 'routed' on TPU backends and
            'precomputed' elsewhere.
        block_rays: rays per block in fused mode.  Static; rays are padded to
            a multiple of this.
        precompute_block_rays: rays per block when building the precomputed
            tables (bounds peak memory of the sort, like the reference's
            pdevice trick, raytracer.py:48-49).
        interpret: run Pallas kernels in interpreter mode (debugging).
    """

    ftype: jnp.dtype = jnp.float32
    itype: jnp.dtype = jnp.int32
    mode: str = "auto"
    block_rays: int = 2048
    precompute_block_rays: int = 8192
    interpret: bool = False
    # device for the one-time crossing trace (the reference's ``pdevice``,
    # raytracer.py:48-49): XLA's variadic sort is ~15x slower on TPU than
    # CPU, so 'auto' traces on the host CPU backend when one is available
    # alongside a TPU.  None = trace on the default backend.
    pdevice: Optional[str] = "auto"
    # crossing-trace pipeline: 'sorted' (single-key lax.sort — fastest on
    # CPU hosts), 'ranked' (sort-free all-pairs ranking — fastest on TPU,
    # 4.2 s vs 5.4 s flagship on v5e, at O(block*M^2) transients), or
    # 'auto' = ranked when the trace runs on a TPU backend.  Both label
    # segments identically (midpoint classification); ranked emits the
    # same (index, length) pairs in concatenation order instead of
    # t-sorted order, which no consumer depends on (projection is a
    # gather-sum; the router lexsorts crossings itself).
    trace_method: str = "auto"
    # lane-routed engine parameters (ops/route.py): rays per tile, window
    # rows, reduce passes.  Measured flagship sweet spot on v5e: G=4096
    # (the packed-key / int8-HI ceiling) packs the 128 slot columns ~50%
    # full vs 34% at G=2048 — fewer, fuller superchunks cut both the
    # per-grid-step overhead and the table bytes streamed (fwd 4.3→3.8 ms,
    # bwd 5.2→3.7 ms with B=16).
    routed_g: int = 4096
    routed_sr: int = 64
    routed_kd: int = 3
    # band-compacted engine (TPU): SR=routed_band_rows routing packed
    # into B-band superchunks; only live density bands occupy table slots.
    # B=32 measured on v5e flagship (with auto chunk padding -> CM=64):
    # fwd 2.84 ms / bwd 2.46 ms vs 3.18/3.01 at B=16 — fewer, bigger grid
    # steps amortize the ~160 ns/step base cost; B=64 is only ~5% more
    # (2.69/2.39) and wastes more dummy bands on small problems.
    routed_banded: bool = True
    routed_bands: int = 32
    # rows per band (multiple of 8): taller bands trade a few dead table
    # rows for proportionally fewer per-band block DMAs — the dominant
    # kernel cost once superchunks are large
    routed_band_rows: int = 8
    # superchunk-count padding multiple; "auto" = power-of-2 granularity
    # near NCB/32 (~3% padding waste, compile-cache hits across
    # similar-size geometries); tests use small explicit values to
    # exercise unequal fwd/bwd grouping sizes
    routed_chunk_multiple: object = "auto"  # int or "auto"
    # fused-mode execution backend: 'pallas' = the in-kernel-trace fused
    # engine (ops/fused_pallas.py — crossings, sort, midpoint labels and
    # density gather all inside one Pallas kernel; zero tables, O(tile)
    # memory); 'xla' = the blockwise lax.map re-trace (ops/project.py);
    # 'auto' = pallas on TPU when fused_pallas.supported() else xla.
    fused_backend: str = "auto"
    # fused-mode BACKWARD: 'retrace' re-traces blockwise in XLA inside
    # the custom VJP — zero residuals, zero tables, but ~555 ms/step
    # flagship (the checkpointing transpose); 'routed' builds the BANDED
    # BACKWARD tables once (device-routed, ~half the full routed
    # engine's table memory — the forward stays zero-table in-kernel
    # Pallas) and runs the hand-written banded backward kernel in the
    # VJP (~2.5 ms flagship; full step 659 -> 104 ms measured).  The
    # fast-training option for fused-envelope workloads whose FULL
    # table set doesn't fit; ignored outside mode='fused'/pallas
    # backend.  'auto' (default) selects 'routed' whenever the Pallas
    # fused engine is active (TPU or interpret) but defers the table
    # build until the first gradient/payload use, so forward-only fused
    # operators (preview3d, geometry sweeps) keep their zero-table
    # zero-setup cost; explicit 'routed' builds eagerly at construction.
    # MEMORY: the deferred build adds ~half the routed engine's banded
    # tables (~1.3 GB flagship) on first training use.
    fused_bwd: str = "auto"
    # where the routing tables are BUILT: 'host' = trace on the host +
    # numpy/C++ router + upload (the original pipeline); 'device' = trace
    # AND route on the accelerator (ops/route_device.py) — no host
    # routing, no table upload, setup drops from ~29 s to a few seconds
    # on a relayed TPU; 'auto' = device on TPU backends for the banded
    # f32 engine, host otherwise.  Device-built tables are byte-identical
    # to host-built ones (tested).
    routed_build: str = "auto"
    # dense-slot banded layouts (route.band_pack_dense): 'auto' enables
    # the dense BACKWARD (slot = ray tile; the whole (T,HI,128) dy array
    # becomes one resident input — no per-band dy blocks re-fetched per
    # (tile, window) pair) whenever the tile count is ≤96.  The dense
    # FORWARD (slot = density window; the band windows become the whole
    # (H,128) density — no per-band window DMAs) exists behind
    # 'fwd'/'both' but is NOT in auto: rep skew across density windows
    # makes it pad every tile to its hottest window's rep count
    # (measured flagship: 66% dummy slots, fwd 2.2x slower), while the
    # dense bwd pads per window over the rep-uniform tiles of an orbit
    # and stays ~85-100% live.  'off' keeps the classic pointer-banded
    # kernels everywhere; all modes are VMEM-envelope-clamped.
    routed_dense: str = "auto"
    # weight-table dtype of the BANDED routed engine ONLY ('auto'/'routed'
    # mode with routed_banded=True; other engines warn and keep f32):
    # 'f32' (default) or 'bf16' — stores the per-slot segment lengths (w fwd, wp
    # backward) in bfloat16: ~19% smaller tables per pass at KD=2 (they
    # are the only non-int8 tables).  A MEMORY-capacity option, not a
    # speed one: measured on-chip at vol100 the step is unchanged
    # (9.51 vs 9.49 ms — the kernels are compute/DMA-issue-bound, their
    # table stream overlaps).  Lossy: weights quantize to 8 mantissa
    # bits (~0.2-0.4% relative; measured 7e-4 max output change at
    # 100³), BUT both passes quantize the SAME values, so the operator
    # stays EXACTLY self-adjoint (<Ax,y> == <x,A'y> to f32 arithmetic)
    # — CG/ML-EM remain valid on the perturbed operator.  Opt-in: never
    # chosen by autotune (it changes numerics, not just layout).
    # Requires 16-row block tiling (SRb·B multiple of 16; tiny configs
    # fall back to f32 with a warning).
    routed_w_dtype: str = "f32"
    # forward reduce of the BANDED routed engine: 'masks' (default) =
    # per-output-bucket masked row-sums (per-chunk work ~ HI x rows —
    # the cost that re-paid the G=8192 fill gains in the round-4 "rows
    # law" study); 'hist' = the round-5 histogram-placement reduce
    # (route.hist_pack_fwd + _fwd_banded_hist_pallas): run totals are
    # vertically folded and PLACED at their (h%8, lane) slots by 8-row
    # sublane gathers, then octave-reduced into y — per-chunk work
    # ~ rows x (kv + HI/32), nearly HI-independent.  Requires
    # routed_band_rows=8; implies the host build (its placement tables
    # are host-derived); gradients are identical math but a different
    # summation order than 'masks' (float-level differences only).
    routed_fwd_reduce: str = "masks"
    # voxel linearization the ROUTED engine's tables are built in: 'a' =
    # the canonical azimuth-innermost C-order of (r, e, a) — the
    # reference's layout; 'r' = radius-innermost ((e, a, r) C-order).
    # Each ray's crossings interleave r/e/a boundary hits, but consecutive
    # same-(e,a) crossings differ by one RADIAL shell — r-innermost puts
    # them in the same 128-lane density row, clustering each ray tile's
    # crossings into fewer 8-row density bands (measured host-side on the
    # 100^3 config: 12-14% fewer bands and table bytes; ~1% at 50^3 where
    # every tile already touches every band).  Implemented as a cheap
    # in-graph transpose of the density (+ an index relabel at build
    # time), so kernels, routers and caches are untouched; the public
    # table/volume layout stays canonical.
    routed_voxel_order: str = "a"
    # ShardedOperator banded-table build: None = process-local when
    # running multi-host (each host traces + routes only its addressable
    # devices' ray ranges — host memory stays O(local shard)), global
    # single-build otherwise; True/False forces.  Both produce
    # bit-identical tables (tested).
    sharded_local_build: Optional[bool] = None

    def replace(self, **kw) -> "TraceConfig":
        return dataclasses.replace(self, **kw)


def default_config() -> TraceConfig:
    return TraceConfig()
