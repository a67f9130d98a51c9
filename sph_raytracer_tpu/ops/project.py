"""Forward projection / adjoint backprojection.

Two TPU execution modes behind one API (SURVEY §7 design stance):

* **precomputed** — the reference architecture (raytracer.py:675-713):
  crossing tables are traced once and cached, the forward pass is a pure
  gather-multiply-reduce and autodiff's backward is a scatter-add.  The
  cache here is a *packed* int32 linear-index table + float32 lengths
  (8 bytes/crossing vs the reference's 3×int64 + float64 = 32,
  cf. README.md:40-47's 4.25 GB config → ~1.06 GB).

* **fused** — the north-star design: rays are processed in fixed-size
  blocks inside a ``lax.map`` loop; each block re-traces its crossings,
  gathers, and reduces, so the O(rays·M) crossing tensor is never
  materialized.  ``jax.checkpoint`` around the block body makes autodiff
  re-run the (cheap, gradient-free) trace in the backward pass instead of
  saving it — the blockwise-computation analog of flash attention, and
  the memory behavior the reference could only approximate by pushing
  precompute to the CPU (raytracer.py:48-49).

Both modes share identical math and are cross-checked in tests.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from .trace import GridSpec, pack_linear, trace_crossings

__all__ = [
    "precompute_table",
    "project_table",
    "backproject_table",
    "project_fused",
]


# ---------------------------------------------------------------------------
# precomputed mode
# ---------------------------------------------------------------------------

def _pad_rays(xs, rays, block: int):
    """Flatten ray arrays to (R, 3) and pad R up to a block multiple with
    harmless dummy rays (start far outside, pointing away)."""
    shape = jnp.broadcast_shapes(xs.shape, rays.shape)
    xs = jnp.broadcast_to(xs, shape).reshape(-1, 3)
    rays = jnp.broadcast_to(rays, shape).reshape(-1, 3)
    n = xs.shape[0]
    pad = (-n) % block
    if pad:
        xs = jnp.concatenate([xs, jnp.broadcast_to(jnp.asarray([1e30, 0.0, 0.0], xs.dtype), (pad, 3))])
        rays = jnp.concatenate([rays, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0], rays.dtype), (pad, 3))])
    return xs, rays, n, shape[:-1]


@partial(jax.jit, static_argnames=("gs", "block", "itype_name", "method",
                                   "platform"))
def _precompute_blocks(gs: GridSpec, xs, rays, block: int,
                       itype_name: str = "int32", method: str = "sorted",
                       platform: str = ""):
    itype = jnp.dtype(itype_name)

    def blk(args):
        xs_b, rays_b = args
        if method == "ranked":
            from .trace import trace_crossings_ranked

            regs, lens, _ = trace_crossings_ranked(
                gs, xs_b, rays_b, itype=itype, platform=platform or None)
        else:
            regs, lens, _ = trace_crossings(
                gs, xs_b, rays_b, itype=itype, platform=platform or None)
        return pack_linear(regs, gs, itype=itype), lens

    xs_p = xs.reshape(-1, block, 3)
    rays_p = rays.reshape(-1, block, 3)
    lin, lens = jax.lax.map(blk, (xs_p, rays_p))
    M = gs.num_crossings
    return lin.reshape(-1, M), lens.reshape(-1, M)


def precompute_table(gs: GridSpec, xs, rays, block: int = 8192,
                     itype=jnp.int32, method: str = "sorted",
                     platform: str = "",
                     ) -> Tuple[jax.Array, jax.Array, int, tuple]:
    """Trace all rays once, returning packed (lin, lens) tables.

    Blocked so peak memory during the sort stays O(block·M) instead of the
    reference's O(rays·M) 4 GB spike (README.md:40-46).

    Args:
        method: 'sorted' (lax.sort pipeline — fast on CPU) or 'ranked'
            (sort-free all-pairs rank pipeline — fast on TPU, where XLA's
            variadic sort is ~15x slower than CPU; uses O(block·M²)
            transients, so pass a smaller block, e.g. 512).

    Returns (lin (Rp, M) int, lens (Rp, M) float, n_real_rays, ray_shape).
    """
    if method == "ranked":
        block = min(block, 512)
    xs, rays, n, rshape = _pad_rays(jnp.asarray(xs), jnp.asarray(rays), block)
    lin, lens = _precompute_blocks(gs, xs, rays, block,
                                   jnp.dtype(itype).name, method,
                                   platform)
    return lin, lens, n, rshape


def project_table(density_flat, lin, lens):
    """Forward projection from a precomputed table.

    Args:
        density_flat: (..., V) volume with spatial dims flattened; leading
            dims broadcast as channels (reference raytracer.py:704-713).
        lin: (R, M) packed voxel indices.
        lens: (R, M) segment lengths (zero where invalid).

    Returns (..., R) line integrals.
    """
    vals = jnp.take(density_flat, lin, axis=-1)  # (..., R, M)
    return jnp.einsum("...rm,rm->...r", vals, lens.astype(vals.dtype))


def backproject_table(y, lin, lens, volume_size: int):
    """Adjoint: scatter-add y·lens into a flat volume
    (reference Operator.T, raytracer.py:715-748).

    Args:
        y: (..., R) line integrals (leading dims = channels).
        lin: (R, M) packed voxel indices.
        lens: (R, M) lengths.

    Returns (..., volume_size) flat density.
    """
    weights = y[..., None] * lens.astype(y.dtype)  # (..., R, M)
    lead = weights.shape[:-2]
    flat_idx = lin.reshape(-1)

    def scatter(w):
        return jnp.zeros((volume_size,), w.dtype).at[flat_idx].add(w.reshape(-1))

    w2 = weights.reshape((-1,) + weights.shape[-2:]) if lead else weights[None]
    out = jax.vmap(scatter)(w2)
    return out.reshape(*lead, volume_size) if lead else out[0]


# ---------------------------------------------------------------------------
# fused mode
# ---------------------------------------------------------------------------

def project_fused(gs: GridSpec, density_flat, xs, rays, view_offsets=None,
                  block: int = 2048, itype=jnp.int32):
    """Fused forward projection: re-trace each ray block on the fly.

    Never materializes the full crossing tensor; peak memory is
    O(block·M).  Differentiable w.r.t. ``density_flat``: the block body is
    wrapped in ``jax.checkpoint`` so the backward pass re-runs the trace
    and emits the scatter-add directly.

    Args:
        gs: device grid spec.
        density_flat: (..., V) flat volume (or (..., T·V) for dynamic
            grids when ``view_offsets`` is given).
        xs, rays: (*rshape, 3) ray geometry.
        view_offsets: optional (*rshape,) int array of per-ray linear
            offsets (t_index·V) implementing dynamic-volume time binning
            (reference raytracer.py:705-710).

    Returns (..., *rshape) line integrals.
    """
    xs, rays, n, rshape = _pad_rays(jnp.asarray(xs), jnp.asarray(rays), block)
    if view_offsets is not None:
        off = jnp.broadcast_to(jnp.asarray(view_offsets, itype), rshape).reshape(-1)
        off = jnp.concatenate(
            [off, jnp.zeros((xs.shape[0] - n,), dtype=off.dtype)]
        )
    else:
        off = jnp.zeros((xs.shape[0],), dtype=itype)

    @jax.checkpoint
    def blk(args):
        xs_b, rays_b, off_b = args
        regs, lens, _ = trace_crossings(gs, xs_b, rays_b, itype=itype)
        lin = pack_linear(regs, gs, itype=itype) + off_b[:, None]
        vals = jnp.take(density_flat, lin, axis=-1)  # (..., B, M)
        return jnp.einsum("...rm,rm->...r", vals, lens.astype(vals.dtype))

    nb = xs.shape[0] // block
    out = jax.lax.map(
        blk,
        (xs.reshape(nb, block, 3), rays.reshape(nb, block, 3), off.reshape(nb, block)),
    )
    # lax.map stacks on axis 0 → (nb, ..., B); move blocks next to rays
    out = jnp.moveaxis(out, 0, -2)  # (..., nb, B)
    out = out.reshape(*out.shape[:-2], -1)[..., :n]
    return out.reshape(*out.shape[:-1], *rshape)
