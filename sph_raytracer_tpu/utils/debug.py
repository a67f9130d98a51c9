"""Per-LOS debug tracer.

TPU-native equivalent of the reference's built-in debug tracer
(``trace_indices(debug=True, debug_los=...)`` pretty-printing per-LOS
crossing tables, reference raytracer.py:175-225, surfaced through
``Operator(debug=True, debug_los=...)`` at raytracer.py:656-665).  The
hot path stays uninstrumented: :func:`debug_trace` slices the single
requested line of sight out of the detector *before* tracing, so the
cost is O(M) regardless of detector size, and runs on the host CPU
backend when one is available (f64, no relay round-trips).
"""
from __future__ import annotations

import contextlib
from typing import Optional

import numpy as np

__all__ = ["debug_trace", "format_trace"]


def debug_trace(op, los: Optional[tuple] = None, out=None):
    """Print a per-crossing table for one line of sight of an operator.

    Args:
        op: an :class:`~sph_raytracer_tpu.operator.Operator`.
        los: index tuple into ``op.geom.shape`` selecting the LOS
            (default: the central pixel).
        out: file-like (default stdout).

    Returns:
        (regs, lens, ts) numpy arrays for the selected LOS — ``regs``
        shaped (3, M), ``lens``/``ts`` shaped (M,).  For 4D operators the
        printed header shows the LOS's time bin (and, under
        ``view_times`` interpolation, both bracketing bins with their
        lerp weights — each printed segment contributes ``(1-w)·len`` to
        the floor bin and ``w·len`` to the ceil bin, exactly how the
        doubled table splits it).
    """
    import jax

    from ..ops.trace import trace_crossings

    rshape = tuple(op.geom.shape)
    if los is None:
        los = tuple(s // 2 for s in rshape)
    los = tuple(int(i) for i in np.atleast_1d(np.asarray(los)))
    if len(los) != len(rshape):
        raise ValueError(
            f"debug_los {los} does not index geom shape {rshape}")

    # slice the one LOS before tracing (the round-1 version traced the
    # full detector to print one ray — wrong tool at flagship scale)
    xs = np.broadcast_to(op._xs_np, (*rshape, 3))[los]
    rays = np.broadcast_to(op._rays_np, (*rshape, 3))[los]

    try:
        dev = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        dev = None
    ctx = jax.default_device(dev) if dev is not None else (
        contextlib.nullcontext())
    with ctx:
        regs, lens, ts = trace_crossings(
            op.gs, xs[None], rays[None], itype=op.config.itype)
        regs = np.asarray(regs)[:, 0]
        lens = np.asarray(lens)[0]
        ts = np.asarray(ts)[0]

    time_info = None
    if op._view_offsets is not None:
        V = op._vsize
        flat = int(np.ravel_multi_index(los, rshape))
        k0 = int(op._view_offsets.reshape(-1)[flat]) // V
        if op._time_w is not None:
            k1 = int(op._time_off2.reshape(-1)[flat]) // V
            time_info = (k0, k1, float(op._time_w.reshape(-1)[flat]))
        else:
            time_info = (k0, None, None)

    print(format_trace(regs, lens, ts, los=los, xs=xs, rays=rays,
                       time_info=time_info), file=out)
    return regs, lens, ts


def format_trace(regs, lens, ts, los=None, xs=None, rays=None,
                 time_info=None) -> str:
    """Format one LOS's (3, M) regions / (M,) lengths / (M,) distances as
    a table of the segments actually contributing to the integral plus
    the invalid crossings around them."""
    lines = [
        f"LOS {los}: {int((lens > 0).sum())} contributing segments, "
        f"total length {lens.sum():.6g}",
    ]
    if xs is not None:
        lines.append(f"ray_start: {np.asarray(xs)}")
    if rays is not None:
        lines.append(f"ray: {np.asarray(rays)}")
    if time_info is not None:
        k0, k1, w = time_info
        if k1 is None or not w:
            lines.append(f"time bin: {k0}")
        else:
            lines.append(
                f"time lerp: bin {k0} × {1 - w:.4g} + bin {k1} × {w:.4g} "
                f"(each segment length splits accordingly)")
    lines.append(
        f"{'idx':>4} {'t':>12} {'len':>12} {'r':>4} {'e':>4} {'a':>4} note")
    for k in range(lens.shape[-1]):
        if not np.isfinite(ts[k]) and lens[k] == 0:
            continue
        note = ""
        if lens[k] == 0:
            note = "(zero/invalid)"
        lines.append(
            f"{k:>4} {ts[k]:>12.6g} {lens[k]:>12.6g} "
            f"{regs[0][k]:>4} {regs[1][k]:>4} {regs[2][k]:>4} {note}"
        )
    return "\n".join(lines)
