"""Per-LOS debug tracer.

TPU-native equivalent of the reference's built-in debug tracer
(``trace_indices(debug=True, debug_los=...)`` pretty-printing per-LOS
crossing tables, reference raytracer.py:175-225, surfaced through
``Operator(debug=True)`` at raytracer.py:656-665).  Here tracing is a
host-side utility over the jitted trace outputs — the hot path stays
uninstrumented; you point :func:`debug_trace` at any operator + LOS after
the fact.
"""
from __future__ import annotations

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
        (regs, lens, ts) numpy arrays for the selected LOS.
    """
    from ..ops.trace import trace_crossings

    regs, lens, ts = trace_crossings(
        op.gs, op._xs, op._rays, itype=op.config.itype
    )
    regs, lens, ts = np.asarray(regs), np.asarray(lens), np.asarray(ts)
    if los is None:
        los = tuple(s // 2 for s in op.geom.shape)
    sel = (slice(None),) + tuple(los)
    r = regs[sel]
    l = lens[tuple(los)]
    t = ts[tuple(los)]
    print(format_trace(r, l, t, los=los), file=out)
    return r, l, t


def format_trace(regs, lens, ts, los=None) -> str:
    """Format one LOS's (3, M) regions / (M,) lengths / (M,) distances as a
    table of the segments actually contributing to the integral plus the
    invalid crossings around them."""
    lines = [
        f"LOS {los}: {int((lens > 0).sum())} contributing segments, "
        f"total length {lens.sum():.6g}",
        f"{'idx':>4} {'t':>12} {'len':>12} {'r':>4} {'e':>4} {'a':>4} note",
    ]
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
