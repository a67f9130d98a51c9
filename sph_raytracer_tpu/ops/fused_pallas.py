"""True fused projection: the crossing trace runs INSIDE a Pallas kernel.

The BASELINE.json north star: forward-project without materializing ANY
per-crossing state in HBM — no (rays·M) crossing tables, no routing
tables, no upload, O(tile) memory at any ray count.  Per 128-ray tile,
one kernel:

  1. computes all M boundary-crossing distances with the branchless
     intersection math of :mod:`.intersect` (sphere/cone/plane families,
     shadow filtering — reference raytracer.py:248-552);
  2. sorts them with an in-register bitonic network over the M sublane
     rows (M is static; the network is ~log²M compare-exchange stages of
     sublane rolls — no lax.sort, no HBM);
  3. takes segment lengths as adjacent differences and labels every
     segment with the voxel bin of its midpoint via lane-gathered binary
     searches over the (static) boundary tables — the same midpoint
     classification as :func:`..ops.trace._bin_segments`, with the
     azimuth bin resolved by half-plane sign tests instead of atan2;
  4. accumulates ``density[bin] · len`` with a dense sweep over 8-row
     density windows (static slices + the 8-sublane × 128-lane two-step
     hardware gather).

The backward pass (``jax.custom_vjp``) re-traces in XLA blockwise and
scatter-adds — the fused design never stores residuals, trading FLOPs
for memory exactly like gradient checkpointing.

Scope (checked by :func:`supported`): float32, ≤127 boundaries per axis,
azimuth grids within [-π, π], padded M ≤ 512, and volumes whose (H, 128)
density image fits VMEM alongside the working set.  Out-of-scope
configs fall back to the XLA fused path in :mod:`.project`.

Knife-edge convention: a segment midpoint lying EXACTLY on a grid
boundary (e.g. detector center columns aimed along an azimuth boundary
plane) may label to either adjacent voxel — the half-plane sign tests
here and the XLA path's atan2+searchsorted round such ties differently
at f32.  Both labelings are geometrically valid (the segment length is
identical); integrals differ only by the density contrast across that
one boundary.
"""
from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .trace import GridSpec

__all__ = ["supported", "fused_pallas_project"]

LANES = 128


def _pow2(n: int) -> int:
    return 1 << max(0, (n - 1)).bit_length()


def supported(gs: GridSpec, n_flat: int) -> bool:
    """Whether this grid fits the in-kernel fused engine's envelope."""
    if gs.ftype != jnp.float32:
        return False
    if max(gs.nr, gs.ne, gs.na) + 1 > 127:
        return False
    if _pow2(gs.num_crossings) > 512:
        return False
    # azimuth half-plane sign tests assume boundaries in [-π, π]
    if gs.a_b[0] < -np.pi - 1e-9 or gs.a_b[-1] > np.pi + 1e-9:
        return False
    # element buffers (~10 per-stage (Mp,128) f32 values) must fit VMEM;
    # the density image itself only needs VMEM on the small-volume
    # unrolled path — big volumes stream it from HBM (_needs_dynamic)
    Mp = _pow2(gs.num_crossings)
    if 10 * Mp * LANES * 4 > 12 * 2 ** 20:
        return False
    if n_flat >= (1 << 30):  # linear codes must fit int32 comfortably
        return False
    return True


def _needs_dynamic(H: int, Mp: int, nstreams: int = 1) -> bool:
    """Unrolled sweep = nstreams·(H/8)·(Mp/8) static bodies (lerp walks
    two (row, lane, weight) streams); past this budget the kernel
    streams 8-row density windows from HBM through a double-buffered DMA
    fori_loop instead (instruction count O(nstreams·Mp/8))."""
    return (nstreams * (H // 8) * (Mp // 8) > 4096
            or H * LANES * 4 + 10 * Mp * LANES * 4 > 12 * 2 ** 20)


def _pad_lanes(vals, fill):
    """Pad a 1-D boundary-derived array to a 128-lane row."""
    out = np.full((1, LANES), fill, np.float32)
    out[0, : len(vals)] = np.asarray(vals, np.float32)
    return out


def _boundary_const(gs: GridSpec) -> np.ndarray:
    """All per-boundary tables packed into ONE (BR, 128) f32 input —
    Pallas kernels cannot close over constant arrays.

    Columns 0-5 of the first max-boundary rows hold the column-layout
    constants (boundary index along sublanes): r², cos²e, cos(e)≥0,
    e≠π/2, sin a, cos a.  The last 5 rows hold the lane-layout
    binary-search tables (boundary index along lanes): r², cos e, sin a,
    cos a, a≤0.
    """
    r_b = np.asarray(gs.r_b, np.float32)
    e_b = np.asarray(gs.e_b, np.float32)
    a_b = np.asarray(gs.a_b, np.float32)
    nbmax = max(len(r_b), len(e_b), len(a_b))
    rows = _round8(nbmax)
    bc = np.zeros((rows + 8, LANES), np.float32)
    tol3 = float(np.finfo(np.float32).resolution) ** (1.0 / 3)
    bc[: len(r_b), 0] = r_b ** 2
    bc[: len(e_b), 1] = np.cos(e_b.astype(np.float64)).astype(
        np.float32) ** 2
    bc[: len(e_b), 2] = (np.cos(e_b.astype(np.float64)) >= 0)
    bc[: len(e_b), 3] = ~np.isclose(e_b, np.pi / 2, atol=tol3)
    bc[: len(a_b), 4] = np.sin(a_b.astype(np.float64)).astype(np.float32)
    bc[: len(a_b), 5] = np.cos(a_b.astype(np.float64)).astype(np.float32)
    bc[rows + 0] = _pad_lanes(r_b.astype(np.float64) ** 2, np.inf)
    bc[rows + 1] = _pad_lanes(np.cos(e_b.astype(np.float64)), -np.inf)
    bc[rows + 2] = _pad_lanes(np.sin(a_b.astype(np.float64)), 0.0)
    bc[rows + 3] = _pad_lanes(np.cos(a_b.astype(np.float64)), -1.0)
    bc[rows + 4] = _pad_lanes((a_b <= 0).astype(np.float32), 0.0)
    return bc


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _round16(x: int) -> int:
    return ((x + 15) // 16) * 16


def _make_kernel(gs: GridSpec, H: int, Mp: int, stage: str = 'full',
                 dynamic_sweep: bool = False, lerp: bool = False):
    """Build the fused forward kernel for a static grid spec."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nr_b = len(gs.r_b)
    ne_b = len(gs.e_b)
    na_b = len(gs.a_b)
    M = gs.num_crossings  # 2(nr_b) + 2(ne_b) + na_b + 1 real rows
    NR, NE, NA = gs.nr, gs.ne, gs.na
    INF = float("inf")
    BROWS = _round8(max(nr_b, ne_b, na_b))

    ftol = float(np.finfo(np.float32).resolution)
    tol3 = ftol ** (1.0 / 3)   # isclose factor 3 (intersect.isclose)
    tol2 = ftol ** (1.0 / 2)   # factor 2 (cone discriminant snap)

    def crossings(xs, rays, bc):
        """All M crossing distances, (M, 128); invalid/missed = +inf.
        Mirrors ops/intersect.py at f32 (same formulas, row layout)."""
        r2_col = bc[:nr_b, 0:1]
        cos2_col = bc[:ne_b, 1:2]
        cos_up_col = bc[:ne_b, 2:3]
        not_eq_col = bc[:ne_b, 3:4]
        sin_a_col = bc[:na_b, 4:5]
        cos_a_col = bc[:na_b, 5:6]
        xx, xy, xz = xs
        rx, ry, rz = rays
        # --- spheres (intersect.sphere_crossings) ---
        tc = -(xx * rx + xy * ry + xz * rz)                # (1, R)
        cxx = xy * rz - xz * ry
        cyy = xz * rx - xx * rz
        czz = xx * ry - xy * rx
        d2 = cxx ** 2 + cyy ** 2 + czz ** 2
        disc = r2_col - d2                                  # (nr_b, R)
        t1c = jnp.sqrt(jnp.maximum(disc, 0.0))
        miss = disc < 0
        t_near = jnp.where(miss, INF, tc - t1c)
        t_far = jnp.where(miss, INF, tc + t1c)
        # --- cones (intersect.cone_crossings) ---
        rdx = rx * xx + ry * xy + rz * xz                   # rays·xs
        xx2 = xx ** 2 + xy ** 2 + xz ** 2
        aa = rz ** 2 - cos2_col                             # (ne_b, R)
        bb = 2.0 * (rz * xz - rdx * cos2_col)
        cc = xz ** 2 - xx2 * cos2_col
        aa = jnp.where(jnp.abs(aa) < tol3, 0.0, aa)
        delta = bb ** 2 - 4.0 * aa * cc
        delta = jnp.where(jnp.abs(delta) < tol2, 0.0, delta)
        neg = delta < 0
        sq = jnp.sqrt(jnp.maximum(delta, 0.0))
        safe_aa = jnp.where(aa == 0, 1.0, aa)
        t1 = jnp.where(neg, INF, (-bb + sq) / (2.0 * safe_aa))
        t2 = jnp.where(neg, INF, (-bb - sq) / (2.0 * safe_aa))
        is_single = (aa == 0) & (jnp.abs(bb) >= tol3)
        th_near = jnp.where(is_single, -cc / jnp.where(bb == 0, 1.0, bb),
                            t1)
        th_far = jnp.where(is_single, INF, t2)
        on_cone = (aa == 0) & (jnp.abs(bb) < tol3)
        th_near = jnp.where(on_cone | ((aa != 0) & neg), INF, th_near)
        th_far = jnp.where(on_cone | ((aa != 0) & neg), INF, th_far)

        def cone_shadow(t):
            pz = xz + t * rz
            shadow = ((pz >= 0) != (cos_up_col > 0)) & (not_eq_col > 0)
            return jnp.where(shadow & jnp.isfinite(t), INF, t)

        th_near = cone_shadow(th_near)
        th_far = cone_shadow(th_far)
        # --- azimuth half-planes (intersect.plane_crossings) ---
        nxv = -sin_a_col * xx + cos_a_col * xy              # (na_b, R)
        nrv = -sin_a_col * rx + cos_a_col * ry
        cross_z = cos_a_col * ry - sin_a_col * rx
        par = jnp.abs(cross_z) <= ftol
        ta = jnp.where(par, INF, -nxv / jnp.where(nrv == 0, 1.0, nrv))
        pxa = xx + ta * rx
        pya = xy + ta * ry
        shadow_a = cos_a_col * pxa + sin_a_col * pya < 0
        ta = jnp.where(shadow_a & jnp.isfinite(ta), INF, ta)

        zero_row = jnp.zeros_like(tc)
        ts = jnp.concatenate(
            [zero_row, t_near, t_far, th_near, th_far, ta], axis=0)
        ts = jnp.where(jnp.isnan(ts), INF, ts)
        if Mp > M:
            ts = jnp.concatenate(
                [ts, jnp.full((Mp - M, ts.shape[1]), INF)], axis=0)
        return ts

    def bitonic(x, row):
        """Ascending bitonic sort along the (power-of-two) sublane axis."""
        n = Mp.bit_length() - 1
        for k in range(n):
            for j in range(k, -1, -1):
                d = 1 << j
                lo = (row & d) == 0
                up = ((row >> (k + 1)) & 1) == 0
                # pltpu.roll wants non-negative shifts: -d ≡ Mp-d
                partner = jnp.where(lo, pltpu.roll(x, Mp - d, 0),
                                    pltpu.roll(x, d, 0))
                take_min = lo == up
                x = jnp.where(take_min, jnp.minimum(x, partner),
                              jnp.maximum(x, partner))
        return x

    def bsearch(ok_fn, nb):
        """pos = (# boundaries 'below' v) - 1 ∈ [-1, nb-1], via ok_fn(i)
        = vectorized 'boundary i is below/at v' on lane-gathered rows."""
        pos = jnp.full((Mp, LANES), -1, jnp.int32)
        step = 64
        while step:
            cand = pos + step
            valid = cand < nb
            ok = ok_fn(jnp.clip(cand, 0, LANES - 1)) & valid
            pos = jnp.where(ok, cand, pos)
            step //= 2
        return pos

    def gather_row(row_const, idx):
        src = jnp.broadcast_to(row_const, (Mp, LANES))
        return jnp.take_along_axis(src, idx, axis=1)

    def kernel(geo_ref, off_ref, bc_ref, d2_ref, y_ref, acc_scr,
               *aux_scr):  # noqa: C901
        geo = geo_ref[0]
        bc = bc_ref[:]
        r2_row = bc[BROWS + 0: BROWS + 1]
        cos_e_row = bc[BROWS + 1: BROWS + 2]
        sin_a_row = bc[BROWS + 2: BROWS + 3]
        cos_a_row = bc[BROWS + 3: BROWS + 4]
        a_neg_row = bc[BROWS + 4: BROWS + 5]
        xs = (geo[0:1], geo[1:2], geo[2:3])
        rays = (geo[3:4], geo[4:5], geo[5:6])
        row = jax.lax.broadcasted_iota(jnp.int32, (Mp, LANES), 0)

        if stage == "ts_raw":
            y_ref[0] = crossings(xs, rays, bc)
            return
        ts = bitonic(crossings(xs, rays, bc), row)
        if stage == "ts":
            y_ref[0] = ts
            return
        ts_next = pltpu.roll(ts, Mp - 1, 0)
        lens = jnp.where(row < Mp - 1, ts_next - ts, INF)
        live = jnp.isfinite(lens) & (lens > 0) & (ts >= 0) \
            & jnp.isfinite(ts)
        t_mid = ts + lens * 0.5

        px = xs[0] + t_mid * rays[0]
        py = xs[1] + t_mid * rays[1]
        pz = xs[2] + t_mid * rays[2]
        p2 = px ** 2 + py ** 2 + pz ** 2
        pn = jnp.sqrt(p2)

        rbin = bsearch(lambda i: p2 >= gather_row(r2_row, i), nr_b)
        ebin = bsearch(lambda i: pz <= pn * gather_row(cos_e_row, i),
                       ne_b)
        ca = gather_row  # alias for brevity

        def a_ok(i):
            # arithmetic 0/1 combine — a bool-branch select lowers to an
            # unsupported i8->i1 truncation in Mosaic
            c = ca(cos_a_row, i)
            s = ca(sin_a_row, i)
            alneg = ca(a_neg_row, i)                       # 0/1 f32
            crossge = (c * py - s * px >= 0).astype(jnp.float32)
            oknum = jnp.where(py >= 0, jnp.maximum(alneg, crossge),
                              alneg * crossge)
            return oknum > 0.5

        abin = bsearch(a_ok, na_b)

        valid = (live
                 & (rbin >= 0) & (rbin <= NR - 1)
                 & (ebin >= 0) & (ebin <= NE - 1)
                 & (abin >= 0) & (abin <= NA - 1))
        code = ((jnp.clip(rbin, 0, NR - 1) * NE
                 + jnp.clip(ebin, 0, NE - 1)) * NA
                + jnp.clip(abin, 0, NA - 1) + off_ref[0][0:1])
        wl = jnp.where(valid, lens, 0.0)
        if stage == "wl":
            y_ref[0] = wl
            return
        if stage == "code":
            y_ref[0] = jnp.where(valid, code, -1).astype(jnp.float32)
            return
        # time-interpolated 4D (Operator view_times): each segment
        # contributes to TWO time bins — (1-w)·len at off0 (already in
        # `code`), w·len at off1 (off row 1); w rides geo row 6.  The
        # sweeps below just walk a second (row, lane, weight) stream —
        # the same lerp-as-part-of-the-operator trick as
        # Operator._apply_offsets, done in-kernel with zero tables.
        if lerp:
            wrow = geo[6:7]
            code1 = code - off_ref[0][0:1] + off_ref[0][1:2]
            streams = [(code // LANES, code % LANES, wl * (1.0 - wrow)),
                       (code1 // LANES, code1 % LANES, wl * wrow)]
        else:
            streams = [(code // LANES, code % LANES, wl)]

        # density fetch: val[i,l] = D2[row[i,l], lane[i,l]] — a general
        # 2D gather the hardware lacks, decomposed per 8-row window into
        # 8 lane-gathers from broadcast rows + row-equality selects.
        # Sorted ts put +inf (dead) segments at the tail, so whole dead
        # m-vregs skip via pl.when (few big regions, not a when-storm).
        if not dynamic_sweep:
            acc_scr[:] = jnp.zeros((Mp, LANES), jnp.float32)
            for v in range(Mp // 8):
                sl = slice(8 * v, 8 * v + 8)
                gate = wl[sl]

                @pl.when(jnp.any(gate > 0))
                def _sweep(gate=gate, sl=sl):
                    part = jnp.zeros((8, LANES), jnp.float32)
                    for row_st, lane_st, wl_st in streams:
                        wl_s = wl_st[sl]
                        row_s = row_st[sl]
                        lane_s = lane_st[sl]
                        for qg in range(H // 8):
                            win = d2_ref[8 * qg: 8 * qg + 8, :]
                            ridx = row_s - 8 * qg
                            for w in range(8):
                                rowvals = jnp.broadcast_to(win[w: w + 1],
                                                           (8, LANES))
                                val = jnp.take_along_axis(rowvals, lane_s,
                                                          axis=1)
                                part = part + jnp.where(ridx == w,
                                                        val * wl_s, 0.0)
                    acc_scr[sl] = part
        else:
            # big-volume variant: the density stays in HBM (memory_space
            # ANY) and 8-row windows stream through a double-buffered DMA
            # inside a fori_loop — the loop BODY is compiled once, so the
            # kernel's instruction count no longer scales with H.  Window
            # scratch slots are indexed statically (the loop walks window
            # PAIRS; a traced slot index would be a dynamic VMEM slice,
            # the known Mosaic compile-time trap).
            win_scr, dma_sems = aux_scr
            acc_scr[:] = jnp.zeros((Mp, LANES), jnp.float32)
            GV = 4  # element vregs per liveness gate: one pl.when per
            # 32-row group keeps the scalar branch overhead ~1/GV of the
            # per-vreg gating (64 tiny whens per window measured ~7 µs)
            live_g = jnp.stack(
                [jnp.any(wl[8 * GV * g: 8 * GV * (g + 1)] > 0
                         ).astype(jnp.int32)
                 for g in range(Mp // 8 // GV)]).reshape(1, -1)
            # windows the TILE actually touches: live rows only (with
            # lerp, both time bins' rows bound the walk)
            hi_pair = jnp.max(jnp.stack(
                [jnp.max(jnp.where(wl > 0, rs, 0))
                 for rs, _, _ in streams])) // 16 + 1
            lo_pair = jnp.min(jnp.stack(
                [jnp.min(jnp.where(wl > 0, rs, H - 1))
                 for rs, _, _ in streams])) // 16

            def dma(slot, qg):
                return pltpu.make_async_copy(
                    d2_ref.at[pl.ds(qg * 8, 8)], win_scr.at[slot],
                    dma_sems.at[slot])

            def sweep(win, base):
                for g in range(Mp // 8 // GV):
                    sl = slice(8 * GV * g, 8 * GV * (g + 1))

                    @pl.when(live_g[0, g] > 0)
                    def _sw(sl=sl, win=win, base=base):
                        part = jnp.zeros((8 * GV, LANES), jnp.float32)
                        for row_st, lane_st, wl_st in streams:
                            ridx = row_st[sl] - base
                            for w in range(8):
                                rowvals = jnp.broadcast_to(
                                    win[w: w + 1], (8 * GV, LANES))
                                val = jnp.take_along_axis(
                                    rowvals, lane_st[sl], axis=1)
                                part = part + jnp.where(
                                    ridx == w, val * wl_st[sl], 0.0)
                        acc_scr[sl] += part

            dma(0, 2 * lo_pair).start()

            def pair_body(k, _):
                qg0 = 2 * k
                dma(1, qg0 + 1).start()
                dma(0, qg0).wait()
                sweep(win_scr[0], qg0 * 8)

                @pl.when(k + 1 < hi_pair)
                def _prefetch():
                    dma(0, qg0 + 2).start()

                dma(1, qg0 + 1).wait()
                sweep(win_scr[1], (qg0 + 1) * 8)
                return 0

            jax.lax.fori_loop(lo_pair, hi_pair, pair_body, 0)
        if stage == "acc":
            y_ref[0] = acc_scr[:]
            return
        # y block is (1, 8, LANES) — Mosaic requires 8-row blocks; only
        # row 0 carries the tile's integrals
        y_ref[0, 0:1, :] = jnp.sum(acc_scr[:], axis=0, keepdims=True)

    return kernel


@partial(jax.jit, static_argnames=("gs", "H", "interpret", "stage",
                                   "lerp"))
def _fused_pallas_call(gs: GridSpec, d2, geo, off, H: int,
                       interpret: bool = False, stage: str = "full",
                       lerp: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mp = _pow2(gs.num_crossings)
    dyn = _needs_dynamic(H, Mp, nstreams=2 if lerp else 1)
    kernel = _make_kernel(gs, H, Mp, stage, dynamic_sweep=dyn, lerp=lerp)
    bc = jnp.asarray(_boundary_const(gs))
    BR = bc.shape[0]
    T = geo.shape[0]
    d2_spec = (pl.BlockSpec(memory_space=pl.ANY) if dyn
               else pl.BlockSpec((H, LANES), lambda t: (0, 0)))
    scratch = [pltpu.VMEM((Mp, LANES), jnp.float32)]
    if dyn:
        scratch += [pltpu.VMEM((2, 8, LANES), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))]
    return pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0)),
            pl.BlockSpec((BR, LANES), lambda t: (0, 0)),
            d2_spec,
        ],
        out_specs=(pl.BlockSpec((1, 8, LANES), lambda t: (t, 0, 0))
                   if stage == "full" else
                   pl.BlockSpec((1, Mp, LANES), lambda t: (t, 0, 0))),
        out_shape=(jax.ShapeDtypeStruct((T, 8, LANES), jnp.float32)
                   if stage == "full" else
                   jax.ShapeDtypeStruct((T, Mp, LANES), jnp.float32)),
        scratch_shapes=scratch,
        interpret=interpret,
    )(geo, off, bc, d2)


def _prep_geo(xs, rays, view_offsets, itype, view_offsets2=None,
              view_w=None):
    """Flatten/pad rays to 128-multiples and transpose into per-tile
    (8, 128) geometry blocks (rows: xs xyz, ray xyz, lerp weight, pad).
    ``view_offsets2``/``view_w`` carry the time-interpolated 4D second
    bin: off row 1 and geo row 6."""
    shape = jnp.broadcast_shapes(xs.shape, rays.shape)
    xs = jnp.broadcast_to(xs, shape).reshape(-1, 3)
    rays = jnp.broadcast_to(rays, shape).reshape(-1, 3)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    n = xs.shape[0]
    pad = (-n) % LANES
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.broadcast_to(jnp.asarray([1e30, 0.0, 0.0],
                                              xs.dtype), (pad, 3))])
        rays = jnp.concatenate(
            [rays, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0],
                                                rays.dtype), (pad, 3))])
    T = (n + pad) // LANES
    geo = jnp.zeros((T, 8, LANES), jnp.float32)
    geo = geo.at[:, 0:3].set(
        xs.reshape(T, LANES, 3).transpose(0, 2, 1))
    geo = geo.at[:, 3:6].set(
        rays.reshape(T, LANES, 3).transpose(0, 2, 1))
    if view_w is not None:
        w = jnp.asarray(view_w, jnp.float32).reshape(-1)
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
        geo = geo.at[:, 6].set(w.reshape(T, LANES))
    off = jnp.zeros((T, 8, LANES), jnp.int32)
    if view_offsets is not None:
        o = jnp.asarray(view_offsets, itype).reshape(-1)
        o = jnp.concatenate([o, jnp.zeros((pad,), o.dtype)])
        off = off.at[:, 0].set(o.reshape(T, LANES).astype(jnp.int32))
    if view_offsets2 is not None:
        o2 = jnp.asarray(view_offsets2, itype).reshape(-1)
        o2 = jnp.concatenate([o2, jnp.zeros((pad,), o2.dtype)])
        off = off.at[:, 1].set(o2.reshape(T, LANES).astype(jnp.int32))
    return geo, off, n, shape[:-1]


def _bwd_blockwise(gs: GridSpec, g_flat, xs, rays, off_flat, n_flat,
                   itype, block=4096, off2_flat=None, w_flat=None):
    """dD for the fused forward: re-trace in XLA blockwise + scatter-add
    (the checkpointing transpose — no residuals were stored).  With
    ``off2_flat``/``w_flat`` (time-interpolated 4D) each crossing
    scatters into both time bins with lerp weights."""
    from .trace import pack_linear, trace_crossings

    lerp = off2_flat is not None
    n = xs.shape[0]
    pad = (-n) % block
    if pad:
        xs = jnp.concatenate(
            [xs, jnp.broadcast_to(jnp.asarray([1e30, 0.0, 0.0],
                                              xs.dtype), (pad, 3))])
        rays = jnp.concatenate(
            [rays, jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0],
                                                rays.dtype), (pad, 3))])
        g_flat = jnp.concatenate(
            [g_flat, jnp.zeros((pad,), g_flat.dtype)])
        off_flat = jnp.concatenate(
            [off_flat, jnp.zeros((pad,), off_flat.dtype)])
        if lerp:
            off2_flat = jnp.concatenate(
                [off2_flat, jnp.zeros((pad,), off2_flat.dtype)])
            w_flat = jnp.concatenate(
                [w_flat, jnp.zeros((pad,), w_flat.dtype)])
    nb = xs.shape[0] // block

    def body(dacc, args):
        xs_b, rays_b, g_b, off_b = args[:4]
        regs, lens, _ = trace_crossings(gs, xs_b, rays_b, itype=itype)
        lin = pack_linear(regs, gs, itype=itype) + off_b[:, None]
        w = g_b[:, None] * lens
        if lerp:
            off2_b, w_b = args[4:]
            wcol = w_b[:, None].astype(w.dtype)
            lin2 = (lin - off_b[:, None] + off2_b[:, None]).reshape(-1)
            dacc = dacc.at[lin2].add((w * wcol).reshape(-1))
            w = w * (1.0 - wcol)
        return dacc.at[lin.reshape(-1)].add(w.reshape(-1)), ()

    args = [xs.reshape(nb, block, 3), rays.reshape(nb, block, 3),
            g_flat.reshape(nb, block), off_flat.reshape(nb, block)]
    if lerp:
        args += [off2_flat.reshape(nb, block), w_flat.reshape(nb, block)]
    dacc, _ = jax.lax.scan(
        body, jnp.zeros((n_flat,), g_flat.dtype), tuple(args))
    return dacc


@partial(jax.custom_vjp, nondiff_argnums=(0, 4, 5))
def fused_pallas_project(gs: GridSpec, density_flat, xs, rays,
                         itype=jnp.int32, interpret: bool = False,
                         view_offsets=None, view_offsets2=None,
                         view_w=None):
    """Fused forward projection with the trace inside the Pallas kernel.

    Args:
        gs: static grid spec.
        density_flat: (V,) flat volume (T·V for dynamic grids).
        xs / rays: (*rshape, 3) ray geometry.
        view_offsets: optional per-ray linear offsets (t_index·V),
            passed keyword-only (it rides the VJP as a zero-cotangent
            integer operand).
        view_offsets2 / view_w: time-interpolated 4D (Operator
            ``view_times``, reference raytracer.py:705-710 semantics):
            per-ray ceil-bin offsets and lerp weights — each segment
            contributes (1-w)·len at ``view_offsets`` and w·len at
            ``view_offsets2``, inside the kernel (no doubled tables).

    Returns (*rshape,) line integrals.  Differentiable w.r.t.
    ``density_flat`` only (custom VJP re-traces blockwise and
    scatter-adds; geometry gradients are not implemented).
    """
    y, _ = _fused_fwd(gs, density_flat, xs, rays, itype, interpret,
                      view_offsets, view_offsets2, view_w)
    return y


def _fused_fwd(gs, density_flat, xs, rays, itype, interpret,
               view_offsets, view_offsets2=None, view_w=None):
    xs = jnp.asarray(xs, jnp.float32)
    rays = jnp.asarray(rays, jnp.float32)
    lerp = view_w is not None
    geo, off, n, rshape = _prep_geo(xs, rays, view_offsets, itype,
                                    view_offsets2, view_w)
    V = density_flat.shape[-1]
    # the window sweep walks 8-row groups; the dynamic (streamed) sweep
    # walks PAIRS of windows, so H is padded to 16 rows
    H = _round16(-(-V // LANES))
    pad = H * LANES - V
    d2 = jnp.concatenate(
        [density_flat.astype(jnp.float32),
         jnp.zeros((pad,), jnp.float32)]).reshape(H, LANES)
    y = _fused_pallas_call(gs, d2, geo, off, H, interpret,
                           lerp=lerp)[:, 0, :]
    y = y.reshape(-1)[:n].reshape(rshape)
    # residuals: only lerp needs the weight row of geo (keeping the
    # whole (T, 8, 128) geo alive fwd->bwd would cost ~8x the weights)
    w_rows = geo[:, 6] if lerp else None
    return y, (xs, rays, off, w_rows, V, lerp)


def _fused_bwd(gs, itype, interpret, res, g):
    xs, rays, off, w_rows, V, lerp = res
    shape = jnp.broadcast_shapes(xs.shape, rays.shape)
    xs_f = jnp.broadcast_to(xs, shape).reshape(-1, 3)
    rays_f = jnp.broadcast_to(rays, shape).reshape(-1, 3)
    n = xs_f.shape[0]
    off_flat = off[:, 0].reshape(-1)[:n].astype(itype)
    off2_flat = w_flat = None
    if lerp:
        off2_flat = off[:, 1].reshape(-1)[:n].astype(itype)
        w_flat = w_rows.reshape(-1)[:n]
    dD = _bwd_blockwise(gs, g.reshape(-1).astype(jnp.float32), xs_f,
                        rays_f, off_flat, V, itype,
                        off2_flat=off2_flat, w_flat=w_flat)
    return (dD.astype(g.dtype), jnp.zeros_like(xs), jnp.zeros_like(rays),
            None, None, None)


fused_pallas_project.defvjp(_fused_fwd, _fused_bwd)
