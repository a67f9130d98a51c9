"""Routing tables for the lane-routed Pallas projection engine.

Why: XLA lowers the projection's element-level gather/scatter
(``density[lin]`` — ~17M live crossings on the flagship config) to
near-serial code: measured ~440 ms/pass on a v5e chip, ~100× off roofline.
The TPU's vector-gather hardware (``tpu.dynamic_gather``) reaches any
element in ~1 vector op, but only along fixed patterns: across the 128
lanes of each row (``take_along_axis(..., axis=1)``, any height) or
across ≤8 sublanes.  This module precomputes a static routing of every
crossing through those patterns.

Layout (static per (grid, geometry)):

* density ``D_flat (V,)`` → ``D2 (H, 128)``: voxel v ↦ row v//128, lane
  v%128.
* rays are tiled ``G`` at a time; ray-in-tile p ↦ output coordinate
  (hi = p//128, lane lp = p%128) of the tile's ``y (HI, 128)`` block.
* crossings live in **window-chunks**: chunk = (tile, window sg of SR
  density rows, repetition rep), an ``(SR, 128)`` slot grid; a crossing
  sits at row ``qoff = voxel_row % SR``, in a free column.  Columns within
  a row are sorted by (ray, voxel-lane), so each ray's crossings of that
  row form a *run* of adjacent columns.

The kernels then need only dense vector ops:

  forward:  ``F = take_along_axis(D2[window], LVW, 1) · W``  (hardware
  lane-gather fetches every slot's exact density value), a 7-step
  segmented lane scan sums each ray-run in place, one more lane-gather
  per routing pass k<KD picks each run's total at the ray's reduce lane,
  and masked column sums accumulate ``y[tile]``.

  backward: each column's g = dy[hi, lp] is fetched lane-aligned: by
  construction ``hik[k][row, lp]`` equals the hi of the pass-k run at
  (row, lp), so a row-select of the dy tile by ``hik[k]`` followed by one
  lane-gather at ``lp8`` yields g for every pass-k column — KD passes
  (selected by KCOL) instead of HI coordinate gathers; ``g·W`` is then
  lane-permuted to voxel-lane-sorted order (PERM), segment-summed per
  voxel run, and placed at its voxel lane (PUT) — the exact transpose,
  with no scatter anywhere.

Collisions: two different rays' runs sharing (row, reduce-lane) use
different passes k; >KD collisions or >128 columns spill to another rep
of the same window.  Ray-runs may split across reps freely (each split
gets its own reduce slot; sums recombine in ``y``).

Band compaction (:func:`band_pack`): the fixed window-per-chunk layout
leaves most rows dead (crossings concentrate in few density rows per
tile — 78% dead rows on the flagship config).  Routing at SR=8 makes
each chunk one live 8-row *band*, and ``band_pack`` stacks B bands into
(8·B, 128) superchunks — grouped by tile for the forward (one y block,
per-band density-window pointers feed B separate BlockSpecs) and by
window for the backward (one dD2 block, per-band dy-tile pointers) — so
per-grid-step overhead stays at the big-chunk level while the slot count
halves.  Measured v5e flagship: fwd 9.0→5.9 ms, bwd 11.9→6.3 ms.

Everything here is vectorized numpy running once per Operator.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np

__all__ = ["RoutedTables", "BandedTables", "build_routed_tables",
           "band_pack", "pad_chunks", "LANES", "SUBLANES"]

LANES = 128
SUBLANES = 8


@dataclasses.dataclass
class RoutedTables:
    """Packed routing tables (see module docstring).

    Per-column tables (NC chunks × SR rows stacked on axis 0):
        lvw:  (NC·SR, L) int8 — voxel lane per column (fetch gather).
        w:    (NC·SR, L) f32  — segment length (0 = dead column).
        hi8:  (NC·SR, L) int8 — ray output bucket per column.
        lp8:  (NC·SR, L) int8 — ray reduce lane per column.
        perm: (NC·SR, L) int8 — lane permutation to voxel-lane-sorted
              order (backward).
        put:  (NC·SR, L) int8 — lane l ↦ permuted column holding the end
              of the voxel-lane-l run.
        putv: (NC·SR, L) int8 — 1 where lane l has a run.
        kcol: (NC·SR, L) int8 — reduce pass k of the column's run; with
              lp8 and hik it lets the backward fetch g lane-aligned:
              g[col] = dy[hik[kcol][row, lp8[col]], lp8[col]].
        rposf: (NC·SR, L) int8 — 0-based position of the column within its
              ray-run; the forward segmented scan's step-s mask is simply
              ``rposf >= s`` (no key comparison / extra roll per step).
        rposb: (NC·SR, L) int8 — same for the voxel-lane runs of the
              backward scan, stored at the *permuted* lane position.
        wp/lp8p/kcolp: w/lp8/kcol stored at the permuted lane position:
              the backward g-fetch reads these and produces g·w directly
              in voxel-lane-sorted order, eliminating the PERM lane-gather
              pass (dynamic gathers are the kernel's costliest unit).
    Per reduce pass k < KD:
        src:  (KD, NC·SR, L) int8 — run-end column per (row, lp).
        hik:  (KD, NC·SR, L) int8 — output bucket; -1 = dead slot.
    Per-chunk scalars:
        sg, tile: (NC,) int32.
        kmax: (NC,) int32 — highest reduce pass used in the chunk; the
            kernels skip pass k > kmax work per chunk (most chunks never
            collide: flagship dist ≈ 31% kmax=0, 51% kmax=1).
        sdf/sdb: (NC,) int32 — Hillis-Steele steps needed to cover the
            chunk's longest ray-run / voxel-lane-run; each scan step is
            wrapped in ``pl.when(sd > t)`` so chunks with short runs (the
            common case) skip the deep steps.
        fwd_first: (NC,) int32 — 1 at the first chunk of each tile (fwd
            order = (tile, sg, rep)).
        bwd_order: (NC,) int32 — chunk permutation sorted by (sg, tile).
        bwd_first: (NC,) int32 — 1 at the first bwd chunk of each sg.
    """

    lvw: np.ndarray
    w: np.ndarray
    hi8: np.ndarray
    lp8: np.ndarray
    perm: np.ndarray
    put: np.ndarray
    putv: np.ndarray
    kcol: np.ndarray
    rposf: np.ndarray
    rposb: np.ndarray
    wp: np.ndarray
    lp8p: np.ndarray
    kcolp: np.ndarray
    src: np.ndarray
    hik: np.ndarray
    sg: np.ndarray
    tile: np.ndarray
    kmax: np.ndarray
    sdf: np.ndarray
    sdb: np.ndarray
    fwd_first: np.ndarray
    bwd_order: np.ndarray
    bwd_first: np.ndarray
    # kernel output blocks are only written where chunks exist; tiles /
    # density windows with no crossings must be zero-masked afterwards
    # (an unvisited Pallas output block is uninitialized memory)
    tiles_covered: np.ndarray   # (T,) int8
    wins_covered: np.ndarray    # (H//SR,) int8
    NC: int
    SR: int
    KD: int
    G: int
    HI: int
    T: int
    H: int
    n_rays: int
    volume_size: int
    n_live: int
    # Hillis-Steele steps needed to cover the longest run (static): the
    # forward scan sums ray-runs, the backward scan voxel-lane runs
    scan_fwd: int = 7
    scan_bwd: int = 7

    @property
    def d2_shape(self) -> Tuple[int, int]:
        return (self.H, LANES)

    @property
    def table_bytes(self) -> int:
        return sum(a.nbytes for a in (
            self.lvw, self.w, self.hi8, self.lp8, self.perm, self.put,
            self.putv, self.kcol, self.rposf, self.rposb, self.wp,
            self.lp8p, self.kcolp, self.src, self.hik))

    def pad_density(self, flat):
        import jax.numpy as jnp

        lead = flat.shape[:-1]
        pad = self.H * LANES - flat.shape[-1]
        flat = jnp.concatenate(
            [flat, jnp.zeros((*lead, pad), flat.dtype)], axis=-1)
        return flat.reshape(*lead, self.H, LANES)

    def unpad_density(self, d2):
        lead = d2.shape[:-2]
        return d2.reshape(*lead, self.H * LANES)[..., : self.volume_size]


def _cumcount(ids):
    """Occurrence counter within equal runs of a sorted 1-D array."""
    n = ids.shape[0]
    if n == 0:
        return np.zeros(0, np.int64)
    first = np.r_[True, ids[1:] != ids[:-1]]
    idx = np.arange(n)
    starts = idx[first]
    return idx - np.repeat(starts, np.diff(np.r_[starts, n]))


def build_routed_tables(lin, lens, volume_size: int, G: int = 2048,
                        SR: int = 32, KD: int = 3,
                        max_iter: int = 16,
                        use_native: bool = True) -> RoutedTables:
    """Build routing tables from packed crossing tables.

    Args:
        lin: (R, M) packed voxel indices.
        lens: (R, M) segment lengths; zeros are dropped here.
        volume_size: V (or T·V for dynamic volumes).
        G: rays per tile (multiple of 128).
        SR: density rows per window (multiple of 8).
        KD: reduce passes (distinct-ray collision capacity per
            (row, lane)).
    """
    assert G % LANES == 0 and SR % SUBLANES == 0
    # int8 per-slot hi bucket: G/128 must fit int8
    assert G <= 16384, f"G={G} overflows the int8 hi bucket (max 16384)"
    lin = np.asarray(lin)
    lens = np.asarray(lens, np.float32)
    R, M = lin.shape
    HI = G // LANES
    T = (R + G - 1) // G
    H = _round_up(max(1, math.ceil(volume_size / LANES)), SR)
    NSG = H // SR
    # 16-bit scalar-prefetch packing (sg<<16 | tile in routed_project's
    # BlockSpec index maps): window id and tile count must each fit
    if NSG > 2**15:
        raise ValueError(
            f"volume has {NSG} density windows (> 2^15): the 16-bit "
            f"window field of the packed BlockSpec indices would "
            f"overflow — raise SR or shard the volume")
    if T > 2**16:
        raise ValueError(
            f"{T} ray tiles (> 2^16) overflow the 16-bit tile field of "
            f"the packed BlockSpec indices — raise G or shard the rays")

    # ---- fully-native fast path ------------------------------------------
    # compaction + key derivation + slot assignment + table fill all in
    # C++ (each pass parallel, bit-identical to the numpy pipeline below
    # — tested); the flagship build drops 17.9 s -> ~10 s
    if use_native:
        from .native_router import native_assign, native_preprocess

        pre = native_preprocess(lin, lens, G, NSG, SR)
        if pre is not None:
            if pre["n"] == 0:
                return _empty_tables(SR, KD, G, HI, T, H, R, volume_size)
            na = native_assign(pre["rowkey"], pre["tsg"], pre["p"],
                               pre["lv"], pre["lp"], NSG, SR, KD)
            if na is not None:
                return _fill_tables_native(
                    na, pre["hi"], pre["lp"].astype(np.int16),
                    pre["lv"].astype(np.int16), pre["qoff"], pre["w"],
                    SR, KD, G, HI, T, H, R, volume_size, pre["n"])

    keep = lens > 0
    # int32 index math where the ranges allow (they do for any practical
    # config: rowkey < 2^31 needs T·NSG·SR < 2^31) — halves the memory
    # traffic of these ~15 full passes over the live-crossing arrays
    small = R < 2**31 and volume_size < 2**31 and T * NSG * SR < 2**31
    idt = np.int32 if small else np.int64
    ray, _ = np.nonzero(keep)  # row index of each live crossing, sorted
    ray = ray.astype(idt, copy=False)
    v = lin[keep].astype(idt, copy=False)
    w = lens[keep]
    n_live = int(v.shape[0])
    if n_live == 0:
        return _empty_tables(SR, KD, G, HI, T, H, R, volume_size)

    tile, p = np.divmod(ray, G)
    hi = (p // LANES).astype(np.int8)
    lp = (p % LANES).astype(np.int16)
    q, lvw_ = np.divmod(v, LANES)
    lv = lvw_.astype(np.int16)
    sg, qoff_ = np.divmod(q, SR)
    qoff = qoff_.astype(np.int16)

    rowkey = (tile * NSG + sg) * SR + qoff

    # ---- native fast path ------------------------------------------------
    if use_native:
        from .native_router import native_assign

        na = native_assign(rowkey, tile * NSG + sg, p.astype(np.int32),
                           lv.astype(np.int32), lp.astype(np.int32),
                           NSG, SR, KD)
        if na is not None:
            return _fill_tables_native(
                na, hi, lp, lv, qoff, w, SR, KD, G, HI, T, H, R,
                volume_size, n_live)

    # ---- column + reduce-slot assignment --------------------------------
    # Columns: within (rowkey, spill generation), sort by (ray, lv) so
    # each ray's crossings of the row form a contiguous run; rep splits at
    # column capacity (ray-runs may split across reps — each split gets
    # its own reduce slot and the pieces recombine in y).
    # Reduce slots: each run's total lands at its run-end column, at the
    # ray's reduce lane lp, in pass k < KD.  Runs overflowing KD at their
    # (row, rep, lp) spill to a fresh generation and are re-columned.
    spill = np.zeros(n_live, np.int32)
    f = dict(tile=tile, p=p, hi=hi, lp=lp, lv=lv, sg=sg, qoff=qoff, w=w,
             rowkey=rowkey)
    for it in range(max_iter):
        order = np.lexsort((lv, p, spill, rowkey))
        rk_s = rowkey[order]
        sp_s = spill[order]
        # pack in int64: rk_s is int32 and NEP-50 keeps int32*python_int
        # in int32, wrapping silently at scale
        grp = rk_s.astype(np.int64) * (int(sp_s.max()) + 1) + sp_s
        occ = _cumcount(grp)
        repdiv = occ // LANES
        rep_s = sp_s.astype(np.int64) * (int(repdiv.max()) + 1) + repdiv
        col_s = (occ % LANES).astype(np.int16)
        p_s = p[order]
        lp_s = lp[order]
        runchange = np.r_[True, (rk_s[1:] != rk_s[:-1])
                          | (rep_s[1:] != rep_s[:-1])
                          | (p_s[1:] != p_s[:-1])]
        run_id = np.cumsum(runchange) - 1
        ends = np.flatnonzero(np.r_[runchange[1:], True])
        key = ((rk_s[ends].astype(np.int64) * (int(rep_s.max()) + 1)
                + rep_s[ends]) * LANES + lp_s[ends])
        korder = np.lexsort((key,))
        kk = np.empty(len(ends), np.int64)
        kk[korder] = _cumcount(key[korder])
        if (kk < KD).all():
            break
        # one-shot: rank runs GLOBALLY per (row, lane) — ignoring rep, so
        # batches from different reps cannot re-merge over capacity — and
        # send rank r to spill generation r//KD; each generation then holds
        # ≤ KD runs per (row, lane) outright (re-columning within a
        # generation can only split runs across reps, never merge them)
        key2 = rk_s[ends].astype(np.int64) * LANES + lp_s[ends]
        k2order = np.lexsort((key2,))
        kk2 = np.empty(len(ends), np.int64)
        kk2[k2order] = _cumcount(key2[k2order])
        gen = kk2 // KD
        gen_of_run = np.zeros(run_id[-1] + 1, np.int64)
        gen_of_run[run_id[ends]] = gen
        extra_sorted = gen_of_run[run_id]
        extra = np.empty(n_live, np.int64)
        extra[order] = extra_sorted
        spill = extra.astype(np.int32)
    else:
        raise RuntimeError("reduce-slot routing did not converge")

    # final slot order
    f = {k: a[order] for k, a in f.items()}
    rep = rep_s
    col = col_s
    k_of_run = np.zeros(run_id[-1] + 1, np.int8)
    k_of_run[run_id[ends]] = kk.astype(np.int8)

    # ---- chunk enumeration ----------------------------------------------
    tsg = f["tile"] * NSG + f["sg"]
    chunkkey = tsg.astype(np.int64) * (int(rep.max()) + 1) + rep
    uniq, chunk_of = np.unique(chunkkey, return_inverse=True)
    NC = len(uniq)
    firstpos = np.full(NC, n_live, np.int64)
    np.minimum.at(firstpos, chunk_of, np.arange(n_live))
    sg_c = f["sg"][firstpos].astype(np.int32)
    tile_c = f["tile"][firstpos].astype(np.int32)
    fwd_first = np.r_[1, (tile_c[1:] != tile_c[:-1]).astype(np.int32)]

    rows = chunk_of * SR + f["qoff"]
    NR = NC * SR

    # ---- per-column tables ----------------------------------------------
    lvw = np.zeros((NR, LANES), np.int8)
    wt = np.zeros((NR, LANES), np.float32)
    hi8 = np.zeros((NR, LANES), np.int8)
    lp8 = np.zeros((NR, LANES), np.int8)
    lvw[rows, col] = f["lv"].astype(np.int8)
    wt[rows, col] = f["w"]
    hi8[rows, col] = f["hi"]
    lp8[rows, col] = f["lp"].astype(np.int8)

    # ---- reduce tables ---------------------------------------------------
    # runchange/run_id/ends from the loop's final iteration are already in
    # this `order` (the loop breaks right after computing them) — reuse
    # them instead of three more full passes over the live crossings
    src = np.zeros((KD, NR, LANES), np.int8)
    hik = np.full((KD, NR, LANES), -1, np.int8)
    ke = k_of_run[run_id[ends]]
    src[ke, rows[ends], f["lp"][ends]] = col[ends].astype(np.int8)
    hik[ke, rows[ends], f["lp"][ends]] = f["hi"][ends]
    kcolt = np.zeros((NR, LANES), np.int8)
    kcolt[rows, col] = k_of_run[run_id]
    kmax_c = np.zeros(NC, np.int32)
    np.maximum.at(kmax_c, chunk_of, k_of_run[run_id].astype(np.int32))
    rposf_t = np.zeros((NR, LANES), np.int8)
    rposf_t[rows, col] = _cumcount(run_id).astype(np.int8)

    # ---- backward permutation + placement -------------------------------
    porder = np.lexsort((col, f["lv"], rows))  # within row: by (lv, col)
    rows_p = rows[porder]
    ppos = _cumcount(rows_p).astype(np.int16)  # target permuted position
    perm = np.zeros((NR, LANES), np.int8)
    # default perm for unused positions: fill with 128-n.. any dead col;
    # simplest: identity then overwrite
    perm[:] = np.arange(LANES, dtype=np.int8)[None, :]
    perm[rows_p, ppos] = col[porder].astype(np.int8)

    lv_p = f["lv"][porder]
    lastp = np.r_[(rows_p[1:] != rows_p[:-1]) | (lv_p[1:] != lv_p[:-1]), True]
    put = np.zeros((NR, LANES), np.int8)
    putv = np.zeros((NR, LANES), np.int8)
    put[rows_p[lastp], lv_p[lastp]] = ppos[lastp].astype(np.int8)
    putv[rows_p[lastp], lv_p[lastp]] = 1
    runb_change = np.r_[True, (rows_p[1:] != rows_p[:-1])
                        | (lv_p[1:] != lv_p[:-1])]
    rposb_t = np.zeros((NR, LANES), np.int8)
    rposb_t[rows_p, ppos] = _cumcount(np.cumsum(runb_change) - 1
                                      ).astype(np.int8)
    wp = np.zeros((NR, LANES), np.float32)
    wp[rows_p, ppos] = f["w"][porder]
    lp8p = np.zeros((NR, LANES), np.int8)
    lp8p[rows_p, ppos] = f["lp"][porder].astype(np.int8)
    kcolp = np.zeros((NR, LANES), np.int8)
    kcolp[rows_p, ppos] = k_of_run[run_id][porder].astype(np.int8)

    # ---- scan-depth bounds ----------------------------------------------
    # forward: longest ray-run; backward: longest voxel-lane run
    run_len = np.diff(np.r_[-1, ends]) if ends.size else np.array([1])
    ends_p = np.flatnonzero(lastp)
    runp_len = np.diff(np.r_[-1, ends_p]) if ends_p.size else np.array([1])
    scan_fwd = max(1, int(np.ceil(np.log2(max(1, run_len.max())))))
    scan_bwd = max(1, int(np.ceil(np.log2(max(1, runp_len.max())))))
    sdf = _chunk_depths(chunk_of[ends] if ends.size else np.zeros(0, np.int64),
                        run_len, NC)
    sdb = _chunk_depths(rows_p[ends_p] // SR, runp_len, NC)

    # ---- backward chunk order -------------------------------------------
    bwd_order = np.lexsort((tile_c, sg_c)).astype(np.int32)
    sg_sorted = sg_c[bwd_order]
    bwd_first = np.r_[1, (sg_sorted[1:] != sg_sorted[:-1]).astype(np.int32)]

    return RoutedTables(
        lvw=lvw, w=wt, hi8=hi8, lp8=lp8, perm=perm, put=put, putv=putv,
        kcol=kcolt, rposf=rposf_t, rposb=rposb_t,
        wp=wp, lp8p=lp8p, kcolp=kcolp,
        src=src, hik=hik, sg=sg_c, tile=tile_c, kmax=kmax_c,
        sdf=sdf, sdb=sdb,
        fwd_first=fwd_first.astype(np.int32),
        bwd_order=bwd_order, bwd_first=bwd_first.astype(np.int32),
        tiles_covered=_covered(tile_c, T), wins_covered=_covered(sg_c, H // SR),
        NC=NC, SR=SR, KD=KD, G=G, HI=HI, T=T, H=H,
        n_rays=R, volume_size=volume_size, n_live=n_live,
        scan_fwd=scan_fwd, scan_bwd=scan_bwd,
    )


def _chunk_depths(chunk_ids, lens, NC):
    """Per-chunk ceil(log2(max run length)) (0 when all runs are length 1)."""
    m = np.zeros(NC, np.int64)
    if len(chunk_ids):
        np.maximum.at(m, chunk_ids, lens)
    return np.ceil(np.log2(np.maximum(m, 1))).astype(np.int32)


def _fill_tables_native(na, hi, lp, lv, qoff, w, SR, KD, G, HI, T, H, R,
                        volume_size, n_live):
    """Build RoutedTables from the native core's per-crossing assignment
    (arrays in original crossing order)."""
    NC = na["NC"]
    NR = NC * SR

    # The random scatters dominate this function's cost (latency-bound
    # 17M-element writes into ~50M-slot arrays); when the native library
    # is present they all happen in one OpenMP pass over the crossings.
    from .native_router import native_chunk_stats, native_fill

    filled = native_fill(na, hi, lp, lv, qoff, w, SR, KD, NR)
    if filled is not None:
        (lvw, wt, hi8, lp8, kcolt, rposf_t, rposb_t, wp, lp8p, kcolp,
         perm, put, putv, src, hik) = filled
    else:
        rows = na["chunk_of"].astype(np.int64) * SR + qoff
        col = na["col"].astype(np.int64)
        k = na["kpass"].astype(np.int64)
        ends = na["runend"] == 1
        ppos = na["ppos"].astype(np.int64)
        lastp = na["lastp"] == 1
        lvw = np.zeros((NR, LANES), np.int8)
        wt = np.zeros((NR, LANES), np.float32)
        hi8 = np.zeros((NR, LANES), np.int8)
        lp8 = np.zeros((NR, LANES), np.int8)
        lvw[rows, col] = lv.astype(np.int8)
        wt[rows, col] = w
        hi8[rows, col] = hi
        lp8[rows, col] = lp.astype(np.int8)

        src = np.zeros((KD, NR, LANES), np.int8)
        hik = np.full((KD, NR, LANES), -1, np.int8)
        src[k[ends], rows[ends], lp[ends]] = col[ends].astype(np.int8)
        hik[k[ends], rows[ends], lp[ends]] = hi[ends]
        kcolt = np.zeros((NR, LANES), np.int8)
        kcolt[rows, col] = k.astype(np.int8)
        rposf_t = np.zeros((NR, LANES), np.int8)
        rposf_t[rows, col] = na["rposf"].astype(np.int8)
        rposb_t = np.zeros((NR, LANES), np.int8)
        rposb_t[rows, ppos] = na["rposb"].astype(np.int8)
        wp = np.zeros((NR, LANES), np.float32)
        wp[rows, ppos] = w
        lp8p = np.zeros((NR, LANES), np.int8)
        lp8p[rows, ppos] = lp.astype(np.int8)
        kcolp = np.zeros((NR, LANES), np.int8)
        kcolp[rows, ppos] = k.astype(np.int8)

        perm = np.zeros((NR, LANES), np.int8)
        perm[:] = np.arange(LANES, dtype=np.int8)[None, :]
        perm[rows, ppos] = col.astype(np.int8)
        put = np.zeros((NR, LANES), np.int8)
        putv = np.zeros((NR, LANES), np.int8)
        put[rows[lastp], lv[lastp]] = ppos[lastp].astype(np.int8)
        putv[rows[lastp], lv[lastp]] = 1

    stats = native_chunk_stats(na, NC)
    if stats is not None:
        kmax_c, mrf, mrb = stats
        # per-chunk scan depths from run lengths (rpos at run end + 1)
        sdf = np.ceil(np.log2(np.maximum(mrf, 1))).astype(np.int32)
        sdb = np.ceil(np.log2(np.maximum(mrb, 1))).astype(np.int32)
    else:
        ends = na["runend"] == 1
        lastp = na["lastp"] == 1
        kmax_c = np.zeros(NC, np.int32)
        np.maximum.at(kmax_c, na["chunk_of"],
                      na["kpass"].astype(np.int32))
        sdf = _chunk_depths(na["chunk_of"][ends],
                            na["rposf"][ends].astype(np.int64) + 1, NC)
        sdb = _chunk_depths(na["chunk_of"][lastp],
                            na["rposb"][lastp].astype(np.int64) + 1, NC)

    sg_c = na["chunk_sg"]
    tile_c = na["chunk_tile"]
    fwd_first = np.r_[1, (tile_c[1:] != tile_c[:-1]).astype(np.int32)]
    bwd_order = np.lexsort((tile_c, sg_c)).astype(np.int32)
    sg_sorted = sg_c[bwd_order]
    bwd_first = np.r_[1, (sg_sorted[1:] != sg_sorted[:-1]).astype(np.int32)]

    scan_fwd = max(1, int(np.ceil(np.log2(max(1, na["max_run_fwd"])))))
    scan_bwd = max(1, int(np.ceil(np.log2(max(1, na["max_run_bwd"])))))

    return RoutedTables(
        lvw=lvw, w=wt, hi8=hi8, lp8=lp8, perm=perm, put=put, putv=putv,
        kcol=kcolt, rposf=rposf_t, rposb=rposb_t,
        wp=wp, lp8p=lp8p, kcolp=kcolp,
        src=src, hik=hik, sg=sg_c, tile=tile_c, kmax=kmax_c,
        sdf=sdf, sdb=sdb,
        fwd_first=fwd_first.astype(np.int32),
        bwd_order=bwd_order, bwd_first=bwd_first.astype(np.int32),
        tiles_covered=_covered(tile_c, T), wins_covered=_covered(sg_c, H // SR),
        NC=NC, SR=SR, KD=KD, G=G, HI=HI, T=T, H=H,
        n_rays=R, volume_size=volume_size, n_live=n_live,
        scan_fwd=scan_fwd, scan_bwd=scan_bwd,
    )


def _empty_tables(SR, KD, G, HI, T, H, R, volume_size):
    z8 = np.zeros((SR, LANES), np.int8)
    return RoutedTables(
        lvw=z8, w=np.zeros((SR, LANES), np.float32),
        hi8=z8.copy(), lp8=z8.copy(),
        perm=np.broadcast_to(np.arange(LANES, dtype=np.int8),
                             (SR, LANES)).copy(),
        put=z8.copy(), putv=z8.copy(), kcol=z8.copy(),
        rposf=z8.copy(), rposb=z8.copy(),
        wp=np.zeros((SR, LANES), np.float32),
        lp8p=z8.copy(), kcolp=z8.copy(),
        src=np.zeros((KD, SR, LANES), np.int8),
        hik=np.full((KD, SR, LANES), -1, np.int8),
        sg=np.zeros(1, np.int32), tile=np.zeros(1, np.int32),
        kmax=np.zeros(1, np.int32),
        sdf=np.zeros(1, np.int32), sdb=np.zeros(1, np.int32),
        fwd_first=np.ones(1, np.int32),
        bwd_order=np.zeros(1, np.int32), bwd_first=np.ones(1, np.int32),
        tiles_covered=np.zeros(T, np.int8),
        wins_covered=np.zeros(max(H // SR, 1), np.int8),
        NC=1, SR=SR, KD=KD, G=G, HI=HI, T=T, H=H,
        n_rays=R, volume_size=volume_size, n_live=0,
        scan_fwd=1, scan_bwd=1,  # no runs (don't inherit the default 7:
        # shard-max scan depths would inflate on empty shards)
    )


def _covered(ids, n):
    m = np.zeros(max(n, 1), np.int8)
    if len(ids):
        m[ids] = 1
    return m


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_chunks(rt: RoutedTables, multiple: int = 1024) -> RoutedTables:
    """Pad the chunk count to a multiple so kernel compiles cache across
    geometries of similar size.  Pad chunks carry zero weights, are never
    'first', and point at the last tile / window — they add zeros."""
    NC = rt.NC
    NCp = _round_up(max(NC, 1), multiple)
    if NCp == NC:
        return rt
    e = NCp - NC
    SR = rt.SR

    def padrows(a, fill=0):
        pad = np.full((e * SR,) + a.shape[1:], fill, a.dtype)
        return np.concatenate([a, pad], axis=0)

    def padk(a, fill):
        pad = np.full((a.shape[0], e * SR) + a.shape[2:], fill, a.dtype)
        return np.concatenate([a, pad], axis=1)

    perm_pad = np.broadcast_to(
        np.arange(LANES, dtype=np.int8), (e * SR, LANES)).copy()
    return dataclasses.replace(
        rt,
        lvw=padrows(rt.lvw), w=padrows(rt.w), hi8=padrows(rt.hi8),
        lp8=padrows(rt.lp8),
        perm=np.concatenate([rt.perm, perm_pad], axis=0),
        put=padrows(rt.put), putv=padrows(rt.putv), kcol=padrows(rt.kcol),
        rposf=padrows(rt.rposf), rposb=padrows(rt.rposb),
        wp=padrows(rt.wp), lp8p=padrows(rt.lp8p), kcolp=padrows(rt.kcolp),
        src=padk(rt.src, 0), hik=padk(rt.hik, -1),
        sg=np.concatenate([rt.sg, np.full(e, rt.H // SR - 1, np.int32)]),
        tile=np.concatenate([rt.tile, np.full(e, rt.T - 1, np.int32)]),
        kmax=np.concatenate([rt.kmax, np.zeros(e, np.int32)]),
        sdf=np.concatenate([rt.sdf, np.zeros(e, np.int32)]),
        sdb=np.concatenate([rt.sdb, np.zeros(e, np.int32)]),
        fwd_first=np.concatenate([rt.fwd_first, np.zeros(e, np.int32)]),
        bwd_order=np.concatenate(
            [rt.bwd_order, np.arange(NC, NCp, dtype=np.int32)]),
        bwd_first=np.concatenate([rt.bwd_first, np.zeros(e, np.int32)]),
        NC=NCp,
    )


@dataclasses.dataclass
class BandedTables:
    """Band-compacted view of SR=8 routed tables (see :func:`band_pack`).

    A *band* is one SR=8 chunk: (tile, 8 consecutive density rows, rep).
    Superchunks stack ``B`` bands of the same tile into an (8·B, 128) slot
    grid; each band keeps its own density-window pointer ``bp``, so only
    bands that actually contain crossings occupy table rows (the fixed
    window-per-chunk layout leaves ~78% of rows dead on the flagship
    config — band packing halves the slot count at equal chunk count).
    """

    # per-column tables, (NCB·8·B, LANES)
    lvw: np.ndarray
    w: np.ndarray
    rposf: np.ndarray
    src: np.ndarray     # (KD, NCB·8·B, LANES)
    hik: np.ndarray
    # backward tables (same slot grid)
    wp: np.ndarray
    lp8p: np.ndarray
    kcolp: np.ndarray
    rposb: np.ndarray
    put: np.ndarray
    putv: np.ndarray
    # per-superchunk scalars
    by: str             # "tile" (fwd grouping) or "window" (bwd grouping)
    keyp: np.ndarray    # (NCB,) int32 — the shared block pointer: tile id
                        # (fwd: y block) or window id (bwd: out block)
    bp: np.ndarray      # (B, NCB) int32 — per-band other pointer: density
                        # window (fwd) or dy tile (bwd)
    kmax: np.ndarray    # (NCB,) int32
    sdf: np.ndarray
    sdb: np.ndarray
    first: np.ndarray   # (NCB,) int32 — 1 at the first superchunk of keyp
    covered: np.ndarray  # (nkeys,) int8 — keys with real bands (unvisited
                         # output blocks are uninitialized: mask them)
    NCB: int
    B: int
    SRb: int            # rows per band (= the source tables' SR)
    KD: int
    G: int
    HI: int
    T: int
    H: int              # density rows (multiple of 8)
    n_rays: int
    volume_size: int
    scan_fwd: int
    scan_bwd: int
    # slot layout: "pack" (classic pointer-banded) or "dense" (slot index
    # = the band's other coordinate; see band_pack_dense).  Carried so
    # cached tables self-describe which kernel consumes them.
    slots: str = "pack"

    @property
    def d2_shape(self):
        return (self.H, LANES)

    @property
    def table_bytes(self) -> int:
        return sum(a.nbytes for a in (
            self.lvw, self.w, self.rposf, self.src, self.hik, self.wp,
            self.lp8p, self.kcolp, self.rposb, self.put, self.putv))

    def pad_density(self, flat):
        import jax.numpy as jnp

        lead = flat.shape[:-1]
        pad = self.H * LANES - flat.shape[-1]
        flat = jnp.concatenate(
            [flat, jnp.zeros((*lead, pad), flat.dtype)], axis=-1)
        return flat.reshape(*lead, self.H, LANES)

    def unpad_density(self, d2):
        lead = d2.shape[:-2]
        return d2.reshape(*lead, self.H * LANES)[..., : self.volume_size]


def band_pack(rt: RoutedTables, B: int = 8, by: str = "tile",
              chunk_multiple="auto") -> BandedTables:
    """Pack SR=8 routed chunks ("bands") into B-band superchunks.

    ``by="tile"`` (forward): bands grouped per tile — the superchunk's y
    output block is one tile; each band carries its own density-window
    pointer (``bp``).  ``by="window"`` (backward): bands grouped per
    density window — the superchunk's dD2 output block is one window;
    each band carries its own dy-tile pointer.  Each group's band count is
    padded to a B multiple with dummy bands (zero tables, pointer 0).

    A band is one SR-row chunk of ``rt`` — any SR multiple of 8 works.
    Taller bands trade a few dead table rows for half (SR=16) or a
    quarter (SR=32) of the per-band block DMAs, the dominant kernel cost
    once superchunks are large (measured v5e: the per-band density/dy
    fetches are ~30 ns each and there are ~33k of them per pass at SR=8
    on the flagship config).
    """
    assert rt.SR % SUBLANES == 0, "band rows must be a multiple of 8"
    SRb = rt.SR
    NC = rt.NC
    if NC == 0 or rt.n_live == 0:
        return _empty_banded(rt, B, by, chunk_multiple)
    if by == "tile":
        order = np.arange(NC)
        key = rt.tile
        nkeys = rt.T
    else:
        order = rt.bwd_order.astype(np.int64)
        key = rt.sg[order]
        nkeys = rt.H // SRb
    counts = np.bincount(key, minlength=nkeys)
    padded = -(-counts // B) * B
    NCB = int(padded.sum()) // B
    if chunk_multiple == "auto":
        # power-of-2 granularity near NCB/32: bounded padding waste
        # (~3%) while similar-size geometries still share a compile
        chunk_multiple = max(32, 1 << max(0, NCB.bit_length() - 5))
    NCBp = _round_up(max(NCB, 1), chunk_multiple)

    # source band id per packed slot (-1 = dummy).  Within each key
    # group the (already (other, rep)-sorted) bands fill slots
    # COLUMN-major — band i of a group with S superchunks goes to
    # (superchunk i % S, slot i // S) — so consecutive superchunks carry
    # reps of the SAME other-coordinate at the same slot: their BlockSpec
    # pointers coincide and the Pallas pipeline skips the repeated
    # window/dy DMA (the dominant per-band cost; rep fractions measured
    # 76% flagship / 53% config5 / 23% vol100, tools/densew_study.py).
    import os

    cmc = os.environ.get("SPH_CMC", "0") == "1"  # measured regression; see PERFORMANCE.md
    nslots = NCBp * B
    srcband = np.full(nslots, -1, np.int64)
    key_of_slot = np.zeros(nslots, np.int64)
    pos = 0
    start = 0
    for t in range(nkeys):
        c = int(counts[t])
        S = int(padded[t]) // B
        i = np.arange(c)
        if cmc:
            srcband[pos + (i % S) * B + i // S] = order[start: start + c]
        else:
            srcband[pos: pos + c] = order[start: start + c]
        key_of_slot[pos: pos + padded[t]] = t
        pos += int(padded[t])
        start += c
    key_of_slot[pos:] = int(key_of_slot[max(pos - 1, 0)])  # grid padding

    dummy = srcband < 0
    sb = np.where(dummy, 0, srcband)

    def rows(a, fill=0):
        """Gather an (NC·SRb, L) per-column table into packed band order."""
        v = a.reshape(NC, SRb, LANES)[sb]
        v = np.where(dummy[:, None, None], fill, v)
        return v.reshape(nslots * SRb, LANES)

    def rowsk(a, fill):
        v = a.reshape(a.shape[0], NC, SRb, LANES)[:, sb]
        v = np.where(dummy[None, :, None, None], fill, v)
        return v.reshape(a.shape[0], nslots * SRb, LANES)

    # sb holds original chunk ids, so index the unpermuted per-chunk arrays
    otherp = np.where(dummy, 0, (rt.sg if by == "tile" else rt.tile)[sb])
    bp = otherp.reshape(NCBp, B).T.astype(np.int32)
    # dummy bands fetch *something* (their w/putv are 0, so any window /
    # dy tile is correct); give them the neighbouring real band's pointer
    # so their DMA is pipeline-skipped too
    bp = _fill_dummy_ptrs(bp, dummy.reshape(NCBp, B).T)
    keyp = key_of_slot.reshape(NCBp, B)[:, 0].astype(np.int32)
    first = np.r_[1, (keyp[1:] != keyp[:-1]).astype(np.int32)]
    # grid-padding superchunks repeat the last key: never "first"
    if pos < nslots and NCB > 0:
        first[NCB:] = 0
    kmax_b = np.where(dummy, 0, rt.kmax[sb]).reshape(NCBp, B).max(axis=1)
    sdf_b = np.where(dummy, 0, rt.sdf[sb]).reshape(NCBp, B).max(axis=1)
    sdb_b = np.where(dummy, 0, rt.sdb[sb]).reshape(NCBp, B).max(axis=1)

    return BandedTables(
        lvw=rows(rt.lvw), w=rows(rt.w), rposf=rows(rt.rposf),
        src=rowsk(rt.src, 0), hik=rowsk(rt.hik, -1),
        wp=rows(rt.wp), lp8p=rows(rt.lp8p), kcolp=rows(rt.kcolp),
        rposb=rows(rt.rposb), put=rows(rt.put), putv=rows(rt.putv),
        by=by, keyp=keyp, bp=bp, kmax=kmax_b.astype(np.int32),
        sdf=sdf_b.astype(np.int32), sdb=sdb_b.astype(np.int32),
        first=first.astype(np.int32),
        covered=(counts > 0).astype(np.int8),
        NCB=NCBp, B=B, SRb=SRb, KD=rt.KD, G=rt.G, HI=rt.HI, T=rt.T, H=rt.H,
        n_rays=rt.n_rays, volume_size=rt.volume_size,
        scan_fwd=rt.scan_fwd, scan_bwd=rt.scan_bwd,
    )


def _fill_dummy_ptrs(bp, dummy):
    """Replace dummy-band pointers with the nearest REAL pointer at the
    same slot (forward fill along the superchunk axis; leading dummies
    take the next real one).  Dummy bands contribute exact zeros
    whatever block they fetch; pointer coincidence just lets the
    pipeline skip the fetch."""
    Bn, Nn = bp.shape
    if Nn == 0:
        return bp
    ar = np.broadcast_to(np.arange(Nn)[None, :], (Bn, Nn))
    idx = np.where(dummy, -1, ar)
    idx = np.maximum.accumulate(idx, axis=1)
    lead = idx < 0
    out = bp[np.arange(Bn)[:, None], np.where(lead, 0, idx)]
    if lead.any():
        idx2 = np.where(dummy, Nn, ar)
        idx2 = np.minimum.accumulate(idx2[:, ::-1], axis=1)[:, ::-1]
        alld = idx2 >= Nn  # slot entirely dummy
        out = np.where(lead, bp[np.arange(Bn)[:, None],
                                np.where(alld, 0, idx2)], out)
        out = np.where(lead & alld, 0, out)
    return out.astype(np.int32)


def select_chunks(rt: RoutedTables, mask) -> RoutedTables:
    """Subset of the SR-chunk tables by chunk mask (T/H/G unchanged;
    per-chunk orderings recomputed).  Routing is per-chunk, so a subset
    of the global routing is the routing of the subset."""
    idx = np.flatnonzero(np.asarray(mask))
    rows = (idx[:, None] * rt.SR + np.arange(rt.SR)[None, :]).reshape(-1)
    sg_l = rt.sg[idx]
    tile_l = rt.tile[idx]
    bwd_order = np.lexsort((tile_l, sg_l)).astype(np.int32)
    sgs = sg_l[bwd_order] if len(bwd_order) else sg_l
    return dataclasses.replace(
        rt,
        lvw=rt.lvw[rows], w=rt.w[rows], hi8=rt.hi8[rows],
        lp8=rt.lp8[rows], perm=rt.perm[rows], put=rt.put[rows],
        putv=rt.putv[rows], kcol=rt.kcol[rows], rposf=rt.rposf[rows],
        rposb=rt.rposb[rows], wp=rt.wp[rows], lp8p=rt.lp8p[rows],
        kcolp=rt.kcolp[rows],
        src=rt.src[:, rows], hik=rt.hik[:, rows],
        sg=sg_l, tile=tile_l,
        kmax=rt.kmax[idx], sdf=rt.sdf[idx], sdb=rt.sdb[idx],
        fwd_first=np.r_[1, (tile_l[1:] != tile_l[:-1]).astype(np.int32)]
        if len(tile_l) else np.ones(1, np.int32),
        bwd_order=bwd_order,
        bwd_first=(np.r_[1, (sgs[1:] != sgs[:-1]).astype(np.int32)]
                   if len(sgs) else np.ones(1, np.int32)),
        tiles_covered=_covered(tile_l, rt.T),
        wins_covered=_covered(sg_l, rt.H // rt.SR),
        NC=len(idx), n_live=int((rt.w[rows] > 0).sum()),
    )


def split_reps(rt: RoutedTables, RP: int):
    """(dense_mask, overflow_mask): per (tile, window) pair, the first
    ``RP`` rep chunks go dense, the rest overflow.  Chunks arrive in
    (tile, sg, rep) order, so pairs are contiguous."""
    NSG = max(rt.H // rt.SR, 1)
    pairkey = rt.tile.astype(np.int64) * NSG + rt.sg
    rank = _cumcount(pairkey)
    dense = rank < RP
    return dense, ~dense


def band_pack_dense(rt: RoutedTables, by: str = "tile",
                    chunk_multiple="auto", slot_pad: int = 1
                    ) -> BandedTables:
    """Dense-slot band packing: slot position encodes the band's OTHER
    coordinate, so the kernels can index it statically.

    ``by="tile"`` (forward): superchunk = one tile, slot w = the band of
    density window w — the concatenated band windows are then the WHOLE
    density image, so the kernel reads one resident ``(H, 128)`` input
    instead of issuing B per-band window DMAs (the dominant forward
    fetch cost: ~30 ns × ~33k live bands ≈ 1 ms/pass on the flagship).
    Needs ``H//SRb ≤ ~128`` (table block VMEM) and pays dummy slots for
    (tile, window) pairs with no crossings — orbit-style tomography
    geometries are ~100% dense (flagship: 30.1k live of 245×123).

    ``by="window"`` (backward): superchunk = one density window, slot t =
    the band of ray tile t — every slot's dy tile is then static, so the
    whole ``(T, HI, 128)`` dy array rides ONE resident input instead of
    B per-band 16 KB blocks re-fetched once per (tile, window) pair
    (~1.4 GB/pass at 100³).  Needs ``T ≤ ~96``.

    Bands of the same (tile, window) beyond the first (rep spills) go to
    follow-up superchunks of the same key, so aliased-output revisits
    stay consecutive.  B is implied (= H//SRb or T); a ``bp`` pointer
    array is still emitted (bp[k] = k on REAL superchunks) so the shape
    contract matches the classic layout, but the dense kernels never
    read it and shard-padding paths may zero-fill it on padded
    superchunks — consumers must index by slot, not bp.
    """
    SRb = rt.SR
    NC = rt.NC
    if by == "tile":
        nkeys, nslots = rt.T, rt.H // SRb
        key_c, slot_c = rt.tile, rt.sg
        order = np.arange(NC)
    else:
        nkeys, nslots = rt.H // SRb, rt.T
        key_c, slot_c = rt.sg, rt.tile
        order = rt.bwd_order.astype(np.int64)
    # slot_pad: pad the slot count (the window-major forward wants
    # 8-multiple slots so its resident-y h-slices stay sublane-aligned)
    nslots = _round_up(nslots, slot_pad)
    if NC == 0 or rt.n_live == 0:
        return dataclasses.replace(
            _empty_banded(rt, nslots, by, chunk_multiple), slots="dense")
    lay = _dense_layout(order, key_c[order], slot_c[order], nkeys, nslots,
                        chunk_multiple)
    srcband, keyp, NCBp, NCB_real, pos = (
        lay["sb"], lay["keyp"], lay["NCB"], lay["NCB_real"],
        lay["npad_slots"])
    B = nslots
    dummy = srcband < 0
    sb = np.where(dummy, 0, srcband)
    nsl = NCBp * B

    def rows(a, fill=0):
        v = a.reshape(NC, SRb, LANES)[sb]
        v = np.where(dummy[:, None, None], fill, v)
        return v.reshape(nsl * SRb, LANES)

    def rowsk(a, fill):
        v = a.reshape(a.shape[0], NC, SRb, LANES)[:, sb]
        v = np.where(dummy[None, :, None, None], fill, v)
        return v.reshape(a.shape[0], nsl * SRb, LANES)

    first = np.r_[1, (keyp[1:] != keyp[:-1]).astype(np.int32)]
    if pos < nsl and NCB_real > 0:
        first[NCB_real:] = 0
    kmax_b = np.where(dummy, 0, rt.kmax[sb]).reshape(NCBp, B).max(axis=1)
    sdf_b = np.where(dummy, 0, rt.sdf[sb]).reshape(NCBp, B).max(axis=1)
    sdb_b = np.where(dummy, 0, rt.sdb[sb]).reshape(NCBp, B).max(axis=1)
    bp = np.broadcast_to(np.arange(B, dtype=np.int32)[:, None],
                         (B, NCBp)).copy()
    covered = _covered(key_c, nkeys)

    return BandedTables(
        lvw=rows(rt.lvw), w=rows(rt.w), rposf=rows(rt.rposf),
        src=rowsk(rt.src, 0), hik=rowsk(rt.hik, -1),
        wp=rows(rt.wp), lp8p=rows(rt.lp8p), kcolp=rows(rt.kcolp),
        rposb=rows(rt.rposb), put=rows(rt.put), putv=rows(rt.putv),
        by=by, keyp=keyp.astype(np.int32), bp=bp,
        kmax=kmax_b.astype(np.int32),
        sdf=sdf_b.astype(np.int32), sdb=sdb_b.astype(np.int32),
        first=first.astype(np.int32),
        covered=covered,
        NCB=NCBp, B=B, SRb=SRb, KD=rt.KD, G=rt.G, HI=rt.HI, T=rt.T,
        H=rt.H, n_rays=rt.n_rays, volume_size=rt.volume_size,
        scan_fwd=rt.scan_fwd, scan_bwd=rt.scan_bwd, slots="dense",
    )


def dense_slot_rows_ok(key, slot, nkeys, nslots, B, threshold=1.25):
    """Whether a dense-slot layout's table rows stay within ``threshold``
    of the classic pointer-banded packing's — the data-aware gate for
    ``routed_dense='auto'``.

    Classic rows scale with the live band count padded per key group to a
    B multiple; dense rows with ``Σ_key max_slot reps(key, slot)·nslots``.
    Rep skew across slots (e.g. hot density windows in the forward
    grouping, or non-uniform ray tiles in few-view geometries) inflates
    the dense layout: measured v5e flagship bwd ratio 1.08 (step 4.41 →
    4.02 ms), vol100 1.14 (equal), config5 3.26 (17.5 vs 11.75 ms).
    """
    key = np.asarray(key, np.int64)
    slot = np.asarray(slot, np.int64)
    if key.size == 0:
        return True
    counts = np.bincount(key, minlength=nkeys)
    classic_rows = int((-(-counts // B) * B).sum())
    # superchunks per key = max reps over its slots
    upair, pc = np.unique(key * nslots + slot, return_counts=True)
    repmax = np.zeros(nkeys, np.int64)
    np.maximum.at(repmax, upair // nslots, pc)
    dense_rows = int(repmax.sum()) * nslots
    return dense_rows <= threshold * max(classic_rows, 1)


def _dense_layout(order, key_sorted, slot_sorted, nkeys, nslots,
                  chunk_multiple):
    """Slot layout of :func:`band_pack_dense`: per key, superchunk r
    holds at slot s the r-th band of (key, s).  Returns the same dict
    shape as the device core's ``_band_layout``."""
    # rep rank of each band within its (key, slot) pair
    o2 = np.lexsort((np.arange(len(order)), slot_sorted, key_sorted))
    ks = key_sorted[o2]
    ss = slot_sorted[o2]
    pair_first = np.r_[True, (ks[1:] != ks[:-1]) | (ss[1:] != ss[:-1])]
    idx = np.arange(len(order))
    starts = idx[pair_first]
    rep = idx - np.repeat(starts, np.diff(np.r_[starts, len(order)]))
    # superchunks per key = max rep + 1
    repmax = np.zeros(nkeys, np.int64)
    np.maximum.at(repmax, ks, rep + 1)
    NCB_real = int(repmax.sum())
    if chunk_multiple == "auto":
        chunk_multiple = max(1, 1 << max(0, NCB_real.bit_length() - 5))
    NCBp = _round_up(max(NCB_real, 1), chunk_multiple)
    chunk_base = np.zeros(nkeys, np.int64)
    np.cumsum(repmax[:-1], out=chunk_base[1:])
    nsl = NCBp * nslots
    sb = np.full(nsl, -1, np.int64)
    sb[(chunk_base[ks] + rep) * nslots + ss] = order[o2]
    keyp = np.zeros(NCBp, np.int64)
    live_keys = np.flatnonzero(repmax)
    keyp[: NCB_real] = np.repeat(live_keys, repmax[live_keys])
    pos = NCB_real * nslots
    if NCB_real and NCBp > NCB_real:
        keyp[NCB_real:] = keyp[NCB_real - 1]
    return dict(sb=sb, keyp=keyp, NCB=NCBp, NCB_real=NCB_real,
                npad_slots=pos)


def save_banded_pair(path: str, btF: BandedTables, btB: BandedTables
                     ) -> None:
    """Atomically save a (fwd, bwd) BandedTables pair as a DIRECTORY of
    raw ``.npy`` files (the on-disk routed-table cache: rebuilding the
    flagship tables costs ~12 s of routing; per-field ``.npy`` loads
    memory-mapped, so a warm hit costs ~nothing vs an ``.npz``'s ~9 s
    zipfile stream at 3 GB)."""
    import os

    tmp = f"{path}.tmp-{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    try:
        for pfx, bt in (("f", btF), ("b", btB)):
            for fld in dataclasses.fields(BandedTables):
                v = getattr(bt, fld.name)
                key = (f"{pfx}_{fld.name}" if isinstance(v, np.ndarray)
                       else f"{pfx}s_{fld.name}")
                np.save(os.path.join(tmp, key + ".npy"), np.asarray(v))
        try:
            os.replace(tmp, path)
        except OSError:
            import shutil

            # lost a save race: another process installed the dir first
            if not os.path.isdir(path):
                raise
            shutil.rmtree(tmp, ignore_errors=True)
    except BaseException:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
        raise


def load_banded_pair(path: str):
    """Load a pair saved by :func:`save_banded_pair` (arrays
    memory-mapped; pages stream in on first use)."""
    import os

    def mk(pfx):
        kw = {}
        for fld in dataclasses.fields(BandedTables):
            a = os.path.join(path, f"{pfx}_{fld.name}.npy")
            s = os.path.join(path, f"{pfx}s_{fld.name}.npy")
            if os.path.exists(a):
                kw[fld.name] = np.load(a, mmap_mode="r")
            elif os.path.exists(s):
                v = np.load(s)
                kw[fld.name] = str(v) if v.dtype.kind == "U" else int(v)
            elif fld.default is not dataclasses.MISSING:
                kw[fld.name] = fld.default  # field newer than the cache
            else:
                raise FileNotFoundError(s)
        return BandedTables(**kw)
    return mk("f"), mk("b")


def _empty_banded(rt: RoutedTables, B: int, by: str,
                  chunk_multiple: int) -> BandedTables:
    """All-dummy banded tables for an empty shard (no live crossings)."""
    nkeys = rt.T if by == "tile" else rt.H // rt.SR
    if chunk_multiple == "auto":
        chunk_multiple = 32
    NCBp = _round_up(1, chunk_multiple)
    nr = NCBp * B * rt.SR

    def z8():
        return np.zeros((nr, LANES), np.int8)

    def zc():
        return np.zeros(NCBp, np.int32)

    return BandedTables(
        lvw=z8(), w=np.zeros((nr, LANES), np.float32), rposf=z8(),
        src=np.zeros((rt.KD, nr, LANES), np.int8),
        hik=np.full((rt.KD, nr, LANES), -1, np.int8),
        wp=np.zeros((nr, LANES), np.float32), lp8p=z8(), kcolp=z8(),
        rposb=z8(), put=z8(), putv=z8(),
        by=by, keyp=zc(), bp=np.zeros((B, NCBp), np.int32),
        kmax=zc(), sdf=zc(), sdb=zc(), first=zc(),
        covered=np.zeros(max(nkeys, 1), np.int8),
        NCB=NCBp, B=B, SRb=rt.SR, KD=rt.KD, G=rt.G, HI=rt.HI, T=rt.T,
        H=rt.H,
        n_rays=rt.n_rays, volume_size=rt.volume_size,
        scan_fwd=rt.scan_fwd, scan_bwd=rt.scan_bwd,
    )


# ---------------------------------------------------------------------------
# histogram-placement forward reduce (round 5; VERDICT r4 #1)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class HistFwdTables:
    """Placement tables for the histogram forward reduce
    (:func:`hist_pack_fwd`; consumed by
    ``routed_project._fwd_banded_hist_pallas``).

    The classic banded forward reduce masks + row-sums the whole
    (SRB, 128) chunk once per output bucket h — per-chunk work
    ~ HI x rows, which is what re-paid the G=8192 fill gains in the
    round-4 "rows law" study.  Here each pass-k run total is instead
    (1) vertically FOLDED with same-h neighbours in consecutive band
    rows (3 masked shift-adds keyed by ``vpos``), then (2) PLACED at
    its (h % 8, lane) position inside its band by an 8-row sublane
    gather per multiplicity level j (a gather never collides — each
    destination picks its j-th source), and (3) accumulated into y
    with one masked (B, 8, 128)->(8, 128) reduction per octave
    o = h >> 3.  Per-chunk work ~ rows x (KV + OCT/4) — measured on
    vol100 routing: 98% of destination slots hold exactly ONE partial
    after the fold (tools/reduce_stats.py + the round-5 sub-run study).

        vpos: (KD, rows, L) int8 — position of the slot inside its
            vertical same-h run (consecutive band rows, same lane,
            same hik value); -1 where the pass has no run end.
        hj:   (KD*KV, rows, L) int8 — placement at DEST coordinates
            (band row i = h % 8): valid<<7 | oct<<3 | srcrow, where
            srcrow is the band row holding the folded sub-run total.
        kv:   (NCB,) int32 — placement levels actually used per
            superchunk (kernel skips j >= kv).
    """

    vpos: np.ndarray
    hj: np.ndarray
    kv: np.ndarray
    KV: int


def hist_pack_fwd(bt: BandedTables, kv_min: int = 2) -> HistFwdTables:
    """Build histogram-reduce placement tables from packed fwd tables.

    Band-local: works directly on the band_pack(by='tile') layout
    (dummy bands produce all-invalid entries).  ``KV`` is sized by the
    data (global max partials per destination slot), floored at
    ``kv_min`` so same-scale geometries share kernel shapes.
    """
    assert bt.by == "tile" and bt.slots == "pack", (bt.by, bt.slots)
    assert bt.SRb == 8, "histogram reduce needs 8-row bands"
    KD, rows = bt.hik.shape[0], bt.hik.shape[1]
    NB = rows // 8
    hik = bt.hik.reshape(KD, NB, 8, LANES).astype(np.int32)
    live = hik >= 0
    prev = np.concatenate(
        [np.full((KD, NB, 1, LANES), -2, np.int32), hik[:, :, :-1]], axis=2)
    start = live & (hik != prev)
    # vpos: distance to the run start within the band column
    ridx = np.arange(8)[None, None, :, None]
    start_row = np.where(start, ridx, -1)
    start_row = np.maximum.accumulate(start_row, axis=2)
    vpos = np.where(live, ridx - start_row, -1).astype(np.int8)
    # run ends: last row of each vertical same-h run
    nxt = np.concatenate(
        [hik[:, :, 1:], np.full((KD, NB, 1, LANES), -2, np.int32)], axis=2)
    is_end = live & (hik != nxt)
    # placement level j: rank of the sub-run end among the partials
    # sharing its DEST slot (band, h % 8, lane) in this pass, by end row
    k_i, b_i, r_i, l_i = np.nonzero(is_end)
    h_v = hik[k_i, b_i, r_i, l_i]
    destkey = ((k_i.astype(np.int64) * NB + b_i) * LANES + l_i) * 8 + h_v % 8
    order = np.lexsort((r_i, destkey))
    j_of = np.empty(len(order), np.int64)
    j_of[order] = _cumcount(destkey[order])
    KV = max(int(j_of.max()) + 1 if len(j_of) else 1, kv_min)
    hj = np.zeros((KD, KV, NB, 8, LANES), np.int8)
    pack = (0x80 | ((h_v >> 3) << 3) | r_i).astype(np.int8)
    hj[k_i, j_of, b_i, h_v % 8, l_i] = pack
    # per-superchunk placement depth (kernel guard)
    kv_band = np.zeros(NB, np.int64)
    np.maximum.at(kv_band, b_i, j_of + 1)
    kv = kv_band.reshape(bt.NCB, bt.B).max(axis=1).astype(np.int32)
    return HistFwdTables(
        vpos=vpos.reshape(KD, rows, LANES),
        hj=hj.reshape(KD * KV, rows, LANES), kv=kv, KV=KV)
