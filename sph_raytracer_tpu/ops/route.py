"""Routing tables for the lane-routed Pallas projection engine.

Why: XLA lowers the projection's element-level gather/scatter
(``density[lin]`` — 36M+ live crossings on the flagship config) to
near-serial code: measured ~440 ms/pass on a v5e chip, ~100× off roofline.
The TPU's vector-gather hardware (``tpu.dynamic_gather``) reaches any
element in ~1 lane-op, but only along fixed patterns: across the 128 lanes
of each row (``take_along_axis(..., axis=1)``, any height) or across ≤8
sublanes (axis=0).  This module precomputes a static routing of every
crossing through those patterns (measured shapes: see
tools/probe notes in ops/routed_project.py).

Layout (all static per (grid, geometry)):

* density ``D_flat (V,)`` → ``D2 (H, 128)``: voxel v ↦ row v//128, lane
  v%128.
* rays are grouped into tiles of ``G`` rays; ray-in-tile p ↦ output
  coordinate (hi = p//128, lane lp = p%128) of the tile's ``y (HI, 128)``
  block.
* crossings are grouped into **window-chunks**: chunk = (tile, superrow
  window sg of SR density rows, repetition rep).  A chunk is an
  ``(SR, 128)`` slot grid where the crossing sits in row ``qoff = voxel_row
  % SR`` at a free column j.  The kernel then needs only:
    1. ``F = take_along_axis(D2[sg·SR : sg·SR+SR], LVW, axis=1)`` — one
       hardware lane-gather fetches every slot's exact density value
       (``LVW[qoff, j] = voxel lane``);
    2. per routing pass k < KD:
       ``R_k = take_along_axis(F, SRC_k, axis=1)`` moves each value to its
       ray's reduce lane lp (``SRC_k[qoff, lp] = source column``), weighted
       by ``W_k`` (= segment length; 0 for dead slots) and bucketed into
       ``y[hi]`` by the ``HI_k`` table;
    3. column sums accumulate ``y`` per tile.
  Two crossings sharing (row, lp) use different passes k; more than KD
  collisions (or >128 crossings per row) spill to another rep of the same
  window.
* the backward pass reuses the same chunks (re-ordered by (sg, tile) so
  the density-gradient window accumulates contiguously): g is read by
  (HI_k, lp) — no gather at all — routed back to fetch columns with the
  inverse tables (INVL/INVP), then within-row runs of equal voxel lane
  (columns are lv-sorted) are segment-summed and placed at their voxel
  lane by one more static lane-gather (PUT).

Everything here is vectorized numpy running once per Operator; the hot
path consumes only the packed tables.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np

__all__ = ["RoutedTables", "build_routed_tables", "LANES", "SUBLANES"]

LANES = 128
SUBLANES = 8


@dataclasses.dataclass
class RoutedTables:
    """Packed routing tables (see module docstring).

    Per-chunk tables, stacked on axis 0 (NC chunks, rows = SR):
        lvw:   (NC·SR, L) int8  — fetch: voxel lane per (row, col).
        src:   (KD, NC·SR, L) int8 — reduce pass k: source column per
               (row, lp); dead → any col with w 0.
        hi:    (KD, NC·SR, L) int8 — output bucket per reduce slot.
        w:     (KD, NC·SR, L) f32  — segment length per reduce slot.
        invl:  (NC·SR, L) int8 — fetch col (row, j) ↦ its reduce lane lp.
        invp:  (NC·SR, L) int8 — fetch col ↦ its reduce pass k.
        put:   (NC·SR, L) int8 — backward: lane l ↦ column of the last
               slot of the lv==l run (cols are lv-sorted); no run → dead
               column (gated by putvalid).
        putvalid: (NC·SR, L) int8 — 1 where lane l has a run in this row.
        colvalid: (NC·SR, L) int8 — 1 where the fetch column is live.
    Per-chunk scalars:
        sg:    (NC,) int32 — density window index.
        tile:  (NC,) int32 — ray tile.
        fwd_first: (NC,) int32 — 1 where chunk is the first of its tile
               (fwd chunk order = by (tile, sg, rep)).
        bwd_order: (NC,) int32 — chunk permutation sorted by (sg, tile).
        bwd_first: (NC,) int32 — 1 where bwd_order chunk is first of its sg.
    """

    lvw: np.ndarray
    src: np.ndarray
    hi: np.ndarray
    w: np.ndarray
    invl: np.ndarray
    invp: np.ndarray
    put: np.ndarray
    putvalid: np.ndarray
    colvalid: np.ndarray
    sg: np.ndarray
    tile: np.ndarray
    fwd_first: np.ndarray
    bwd_order: np.ndarray
    bwd_first: np.ndarray
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

    @property
    def d2_shape(self) -> Tuple[int, int]:
        return (self.H, LANES)

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


def build_routed_tables(lin, lens, volume_size: int, G: int = 512,
                        SR: int = 32, KD: int = 2,
                        max_iter: int = 64) -> RoutedTables:
    """Build routing tables from packed crossing tables.

    Args:
        lin: (R, M) packed voxel indices.
        lens: (R, M) segment lengths; zeros are dropped.
        volume_size: V (or T·V for dynamic volumes).
        G: rays per tile (multiple of 128).
        SR: density rows per window (multiple of 8).
        KD: routing passes (collision capacity per (row, reduce-lane)).
    """
    assert G % LANES == 0 and SR % SUBLANES == 0
    lin = np.asarray(lin)
    lens = np.asarray(lens, np.float32)
    R, M = lin.shape
    HI = G // LANES
    T = (R + G - 1) // G
    H = _round_up(math.ceil(volume_size / LANES), SR)
    NSG = H // SR

    keep = lens > 0
    ray = np.broadcast_to(np.arange(R)[:, None], (R, M))[keep].astype(np.int64)
    v = lin[keep].astype(np.int64)
    w = lens[keep]
    n_live = v.shape[0]
    if n_live == 0:
        z8 = np.zeros((SR, LANES), np.int8)
        return RoutedTables(
            lvw=z8, src=np.zeros((KD, SR, LANES), np.int8),
            hi=np.zeros((KD, SR, LANES), np.int8),
            w=np.zeros((KD, SR, LANES), np.float32),
            invl=z8.copy(), invp=z8.copy(), put=z8.copy(),
            putvalid=z8.copy(), colvalid=z8.copy(),
            sg=np.zeros(1, np.int32), tile=np.zeros(1, np.int32),
            fwd_first=np.ones(1, np.int32),
            bwd_order=np.zeros(1, np.int32), bwd_first=np.ones(1, np.int32),
            NC=1, SR=SR, KD=KD, G=G, HI=HI, T=T, H=H,
            n_rays=R, volume_size=volume_size, n_live=0,
        )

    p = ray % G
    tile = ray // G
    hi = (p // LANES).astype(np.int8)
    lp = (p % LANES).astype(np.int16)
    q = v // LANES
    lv = (v % LANES).astype(np.int16)
    sg = q // SR
    qoff = (q % SR).astype(np.int16)

    # ---- rep assignment (iterative spill) -------------------------------
    # row key = (tile, sg, qoff); constraints per (row key, rep):
    #   (a) ≤ LANES crossings (columns)
    #   (b) ≤ KD crossings per reduce lane lp
    # Crossings that fit BOTH constraints settle permanently; the rest bump
    # to the next rep.  Ranking counts settled crossings first so
    # newcomers can never preempt incumbents — this makes progress strictly
    # monotone (each (group, rep) fills to capacity and stays filled).
    rep = np.zeros(n_live, np.int32)
    settled = np.zeros(n_live, bool)
    rowkey = (tile * NSG + sg) * SR + qoff
    arange = np.arange(n_live)
    for it in range(max_iter):
        active = ~settled
        grp = rowkey * (rep.max() + 1) + rep
        # (a) column capacity, settled-first ranking
        order = np.lexsort((arange, active, grp))
        occ = np.empty(n_live, np.int64)
        occ[order] = _cumcount(grp[order])
        fit_a = occ < LANES
        # (b) lane capacity
        grp_lp = grp * LANES + lp
        order2 = np.lexsort((arange, active, grp_lp))
        occ2 = np.empty(n_live, np.int64)
        occ2[order2] = _cumcount(grp_lp[order2])
        fit_b = occ2 < KD
        settled |= active & fit_a & fit_b
        if settled.all():
            break
        rep[~settled] += 1
    else:
        raise RuntimeError("routing did not converge; raise KD or max_iter")

    # ---- final slot coordinates ----------------------------------------
    chunkkey = (tile * NSG + sg) * (rep.max() + 1) + rep
    # columns: lv-sorted within (chunk, row) for the backward run-scan
    order = np.lexsort((lv, qoff, chunkkey))
    c = {k: a[order] for k, a in dict(
        tile=tile, sg=sg, rep=rep, qoff=qoff, lv=lv, lp=lp, hi=hi, w=w,
        chunkkey=chunkkey,
    ).items()}
    rowid = c["chunkkey"] * SR + c["qoff"]
    col = _cumcount(rowid)  # order is rowid-sorted already
    assert col.max() < LANES
    # reduce pass within (row, lp)
    k = _cumcount_by(rowid * LANES + c["lp"])
    assert k.max() < KD

    # chunk enumeration in fwd order (tile, sg, rep)
    uniq, chunk_of = np.unique(c["chunkkey"], return_inverse=True)
    NC = len(uniq)
    # per-chunk scalars (uniq is sorted by chunkkey = tile-major fwd order)
    first_pos = np.full(NC, n_live, np.int64)
    np.minimum.at(first_pos, chunk_of, np.arange(n_live))
    sg_c = c["sg"][first_pos].astype(np.int32)
    tile_c = c["tile"][first_pos].astype(np.int32)
    fwd_first = np.r_[1, (tile_c[1:] != tile_c[:-1]).astype(np.int32)]

    # ---- fill tables ----------------------------------------------------
    NR = NC * SR
    rows = chunk_of * SR + c["qoff"] if n_live else np.zeros(0, np.int64)

    lvw = np.zeros((NR, LANES), np.int8)
    invl = np.zeros((NR, LANES), np.int8)
    invp = np.zeros((NR, LANES), np.int8)
    src = np.zeros((KD, NR, LANES), np.int8)
    hi_t = np.zeros((KD, NR, LANES), np.int8)
    w_t = np.zeros((KD, NR, LANES), np.float32)
    put = np.zeros((NR, LANES), np.int8)
    putvalid = np.zeros((NR, LANES), np.int8)
    colvalid = np.zeros((NR, LANES), np.int8)

    lvw[rows, col] = c["lv"].astype(np.int8)
    invl[rows, col] = c["lp"].astype(np.int8)
    invp[rows, col] = k.astype(np.int8)
    colvalid[rows, col] = 1
    src[k, rows, c["lp"]] = col.astype(np.int8)
    hi_t[k, rows, c["lp"]] = c["hi"]
    w_t[k, rows, c["lp"]] = c["w"]

    # run ends: last col of each (row, lv) run (cols lv-sorted)
    runkey = rows * LANES + c["lv"]
    last = np.r_[runkey[1:] != runkey[:-1], True]
    put[rows[last], c["lv"][last]] = col[last].astype(np.int8)
    putvalid[rows[last], c["lv"][last]] = 1

    # ---- backward chunk order ------------------------------------------
    bwd_order = np.lexsort((tile_c, sg_c)).astype(np.int32)
    sg_sorted = sg_c[bwd_order]
    bwd_first = np.r_[1, (sg_sorted[1:] != sg_sorted[:-1]).astype(np.int32)]

    return RoutedTables(
        lvw=lvw, src=src, hi=hi_t, w=w_t, invl=invl, invp=invp,
        put=put, putvalid=putvalid, colvalid=colvalid, sg=sg_c, tile=tile_c,
        fwd_first=fwd_first.astype(np.int32),
        bwd_order=bwd_order, bwd_first=bwd_first.astype(np.int32),
        NC=NC, SR=SR, KD=KD, G=G, HI=HI, T=T, H=H,
        n_rays=R, volume_size=volume_size, n_live=int(n_live),
    )


def _cumcount_by(ids, stable_order=None):
    """Occurrence counter within groups of an (unsorted) id array."""
    if ids.size == 0:
        return np.zeros(0, np.int64)
    order = np.argsort(ids, kind="stable") if stable_order is None \
        else stable_order
    out = np.empty(ids.shape[0], np.int64)
    out[order] = _cumcount(ids[order])
    return out


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
