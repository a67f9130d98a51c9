"""On-device routing: build the banded routing tables ON THE TPU.

The host pipeline (``route.build_routed_tables`` + ``route.band_pack``,
with the C++ core in native/router.cpp) costs ~8-10 s of host routing
plus a 10-30 s upload of ~2.5 GB of tables through a relayed device —
the dominant share of the Operator's one-time setup (BENCH_r01: 29.1 s
warm).  This module runs the SAME algorithm as XLA ops on the device the
tables will live on: the crossing tables come straight from the on-chip
trace, every sort/scan/scatter runs at HBM speed (measured v5e: 17M-entry
2-key sort 68 ms, 17M scatter-add 115 ms, cumsum 4 ms), and nothing
crosses the host boundary except a handful of scalar / per-chunk-array
fetches (KB scale).

Bit-compatibility: given the same (lin, lens) and ``npad_multiple=1``,
the tables produced here are byte-identical to
``band_pack(build_routed_tables(...))`` — every stable-sort order
mirrors the corresponding ``np.lexsort`` of the numpy router (tested in
tests/test_route_device.py).  With production padding, dead (w = 0)
crossings route to the last (tile, window) rows with zero weight — extra
zero-contribution bands, same mechanism as ``route.pad_chunks``.

Static-shape discipline: XLA needs static shapes but n_live and the
chunk count are data-dependent, so the build runs as jit stages
separated by scalar fetches (n_live, the spill convergence flag, NC),
with sizes rounded to coarse buckets so compiles cache across
geometries.

Key-packing guards: rowkey = (tile·NSG + sg)·SR + qoff must fit 26 bits
and G ≤ 2^14 so composite sort keys fit int32 — both hold for any config
that passes route.py's 16-bit BlockSpec guards; violations raise before
any device work and the caller falls back to the host router.
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .route import LANES, SUBLANES, _covered, _round_up

__all__ = ["build_banded_device", "DevicePadHelper"]

_I32 = jnp.int32


class DevicePadHelper(NamedTuple):
    """pad_density/unpad_density provider (the BandedTables methods the
    Operator's kernel wrappers use) for device-built tables that have no
    host-side BandedTables object."""

    H: int
    volume_size: int

    def pad_density(self, flat):
        lead = flat.shape[:-1]
        pad = self.H * LANES - flat.shape[-1]
        flat = jnp.concatenate(
            [flat, jnp.zeros((*lead, pad), flat.dtype)], axis=-1)
        return flat.reshape(*lead, self.H, LANES)

    def unpad_density(self, d2):
        lead = d2.shape[:-2]
        return d2.reshape(*lead, self.H * LANES)[..., : self.volume_size]


# ---------------------------------------------------------------------------
# small device combinators
# ---------------------------------------------------------------------------

def _prev_ne(x, fill=-1):
    """True where x differs from its predecessor (first element: True)."""
    return x != jnp.roll(x, 1).at[0].set(fill)


def _occ_within(first, idx):
    """Occurrence counter within groups delimited by ``first`` flags over
    already-grouped data (the device np-router ``_cumcount``)."""
    return idx - jax.lax.cummax(jnp.where(first, idx, -1))


def _sort2(khi, klo, *payloads):
    """Stable composite sort by (khi, klo) — the device np.lexsort."""
    return jax.lax.sort((khi, klo) + payloads, num_keys=2, is_stable=True)


def _scatter_set(flat_idx, val, n, dtype, init=0):
    # mode='drop': parked indices (pure-dead chunks routed past the end)
    # must vanish, not clamp onto the last slot
    base = jnp.full((n,), init, dtype)
    return base.at[flat_idx].set(val.astype(dtype), mode="drop")


# ---------------------------------------------------------------------------
# jit stages
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("M", "G", "NSG", "SR", "T"))
def _stage_classify(lin, lens, M, G, NSG, SR, T):
    """Per-crossing fields + liveness count (flat, original order).

    Dead crossings take sentinel coordinates — last tile, last window,
    qoff spread over the window's SR rows, last ray-in-tile, last voxel
    lane — so they sort to the very end and pad the final chunk(s) with
    zero-weight slots (≤ npad_multiple/(SR·128) extra bands)."""
    v = lin.reshape(-1).astype(_I32)
    w = lens.reshape(-1).astype(jnp.float32)
    n = v.shape[0]
    idx = jnp.arange(n, dtype=_I32)
    ray = idx // M
    keep = w > 0
    tile = jnp.where(keep, ray // G, T - 1)
    p = jnp.where(keep, ray % G, G - 1)
    q = v // LANES
    lv = jnp.where(keep, v % LANES, LANES - 1)
    sg = jnp.where(keep, q // SR, NSG - 1)
    qoff = jnp.where(keep, q % SR, idx % SR)
    rowkey = (tile * NSG + sg) * SR + qoff
    khi = rowkey + jnp.where(keep, 0, 1 << 27).astype(_I32)
    klo = p * LANES + lv
    return khi, klo, rowkey, p, lv, w, jnp.sum(keep)


@partial(jax.jit, static_argnames=("npad", "exact"))
def _stage_compact(khi, klo, rowkey, p, lv, w, npad, exact):
    """Sort live crossings to the front (dead ones carry a +2^27 key bit)
    and truncate to ``npad``; then re-sort by plain (rowkey, p, lv) so
    the kept dead entries rejoin their rowkey groups — without this their
    occupancy would restart at column 0 and collide with live slots
    (``exact`` = npad == n_live: no dead entries kept, skip the
    re-sort to stay byte-identical to the numpy router)."""
    _, _, rowkey, p, lv, w = _sort2(khi, klo, rowkey, p, lv, w)
    rowkey, p, lv, w = (a[:npad] for a in (rowkey, p, lv, w))
    if not exact:
        _, _, rowkey, p, lv, w = _sort2(rowkey, p * LANES + lv,
                                        rowkey, p, lv, w)
    return rowkey, p, lv, w


@jax.jit
def _stage_resort(rowkey, spill, p, lv, w):
    """Re-sort by (rowkey, spill, p, lv) after a spill update
    (np.lexsort((lv, p, spill, rowkey)))."""
    klo = (spill * (LANES * 16384) + p * LANES + lv).astype(_I32)
    _, _, rowkey, p, lv, w, spill = _sort2(
        rowkey, klo, rowkey, p, lv, w, spill)
    return rowkey, spill, p, lv, w


@jax.jit
def _stage_assign(rowkey, spill, p, lv):
    """Column / rep / run assignment + reduce-pass ranks for the current
    (rowkey, spill, p, lv) order — one iteration of the numpy router's
    slot-assignment loop, minus the spill update."""
    n = rowkey.shape[0]
    idx = jnp.arange(n, dtype=_I32)
    grp_first = _prev_ne(rowkey) | _prev_ne(spill)
    occ = _occ_within(grp_first, idx)
    repdiv = occ // LANES
    col = (occ % LANES).astype(_I32)
    rep = spill * (jnp.max(repdiv) + 1) + repdiv

    runchange = grp_first | _prev_ne(rep) | _prev_ne(p)
    run_id = jnp.cumsum(runchange.astype(_I32)) - 1
    ends = jnp.roll(runchange, -1).at[n - 1].set(True)
    rposf = _occ_within(runchange, idx)

    # reduce-pass rank of each run among equal (rowkey, rep, lane): sort
    # the run ends by that key and count occurrences (korder/kk)
    lp = p % LANES
    ehi = jnp.where(ends, rowkey, 1 << 28)
    elo = jnp.where(ends, rep * LANES + lp, 0).astype(_I32)
    s_hi, s_elo, s_pos = _sort2(ehi, elo, idx)
    e_first = _prev_ne(s_hi) | _prev_ne(s_elo)
    kk_sorted = _occ_within(e_first, idx)
    kmax_global = jnp.max(jnp.where(s_hi < (1 << 28), kk_sorted, 0))
    kk = jnp.zeros((n,), _I32).at[s_pos].set(kk_sorted)
    return col, rep, run_id, ends, rposf, kk, kmax_global


@partial(jax.jit, static_argnames=("KD",))
def _stage_spill(rowkey, p, run_id, ends, KD):
    """One-shot spill generations: rank runs per (rowkey, lane) globally
    and send rank r to generation r // KD (key2/kk2/gen)."""
    n = rowkey.shape[0]
    idx = jnp.arange(n, dtype=_I32)
    lp = p % LANES
    valid_hi = jnp.where(ends, rowkey, 1 << 28)
    elo = jnp.where(ends, lp, 0).astype(_I32)
    s_hi, s_lo, s_run = _sort2(valid_hi, elo, run_id)
    e_first = _prev_ne(s_hi) | _prev_ne(s_lo)
    kk2 = _occ_within(e_first, idx)
    gen = kk2 // KD
    valid = s_hi < (1 << 28)
    gen_of_run = jnp.zeros((n,), _I32).at[
        jnp.where(valid, s_run, n - 1)
    ].max(jnp.where(valid, gen, 0))
    return gen_of_run[run_id]


@partial(jax.jit, static_argnames=("SR",))
def _stage_chunks(rowkey, rep, SR):
    """Chunk ids ascending by (tile·NSG+sg, rep) — np.unique(chunkkey)."""
    n = rowkey.shape[0]
    idx = jnp.arange(n, dtype=_I32)
    tsg = rowkey // SR
    s_tsg, s_rep, s_pos = _sort2(tsg, rep.astype(_I32), idx)
    cfirst = _prev_ne(s_tsg) | _prev_ne(s_rep)
    crank = jnp.cumsum(cfirst.astype(_I32)) - 1
    chunk_of = jnp.zeros((n,), _I32).at[s_pos].set(crank)
    return chunk_of, crank[n - 1]


@partial(jax.jit, static_argnames=("NCpad", "SR", "NSG"))
def _stage_chunk_scalars(rowkey, chunk_of, ends, rposf, kk, w, NCpad, SR,
                         NSG):
    tsg = rowkey // SR
    sg_c = _scatter_set(chunk_of, tsg % NSG, NCpad, _I32)
    tile_c = _scatter_set(chunk_of, tsg // NSG, NCpad, _I32)
    kmax_c = jnp.zeros((NCpad,), _I32).at[chunk_of].max(
        jnp.where(ends, kk, 0))
    runlen = jnp.where(ends, rposf + 1, 1)
    mrf = jnp.ones((NCpad,), _I32).at[chunk_of].max(runlen)
    sdf_c = jnp.ceil(jnp.log2(jnp.maximum(mrf, 1).astype(jnp.float32))
                     ).astype(_I32)
    # live slot count per chunk: pure-dead chunks (all slots from the
    # npad padding) are excluded from the band layout on the host
    live_c = jnp.zeros((NCpad,), _I32).at[chunk_of].add(
        (w > 0).astype(_I32))
    return sg_c, tile_c, kmax_c, sdf_c, live_c


@partial(jax.jit, static_argnames=("SR",))
def _stage_perm(chunk_of, rowkey, lv, col, SR):
    """Backward voxel-lane permutation: within each table row, order by
    (lv, col) (the numpy porder) and compute permuted positions, run
    positions, and run ends."""
    n = chunk_of.shape[0]
    idx = jnp.arange(n, dtype=_I32)
    rows = chunk_of * SR + (rowkey % SR)
    plo = (lv * LANES + col).astype(_I32)
    s_rows, _, s_pos, s_lv = _sort2(rows, plo, idx, lv)
    rfirst = _prev_ne(s_rows)
    ppos_sorted = _occ_within(rfirst, idx)
    runb_first = rfirst | _prev_ne(s_lv)
    rposb_sorted = _occ_within(runb_first, idx)
    lastp_sorted = jnp.roll(runb_first, -1).at[n - 1].set(True)
    ppos = jnp.zeros((n,), _I32).at[s_pos].set(ppos_sorted)
    lastp = jnp.zeros((n,), jnp.bool_).at[s_pos].set(lastp_sorted)
    rposb = jnp.zeros((n,), _I32).at[s_pos].set(rposb_sorted)
    return ppos, lastp, rposb


@partial(jax.jit, static_argnames=("NCpad",))
def _stage_sdb(chunk_of, lastp, rposb, NCpad):
    runlen = jnp.where(lastp, rposb + 1, 1)
    mrb = jnp.ones((NCpad,), _I32).at[chunk_of].max(runlen)
    return jnp.ceil(jnp.log2(jnp.maximum(mrb, 1).astype(jnp.float32))
                    ).astype(_I32)


@partial(jax.jit, static_argnames=("NR", "SR", "KD"))
def _stage_fill_fwd(slot_of_chunk, chunk_of, rowkey, col, lv, w, hi, lp,
                    ends, rposf, k_entry, NR, SR, KD):
    """Scatter the forward banded tables directly into banded layout.
    int8 fields ride one packed-int32 scatter and unpack on device."""
    rows = slot_of_chunk[chunk_of] * SR + (rowkey % SR)
    flat = rows * LANES + col
    n = NR * LANES
    w_t = _scatter_set(flat, w, n, jnp.float32)
    packed = _scatter_set(flat, lv | (rposf << 8), n, _I32)
    lvw = (packed & 0xFF).astype(jnp.int8)
    rposf_t = ((packed >> 8) & 0xFF).astype(jnp.int8)
    # src/hik at run ends: [k, row, ray-lane]; unwritten slots must read
    # src=0 / hik=-1, so hik is stored +1 in the pack.  The rows < NR
    # guard parks pure-dead chunks (whose rows sit past the table) — the
    # k·NR term would otherwise fold their overflow into pass k+1's rows
    kflat = (k_entry * NR + rows) * LANES + lp
    kflat = jnp.where(ends & (rows < NR), kflat, KD * n)
    packed_k = jnp.zeros((KD * n + 1,), _I32).at[kflat].set(
        (col | ((hi + 1) << 8)).astype(_I32))[:KD * n]
    src = (packed_k & 0xFF).astype(jnp.int8).reshape(KD, NR, LANES)
    hik = (((packed_k >> 8) & 0x1FF) - 1).astype(jnp.int8).reshape(
        KD, NR, LANES)
    return dict(lvw=lvw.reshape(NR, LANES), w=w_t.reshape(NR, LANES),
                rposf=rposf_t.reshape(NR, LANES), src=src, hik=hik)


@partial(jax.jit, static_argnames=("NR", "SR", "KD"))
def _stage_fill_bwd(slot_of_chunk, chunk_of, rowkey, col, lv, w, hi, lp,
                    ends, k_entry, ppos, lastp, rposb, NR, SR, KD):
    """Scatter the backward banded tables (permuted-position layout).
    ``k_entry`` is the per-entry reduce pass (its forward run's rank)."""
    rows = slot_of_chunk[chunk_of] * SR + (rowkey % SR)
    n = NR * LANES
    flat_p = rows * LANES + ppos
    wp = _scatter_set(flat_p, w, n, jnp.float32)
    packed = _scatter_set(flat_p, lp | (k_entry << 8) | (rposb << 16), n,
                          _I32)
    lp8p = (packed & 0xFF).astype(jnp.int8)
    kcolp = ((packed >> 8) & 0xFF).astype(jnp.int8)
    rposb_t = ((packed >> 16) & 0xFF).astype(jnp.int8)
    # put/putv at (row, voxel lane), marked at the (rows, lv) run ends
    flat_v = rows * LANES + lv
    flat_v = jnp.where(lastp, flat_v, n)
    packed_v = jnp.zeros((n + 1,), _I32).at[flat_v].set(
        (ppos | (1 << 8)).astype(_I32))[:n]
    put = (packed_v & 0xFF).astype(jnp.int8)
    putv = ((packed_v >> 8) & 0x1).astype(jnp.int8)
    # hik for the backward g-fetch (same fill as fwd, banded by window);
    # rows < NR parks pure-dead chunks (see _stage_fill_fwd)
    kflat = (k_entry * NR + rows) * LANES + lp
    kflat = jnp.where(ends & (rows < NR), kflat, KD * n)
    hik_p = jnp.zeros((KD * n + 1,), _I32).at[kflat].set(
        ((hi + 1)).astype(_I32))[:KD * n]
    hik = (hik_p - 1).astype(jnp.int8).reshape(KD, NR, LANES)
    return dict(wp=wp.reshape(NR, LANES), lp8p=lp8p.reshape(NR, LANES),
                kcolp=kcolp.reshape(NR, LANES),
                rposb=rposb_t.reshape(NR, LANES),
                put=put.reshape(NR, LANES), putv=putv.reshape(NR, LANES),
                hik=hik)


@jax.jit
def _expand_run_k(run_id, ends, kk):
    """Per-entry reduce pass: each entry takes its run end's kk."""
    n = run_id.shape[0]
    kk_by_run = jnp.zeros((n,), _I32).at[
        jnp.where(ends, run_id, n - 1)
    ].max(jnp.where(ends, kk, 0))
    return kk_by_run[run_id]


# ---------------------------------------------------------------------------
# host-side band layout (KB-scale numpy)
# ---------------------------------------------------------------------------

def _band_layout(order, key_sorted, nkeys, B, chunk_multiple):
    """Slot layout of band_pack: bands grouped by key, each group padded
    to a B multiple with dummy (-1) bands.  Bands fill each group
    COLUMN-major (band i → superchunk i % S, slot i // S) so same-slot
    pointers repeat across consecutive superchunks for rep bands —
    must stay bit-identical to route.band_pack's layout."""
    import os

    cmc = os.environ.get("SPH_CMC", "0") == "1"  # measured regression; see PERFORMANCE.md
    counts = np.bincount(key_sorted, minlength=nkeys)
    padded = -(-counts // B) * B
    NCB_real = int(padded.sum()) // B
    if chunk_multiple == "auto":
        chunk_multiple = max(32, 1 << max(0, NCB_real.bit_length() - 5))
    NCBp = _round_up(max(NCB_real, 1), chunk_multiple)
    nslots = NCBp * B
    sb = np.full(nslots, -1, np.int64)
    key_of_slot = np.zeros(nslots, np.int64)
    pos = start = 0
    for t in range(nkeys):
        c = int(counts[t])
        S = int(padded[t]) // B
        i = np.arange(c)
        if cmc:
            sb[pos + (i % S) * B + i // S] = order[start: start + c]
        else:
            sb[pos: pos + c] = order[start: start + c]
        key_of_slot[pos: pos + padded[t]] = t
        pos += int(padded[t])
        start += c
    key_of_slot[pos:] = int(key_of_slot[max(pos - 1, 0)])
    keyp = key_of_slot.reshape(NCBp, B)[:, 0]
    return dict(sb=sb, keyp=keyp, NCB=NCBp, NCB_real=NCB_real,
                npad_slots=pos)


def _slot_of_chunk(lay, NC, B):
    """Chunk → banded slot; chunks absent from the layout (pure-dead)
    park one slot past the end, so their fills drop."""
    inv = np.full(NC, lay["NCB"] * B, np.int32)
    mask = lay["sb"] >= 0
    inv[lay["sb"][mask]] = np.flatnonzero(mask).astype(np.int32)
    return inv


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

def _banded_device_core(lin, lens, volume_size: int, G: int, SR: int = 8,
                        KD: int = 3, B: int = 32, chunk_multiple="auto",
                        max_iter: int = 16, npad_multiple: int = 1 << 20,
                        T: int = None, dense_fwd: bool = False,
                        dense_bwd: bool = False, bwd_only: bool = False):
    """Device-routing core: banded tables as RAW pieces.

    Same algorithm as :func:`build_banded_device` (which wraps this), but
    the per-superchunk scalars stay UNPACKED numpy arrays so callers can
    re-pad shards to a common superchunk count before packing ``p2`` —
    the multi-device table build (parallel/routed_sharded.py's
    ``build_banded_device_shards``) stacks shards on a leading device
    axis and needs every shard at identical shapes.

    Args:
        T: tile-count override (≥ the natural ``ceil(R/G)``) — sharded
            builds pass the common tiles-per-device so the last (short)
            shard's tile space matches its peers.

    Returns a dict with device row tables (``ftbl``/``btbl``), numpy
    per-superchunk scalars (``fsc``/``bsc``: bp, keyp, kmax, sdf|sdb,
    first), coverage masks, superchunk counts and scan depths.
    """
    import os
    import sys
    import time

    # per-stage ticks only at SPH_TPU_TIMING=2: each tick fetch-syncs
    # through the relay (~0.3-1 s), serializing stages that otherwise
    # pipeline — the default =1 must not pay that in the setup number
    timing = os.environ.get("SPH_TPU_TIMING") == "2"

    def tick(label, *sync):
        if not timing:
            return
        from ..utils.profiling import fetch_sync

        for s in sync:
            fetch_sync(s)
        now = time.time()
        print(f"[timing]   route_device/{label} {now - tick.t0:.1f}s",
              file=sys.stderr)
        tick.t0 = now

    tick.t0 = time.time()

    assert G % LANES == 0 and SR % SUBLANES == 0
    R, M = lin.shape
    HI = G // LANES
    T_nat = (R + G - 1) // G
    if T is None:
        T = T_nat
    assert T >= T_nat, (T, T_nat)
    H = _round_up(max(1, math.ceil(volume_size / LANES)), SR)
    NSG = H // SR
    if NSG > 2 ** 15:
        raise ValueError(f"{NSG} density windows overflow the 16-bit "
                         f"BlockSpec window field — raise SR or shard")
    if T > 2 ** 16:
        raise ValueError(f"{T} ray tiles overflow the 16-bit tile field")
    if T * NSG * SR >= (1 << 26) or G > (1 << 14):
        raise ValueError("rowkey exceeds the 26-bit device sort-key "
                         "budget — use the host router for this config")

    khi, klo, rowkey, p, lv, w, nlive = _stage_classify(
        lin, lens, M, G, NSG, SR, T)
    nlive = int(nlive)  # host sync 1
    tick("classify", w)
    if nlive == 0:
        # 'auto' resolves to classic on an empty build; FORCED dense
        # modes must keep their flags so the caller dispatches the
        # kernels matching the (dense-shaped) empty tables
        return _empty_core(SR, KD, G, HI, T, H, R, volume_size,
                           H // SR if dense_fwd is True else B,
                           T if dense_bwd is True else B, chunk_multiple,
                           dense_fwd is True, dense_bwd is True)
    npad = min(_round_up(nlive, npad_multiple), R * M)
    rowkey, p, lv, w = _stage_compact(khi, klo, rowkey, p, lv, w, npad,
                                      exact=(npad == nlive))
    tick("compact", w)
    spill = jnp.zeros((npad,), _I32)

    for _ in range(max_iter):
        col, rep, run_id, ends, rposf, kk, kmax_g = _stage_assign(
            rowkey, spill, p, lv)
        if int(kmax_g) < KD:  # host sync per iteration (1-2 typical)
            tick("assign", kk)
            break
        spill = _stage_spill(rowkey, p, run_id, ends, KD)
        rowkey, spill, p, lv, w = _stage_resort(rowkey, spill, p, lv, w)
    else:
        raise RuntimeError("device routing did not converge")

    chunk_of, NC_last = _stage_chunks(rowkey, rep, SR)
    NC = int(NC_last) + 1  # host sync
    tick("chunks", chunk_of)
    NCpad = _round_up(NC, 1024)
    sg_c, tile_c, kmax_c, sdf_c, live_c = _stage_chunk_scalars(
        rowkey, chunk_of, ends, rposf, kk, w, NCpad, SR, NSG)
    ppos, lastp, rposb = _stage_perm(chunk_of, rowkey, lv, col, SR)
    sdb_c = _stage_sdb(chunk_of, lastp, rposb, NCpad)
    tick("perm+scalars", sdb_c, ppos)

    # per-chunk arrays are KB-scale: lay out the band packing on the host
    sg_h = np.asarray(jax.device_get(sg_c))[:NC]
    tile_h = np.asarray(jax.device_get(tile_c))[:NC]
    kmax_h = np.asarray(jax.device_get(kmax_c))[:NC]
    sdf_h = np.asarray(jax.device_get(sdf_c))[:NC]
    sdb_h = np.asarray(jax.device_get(sdb_c))[:NC]
    live_h = np.asarray(jax.device_get(live_c))[:NC] > 0
    tick("chunk-fetch")

    # pure-dead chunks (all slots from npad padding) are dropped from the
    # band layout — their fills park past the table end (mode='drop'), so
    # the produced layout matches the host router's exactly
    from .route import _dense_layout, dense_slot_rows_ok

    live_ids = np.flatnonzero(live_h)
    if dense_fwd == "auto":
        dense_fwd = dense_slot_rows_ok(tile_h[live_ids], sg_h[live_ids],
                                       T, H // SR, B)
    if dense_bwd == "auto":
        dense_bwd = dense_slot_rows_ok(sg_h[live_ids], tile_h[live_ids],
                                       H // SR, T, B)
    Bf = H // SR if dense_fwd else B
    Bb = T if dense_bwd else B
    if bwd_only:
        fwd = None  # fused-fwd hybrid: no forward tables at all
    elif dense_fwd:
        fwd = _dense_layout(live_ids, tile_h[live_ids], sg_h[live_ids],
                            T, Bf, chunk_multiple)
    else:
        fwd = _band_layout(live_ids, tile_h[live_ids], T, B,
                           chunk_multiple)
    bwd_sub = np.lexsort((tile_h[live_ids], sg_h[live_ids]))
    bwd_order = live_ids[bwd_sub].astype(np.int64)
    if dense_bwd:
        bwd = _dense_layout(bwd_order, sg_h[bwd_order], tile_h[bwd_order],
                            H // SR, Bb, chunk_multiple)
    else:
        bwd = _band_layout(bwd_order, sg_h[bwd_order], H // SR, B,
                           chunk_multiple)

    def scalars(lay, other, Bs, dense=False):
        sb, keyp, NCB = lay["sb"], lay["keyp"], lay["NCB"]
        dummy = sb < 0
        sbs = np.where(dummy, 0, sb)
        if dense:  # the slot index IS the pointer (kernels never read it)
            bp = np.broadcast_to(
                np.arange(Bs, dtype=np.int32)[:, None], (Bs, NCB))
        else:
            from .route import _fill_dummy_ptrs

            bp = np.where(dummy, 0, other[sbs]).reshape(NCB, Bs).T
            bp = _fill_dummy_ptrs(bp, dummy.reshape(NCB, Bs).T)
        km = np.where(dummy, 0, kmax_h[sbs]).reshape(NCB, Bs).max(axis=1)
        sf = np.where(dummy, 0, sdf_h[sbs]).reshape(NCB, Bs).max(axis=1)
        sbd = np.where(dummy, 0, sdb_h[sbs]).reshape(NCB, Bs).max(axis=1)
        first = np.r_[1, (keyp[1:] != keyp[:-1]).astype(np.int32)]
        if lay["npad_slots"] < NCB * Bs and lay["NCB_real"] > 0:
            first[lay["NCB_real"]:] = 0
        return (bp.astype(np.int32), keyp.astype(np.int32),
                km.astype(np.int32), sf.astype(np.int32),
                sbd.astype(np.int32), first.astype(np.int32))

    if bwd_only:
        f_bp = f_keyp = f_km = f_sf = f_first = None
    else:
        f_bp, f_keyp, f_km, f_sf, f_sb, f_first = scalars(
            fwd, sg_h, Bf, dense=dense_fwd)
    b_bp, b_keyp, b_km, b_sf, b_sb, b_first = scalars(
        bwd, tile_h, Bb, dense=dense_bwd)

    b_slot = jnp.asarray(_slot_of_chunk(bwd, NC, Bb))

    hi = p // LANES
    lp = p % LANES
    k_entry = _expand_run_k(run_id, ends, kk)
    NRb = bwd["NCB"] * Bb * SR
    if bwd_only:
        ftbl = None
    else:
        f_slot = jnp.asarray(_slot_of_chunk(fwd, NC, Bf))
        NRf = fwd["NCB"] * Bf * SR
        ftbl = _stage_fill_fwd(f_slot, chunk_of, rowkey, col, lv, w, hi,
                               lp, ends, rposf, k_entry, NRf, SR, KD)
        tick("fill-fwd", ftbl["w"])
    btbl = _stage_fill_bwd(b_slot, chunk_of, rowkey, col, lv, w, hi, lp,
                           ends, k_entry, ppos, lastp, rposb, NRb, SR, KD)
    tick("fill-bwd", btbl["wp"])

    scan_fwd = max(1, int(sdf_h[live_ids].max())) if len(live_ids) else 1
    scan_bwd = max(1, int(sdb_h[live_ids].max())) if len(live_ids) else 1

    return dict(
        ftbl=ftbl, btbl=btbl,
        fsc=(None if bwd_only else dict(
            bp=f_bp, keyp=f_keyp, kmax=f_km, sdf=f_sf, first=f_first)),
        bsc=dict(bp=b_bp, keyp=b_keyp, kmax=b_km, sdb=b_sb,
                 first=b_first),
        cov_f=_covered(tile_h[live_ids], T),
        cov_b=_covered(sg_h[live_ids], H // SR),
        NCBf=(0 if bwd_only else fwd["NCB"]), NCBb=bwd["NCB"],
        Bf=Bf, Bb=Bb,
        dense_fwd=bool(dense_fwd), dense_bwd=bool(dense_bwd),
        scan_fwd=scan_fwd, scan_bwd=scan_bwd,
        T=T, H=H, HI=HI, R=R)


def build_banded_device(lin, lens, volume_size: int, G: int, SR: int = 8,
                        KD: int = 3, B: int = 32, chunk_multiple="auto",
                        max_iter: int = 16, npad_multiple: int = 1 << 20,
                        dense_fwd: bool = False, dense_bwd: bool = False,
                        bwd_only: bool = False):
    """Build banded routing tables on the device holding ``lin``/``lens``.

    Args:
        lin: (R, M) packed voxel indices (device; int32).
        lens: (R, M) segment lengths (device; zeros dropped here).
        volume_size: V (or T·V for dynamic volumes).
        G / SR / KD / B / chunk_multiple: as route.build_routed_tables /
            route.band_pack (SR = rows per band = routed_band_rows).
        npad_multiple: live-crossing padding granularity (compile-cache
            bucketing; 1 = exact, used by the bit-parity tests).
        dense_fwd / dense_bwd: dense-slot layouts per side (the device
            analog of route.band_pack_dense); ``"auto"`` applies the
            rep-skew gate (route.dense_slot_rows_ok) to the routed chunk
            stats.  B applies to classic sides only.

    Returns:
        (ft, meta, btd, metab, helper, (dense_fwd, dense_bwd)):
        BandedDeviceFwd / BandedDeviceBwd device tables + their
        RoutedMeta, a :class:`DevicePadHelper`, and the RESOLVED dense
        flags (what 'auto' chose).
    """
    from .routed_project import (
        BandedDeviceBwd,
        BandedDeviceFwd,
        RoutedMeta,
    )

    c = _banded_device_core(lin, lens, volume_size, G, SR, KD, B,
                            chunk_multiple, max_iter, npad_multiple,
                            dense_fwd=dense_fwd, dense_bwd=dense_bwd,
                            bwd_only=bwd_only)
    T, H, HI, R = c["T"], c["H"], c["HI"], c["R"]
    ftbl, btbl, fsc, bsc = c["ftbl"], c["btbl"], c["fsc"], c["bsc"]

    def p2(sc, sd_key):
        return jnp.asarray(
            (sc["first"] | (sc["kmax"] << 4) | (sc[sd_key] << 8)
             | (sc["keyp"] << 16)).astype(np.int32))

    if bwd_only and ftbl is None:
        ft = meta = None
    else:
        ft = BandedDeviceFwd(
            lvw=ftbl["lvw"], w=ftbl["w"], rposf=ftbl["rposf"],
            src=ftbl["src"], hik=ftbl["hik"], bp=jnp.asarray(fsc["bp"]),
            p2=p2(fsc, "sdf"), covered=jnp.asarray(c["cov_f"]))
        meta = RoutedMeta(c["NCBf"], SR * c["Bf"], KD, G, HI, T, H, R,
                          volume_size, c["scan_fwd"], c["scan_bwd"])
    btd = BandedDeviceBwd(
        rposb=btbl["rposb"], wp=btbl["wp"], lp8p=btbl["lp8p"],
        kcolp=btbl["kcolp"], hik=btbl["hik"], put=btbl["put"],
        putv=btbl["putv"], bp=jnp.asarray(bsc["bp"]),
        p2=p2(bsc, "sdb"), covered=jnp.asarray(c["cov_b"]))
    metab = RoutedMeta(c["NCBb"], SR * c["Bb"], KD, G, HI, T, H, R,
                       volume_size, c["scan_fwd"], c["scan_bwd"])
    return (ft, meta, btd, metab, DevicePadHelper(H, volume_size),
            (c["dense_fwd"], c["dense_bwd"]))


def _empty_core(SR, KD, G, HI, T, H, R, volume_size, Bf, Bb,
                chunk_multiple, dense_fwd: bool = False,
                dense_bwd: bool = False):
    """Raw pieces of all-dummy tables for an empty shard (no live
    crossings): reuse the host empty-band construction (KB-scale)."""
    from .route import _empty_banded, _empty_tables

    rt = _empty_tables(SR, KD, G, HI, T, H, R, volume_size)
    btF = _empty_banded(rt, Bf, "tile", chunk_multiple)
    btB = _empty_banded(rt, Bb, "window", chunk_multiple)
    return dict(
        ftbl={k: jnp.asarray(getattr(btF, k))
              for k in ("lvw", "w", "rposf", "src", "hik")},
        btbl={k: jnp.asarray(getattr(btB, k))
              for k in ("rposb", "wp", "lp8p", "kcolp", "put", "putv",
                        "hik")},
        fsc=dict(bp=btF.bp, keyp=btF.keyp, kmax=btF.kmax, sdf=btF.sdf,
                 first=btF.first),
        bsc=dict(bp=btB.bp, keyp=btB.keyp, kmax=btB.kmax, sdb=btB.sdb,
                 first=btB.first),
        cov_f=btF.covered, cov_b=btB.covered,
        NCBf=btF.NCB, NCBb=btB.NCB, Bf=Bf, Bb=Bb,
        dense_fwd=dense_fwd, dense_bwd=dense_bwd,
        scan_fwd=btF.scan_fwd, scan_bwd=btB.scan_bwd,
        T=T, H=H, HI=HI, R=R)
