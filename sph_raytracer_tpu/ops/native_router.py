"""ctypes bridge to the native router core (native/router.cpp).

The C++ core replaces the numpy router's sort/grouping passes (the
dominant cost of building routed tables — ~56s for the 17M-crossing
flagship in numpy, a few seconds native).  Table semantics are identical;
``tests/test_routed.py::test_native_router_matches_numpy`` checks
bit-equality.  If the shared library is missing or fails, callers fall
back to the numpy path transparently.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

__all__ = ["native_assign", "native_fill", "native_preprocess",
           "available", "build_native"]

LANES = 128

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))),
        "native", "librouter.so")


def build_native(quiet: bool = True) -> bool:
    """Attempt to build native/librouter.so with make (no-op if present)."""
    import subprocess

    d = os.path.dirname(_lib_path())
    if not os.path.exists(os.path.join(d, "Makefile")):
        return False
    r = subprocess.run(["make", "-C", d],
                       capture_output=quiet, text=True)
    return r.returncode == 0 and os.path.exists(_lib_path())


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        if not build_native():
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.route_assign.restype = ctypes.c_int64
    lib.route_assign.argtypes = [
        i64p, i64p, i32p, i32p, i32p,              # rowkey, tsg, p, lv, lp
        ctypes.c_int64, ctypes.c_int64,            # n, NSG
        ctypes.c_int32, ctypes.c_int32,            # SR, KD
        i32p, u8p, u8p, u8p, u8p, u8p, u8p, u8p,   # per-crossing outputs
        ctypes.c_int64, i32p, i32p,                # chunk_cap, sg, tile
        i32p, i32p,                                # max_run_fwd/bwd
    ]
    if hasattr(lib, "fill_tables"):
        i8p = ctypes.POINTER(ctypes.c_int8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.fill_tables.restype = None
        lib.fill_tables.argtypes = (
            [i32p] + [u8p] * 7                       # chunk_of + na fields
            + [i8p, i16p, i16p, i16p, f32p]          # hi, lp, lv, qoff, w
            + [ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
               ctypes.c_int64]                       # n, SR, KD, NR
            + [i8p, f32p] + [i8p] * 5 + [f32p] + [i8p] * 7  # out tables
        )
    if hasattr(lib, "chunk_stats"):
        lib.chunk_stats.restype = None
        lib.chunk_stats.argtypes = [
            i32p] + [u8p] * 5 + [ctypes.c_int64, ctypes.c_int64] + [i32p] * 3
    if hasattr(lib, "preprocess"):
        i8p = ctypes.POINTER(ctypes.c_int8)
        i16p = ctypes.POINTER(ctypes.c_int16)
        i64p2 = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.count_live.restype = ctypes.c_int64
        lib.count_live.argtypes = [f32p, ctypes.c_int64]
        lib.preprocess.restype = None
        lib.preprocess.argtypes = (
            [i32p, f32p]                              # lin, lens
            + [ctypes.c_int64] * 4 + [ctypes.c_int32]  # R, M, G, NSG, SR
            + [i64p2, i64p2, i32p, i32p, i32p, i8p, i16p, f32p]
        )
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def native_assign(rowkey, tsg, p, lv, lp, NSG: int, SR: int, KD: int
                  ) -> Optional[dict]:
    """Run the native slot assignment.  Returns None on any failure
    (caller falls back to numpy)."""
    lib = _load()
    if lib is None:
        return None
    n = rowkey.shape[0]
    if n and (int(p.max()) >= 4096 or int(rowkey.max()) >= (1 << 38)):
        return None  # packed-key limits (G ≤ 4096)

    rowkey = np.ascontiguousarray(rowkey, np.int64)
    tsg = np.ascontiguousarray(tsg, np.int64)
    p32 = np.ascontiguousarray(p, np.int32)
    lv32 = np.ascontiguousarray(lv, np.int32)
    lp32 = np.ascontiguousarray(lp, np.int32)

    chunk_of = np.empty(n, np.int32)
    col = np.empty(n, np.uint8)
    kpass = np.empty(n, np.uint8)
    runend = np.empty(n, np.uint8)
    ppos = np.empty(n, np.uint8)
    lastp = np.empty(n, np.uint8)
    rposf = np.empty(n, np.uint8)
    rposb = np.empty(n, np.uint8)
    cap = max(1024, n // 32 + 4096)
    while True:
        chunk_sg = np.empty(cap, np.int32)
        chunk_tile = np.empty(cap, np.int32)
        mrf = ctypes.c_int32(0)
        mrb = ctypes.c_int32(0)

        def P(a, t):
            return a.ctypes.data_as(t)

        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        rc = lib.route_assign(
            P(rowkey, i64p), P(tsg, i64p), P(p32, i32p), P(lv32, i32p),
            P(lp32, i32p), n, NSG, SR, KD,
            P(chunk_of, i32p), P(col, u8p), P(kpass, u8p), P(runend, u8p),
            P(ppos, u8p), P(lastp, u8p), P(rposf, u8p), P(rposb, u8p),
            cap, P(chunk_sg, i32p), P(chunk_tile, i32p),
            ctypes.byref(mrf), ctypes.byref(mrb),
        )
        if rc == -1:
            cap *= 4
            continue
        if rc < 0:
            return None
        NC = int(rc)
        break

    return dict(
        chunk_of=chunk_of, col=col, kpass=kpass, runend=runend,
        ppos=ppos, lastp=lastp, rposf=rposf, rposb=rposb,
        chunk_sg=chunk_sg[:NC].copy(), chunk_tile=chunk_tile[:NC].copy(),
        NC=NC, max_run_fwd=int(mrf.value), max_run_bwd=int(mrb.value),
    )


def native_preprocess(lin, lens, G: int, NSG: int, SR: int
                      ) -> Optional[dict]:
    """Compact live crossings + derive routing keys in one parallel
    native pass (bit-identical to the numpy nonzero/gather/divmod
    pipeline, which is ~7 s single-threaded at 17M crossings).  Returns
    None if the library or symbol is unavailable or dtypes don't fit."""
    lib = _load()
    if lib is None or not hasattr(lib, "preprocess"):
        return None
    lin = np.asarray(lin)
    if lin.dtype != np.int32:
        if lin.size and (lin.max() >= 2**31 or lin.min() < 0):
            return None
        lin = lin.astype(np.int32)
    lin = np.ascontiguousarray(lin)
    lens = np.ascontiguousarray(lens, np.float32)
    R, M = lin.shape

    i8p = ctypes.POINTER(ctypes.c_int8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)

    def P(a, t):
        return a.ctypes.data_as(t)

    n = int(lib.count_live(P(lens, f32p), R * M))
    out = dict(
        rowkey=np.empty(n, np.int64), tsg=np.empty(n, np.int64),
        p=np.empty(n, np.int32), lv=np.empty(n, np.int32),
        lp=np.empty(n, np.int32), hi=np.empty(n, np.int8),
        qoff=np.empty(n, np.int16), w=np.empty(n, np.float32), n=n,
    )
    if n:
        lib.preprocess(
            P(lin, i32p), P(lens, f32p), R, M, G, NSG, SR,
            P(out["rowkey"], i64p), P(out["tsg"], i64p), P(out["p"], i32p),
            P(out["lv"], i32p), P(out["lp"], i32p), P(out["hi"], i8p),
            P(out["qoff"], i16p), P(out["w"], f32p))
    return out


def native_chunk_stats(na: dict, NC: int) -> Optional[tuple]:
    """Per-chunk (kmax, max fwd run, max bwd run) in one parallel native
    pass; returns None when the symbol is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "chunk_stats"):
        return None
    n = int(na["chunk_of"].shape[0])
    kmax = np.zeros(NC, np.int32)
    mrf = np.zeros(NC, np.int32)
    mrb = np.zeros(NC, np.int32)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    def P(a, t):
        return a.ctypes.data_as(t)

    lib.chunk_stats(
        P(na["chunk_of"], i32p), P(na["kpass"], u8p), P(na["runend"], u8p),
        P(na["lastp"], u8p), P(na["rposf"], u8p), P(na["rposb"], u8p),
        n, NC, P(kmax, i32p), P(mrf, i32p), P(mrb, i32p))
    return kmax, mrf, mrb


def native_fill(na: dict, hi, lp, lv, qoff, w, SR: int, KD: int, NR: int
                ) -> Optional[tuple]:
    """Scatter all per-crossing fields into the (NR, 128) tables in one
    native pass (bit-identical to the numpy scatters in
    ``_fill_tables_native``).  Returns the 15 table arrays, or None if the
    native library (or its fill_tables symbol) is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "fill_tables"):
        return None
    n = int(na["chunk_of"].shape[0])

    i8p = ctypes.POINTER(ctypes.c_int8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)

    hi = np.ascontiguousarray(hi, np.int8)
    lp = np.ascontiguousarray(lp, np.int16)
    lv = np.ascontiguousarray(lv, np.int16)
    qoff = np.ascontiguousarray(qoff, np.int16)
    w = np.ascontiguousarray(w, np.float32)

    lvw = np.empty((NR, LANES), np.int8)
    wt = np.empty((NR, LANES), np.float32)
    hi8 = np.empty((NR, LANES), np.int8)
    lp8 = np.empty((NR, LANES), np.int8)
    kcolt = np.empty((NR, LANES), np.int8)
    rposf_t = np.empty((NR, LANES), np.int8)
    rposb_t = np.empty((NR, LANES), np.int8)
    wp = np.empty((NR, LANES), np.float32)
    lp8p = np.empty((NR, LANES), np.int8)
    kcolp = np.empty((NR, LANES), np.int8)
    perm = np.empty((NR, LANES), np.int8)
    put = np.empty((NR, LANES), np.int8)
    putv = np.empty((NR, LANES), np.int8)
    src = np.empty((KD, NR, LANES), np.int8)
    hik = np.empty((KD, NR, LANES), np.int8)

    def P(a, t):
        return a.ctypes.data_as(t)

    lib.fill_tables(
        P(na["chunk_of"], i32p), P(na["col"], u8p), P(na["kpass"], u8p),
        P(na["runend"], u8p), P(na["ppos"], u8p), P(na["lastp"], u8p),
        P(na["rposf"], u8p), P(na["rposb"], u8p),
        P(hi, i8p), P(lp, i16p), P(lv, i16p), P(qoff, i16p), P(w, f32p),
        n, SR, KD, NR,
        P(lvw, i8p), P(wt, f32p), P(hi8, i8p), P(lp8, i8p), P(kcolt, i8p),
        P(rposf_t, i8p), P(rposb_t, i8p), P(wp, f32p), P(lp8p, i8p),
        P(kcolp, i8p), P(perm, i8p), P(put, i8p), P(putv, i8p),
        P(src, i8p), P(hik, i8p),
    )
    return (lvw, wt, hi8, lp8, kcolt, rposf_t, rposb_t, wp, lp8p, kcolp,
            perm, put, putv, src, hik)
