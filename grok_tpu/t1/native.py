"""ctypes bindings for the native C++ Tier-1 batch coder.

Parity: this is the production host entropy path (SURVEY.md §7
"Architecture stance": serial-bitstream stages in native code).  The
library is built by native/build.sh into grok_tpu/_native/libgrk_t1.so;
importing this module registers the "native" backend.
"""

from __future__ import annotations

import ctypes as ct
import os

import numpy as np

from . import backend as bk

_LIB_PATH = os.path.join(os.path.dirname(__file__), os.pardir, "_native",
                         "libgrk_t1.so")


class _EncJob(ct.Structure):
    _fields_ = [
        ("h", ct.c_int32), ("w", ct.c_int32),
        ("orient", ct.c_int32), ("style", ct.c_int32),
        ("need_dist", ct.c_int32),
        ("coeffs", ct.POINTER(ct.c_int32)),
        ("out", ct.POINTER(ct.c_uint8)),
        ("out_cap", ct.c_int32), ("out_len", ct.c_int32),
        ("numbps", ct.c_int32), ("num_passes", ct.c_int32),
        ("pass_rates", ct.POINTER(ct.c_int32)),
        ("pass_dists", ct.POINTER(ct.c_double)),
        ("pass_terms", ct.POINTER(ct.c_uint8)),
        ("status", ct.c_int32),
    ]


class _DecJob(ct.Structure):
    _fields_ = [
        ("h", ct.c_int32), ("w", ct.c_int32),
        ("orient", ct.c_int32), ("style", ct.c_int32),
        ("numbps", ct.c_int32), ("num_passes", ct.c_int32),
        ("data", ct.POINTER(ct.c_uint8)), ("data_len", ct.c_int32),
        ("seg_lens", ct.POINTER(ct.c_int32)), ("num_segs", ct.c_int32),
        ("out", ct.POINTER(ct.c_int32)),
        ("status", ct.c_int32),
    ]


_lib = ct.CDLL(_LIB_PATH)
_lib.grk_t1_encode_batch.argtypes = [ct.POINTER(_EncJob), ct.c_int, ct.c_int]
_lib.grk_t1_encode_batch.restype = ct.c_int
_lib.grk_t1_decode_batch.argtypes = [ct.POINTER(_DecJob), ct.c_int, ct.c_int]
_lib.grk_t1_decode_batch.restype = ct.c_int

MAX_PASSES = 3 * 32


def _i32ptr(a: np.ndarray):
    return a.ctypes.data_as(ct.POINTER(ct.c_int32))


def encode_batch_native(jobs: list[bk.EncodeJob], num_threads: int = 0) -> None:
    n = len(jobs)
    if n == 0:
        return
    cjobs = (_EncJob * n)()
    keep = []
    from ..t1.coder import PassInfo

    for i, j in enumerate(jobs):
        coeffs = np.ascontiguousarray(j.coeffs, dtype=np.int32)
        h, w = coeffs.shape
        cap = max(4096, h * w * 4 + 1024)
        out = np.empty(cap, dtype=np.uint8)
        rates = np.zeros(MAX_PASSES, dtype=np.int32)
        dists = np.zeros(MAX_PASSES, dtype=np.float64)
        terms = np.zeros(MAX_PASSES, dtype=np.uint8)
        keep.append((coeffs, out, rates, dists, terms))
        c = cjobs[i]
        c.h, c.w = h, w
        c.orient = int(j.orient)
        c.style = int(j.style)
        c.need_dist = 1 if j.need_dist else 0
        c.coeffs = _i32ptr(coeffs)
        c.out = out.ctypes.data_as(ct.POINTER(ct.c_uint8))
        c.out_cap = cap
        c.pass_rates = _i32ptr(rates)
        c.pass_dists = dists.ctypes.data_as(ct.POINTER(ct.c_double))
        c.pass_terms = terms.ctypes.data_as(ct.POINTER(ct.c_uint8))
    rc = _lib.grk_t1_encode_batch(cjobs, n, num_threads)
    if rc != 0:
        raise RuntimeError("native T1 encode overflow")
    for i, j in enumerate(jobs):
        c = cjobs[i]
        _, out, rates, dists, terms = keep[i]
        j.data = bytes(out[: c.out_len])
        j.numbps = int(c.numbps)
        np_ = int(c.num_passes)
        passes = []
        passno = 0
        numbps = j.numbps
        for bpno in range(numbps - 1, -1, -1):
            for ptype in ((2,) if bpno == numbps - 1 else (0, 1, 2)):
                if passno >= np_:
                    break
                passes.append(PassInfo(ptype, bpno, bool(terms[passno]),
                                       int(rates[passno]),
                                       float(dists[passno])))
                passno += 1
        j.passes = passes


def decode_batch_native(jobs: list[bk.DecodeJob], num_threads: int = 0) -> None:
    n = len(jobs)
    if n == 0:
        return
    cjobs = (_DecJob * n)()
    keep = []
    for i, j in enumerate(jobs):
        data = np.frombuffer(j.data, dtype=np.uint8) if j.data else \
            np.zeros(1, dtype=np.uint8)
        data = np.ascontiguousarray(data)
        segs = np.asarray(j.seg_lengths or [0], dtype=np.int32)
        out = np.zeros(j.h * j.w, dtype=np.int32)
        keep.append((data, segs, out))
        c = cjobs[i]
        c.h, c.w = j.h, j.w
        c.orient = int(j.orient)
        c.style = int(j.style)
        c.numbps = int(j.numbps)
        c.num_passes = int(j.num_passes)
        c.data = data.ctypes.data_as(ct.POINTER(ct.c_uint8))
        c.data_len = len(j.data)
        c.seg_lens = _i32ptr(segs)
        c.num_segs = len(segs)
        c.out = _i32ptr(out)
    _lib.grk_t1_decode_batch(cjobs, n, num_threads)
    for i, j in enumerate(jobs):
        _, _, out = keep[i]
        j.out = out.reshape(j.h, j.w)


class _HTEncJob(ct.Structure):
    _fields_ = [
        ("h", ct.c_int32), ("w", ct.c_int32),
        ("coeffs", ct.POINTER(ct.c_int32)),
        ("out", ct.POINTER(ct.c_uint8)),
        ("out_cap", ct.c_int32), ("out_len", ct.c_int32),
        ("numbps", ct.c_int32), ("status", ct.c_int32),
    ]


class _HTDecJob(ct.Structure):
    _fields_ = [
        ("h", ct.c_int32), ("w", ct.c_int32),
        ("data", ct.POINTER(ct.c_uint8)), ("data_len", ct.c_int32),
        ("out", ct.POINTER(ct.c_int32)), ("status", ct.c_int32),
    ]


_lib.grk_ht_encode_batch.argtypes = [ct.POINTER(_HTEncJob), ct.c_int, ct.c_int]
_lib.grk_ht_encode_batch.restype = ct.c_int
_lib.grk_ht_decode_batch.argtypes = [ct.POINTER(_HTDecJob), ct.c_int, ct.c_int]
_lib.grk_ht_decode_batch.restype = ct.c_int


def ht_encode_batch_native(jobs: list[bk.EncodeJob],
                           num_threads: int = 0) -> None:
    from ..t1.coder import PassInfo

    n = len(jobs)
    if n == 0:
        return
    cjobs = (_HTEncJob * n)()
    keep = []
    for i, j in enumerate(jobs):
        coeffs = np.ascontiguousarray(j.coeffs, dtype=np.int32)
        h, w = coeffs.shape
        cap = max(4096, h * w * 5 + 2048)
        out = np.empty(cap, dtype=np.uint8)
        keep.append((coeffs, out))
        c = cjobs[i]
        c.h, c.w = h, w
        c.coeffs = _i32ptr(coeffs)
        c.out = out.ctypes.data_as(ct.POINTER(ct.c_uint8))
        c.out_cap = cap
    rc = _lib.grk_ht_encode_batch(cjobs, n, num_threads)
    if rc != 0:
        raise RuntimeError("native HT encode overflow")
    for i, j in enumerate(jobs):
        c = cjobs[i]
        _, out = keep[i]
        j.data = bytes(out[: c.out_len])
        j.numbps = int(c.numbps)
        if j.numbps == 0:
            j.passes = []
        else:
            e0 = float((np.abs(keep[i][0]).astype(np.float64) ** 2).sum())
            j.passes = [PassInfo(2, j.numbps - 1, True, len(j.data), e0)]


def ht_decode_batch_native(jobs: list[bk.DecodeJob],
                           num_threads: int = 0) -> None:
    n = len(jobs)
    if n == 0:
        return
    cjobs = (_HTDecJob * n)()
    keep = []
    for i, j in enumerate(jobs):
        data = np.frombuffer(j.data, dtype=np.uint8) if j.data else \
            np.zeros(1, dtype=np.uint8)
        data = np.ascontiguousarray(data)
        out = np.zeros(j.h * j.w, dtype=np.int32)
        keep.append((data, out))
        c = cjobs[i]
        c.h, c.w = j.h, j.w
        c.data = data.ctypes.data_as(ct.POINTER(ct.c_uint8))
        c.data_len = len(j.data)
        c.out = _i32ptr(out)
    _lib.grk_ht_decode_batch(cjobs, n, num_threads)
    for i, j in enumerate(jobs):
        j.out = keep[i][1].reshape(j.h, j.w)


bk.register_backend("native", encode_batch_native, decode_batch_native)
bk.register_ht_backend(ht_encode_batch_native, ht_decode_batch_native)
