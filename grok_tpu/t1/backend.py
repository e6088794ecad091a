"""Tier-1 backend dispatch: python reference / native C++ / device.

Parity: T1Interface / T1Factory (SURVEY.md §2.1 "Tier-1 interface").  The
reference dispatches per codeblock between MQ and HT coders; we additionally
dispatch between implementations:

- "python": the reference implementation in t1/coder.py (always available,
  correctness oracle)
- "native": C++ batch coder (native/t1.cc via ctypes), threads across
  codeblocks — the production host path
- future: Pallas context-formation kernels feeding the native MQ backend

Batch API: lists of codeblock jobs so the native backend can parallelize
freely (SURVEY.md §2.3 "codeblock-batch axis").
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..params import CblkStyle
from . import coder as pycoder


class LazyPasses:
    """Sequence of PassInfo materialized on demand from the native
    coder's pooled (rates, dists, terms) arrays.

    Building ~25 PassInfo objects per codeblock was ~15% of rate-targeted
    encode wall time; the hot consumers (hulls, Tier-2 statics) read the
    arrays directly and never materialize."""

    __slots__ = ("rates", "dists", "terms", "numbps", "_mat")

    def __init__(self, rates, dists, terms, numbps):
        self.rates = rates
        self.dists = dists
        self.terms = terms
        self.numbps = numbps
        self._mat = None

    def _list(self):
        if self._mat is None:
            from .coder import PassInfo

            out = []
            passno = 0
            n = len(self.rates)
            for bpno in range(self.numbps - 1, -1, -1):
                for ptype in ((2,) if bpno == self.numbps - 1 else (0, 1, 2)):
                    if passno >= n:
                        break
                    out.append(PassInfo(ptype, bpno,
                                        bool(self.terms[passno]),
                                        int(self.rates[passno]),
                                        float(self.dists[passno])))
                    passno += 1
            self._mat = out
        return self._mat

    def __len__(self):
        return len(self.rates)

    def __bool__(self):
        return len(self.rates) > 0

    def __getitem__(self, k):
        return self._list()[k]

    def __iter__(self):
        return iter(self._list())


@dataclass
class EncodeJob:
    coeffs: np.ndarray        # numpy, or a device (jax) array slice
    orient: int
    style: CblkStyle
    ht: bool = False          # Part 15 HT block coder instead of MQ
    need_dist: bool = True    # PCRD distortion tracking required
    # static magnitude-bitcount bound (band M_b); lets the device paths
    # pick a plane bucket without a device->host sync
    numbps_bound: int = 32
    # deferred quantization: > 0 means coeffs is a float32 band view and
    # the backend applies floor(|v|/delta) during ingest (the native
    # coder fuses it; other backends materialize via _materialize_quant)
    quant_delta: float = 0.0
    # max-shift ROI upshift applied to magnitudes during ingest
    roi_shift: int = 0
    # > 0: stop after the first pass whose cumulative rate reaches this
    # many bytes (rate-quota PCRD; see TileCompressor.run_t1)
    rate_cap: int = 0
    # results
    data: bytes = b""
    numbps: int = 0
    passes: list = field(default_factory=list)
    # native backend: e0 measured during coefficient ingest (sum m^2);
    # None on backends that don't provide it
    e0_out: float | None = None


def _materialize_quant(j: EncodeJob) -> None:
    """Apply deferred quantization/ROI for backends without fused ingest."""
    if j.quant_delta > 0.0:
        from ..transform.quant import quantize

        j.coeffs = quantize(np.asarray(j.coeffs), j.quant_delta)
        j.quant_delta = 0.0
    if j.roi_shift:
        j.coeffs = (np.asarray(j.coeffs).astype(np.int64)
                    << j.roi_shift).astype(np.int32)
        j.roi_shift = 0


@dataclass
class DecodeJob:
    data: bytes
    seg_lengths: list[int]
    num_passes: int
    numbps: int
    h: int
    w: int
    orient: int
    style: CblkStyle
    ht: bool = False
    out: np.ndarray | None = None  # doubled-domain signed int32
    # optional pre-zeroed (h, w) int32 view into the destination band
    # array: native backends write it directly (no paste copy) and set
    # direct_done; other backends ignore it and fill `out` as usual
    out_dest: np.ndarray | None = None
    direct_done: bool = False


def _encode_python(jobs: list[EncodeJob], num_threads: int = 0) -> None:
    for j in jobs:
        j.data, j.numbps, j.passes = pycoder.encode_cblk(
            j.coeffs, j.orient, j.style, rate_cap=j.rate_cap)


def _decode_python(jobs: list[DecodeJob], num_threads: int = 0) -> None:
    for j in jobs:
        j.out = pycoder.decode_cblk(
            j.data, j.seg_lengths, j.num_passes, j.numbps,
            j.h, j.w, j.orient, j.style)


_BACKENDS = {"python": (_encode_python, _decode_python)}
_HT_NATIVE = None  # (encode_fn, decode_fn) once native lib registers


def register_backend(name: str, encode_fn, decode_fn) -> None:
    _BACKENDS[name] = (encode_fn, decode_fn)


def register_ht_backend(encode_fn, decode_fn) -> None:
    global _HT_NATIVE
    _HT_NATIVE = (encode_fn, decode_fn)


def _load_native() -> bool:
    if "native" in _BACKENDS:
        return True
    try:
        from . import native  # noqa: F401  (registers itself)
    except Exception:
        return False
    return "native" in _BACKENDS


def resolve(backend: str = "auto") -> str:
    # "device" refers to the transform pipeline; T1 entropy coding runs on
    # the native host backend in that mode (SURVEY.md §7 device/host split)
    if backend in ("auto", "native", "device") and _load_native():
        return "native"
    return "python"


def _encode_ht(jobs: list[EncodeJob]) -> None:
    from ..t1.coder import PassInfo
    from . import ht

    for j in jobs:
        j.data, j.numbps = ht.encode_cblk_ht(j.coeffs)
        if j.numbps == 0:
            j.passes = []
        else:
            # HTONLY: one cleanup pass carrying everything
            e0 = float((np.abs(j.coeffs).astype(np.float64) ** 2).sum())
            j.passes = [PassInfo(2, j.numbps - 1, True, len(j.data), e0)]


def _decode_ht(jobs: list[DecodeJob]) -> None:
    from . import ht

    for j in jobs:
        j.out = ht.decode_cblk_ht(j.data, j.h, j.w)


def _encode_ht_device(jobs: list[EncodeJob]) -> list[EncodeJob]:
    """Route uniform even-dim HT jobs through the device (TPU) cleanup
    encoder, batched by codeblock shape (ops/ht_encode.py).  Returns the
    jobs the device path cannot take (ragged dims, out-of-range
    magnitudes) for the host coder."""
    from collections import defaultdict

    from ..ops import ht_encode as dht
    from ..t1.coder import PassInfo

    groups: dict = defaultdict(list)
    rest: list[EncodeJob] = []
    for j in jobs:
        h, w = j.coeffs.shape
        if h % 2 == 0 and w % 2 == 0 \
                and j.numbps_bound <= dht.MAX_NUMBPS_DEVICE:
            groups[(h, w)].append(j)
        else:
            rest.append(j)
    for (h, w), g in groups.items():
        batch = _stack_coeffs([j.coeffs for j in g])
        # pad the batch axis to a power of two to bound jit recompiles
        b = len(g)
        bpad = 1 << (b - 1).bit_length()
        if bpad != b:
            import jax.numpy as jnp

            batch = jnp.concatenate(
                [batch, jnp.zeros((bpad - b, h, w), jnp.int32)])
        segs = dht.encode_cblks_ht_device(batch)[:b]
        for j, (seg, nb) in zip(g, segs):
            j.data, j.numbps = seg, nb
            if nb == 0:
                j.passes = []
            else:
                e0 = float((np.abs(j.coeffs).astype(np.float64) ** 2).sum())
                j.passes = [PassInfo(2, nb - 1, True, len(seg), e0)]
    return rest


def _encode_mq_device(jobs: list[EncodeJob]) -> list[EncodeJob]:
    """Route eligible MQ jobs through the device Tier-1 encoder
    (ops/mq_encode.py): styles NONE/LAZY without distortion tracking,
    magnitudes within the device range.  Groups by (shape, style) and
    returns the jobs left for the host coder."""
    from collections import defaultdict

    from ..ops import mq_encode as dmq
    from ..params import CblkStyle

    groups: dict = defaultdict(list)
    rest: list[EncodeJob] = []
    for j in jobs:
        style = CblkStyle(j.style)
        cap = (dmq.MAX_NUMBPS_DIST if j.need_dist
               else dmq.MAX_NUMBPS_DEVICE)
        if style not in (CblkStyle.NONE, CblkStyle.LAZY) \
                or j.numbps_bound > cap:
            rest.append(j)
            continue
        h, w = j.coeffs.shape
        groups[(h, w, style == CblkStyle.LAZY, j.need_dist)].append(j)
    for (h, w, lazy, need_dist), g in groups.items():
        batch = _stack_coeffs([j.coeffs for j in g])
        # pad the batch axis to a power of two to bound jit recompiles
        b = len(g)
        bpad = 1 << (b - 1).bit_length()
        orients = np.array([j.orient for j in g] + [0] * (bpad - b),
                           dtype=np.int32)
        if bpad != b:
            import jax.numpy as jnp

            batch = jnp.concatenate(
                [batch, jnp.zeros((bpad - b, h, w), jnp.int32)])
        nb_bound = max(j.numbps_bound for j in g)
        res = dmq.encode_cblks_mq_device(batch, orients, lazy,
                                         numbps_bound=nb_bound,
                                         need_dist=need_dist)[:b]
        for j, (data, nb, passes, e0) in zip(g, res):
            j.data, j.numbps, j.passes = data, nb, passes
            j.e0_out = e0
    return rest


def _stack_coeffs(arrs):
    """Stack codeblock slices on the device when they are device arrays
    (keeps transform outputs resident — no coefficient round trip), on
    the host otherwise."""
    import jax.numpy as jnp

    if any(not isinstance(a, np.ndarray) for a in arrs):
        return jnp.stack([jnp.asarray(a, jnp.int32) for a in arrs])
    return jnp.asarray(np.stack(
        [np.ascontiguousarray(a, dtype=np.int32) for a in arrs]))


def encode_batch(jobs: list[EncodeJob], backend: str = "auto",
                 num_threads: int = 0) -> None:
    """num_threads sizes the native thread pool (-H parity; 0 = all
    cores).  Output is byte-identical for any thread count — jobs are
    independent and land in per-job buffers (the reference's determinism
    invariant, SURVEY.md §4)."""
    ht_jobs = [j for j in jobs if j.ht]
    mq_jobs = [j for j in jobs if not j.ht]
    if mq_jobs and backend == "device":
        for j in mq_jobs:
            _materialize_quant(j)
        mq_jobs = _encode_mq_device(mq_jobs)
    if ht_jobs and backend == "device":
        for j in ht_jobs:
            _materialize_quant(j)
        ht_jobs = _encode_ht_device(ht_jobs)
    if ht_jobs:
        name = resolve(backend)
        for j in ht_jobs:  # native HT ingest has no fused quantizer
            _materialize_quant(j)
        if name == "native" and _HT_NATIVE is not None and \
                backend != "python":
            _HT_NATIVE[0](ht_jobs, num_threads)
        else:
            _encode_ht(ht_jobs)
    if mq_jobs:
        name = resolve(backend)
        if name != "native":  # the native MQ coder fuses quant/ROI
            for j in mq_jobs:
                _materialize_quant(j)
        _BACKENDS[name][0](mq_jobs, num_threads)


def _decode_ht_device(jobs: list[DecodeJob]) -> list[DecodeJob]:
    """Batch even-dim HT decode jobs — mixed shapes together — through the
    device decoder (ops/ht_decode.py decodes them on one canonical padded
    quad grid); returns the jobs left for the host path."""
    from ..ops import ht_decode as dht

    dev: list[DecodeJob] = []
    rest: list[DecodeJob] = []
    for j in jobs:
        (dev if j.h % 2 == 0 and j.w % 2 == 0 else rest).append(j)
    if dev:
        outs = dht.decode_cblks_ht_device(
            [(j.data, j.h, j.w) for j in dev])
        for j, o in zip(dev, outs):
            j.out = o
    return rest


def _decode_mq_device(jobs: list[DecodeJob]) -> list[DecodeJob]:
    """Route eligible MQ decode jobs through the device decoder
    (ops/mq_decode.py flags-in-carry scan): styles NONE/LAZY, uniform
    shapes, numbps within the device range.  Small groups stay on the
    host (the scan amortizes across blocks, and each (shape, plane
    bucket) costs one jit compilation)."""
    from collections import defaultdict

    from ..ops import mq_decode as dmqd
    from ..params import CblkStyle

    groups: dict = defaultdict(list)
    rest: list[DecodeJob] = []
    for j in jobs:
        style = CblkStyle(j.style)
        if style not in (CblkStyle.NONE, CblkStyle.LAZY) \
                or j.numbps > dmqd.MAX_NUMBPS_DEVICE or j.numbps < 0:
            rest.append(j)
            continue
        groups[(j.h, j.w)].append(j)
    for (h, w), g in groups.items():
        if len(g) < 8:
            rest.extend(g)
            continue
        outs = dmqd.decode_cblks_mq_device(
            [(j.data, j.seg_lengths, j.num_passes, j.numbps, j.h, j.w,
              j.orient, j.style) for j in g])
        for j, o in zip(g, outs):
            j.out = o
    return rest


def decode_batch(jobs: list[DecodeJob], backend: str = "auto",
                 num_threads: int = 0) -> None:
    ht_jobs = [j for j in jobs if j.ht]
    mq_jobs = [j for j in jobs if not j.ht]
    if mq_jobs and backend == "device":
        mq_jobs = _decode_mq_device(mq_jobs)
    if ht_jobs and backend == "device":
        ht_jobs = _decode_ht_device(ht_jobs)
    if ht_jobs:
        name = resolve(backend)
        if name == "native" and _HT_NATIVE is not None and \
                backend != "python":
            _HT_NATIVE[1](ht_jobs, num_threads)
        else:
            _decode_ht(ht_jobs)
    if mq_jobs:
        name = resolve(backend)
        _BACKENDS[name][1](mq_jobs, num_threads)
