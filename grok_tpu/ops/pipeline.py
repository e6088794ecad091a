"""Fused device pipelines: the TPU compute path of the codec.

Parity: the device half of TileProcessor (SURVEY.md §3.1/3.2 HOT stages):

- analysis (encode front-end): DC shift -> MCT -> multi-level DWT ->
  quantization, one jit per (shape, numres, path) — XLA fuses the
  elementwise stages into the lifting kernels
- synthesis (decode back-end): dequant -> inverse DWT -> inverse MCT ->
  DC unshift + clamp

Both operate on batched (C, B, H, W) even-origin tiles.  Host geometry
code slices the resulting band arrays into codeblocks for the entropy
stage (native T1), and vice versa.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import dwt as ddwt
from . import mct as dmct


def analysis_impl(planes: jnp.ndarray, *, numres: int, reversible: bool,
                  mct: int, prec: int, sgnd: bool,
                  deltas: tuple[tuple[int, int, float], ...] = (),
                  dwt=None):
    """Encode front-end on (C, B, H, W) int32 tile batch.

    deltas: per-band quantization steps as ((resno, orient, delta), ...)
    for the irreversible path (empty = reversible, no quantization).
    Returns {(resno, orient): (C, B, h, w) int32} quantized coefficients.

    `dwt` swaps the transform stage (same signature as
    ddwt.forward_dwt_batch) while keeping every elementwise stage shared;
    parallel.mesh passes its halo-exchange row-sharded DWT here so the sp
    path can never drift from this normative pipeline.
    """
    c = planes.shape[0]
    x = dmct.dc_shift(planes, prec, sgnd)
    if mct == 1 and c >= 3:
        if reversible:
            y0, y1, y2 = dmct.rct_forward(x[0], x[1], x[2])
        else:
            y0, y1, y2 = dmct.ict_forward(x[0].astype(jnp.float32),
                                          x[1].astype(jnp.float32),
                                          x[2].astype(jnp.float32))
        rest = [x[i] for i in range(3, c)]
        x = jnp.stack([y0, y1, y2] + rest)
    if not reversible:
        x = x.astype(jnp.float32)
    bands = (dwt or ddwt.forward_dwt_batch)(x, numres, reversible)
    if not reversible:
        dmap = {(r, o): d for (r, o, d) in deltas}
        bands = {k: dmct.quantize(v, dmap[k]) for k, v in bands.items()}
    return bands


def synthesis_impl(bands: dict, *, numres: int, reversible: bool, mct: int,
                   prec: int, sgnd: bool, shape: tuple[int, int],
                   deltas: tuple[tuple[int, int, float], ...] = (),
                   dwt=None):
    """Decode back-end: bands {(resno, orient): (C, B, h, w)} ->
    (C, B, H, W) int32 samples.  For the reversible path band arrays are
    T1 doubled-domain ints; for irreversible they are doubled ints to be
    dequantized.  `dwt` swaps the transform stage (signature of
    ddwt.inverse_dwt_batch) — see analysis_impl."""
    if reversible:
        bands = {k: jnp.sign(v) * (jnp.abs(v) >> 1) for k, v in bands.items()}
    else:
        dmap = {(r, o): d for (r, o, d) in deltas}
        bands = {k: dmct.dequantize(v, dmap[k]) for k, v in bands.items()}
    x = (dwt or ddwt.inverse_dwt_batch)(bands, numres, reversible, shape)
    c = x.shape[0]
    if mct == 1 and c >= 3:
        if reversible:
            y0, y1, y2 = dmct.rct_inverse(x[0], x[1], x[2])
        else:
            y0, y1, y2 = dmct.ict_inverse(x[0], x[1], x[2])
        rest = [x[i] for i in range(3, c)]
        x = jnp.stack([y0, y1, y2] + rest)
    if not reversible:
        x = jnp.round(x).astype(jnp.int32)
    return dmct.dc_unshift(x, prec, sgnd)


analysis = functools.partial(jax.jit, static_argnames=(
    "numres", "reversible", "mct", "prec", "sgnd", "deltas",
    "dwt"))(analysis_impl)
synthesis = functools.partial(jax.jit, static_argnames=(
    "numres", "reversible", "mct", "prec", "sgnd", "shape",
    "deltas", "dwt"))(synthesis_impl)
