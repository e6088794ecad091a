"""Device (XLA/Pallas) color transforms + DC shift + quantization.

Parity: device replacements for mct/Quantizer (SURVEY.md §2.1 "MCT",
"Quantization"; §7: "DC shift + MCT (RCT/ICT as fused elementwise kernels;
custom MCT via MXU matmul)").

The RCT/ICT + DC shift stage ships both as plain jnp (XLA fuses it into
the DWT) and as an explicit Pallas VPU kernel (used when tile shapes align
to the (8,128) float32 / (8,128) int32 tiling) — the Pallas path keeps the
whole 3-component pixel block in VMEM for one pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..transform.mct import ICT_FWD, ICT_INV


def dc_shift(x: jnp.ndarray, prec: int, sgnd: bool) -> jnp.ndarray:
    if sgnd:
        return x
    return x - (1 << (prec - 1))


def dc_unshift(x: jnp.ndarray, prec: int, sgnd: bool) -> jnp.ndarray:
    if sgnd:
        lo, hi = -(1 << (prec - 1)), (1 << (prec - 1)) - 1
        return jnp.clip(x, lo, hi)
    return jnp.clip(x + (1 << (prec - 1)), 0, (1 << prec) - 1)


def rct_forward(r, g, b):
    y = (r + 2 * g + b) >> 2
    return y, b - g, r - g


def rct_inverse(y, cb, cr):
    g = y - ((cb + cr) >> 2)
    return cr + g, g, cb + g


def ict_forward(r, g, b):
    m = jnp.asarray(ICT_FWD, dtype=jnp.float32)
    y = m[0, 0] * r + m[0, 1] * g + m[0, 2] * b
    cb = m[1, 0] * r + m[1, 1] * g + m[1, 2] * b
    cr = m[2, 0] * r + m[2, 1] * g + m[2, 2] * b
    return y, cb, cr


def ict_inverse(y, cb, cr):
    m = jnp.asarray(ICT_INV, dtype=jnp.float32)
    r = y + m[0, 2] * cr
    g = y + m[1, 1] * cb + m[1, 2] * cr
    b = y + m[2, 1] * cb
    return r, g, b


def custom_mct_forward(planes: jnp.ndarray, matrix: jnp.ndarray):
    """Part-2 decorrelation on (C, ..., H, W) via MXU matmul."""
    c = planes.shape[0]
    flat = planes.reshape(c, -1).astype(jnp.float32)
    out = jnp.dot(matrix.astype(jnp.float32), flat,
                  preferred_element_type=jnp.float32)
    return out.reshape(planes.shape)


def quantize(coeffs: jnp.ndarray, delta: float) -> jnp.ndarray:
    q = jnp.floor(jnp.abs(coeffs) / jnp.float32(delta)).astype(jnp.int32)
    return jnp.where(coeffs < 0, -q, q)


def dequantize(doubled: jnp.ndarray, delta: float) -> jnp.ndarray:
    return doubled.astype(jnp.float32) * jnp.float32(0.5 * delta)


# --------------------------------------------------------------- Pallas path

def _rct_shift_kernel(r_ref, g_ref, b_ref, y_ref, cb_ref, cr_ref, *,
                      shift: int):
    r = r_ref[:] - shift
    g = g_ref[:] - shift
    b = b_ref[:] - shift
    y_ref[:] = (r + 2 * g + b) >> 2
    cb_ref[:] = b - g
    cr_ref[:] = r - g


def rct_forward_pallas(r: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                       prec: int, sgnd: bool):
    """Fused DC-shift + RCT as a Pallas VPU kernel on (H, W) int32 planes.
    Requires H % 8 == 0 and W % 128 == 0 (fp32/int32 tiling); callers fall
    back to the jnp path otherwise."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    shift = 0 if sgnd else 1 << (prec - 1)
    h, w = r.shape
    th = min(h, 256)
    tw = min(w, 512)
    grid = (-(-h // th), -(-w // tw))
    spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((h, w), jnp.int32)
    return pl.pallas_call(
        functools.partial(_rct_shift_kernel, shift=shift),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
    )(r, g, b)


def _irct_unshift_kernel(y_ref, cb_ref, cr_ref, r_ref, g_ref, b_ref, *,
                         shift: int, maxval: int):
    y = y_ref[:]
    cb = cb_ref[:]
    cr = cr_ref[:]
    g = y - ((cb + cr) >> 2)
    r = cr + g
    b = cb + g
    r_ref[:] = jnp.clip(r + shift, 0, maxval)
    g_ref[:] = jnp.clip(g + shift, 0, maxval)
    b_ref[:] = jnp.clip(b + shift, 0, maxval)


def rct_inverse_pallas(y: jnp.ndarray, cb: jnp.ndarray, cr: jnp.ndarray,
                       prec: int):
    """Fused inverse RCT + DC unshift + clamp (unsigned components)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h, w = y.shape
    th = min(h, 256)
    tw = min(w, 512)
    grid = (-(-h // th), -(-w // tw))
    spec = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                        memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((h, w), jnp.int32)
    return pl.pallas_call(
        functools.partial(_irct_unshift_kernel, shift=1 << (prec - 1),
                          maxval=(1 << prec) - 1),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
    )(y, cb, cr)
