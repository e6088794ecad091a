"""Device-side HT cleanup metadata (context formation on the accelerator).

Roadmap role (SURVEY.md §7, PERF_NOTES.md): the HT cleanup pass splits
cleanly into (a) per-quad metadata — significance pattern rho, quad
exponent bound U, MEL significance events — which is pure data-parallel
arithmetic, and (b) serial byte emission.  This module computes (a) on the
device for whole codeblock batches; the host packer consumes the small
metadata arrays and raw magnitudes to emit the byte streams.  On hardware
with sane device->host bandwidth this moves ~80% of HT encode FLOPs onto
the VPU; byte emission stays on the host until a Pallas bit-packing kernel
lands (round 2).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


@jax.jit
def quad_metadata(coeffs: jnp.ndarray):
    """Per-quad HT cleanup metadata for a batch of codeblocks.

    coeffs: (..., H, W) int32 with H, W even (callers pad ragged blocks).
    Returns (rho, umax, nbits):
      rho   (..., H/2, W/2) int32 — 4-bit significance pattern with the
             host coder's sample order (TL, BL, TR, BR)
      umax  (..., H/2, W/2) int32 — max magnitude bit-length in the quad
      nbits (..., H/2, W/2) int32 — MagSgn payload bits contributed by the
             quad (popcount(rho) * (umax + 1)), for prefix-sum packing
    """
    mags = jnp.abs(coeffs)
    h, w = coeffs.shape[-2], coeffs.shape[-1]
    lead = coeffs.shape[:-2]
    q = mags.reshape(lead + (h // 2, 2, w // 2, 2))
    # sample order TL, BL, TR, BR -> bits 0..3
    tl = q[..., :, 0, :, 0]
    bl = q[..., :, 1, :, 0]
    tr = q[..., :, 0, :, 1]
    br = q[..., :, 1, :, 1]
    sig = [(s > 0).astype(jnp.int32) for s in (tl, bl, tr, br)]
    rho = sig[0] | (sig[1] << 1) | (sig[2] << 2) | (sig[3] << 3)
    bl_ = [32 - jax.lax.clz(s) for s in (tl, bl, tr, br)]
    umax = jnp.maximum(jnp.maximum(bl_[0], bl_[1]),
                       jnp.maximum(bl_[2], bl_[3]))
    count = sig[0] + sig[1] + sig[2] + sig[3]
    nbits = count * (umax + 1)
    return rho, umax, nbits
