"""Device (XLA/TPU) wavelet lifting on batched tiles.

Parity: the device replacement for WaveletFwd/WaveletReverse (SURVEY.md
§2.1 "Wavelet", §7 "Device (Pallas/XLA)").  Operates on even-origin
(parity-0) tiles in batched (..., H, W) layout — the layout the codec uses
for grid-aligned tiles; odd-origin tiles fall back to the host numpy path
(grok_tpu.transform.dwt), which is also the bit-exactness oracle for these
kernels (tests/test_device_ops.py).

All shapes are static under jit; the lifting is expressed with even/odd
stride slicing so XLA fuses each level into a few elementwise VPU kernels.
int32 end-to-end on the reversible path (SURVEY.md §7 hard part #3: no
float contamination).

Whole-sample symmetric extension identities used below (signal x[0..n-1],
period 2n-2):  x[-1] = x[1],  x[n] = x[n-2] — so every boundary neighbor
is a mirrored interior sample and no physical padding is needed.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..transform.dwt import ALPHA, BETA, DELTA, GAMMA, K


def _split(x):
    """(even, odd) subsequences + mirror helpers along the last axis."""
    return x[..., 0::2], x[..., 1::2]


def _ev_right(ev, ne, no):
    """ev[i+1] for i in 0..no-1 (x[2i+2]); x[n] mirrors to x[n-2]=ev[-1]
    when n is even."""
    if ne > no:  # n odd: ev has no+1 entries
        return ev[..., 1:]
    return jnp.concatenate([ev[..., 1:], ev[..., -1:]], axis=-1)


def _d_pair(d, ne, no):
    """(d[i-1], d[i]) for i in 0..ne-1 with d[-1]=d[0] and, when n is odd,
    d[ne-1] = d[no-1]."""
    d_l = jnp.concatenate([d[..., :1], d], axis=-1)[..., :ne]
    if no >= ne:
        d_r = d[..., :ne]
    else:
        d_r = jnp.concatenate([d, d[..., -1:]], axis=-1)
    return d_l, d_r


def fwd_53_axis(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward reversible 5/3 along the last axis, even parity."""
    n = x.shape[-1]
    if n == 1:
        return x, x[..., :0]
    ne, no = (n + 1) // 2, n // 2
    ev, od = _split(x)
    d = od - ((ev[..., :no] + _ev_right(ev, ne, no)) >> 1)
    d_l, d_r = _d_pair(d, ne, no)
    s = ev + ((d_l + d_r + 2) >> 2)
    return s, d


def inv_53_axis(s: jnp.ndarray, d: jnp.ndarray, n: int) -> jnp.ndarray:
    if n == 1:
        return s
    ne, no = (n + 1) // 2, n // 2
    d_l, d_r = _d_pair(d, ne, no)
    ev = s - ((d_l + d_r + 2) >> 2)
    od = d + ((ev[..., :no] + _ev_right(ev, ne, no)) >> 1)
    out = jnp.zeros(s.shape[:-1] + (n,), dtype=s.dtype)
    out = out.at[..., 0::2].set(ev)
    out = out.at[..., 1::2].set(od)
    return out


def fwd_97_axis(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Forward irreversible 9/7 along the last axis, even parity."""
    n = x.shape[-1]
    if n == 1:
        return x * jnp.float32(1.0 / K), x[..., :0]
    ne, no = (n + 1) // 2, n // 2
    ev, od = _split(x)
    od = od + jnp.float32(ALPHA) * (ev[..., :no] + _ev_right(ev, ne, no))
    d_l, d_r = _d_pair(od, ne, no)
    ev = ev + jnp.float32(BETA) * (d_l + d_r)
    od = od + jnp.float32(GAMMA) * (ev[..., :no] + _ev_right(ev, ne, no))
    d_l, d_r = _d_pair(od, ne, no)
    ev = ev + jnp.float32(DELTA) * (d_l + d_r)
    return ev * jnp.float32(1.0 / K), od * jnp.float32(K)


def inv_97_axis(s: jnp.ndarray, d: jnp.ndarray, n: int) -> jnp.ndarray:
    if n == 1:
        return s * jnp.float32(K)
    ne, no = (n + 1) // 2, n // 2
    ev = s * jnp.float32(K)
    od = d * jnp.float32(1.0 / K)
    d_l, d_r = _d_pair(od, ne, no)
    ev = ev - jnp.float32(DELTA) * (d_l + d_r)
    od = od - jnp.float32(GAMMA) * (ev[..., :no] + _ev_right(ev, ne, no))
    d_l, d_r = _d_pair(od, ne, no)
    ev = ev - jnp.float32(BETA) * (d_l + d_r)
    od = od - jnp.float32(ALPHA) * (ev[..., :no] + _ev_right(ev, ne, no))
    out = jnp.zeros(s.shape[:-1] + (n,), dtype=s.dtype)
    out = out.at[..., 0::2].set(ev)
    out = out.at[..., 1::2].set(od)
    return out


def _vert_fwd(fwd, x):
    xt = jnp.swapaxes(x, -1, -2)
    lo, hi = fwd(xt)
    return jnp.swapaxes(lo, -1, -2), jnp.swapaxes(hi, -1, -2)


def fwd_level(x, reversible: bool):
    """One forward DWT level on (..., H, W): vertical pass then horizontal
    (matches the host/oracle order).  Returns (ll, hl, lh, hh)."""
    fwd = fwd_53_axis if reversible else fwd_97_axis
    lo_v, hi_v = _vert_fwd(fwd, x)
    ll, hl = fwd(lo_v)
    lh, hh = fwd(hi_v)
    return ll, hl, lh, hh


def inv_level(ll, hl, lh, hh, h: int, w: int, reversible: bool):
    """One inverse DWT level producing (..., h, w)."""
    inv = inv_53_axis if reversible else inv_97_axis
    lo_v = inv(ll, hl, w)
    hi_v = inv(lh, hh, w)
    lo_t = jnp.swapaxes(lo_v, -1, -2)
    hi_t = jnp.swapaxes(hi_v, -1, -2)
    return jnp.swapaxes(inv(lo_t, hi_t, h), -1, -2)


def forward_dwt_batch(x: jnp.ndarray, numres: int, reversible: bool):
    """Multi-level forward DWT on (..., H, W) even-origin tiles.
    Returns {(resno, orient): array} matching the host band layout."""
    bands = {}
    nl = numres - 1
    cur = x
    for lev in range(nl):
        resno = nl - lev
        ll, hl, lh, hh = fwd_level(cur, reversible)
        bands[(resno, 1)] = hl
        bands[(resno, 2)] = lh
        bands[(resno, 3)] = hh
        cur = ll
    bands[(0, 0)] = cur
    return bands


def inverse_dwt_batch(bands: dict, numres: int, reversible: bool,
                      shape: tuple[int, int]):
    """Multi-level inverse DWT back to (..., H, W)."""
    h, w = shape
    nl = numres - 1
    dims = [(h, w)]
    for _ in range(nl):
        ph, pw = dims[-1]
        dims.append(((ph + 1) // 2, (pw + 1) // 2))
    cur = bands[(0, 0)]
    for resno in range(1, numres):
        lh_, lw_ = dims[numres - resno - 1]
        cur = inv_level(cur, bands[(resno, 1)], bands[(resno, 2)],
                        bands[(resno, 3)], lh_, lw_, reversible)
    return cur
