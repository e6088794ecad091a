"""Pallas TPU kernels for wavelet lifting.

Parity/role: the hand-scheduled device path for the DWT hot loop
(SURVEY.md §7 "2-D lifting DWT (jnp first, Pallas second)").  The vertical
(column) pass is the bandwidth-bound stage: one kernel keeps a full column
stripe in VMEM, runs both 5/3 lifting steps on the VPU and writes the
low/high subbands without round-tripping HBM between steps.

Layout: grid over width tiles; each program sees the whole height (tile
heights up to ~2K rows fit VMEM comfortably at 128-lane width).  Even
parity (grid-aligned tiles), matching ops.dwt.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _v53_fwd_kernel(x_ref, lo_ref, hi_ref):
    # even H only (wrapper guarantees): reshape-based even/odd split keeps
    # Mosaic on dense loads (strided slices lower to gathers it rejects)
    x = x_ref[:]
    h, w = x.shape
    no = h // 2
    pairs = x.reshape(no, 2, w)
    ev = pairs[:, 0, :]
    od = pairs[:, 1, :]
    # d[i] = od[i] - (ev[i] + ev[i+1]) >> 1; ev[no] mirrors to ev[-1]
    ev_r = ev if no == 1 else jnp.concatenate([ev[1:], ev[-1:]], axis=0)
    d = od - ((ev + ev_r) >> 1)
    # s[i] = ev[i] + (d[i-1] + d[i] + 2) >> 2 with d[-1] = d[0]
    d_l = d if no == 1 else jnp.concatenate([d[:1], d[:-1]], axis=0)
    s = ev + ((d_l + d + 2) >> 2)
    lo_ref[:] = s
    hi_ref[:] = d


def _v53_inv_kernel(lo_ref, hi_ref, out_ref):
    s = lo_ref[:]
    d = hi_ref[:]
    no, w = d.shape
    d_l = d if no == 1 else jnp.concatenate([d[:1], d[:-1]], axis=0)
    ev = s - ((d_l + d + 2) >> 2)
    ev_r = ev if no == 1 else jnp.concatenate([ev[1:], ev[-1:]], axis=0)
    od = d + ((ev + ev_r) >> 1)
    # interleave via stack + reshape (dense)
    out_ref[:] = jnp.stack([ev, od], axis=1).reshape(2 * no, w)


def _pick_tw(h: int, w: int) -> int:
    """Width tile sized so the kernel's VMEM working set (input block +
    both subbands + lifting temporaries, ~6 copies) stays within the
    ~16 MB scoped limit."""
    budget_elems = (1 << 20) // 4  # ~1 MB of int32 per live copy
    tw = max(128, min(512, (budget_elems // max(h, 1)) // 128 * 128))
    tw = min(tw, w)
    if w % tw:
        tw = w if w <= 512 else tw  # ragged narrow arrays: single tile
    return tw


def _grid_spec(h, w, tw, out_shapes):
    grid = (-(-w // tw),)
    in_spec = pl.BlockSpec((h, tw), lambda i: (0, i),
                           memory_space=pltpu.VMEM)
    out_specs = tuple(
        pl.BlockSpec((sh, tw), lambda i: (0, i), memory_space=pltpu.VMEM)
        for sh in out_shapes)
    return grid, in_spec, out_specs


@functools.partial(jax.jit, static_argnames=("interpret",))
def fwd_53_vertical(x: jnp.ndarray, interpret: bool = False):
    """Vertical forward 5/3 on (H, W) int32, even parity.  Returns
    (lo (ceil(H/2), W), hi (floor(H/2), W))."""
    h, w = x.shape
    if h == 1:
        return x, x[:0]
    if h % 2:
        # odd heights fall back to the XLA path (kernel assumes even H)
        from . import dwt as ddwt

        lo_t, hi_t = ddwt.fwd_53_axis(jnp.swapaxes(x, 0, 1))
        return jnp.swapaxes(lo_t, 0, 1), jnp.swapaxes(hi_t, 0, 1)
    ne, no = (h + 1) // 2, h // 2
    tw = _pick_tw(h, w)
    grid, in_spec, out_specs = _grid_spec(h, w, tw, (ne, no))
    return pl.pallas_call(
        _v53_fwd_kernel,
        grid=grid,
        in_specs=[in_spec],
        out_specs=out_specs,
        out_shape=(jax.ShapeDtypeStruct((ne, w), x.dtype),
                   jax.ShapeDtypeStruct((no, w), x.dtype)),
        interpret=interpret,
    )(x)


@functools.partial(jax.jit, static_argnames=("h", "interpret"))
def inv_53_vertical(lo: jnp.ndarray, hi: jnp.ndarray, h: int,
                    interpret: bool = False):
    """Vertical inverse 5/3 producing (h, W)."""
    if h == 1:
        return lo
    if h % 2:
        from . import dwt as ddwt

        out_t = ddwt.inv_53_axis(jnp.swapaxes(lo, 0, 1),
                                 jnp.swapaxes(hi, 0, 1), h)
        return jnp.swapaxes(out_t, 0, 1)
    w = lo.shape[1]
    tw = _pick_tw(h, w)
    grid = (-(-w // tw),)
    ne, no = lo.shape[0], hi.shape[0]
    in_specs = [
        pl.BlockSpec((ne, tw), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((no, tw), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((h, tw), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _v53_inv_kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((h, w), lo.dtype),
        interpret=interpret,
    )(lo, hi)
