"""Multi-chip sharding of the codec pipeline.

Parity: the TPU-native replacement for the reference's thread-level
parallelism (SURVEY.md §2.3 "Parallelism & communication inventory"):

- **dp axis (tile data-parallel):** tiles are independent coding units, so
  a batch of tiles shards embarrassingly over the mesh with `shard_map`
  (the analog of the reference's per-tile Taskflow concurrency).
- **sp axis (spatial / sequence-parallel analog):** a single huge tile's
  rows shard across chips; the vertical DWT lifting then needs a 2-row
  halo exchange per level, implemented with `jax.lax.ppermute` over ICI
  (SURVEY.md §2.3: "halo exchange for DWT via ppermute"; PAPERS.md
  parallel-wavelet schemes).

Collectives ride ICI; no reference NCCL/MPI analog exists or is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8 top-level API (check_rep renamed to check_vma)
    def shard_map(f, mesh, in_specs, out_specs, check_rep=False):
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_rep)
    jax.shard_map
except AttributeError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..ops import dwt as ddwt
from ..ops import pipeline as dpipe


def make_mesh(n_devices: int | None = None, dp: int | None = None,
              sp: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None or sp is None:
        # favor sp (within-tile) only when dp alone cannot use all chips
        dp = n
        sp = 1
    arr = np.array(devs).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def resolve_mesh(spec) -> Mesh | None:
    """Resolve the public `mesh` parameter (CompressParams.mesh /
    DecompressParams.mesh): a Mesh passes through, an int builds a dp mesh
    over jax.devices().  Returns None when the spec describes a single
    device (the single-chip path needs no shard_map)."""
    if spec is None:
        return None
    if isinstance(spec, Mesh):
        return spec if spec.devices.size > 1 else None
    if isinstance(spec, int):
        if spec <= 1:
            return None
        if spec > len(jax.devices()):
            raise ValueError(
                f"mesh={spec} devices requested but only "
                f"{len(jax.devices())} visible")
        return make_mesh(spec)
    raise TypeError(f"mesh must be a Mesh or int, got {type(spec)!r}")


def dp_size(mesh: Mesh) -> int:
    return mesh.shape.get("dp", 1)


def sp_size(mesh: Mesh) -> int:
    return mesh.shape.get("sp", 1)


def sp_transform_ok(mesh: Mesh, h: int, numres: int) -> bool:
    """Whether a tile of height `h` can row-shard its `numres`-level
    transform over the mesh's 'sp' axis: every DWT level needs each
    shard's rows even-aligned and even-counted, and enough local rows at
    the deepest level to source the 4-row 9/7 halos."""
    sp = sp_size(mesh)
    if sp == 1:
        return True
    nl = numres - 1
    if nl <= 0:
        return h % sp == 0 and h // sp >= 1
    return h % (sp << nl) == 0 and (h >> nl) // sp >= 8


# ---------------------------------------------------------------------------
# dp: tile-batch sharding of the fused analysis/synthesis pipeline
# ---------------------------------------------------------------------------

def _sp_forward_dwt_local(x, numres: int, reversible: bool):
    """Multi-level forward DWT on a row shard: halo-exchange vertical
    lifting + shard-local horizontal pass per level (mirror of
    ops.dwt.forward_dwt_batch for row-sharded input)."""
    bands = {}
    nl = numres - 1
    cur = x
    for lev in range(nl):
        resno = nl - lev
        if reversible:
            lo_v, hi_v = _fwd_53_rows_local(cur, "sp")
            ll, hl = ddwt.fwd_53_axis(lo_v)
            lh, hh = ddwt.fwd_53_axis(hi_v)
        else:
            lo_v, hi_v = _fwd_97_rows_local(cur, "sp")
            ll, hl = ddwt.fwd_97_axis(lo_v)
            lh, hh = ddwt.fwd_97_axis(hi_v)
        bands[(resno, 1)] = hl
        bands[(resno, 2)] = lh
        bands[(resno, 3)] = hh
        cur = ll
    bands[(0, 0)] = cur
    return bands


def _sp_inverse_dwt_local(bands: dict, numres: int, reversible: bool,
                          shape=None):
    """Multi-level inverse DWT on row-sharded subbands (mirror of
    ops.dwt.inverse_dwt_batch; sp_transform_ok guarantees even level
    geometry so no odd-dimension cases arise).  `shape` (the FULL tile
    shape) is accepted for signature parity with inverse_dwt_batch but
    unused — every level's local geometry is implied by the shard."""
    cur = bands[(0, 0)]
    for resno in range(1, numres):
        hl, lh, hh = (bands[(resno, 1)], bands[(resno, 2)],
                      bands[(resno, 3)])
        w = cur.shape[-1] + hl.shape[-1]
        if reversible:
            lo_v = ddwt.inv_53_axis(cur, hl, w)
            hi_v = ddwt.inv_53_axis(lh, hh, w)
            cur = _inv_53_rows_local(lo_v, hi_v, "sp")
        else:
            lo_v = ddwt.inv_97_axis(cur, hl, w)
            hi_v = ddwt.inv_97_axis(lh, hh, w)
            cur = _inv_97_rows_local(lo_v, hi_v, "sp")
    return cur


def sharded_analysis(mesh: Mesh, planes, *, numres: int, reversible: bool,
                     mct: int, prec: int, sgnd: bool, deltas=()):
    """Run ops.pipeline.analysis with the tile-batch axis sharded over
    the 'dp' mesh axis and (when the mesh has sp > 1) tile ROWS sharded
    over 'sp' with ppermute halo-exchange DWT.  planes: (C, B, H, W)
    with B % dp == 0 (and sp_transform_ok(mesh, H, numres) for sp > 1).
    Also returns a psum'd coefficient-energy scalar (the cross-chip
    distortion statistic used by global rate control)."""
    sp = sp_size(mesh)
    axes = ("dp", "sp") if sp > 1 else ("dp",)

    def local(x):
        # every elementwise stage comes from the ONE normative pipeline;
        # sp > 1 swaps only the DWT for the halo-exchange row-sharded one
        bands = dpipe.analysis_impl(
            x, numres=numres, reversible=reversible, mct=mct,
            prec=prec, sgnd=sgnd, deltas=deltas,
            dwt=_sp_forward_dwt_local if sp > 1 else None)
        energy = sum((b.astype(jnp.float32) ** 2).sum()
                     for b in bands.values())
        energy = jax.lax.psum(energy, axis_name=axes)
        return bands, energy

    keys = _band_keys(numres)
    spec = P(None, "dp", "sp", None) if sp > 1 else P(None, "dp")
    out_specs = ({k: spec for k in keys}, P())
    fn = shard_map(local, mesh=mesh, in_specs=(spec,),
                   out_specs=out_specs, check_rep=False)
    return fn(planes)


def sharded_synthesis(mesh: Mesh, bands: dict, *, numres: int,
                      reversible: bool, mct: int, prec: int, sgnd: bool,
                      shape, deltas=()):
    sp = sp_size(mesh)

    def local(b):
        return dpipe.synthesis_impl(
            b, numres=numres, reversible=reversible, mct=mct,
            prec=prec, sgnd=sgnd, shape=shape, deltas=deltas,
            dwt=_sp_inverse_dwt_local if sp > 1 else None)

    keys = _band_keys(numres)
    spec = P(None, "dp", "sp", None) if sp > 1 else P(None, "dp")
    fn = shard_map(local, mesh=mesh,
                   in_specs=({k: spec for k in keys},),
                   out_specs=spec, check_rep=False)
    return fn(bands)


def _band_keys(numres: int):
    keys = [(0, 0)]
    for r in range(1, numres):
        keys += [(r, 1), (r, 2), (r, 3)]
    return keys


# ---------------------------------------------------------------------------
# sp: row-sharded vertical 5/3 lifting with ppermute halo exchange
# ---------------------------------------------------------------------------

def _halo_exchange(x_loc, k: int, axis_name: str):
    """Fetch k boundary rows from each neighbor along `axis_name`.

    Returns (top_halo, bottom_halo) of k rows each; global edges receive
    whole-sample mirrored rows instead (symmetric extension)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # send bottom k rows down -> arrive as top halo of the next shard
    top_from_prev = jax.lax.ppermute(
        x_loc[..., -k:, :], axis_name,
        [(i, (i + 1) % n) for i in range(n)])
    bot_from_next = jax.lax.ppermute(
        x_loc[..., :k, :], axis_name,
        [(i, (i - 1) % n) for i in range(n)])
    # mirror at global boundaries: x[-j] = x[j]  /  x[H-1+j] = x[H-1-j]
    mirror_top = x_loc[..., 1:k + 1, :][..., ::-1, :]
    mirror_bot = x_loc[..., -k - 1:-1, :][..., ::-1, :]
    top = jnp.where(idx == 0, mirror_top, top_from_prev)
    bot = jnp.where(idx == n - 1, mirror_bot, bot_from_next)
    return top, bot


def _fwd_53_rows_local(x_loc, axis_name: str):
    """Vertical forward 5/3 on a row shard (local rows even-aligned, local
    row count even).  Produces the shard's low/high row subsequences."""
    top, bot = _halo_exchange(x_loc, 2, axis_name)
    x_ext = jnp.concatenate([top, x_loc, bot], axis=-2)  # rows [-2, H+2)
    ev = x_ext[..., 0::2, :]   # rows -2, 0, 2, ..  (local evens offset 1)
    od = x_ext[..., 1::2, :]   # rows -1, 1, 3, ..
    # d[j] for odd rows -1 .. H+1: d_j = od[j] - (ev[j] + ev[j+1]) >> 1
    # (od's last row, global H+1, has no right even neighbor and is unused)
    d_all = od[..., :-1, :] - ((ev[..., :-1, :] + ev[..., 1:, :]) >> 1)
    # d_all[j] sits at global odd row (start-1) + 2j; the shard's own odd
    # rows are j = 1 .. H_loc/2 (d_all[0] is the top-halo d row)
    hi = d_all[..., 1:, :]
    # s[i] for local even rows: s = ev_loc + (d[i-1] + d[i] + 2) >> 2
    ev_loc = x_loc[..., 0::2, :]
    s = ev_loc + ((d_all[..., :-1, :] + d_all[..., 1:, :] + 2) >> 2)
    return s, hi


def _fwd_97_rows_local(x_loc, axis_name: str):
    """Vertical forward 9/7 on a row shard: 4-row halos cover the four
    lifting steps' dependency cone (each step consumes one neighbor)."""
    from ..transform.dwt import ALPHA, BETA, DELTA, GAMMA, K

    top, bot = _halo_exchange(x_loc, 4, axis_name)
    y = jnp.concatenate([top, x_loc, bot], axis=-2).astype(jnp.float32)
    # rows of y: global [start-4, start+H+4); start even -> y row j has
    # global parity j & 1 flipped? start-4 is even, so even rows of y are
    # even global rows.
    ev = y[..., 0::2, :]
    od = y[..., 1::2, :]

    def lift_odd(ev_s, od_s, c):
        # od[j] += c * (ev[j] + ev[j+1]); the last odd halo row has no
        # right even neighbor and is dropped (unused by later steps)
        return od_s[..., :-1, :] + jnp.float32(c) * (
            ev_s[..., :-1, :] + ev_s[..., 1:, :])

    def lift_even(ev_s, od_s, c):
        # ev[j] += c * (od[j-1] + od[j])
        return (ev_s[..., 1:-1, :]
                + jnp.float32(c) * (od_s[..., :-1, :] + od_s[..., 1:, :]))

    od1 = lift_odd(ev, od, ALPHA)            # odd rows  [-3 .. H+3)
    ev1 = lift_even(ev, od1, BETA)           # even rows [-2 .. H+2)
    od2 = od1[..., 1:-1, :] + jnp.float32(GAMMA) * (
        ev1[..., :-1, :] + ev1[..., 1:, :])  # odd rows  [-1 .. H+1)
    ev2 = ev1[..., 1:-1, :] + jnp.float32(DELTA) * (
        od2[..., :-1, :] + od2[..., 1:, :])  # even rows [0 .. H)
    lo = ev2 * jnp.float32(1.0 / K)
    hi = od2[..., 1:, :] * jnp.float32(K)  # local odd rows
    return lo, hi


def sp_sharded_fwd_97_level(mesh: Mesh, x):
    """One forward 9/7 level with rows sharded over 'sp' (halo-exchange
    vertical lifting, local horizontal pass)."""

    def local(x_loc):
        lo_v, hi_v = _fwd_97_rows_local(x_loc, "sp")
        ll, hl = ddwt.fwd_97_axis(lo_v)
        lh, hh = ddwt.fwd_97_axis(hi_v)
        return ll, hl, lh, hh

    nd = x.ndim
    spec = P(*([None] * (nd - 2) + ["sp", None]))
    fn = shard_map(local, mesh=mesh, in_specs=(spec,),
                   out_specs=(spec, spec, spec, spec), check_rep=False)
    return fn(x)


def _interleave_rows(ev, od):
    """(…, m, W) + (…, m, W) -> (…, 2m, W) with ev rows at even indices."""
    stacked = jnp.stack([ev, od], axis=-2)  # (..., m, 2, W)
    return stacked.reshape(stacked.shape[:-3] + (-1, stacked.shape[-1]))


def _inv_53_rows_local(s_loc, d_loc, axis_name: str):
    """Vertical inverse 5/3 on row-sharded subbands: s_loc low rows (global
    even), d_loc high rows (global odd), equal local counts.  One-row halo
    exchange per subband; global edges use the subband-domain mirrors the
    host reference applies (d[-1]=d[0], ev[m]=ev[m-1])."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    d_prev = jax.lax.ppermute(d_loc[..., -1:, :], axis_name, fwd)
    s_next = jax.lax.ppermute(s_loc[..., :1, :], axis_name, bwd)
    d_next = jax.lax.ppermute(d_loc[..., :1, :], axis_name, bwd)
    d_top = jnp.where(idx == 0, d_loc[..., :1, :], d_prev)
    d_ext = jnp.concatenate([d_top, d_loc], axis=-2)
    # ev[i] = s[i] - ((d[i-1] + d[i] + 2) >> 2)
    ev = s_loc - ((d_ext[..., :-1, :] + d_ext[..., 1:, :] + 2) >> 2)
    ev_next0 = s_next - ((d_loc[..., -1:, :] + d_next + 2) >> 2)
    ev_bot = jnp.where(idx == n - 1, ev[..., -1:, :], ev_next0)
    ev_ext = jnp.concatenate([ev, ev_bot], axis=-2)
    # od[j] = d[j] + ((ev[j] + ev[j+1]) >> 1)
    od = d_loc + ((ev_ext[..., :-1, :] + ev_ext[..., 1:, :]) >> 1)
    return _interleave_rows(ev, od)


def _inv_97_rows_local(s_loc, d_loc, axis_name: str):
    """Vertical inverse 9/7 on row-sharded subbands: un-scale, interleave,
    4-row halo exchange, then the four inverse lifting steps on shrinking
    windows (global rows tracked in the comments; m = local low count)."""
    from ..transform.dwt import ALPHA, BETA, DELTA, GAMMA, K

    ev_t = s_loc.astype(jnp.float32) * jnp.float32(K)
    od_t = d_loc.astype(jnp.float32) * jnp.float32(1.0 / K)
    y = _interleave_rows(ev_t, od_t)              # local rows [0, 2m)
    top, bot = _halo_exchange(y, 4, axis_name)
    yext = jnp.concatenate([top, y, bot], axis=-2)  # rows [-4, 2m+4)
    ev0 = yext[..., 0::2, :]                       # evens -4 .. 2m+2
    od0 = yext[..., 1::2, :]                       # odds  -3 .. 2m+3
    evA = ev0[..., 1:, :] - jnp.float32(DELTA) * (
        od0[..., :-1, :] + od0[..., 1:, :])        # evens -2 .. 2m+2
    odB = od0[..., 1:-1, :] - jnp.float32(GAMMA) * (
        evA[..., :-1, :] + evA[..., 1:, :])        # odds  -1 .. 2m+1
    evC = evA[..., 1:-1, :] - jnp.float32(BETA) * (
        odB[..., :-1, :] + odB[..., 1:, :])        # evens  0 .. 2m
    odD = odB[..., 1:-1, :] - jnp.float32(ALPHA) * (
        evC[..., :-1, :] + evC[..., 1:, :])        # odds   1 .. 2m-1
    return _interleave_rows(evC[..., :-1, :], odD)


def sp_sharded_inv_53_level(mesh: Mesh, ll, hl, lh, hh):
    """One inverse 5/3 level with rows sharded over 'sp': shard-local
    horizontal inverses, then halo-exchange vertical inverse lifting.
    Inverse of sp_sharded_fwd_53_level (bit-exact round trip)."""

    def local(ll_l, hl_l, lh_l, hh_l):
        w = ll_l.shape[-1] + hl_l.shape[-1]
        lo_v = ddwt.inv_53_axis(ll_l, hl_l, w)
        hi_v = ddwt.inv_53_axis(lh_l, hh_l, w)
        return _inv_53_rows_local(lo_v, hi_v, "sp")

    nd = ll.ndim
    spec = P(*([None] * (nd - 2) + ["sp", None]))
    fn = shard_map(local, mesh=mesh, in_specs=(spec,) * 4,
                   out_specs=spec, check_rep=False)
    return fn(ll, hl, lh, hh)


def sp_sharded_inv_97_level(mesh: Mesh, ll, hl, lh, hh):
    """One inverse 9/7 level with rows sharded over 'sp'."""

    def local(ll_l, hl_l, lh_l, hh_l):
        w = ll_l.shape[-1] + hl_l.shape[-1]
        lo_v = ddwt.inv_97_axis(ll_l, hl_l, w)
        hi_v = ddwt.inv_97_axis(lh_l, hh_l, w)
        return _inv_97_rows_local(lo_v, hi_v, "sp")

    nd = ll.ndim
    spec = P(*([None] * (nd - 2) + ["sp", None]))
    fn = shard_map(local, mesh=mesh, in_specs=(spec,) * 4,
                   out_specs=spec, check_rep=False)
    return fn(ll, hl, lh, hh)


def sp_sharded_fwd_53_level(mesh: Mesh, x):
    """One forward 5/3 DWT level of (..., H, W) with rows sharded over the
    'sp' mesh axis: vertical lifting uses ppermute halo exchange, then the
    horizontal pass runs shard-locally.  Returns (ll, hl, lh, hh) row-
    sharded over 'sp'."""

    def local(x_loc):
        lo_v, hi_v = _fwd_53_rows_local(x_loc, "sp")
        ll, hl = ddwt.fwd_53_axis(lo_v)
        lh, hh = ddwt.fwd_53_axis(hi_v)
        return ll, hl, lh, hh

    nd = x.ndim
    spec = P(*([None] * (nd - 2) + ["sp", None]))
    fn = shard_map(local, mesh=mesh, in_specs=(spec,),
                   out_specs=(spec, spec, spec, spec), check_rep=False)
    return fn(x)
