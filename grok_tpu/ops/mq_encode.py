"""Device-side EBCOT Tier-1 MQ ENCODER (SURVEY.md §7 hard part #1).

The bit-plane passes look serial (significance propagates along the
stripe scan), but almost everything about them is decidable in parallel:

- a sample first becomes significant at the bit-plane of its magnitude's
  MSB, regardless of which pass codes it;
- within a plane, only the SigProp pass has a wavefront (significance
  spreads forward in scan order).  We encode every sample's significance
  moment as a single integer TIME = (plane, pass, scan position) and
  compute the SPP wavefront as a fixpoint relaxation (`lax.while_loop`
  over 8-neighbor min-time propagation — converges in a handful of
  sweeps on real data, exactly, for any data);
- the MagRef pass set and the cleanup pass set are then fully static,
  and cleanup significance times are deterministic (everything left is
  visited), including the run-length aggregation decisions;
- every decision's context (ZC/SC/MR/RL/UNI) is a pure function of
  neighbor times and signs, so the ordered (context, decision) stream is
  built by data-parallel slot construction + one prefix-sum compaction;
- the serial MQ automaton runs as a `lax.scan` over that stream,
  vmapped across the codeblock batch (thousands of lanes amortize the
  per-step cost), emitting bytes via a carried "mutable last byte" that
  reproduces the spec byteout/carry/flush exactly;
- raw (selective-bypass) passes bypass MQ into packed bit streams
  (host applies the 0xFF stuffing, as in the device HT path).

Byte-identical to t1/coder.py / native/t1.cc for styles NONE and LAZY.
Rate-targeted (multi-layer PCRD) encodes are device-eligible too: with
`need_dist=True` the significance schedule drives a closed-form
on-device distortion kernel whose per-pass sums match the host coder
exactly (MAX_NUMBPS_DIST bounds the magnitude range where the float64
accumulation stays integer-exact).  Other styles fall back to the host
coder.  Only compressed bytes cross the device-to-host link.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..t1.coder import _SC_TABLE, _zc_context
from ..t1.mq import QE_TABLE

_INF = np.int32(0x7FFFFFFF)
_POS_BITS = 14          # scan positions fit 14 bits (cblk area <= 4096)
_CTX_ZC, _CTX_SC, _CTX_MAG, _CTX_RL, _CTX_UNI = 0, 9, 14, 17, 18
_FLUSH1, _FLUSH2, _PAD = 240, 241, 255
# numbps buckets: one jit specialization per bucket, host picks the
# smallest bucket covering the batch's max magnitude
NUMBPS_BUCKETS = (8, 14, 22, 26)
MAX_NUMBPS_DEVICE = NUMBPS_BUCKETS[-1]
# distortion sums stay exact in float64 (every partial sum < 2^53) up to
# this magnitude bit depth — the need_dist routing gate
MAX_NUMBPS_DIST = 20


def _build_luts():
    zc = np.zeros((4, 256), dtype=np.uint8)
    for orient in range(4):
        for f in range(256):
            h = ((f >> 3) & 1) + ((f >> 4) & 1)
            v = ((f >> 1) & 1) + ((f >> 6) & 1)
            d = (f & 1) + ((f >> 2) & 1) + ((f >> 5) & 1) + ((f >> 7) & 1)
            zc[orient, f] = _zc_context(h, v, d, orient)
    # sc index bits: 0 Wsig 1 Wneg 2 Esig 3 Eneg 4 Nsig 5 Nneg 6 Ssig 7 Sneg
    sc_cn = np.zeros(256, dtype=np.uint8)
    sc_xor = np.zeros(256, dtype=np.uint8)
    for idx in range(256):
        def contrib(sb, nb):
            if not (idx >> sb) & 1:
                return 0
            return -1 if (idx >> nb) & 1 else 1
        hc = max(-1, min(1, contrib(0, 1) + contrib(2, 3)))
        vc = max(-1, min(1, contrib(4, 5) + contrib(6, 7)))
        off, xr = _SC_TABLE[(hc, vc)]
        sc_cn[idx] = _CTX_SC + off
        sc_xor[idx] = xr
    # si-packed MQ transition tables (state*2 + mps)
    qe = np.zeros(94, dtype=np.uint32)
    nmps = np.zeros(94, dtype=np.uint8)
    nlps = np.zeros(94, dtype=np.uint8)
    for s, (q, nm, nl, sw) in enumerate(QE_TABLE):
        for mps in range(2):
            qe[s * 2 + mps] = q
            nmps[s * 2 + mps] = nm * 2 + mps
            nlps[s * 2 + mps] = nl * 2 + (mps ^ sw)
    return zc, sc_cn, sc_xor, qe, nmps, nlps


_ZC_LUT, _SC_CN, _SC_XOR, _QE, _NMPS, _NLPS = _build_luts()

_INIT_CTX = np.zeros(19, dtype=np.uint8)
_INIT_CTX[_CTX_ZC] = 4 * 2
_INIT_CTX[_CTX_RL] = 3 * 2
_INIT_CTX[_CTX_UNI] = 46 * 2


def _scan_index(h: int, w: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return ((y >> 2) * (4 * w) + x * 4 + (y & 3)).astype(np.int32)


def _shift8(a, fill):
    """The 8 neighbor views of (..., H, W) as a stacked (8, ..., H, W):
    order NW N NE W E SW S SE (the neighbor's value seen from each
    sample)."""
    pad = jnp.pad(a, [(0, 0)] * (a.ndim - 2) + [(1, 1), (1, 1)],
                  constant_values=fill)
    h, w = a.shape[-2], a.shape[-1]

    def v(dy, dx):
        return jax.lax.dynamic_slice_in_dim(
            jax.lax.dynamic_slice_in_dim(pad, 1 + dy, h, axis=-2),
            1 + dx, w, axis=-1)

    return jnp.stack([v(-1, -1), v(-1, 0), v(-1, 1), v(0, -1), v(0, 1),
                      v(1, -1), v(1, 0), v(1, 1)])


def _nbr_index(times, signs, visit):
    """ZC LUT index (8 bits) and SC LUT index (8 bits) for every sample,
    judging neighbor significance by time < visit (per-sample visit)."""
    nt = _shift8(times, _INF)
    sig = (nt < visit[None]).astype(jnp.int32)          # (8, H, W)
    ns = _shift8(signs, 0)
    # zc bit order NW N NE W E SW S SE = stack order
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.int32)
    zc_idx = jnp.tensordot(weights, sig, axes=1)
    # sc bits: W(3) E(4) N(1) S(6) of the stack
    w_s, e_s, n_s, s_s = sig[3], sig[4], sig[1], sig[6]
    w_n, e_n, n_n, s_n = ns[3], ns[4], ns[1], ns[6]
    sc_idx = (w_s | ((w_s & w_n) << 1) | (e_s << 2) | ((e_s & e_n) << 3)
              | (n_s << 4) | ((n_s & n_n) << 5) | (s_s << 6)
              | ((s_s & s_n) << 7))
    return zc_idx, sc_idx


def _plane_slots(mag, sign, numbps, i, times, orient, lazy, h, w):
    """Build one plane's decision slots.  Returns (times', mq_ctx, mq_bit,
    raw_bit, raw_valid) where the slot axes follow scan order."""
    zc_lut = jnp.asarray(_ZC_LUT)[orient]
    sc_cn = jnp.asarray(_SC_CN)
    sc_xor = jnp.asarray(_SC_XOR)
    sidx = jnp.asarray(_scan_index(h, w))
    stripes = (h + 3) // 4
    rows_of = jnp.minimum(4, h - 4 * jnp.arange(stripes))  # (S,)

    plane_valid = i < numbps
    p = jnp.maximum(numbps - 1 - i, 0)
    bit = ((mag >> p) & 1).astype(jnp.int32) * plane_valid
    base = (i * 3) << _POS_BITS
    spp_visit = base + sidx
    mrp_thresh = base + (1 << _POS_BITS)
    cup_visit = base + (2 << _POS_BITS) + sidx
    sig_before = times < base
    is_top = i == 0
    is_raw = lazy & (i >= 4)

    # ---- SPP wavefront: assign spp times to bit=1 samples reached by the
    # forward-propagating significance front (exact fixpoint)
    cand = (~sig_before) & (bit == 1) & (~is_top) & plane_valid

    def body(t):
        m8 = jnp.min(_shift8(t, _INF), axis=0)
        new_t = jnp.where(cand & (m8 < spp_visit),
                          jnp.minimum(t, spp_visit), t)
        return new_t

    def cond(state):
        t, changed = state
        return changed

    def wl_body(state):
        t, _ = state
        t2 = body(t)
        return t2, jnp.any(t2 != t)

    times_spp, _ = jax.lax.while_loop(
        cond, wl_body, (body(times), jnp.bool_(True)))
    m8 = jnp.min(_shift8(times_spp, _INF), axis=0)
    spp_member = ((~sig_before) & (~is_top) & plane_valid
                  & (m8 < spp_visit))
    times = times_spp

    # SPP slots: (S, W, 4, 2) -> scan order stripe, col, row, slot
    zc_idx, sc_idx = _nbr_index(times, sign, spp_visit)
    spp_zc_ctx = zc_lut[zc_idx]
    spp_sc_ctx = sc_cn[sc_idx]
    spp_sc_bit = sign ^ sc_xor[sc_idx]

    def to_slots(a):
        """(H, W) -> (S, W, 4) scan-order layout (pad partial stripes)."""
        pad_h = stripes * 4
        ap = jnp.pad(a, ((0, pad_h - h), (0, 0)))
        return ap.reshape(stripes, 4, w).transpose(0, 2, 1)

    row_valid = to_slots(jnp.ones((h, w), jnp.int32)) > 0
    s_member = to_slots(spp_member.astype(jnp.int32)) > 0
    s_bit = to_slots(bit)
    spp_ctx0 = to_slots(spp_zc_ctx.astype(jnp.int32))
    spp_ctx1 = to_slots(spp_sc_ctx.astype(jnp.int32))
    spp_bit1 = to_slots(spp_sc_bit.astype(jnp.int32))
    v0 = s_member & row_valid
    v1 = v0 & (s_bit > 0)
    spp_ctx = jnp.stack([jnp.where(v0, spp_ctx0, _PAD),
                         jnp.where(v1, spp_ctx1, _PAD)], axis=-1)
    spp_bitv = jnp.stack([s_bit, spp_bit1], axis=-1)

    # ---- MRP slots: (S, W, 4, 1)
    mrp_member = sig_before & plane_valid & (~is_top)
    firstsig = 31 - jax.lax.clz(jnp.maximum(mag, 1))
    first_ref = p == (firstsig - 1)
    any_nb = (jnp.min(_shift8(times, _INF), axis=0) < mrp_thresh)
    mr_ctx = jnp.where(first_ref,
                       _CTX_MAG + any_nb.astype(jnp.int32), _CTX_MAG + 2)
    m_member = to_slots(mrp_member.astype(jnp.int32)) > 0
    vm = m_member & row_valid
    mrp_ctx = jnp.where(vm, to_slots(mr_ctx), _PAD)[..., None]
    mrp_bitv = s_bit[..., None]

    # ---- CUP: assign cleanup significance times, then build slots
    remaining = (~sig_before) & (~spp_member) & plane_valid
    times = jnp.where(remaining & (bit == 1),
                      jnp.minimum(times, cup_visit), times)
    # column visit time: scan position of row k=0 of each stripe-column
    cv = (base + (2 << _POS_BITS) + to_slots(sidx)[:, :, 0])   # (S, W)
    m8c = jnp.min(_shift8(times, _INF), axis=0)
    # the host agg check reads F & (SIG | VIS | 0xFF) for all 4 samples
    # when the scan reaches the column
    sig_or_vis = (times < (base + (2 << _POS_BITS))) | spp_member
    sv = to_slots(sig_or_vis.astype(jnp.int32)) > 0
    nbr_lt_cv = to_slots(m8c) < cv[:, :, None]          # (S, W, 4)
    full = (rows_of == 4)[:, None]                      # (S, 1)
    agg = full & plane_valid & jnp.all(~(sv | nbr_lt_cv), axis=-1)
    first = jnp.argmax(jnp.concatenate(
        [s_bit, jnp.ones_like(s_bit[..., :1])], axis=-1) > 0, axis=-1)
    has_first = first < 4

    zc_c, sc_c = _nbr_index(times, sign, cup_visit)
    cup_zc = to_slots(zc_lut[zc_c].astype(jnp.int32))
    cup_sc = to_slots(sc_cn[sc_c].astype(jnp.int32))
    cup_scb = to_slots((sign ^ sc_xor[sc_c]).astype(jnp.int32))

    slot_rl_v = agg
    slot_rl_b = has_first.astype(jnp.int32)
    slot_uni_v = agg & has_first
    u1 = (first >> 1) & 1
    u2 = first & 1
    fk = jnp.minimum(first, 3)
    sc_first_ctx = jnp.take_along_axis(cup_sc, fk[..., None], -1)[..., 0]
    sc_first_bit = jnp.take_along_axis(cup_scb, fk[..., None], -1)[..., 0]
    k_idx = jnp.arange(4)
    rem_s = to_slots(remaining.astype(jnp.int32)) > 0
    # non-agg columns code every remaining sample; agg columns only the
    # rows after `first` (and nothing when the whole column is zero)
    vzc = plane_valid & rem_s & row_valid & jnp.where(
        agg[..., None], slot_uni_v[..., None] & (k_idx > first[..., None]),
        True)
    vsc_ = vzc & (s_bit > 0)
    per_k = []
    per_kb = []
    for k in range(4):
        per_k.append(jnp.where(vzc[..., k], cup_zc[..., k], _PAD))
        per_k.append(jnp.where(vsc_[..., k], cup_sc[..., k], _PAD))
        per_kb.append(s_bit[..., k])
        per_kb.append(cup_scb[..., k])
    cup_ctx = jnp.stack(
        [jnp.where(slot_rl_v, _CTX_RL, _PAD),
         jnp.where(slot_uni_v, _CTX_UNI, _PAD),
         jnp.where(slot_uni_v, _CTX_UNI, _PAD),
         jnp.where(slot_uni_v, sc_first_ctx, _PAD)] + per_k, axis=-1)
    cup_bit = jnp.stack(
        [slot_rl_b, u1, u2, sc_first_bit] + per_kb, axis=-1)

    # ---- route SPP/MRP to raw under bypass; flatten plane layout
    mq_spp_ctx = jnp.where(is_raw, _PAD, spp_ctx)
    mq_mrp_ctx = jnp.where(is_raw, _PAD, mrp_ctx)
    raw_spp_v = is_raw & (spp_ctx != _PAD)
    raw_mrp_v = is_raw & (mrp_ctx != _PAD)
    # raw sign bit is the plain sign (no XOR)
    raw_spp_b = jnp.stack([s_bit, to_slots(sign.astype(jnp.int32))],
                          axis=-1)

    term = (lazy & (i >= 3)) | (i == numbps - 1)
    flush_ctx = jnp.where(term & plane_valid,
                          jnp.asarray([_FLUSH1, _FLUSH2]), _PAD)

    mq_ctx = jnp.concatenate(
        [mq_spp_ctx.reshape(-1), mq_mrp_ctx.reshape(-1),
         cup_ctx.reshape(-1), flush_ctx])
    mq_bit = jnp.concatenate(
        [spp_bitv.reshape(-1), mrp_bitv.reshape(-1),
         cup_bit.reshape(-1), jnp.zeros(2, jnp.int32)])
    raw_bit = jnp.concatenate(
        [raw_spp_b.reshape(-1), mrp_bitv.reshape(-1)])
    raw_valid = jnp.concatenate(
        [raw_spp_v.reshape(-1), raw_mrp_v.reshape(-1)])
    # uint8 slot streams: the stacked per-plane layout is the encoder's
    # biggest buffer (B x maxp x 24*S*W) — keep it byte-wide
    return (times, mq_ctx.astype(jnp.uint8), mq_bit.astype(jnp.uint8),
            raw_bit.astype(jnp.uint8), raw_valid)


def _compact(vals, valid, out_len):
    """Stable compaction of valid entries to the front of an (out_len,)
    array.  Gather-based (cumsum + searchsorted): TPU scatters serialize,
    gathers do not."""
    cs = jnp.cumsum(valid.astype(jnp.int32))
    n = cs[-1]
    sel = jnp.searchsorted(cs, jnp.arange(1, out_len + 1, dtype=jnp.int32))
    sel = jnp.minimum(sel, vals.shape[0] - 1)
    out = jnp.where(jnp.arange(out_len) < n, vals[sel],
                    jnp.zeros((), vals.dtype))
    return out, n


@functools.partial(jax.jit, static_argnames=("h", "w", "maxp", "lazy"))
def build_streams(mags, signs, orients, *, h: int, w: int, maxp: int,
                  lazy: bool):
    """Phase A: per-block ordered MQ decision stream + raw bit stream.

    mags/signs: (B, h, w) int32; orients: (B,) int32.
    Returns (mq_ctx, mq_bit, mq_count, raw_bits, raw_count,
    raw_plane_counts, numbps, times) with the streams compacted and
    padded to their static layout sizes (kept on device); `times` is the
    final per-sample significance schedule (plane/pass encoded, _INF for
    never-significant) that the distortion kernel consumes."""

    def one(mag, sign, orient):
        numbps = 32 - jax.lax.clz(jnp.max(mag))
        times0 = jnp.full((h, w), _INF, dtype=jnp.int32)

        def plane(carry, i):
            times = carry
            times, mq_ctx, mq_bit, raw_bit, raw_valid = _plane_slots(
                mag, sign, numbps, i, times, orient, lazy, h, w)
            return times, (mq_ctx, mq_bit, raw_bit, raw_valid)

        times_f, (mq_ctx, mq_bit, raw_bit, raw_valid) = jax.lax.scan(
            plane, times0, jnp.arange(maxp, dtype=jnp.int32))
        raw_counts = jnp.sum(raw_valid.astype(jnp.int32), axis=-1)
        # raw SPP/MRP split per plane (bypass pass-rate boundaries): the
        # raw slot layout per plane is [spp (S*W*4*2)] then [mrp (S*W*4)]
        stripes = (h + 3) // 4
        rsplit = stripes * w * 8
        raw_spp_counts = jnp.sum(
            raw_valid[:, :rsplit].astype(jnp.int32), axis=-1)
        # per-plane MQ section boundaries: [spp | mrp | cup+flush]
        slen = stripes * w * 8
        mlen = stripes * w * 4
        mqv2 = mq_ctx != _PAD
        sec = jnp.stack(
            [jnp.sum(mqv2[:, :slen].astype(jnp.int32), -1),
             jnp.sum(mqv2[:, slen:slen + mlen].astype(jnp.int32), -1),
             jnp.sum(mqv2[:, slen + mlen:].astype(jnp.int32), -1)], -1)
        mq_ctx = mq_ctx.reshape(-1)
        mq_bit = mq_bit.reshape(-1)
        raw_bit = raw_bit.reshape(-1)
        raw_valid = raw_valid.reshape(-1)
        mqv = mq_ctx != _PAD
        mq_ctx_c, mq_n = _compact(
            jnp.where(mqv, mq_ctx, 0), mqv, mq_ctx.shape[0])
        mq_bit_c, _ = _compact(mq_bit, mqv, mq_ctx.shape[0])
        raw_c, raw_n = _compact(raw_bit, raw_valid, raw_bit.shape[0])
        return (mq_ctx_c.astype(jnp.uint8), mq_bit_c.astype(jnp.uint8),
                mq_n, raw_c.astype(jnp.uint8), raw_n, raw_counts, numbps,
                times_f, sec, raw_spp_counts)

    # ZC tables differ per orient; vmap over blocks
    return jax.vmap(one)(mags, signs, orients)


# --------------------------------------------------------------- MQ scan

def _byteout(c, ct, last):
    """One spec BYTEOUT on the carried mutable last byte.  Returns
    (c, ct, new_last, emitted_byte)."""
    is_ff = last == 0xFF
    carry = (~is_ff) & (c >= 0x8000000)
    last1 = last + carry.astype(jnp.uint32)
    now_ff = is_ff | (carry & (last1 == 0xFF))
    c1 = jnp.where(carry & (last1 == 0xFF), c & 0x7FFFFFF, c)
    emit = last1
    nlast = jnp.where(now_ff, (c1 >> 20) & 0xFF, (c1 >> 19) & 0xFF)
    c2 = jnp.where(now_ff, c1 & 0xFFFFF, c1 & 0x7FFFF)
    ct2 = jnp.where(now_ff, jnp.uint32(7), jnp.uint32(8))
    return c2, ct2, nlast, emit


@functools.partial(jax.jit, static_argnames=("maxseg",))
def mq_scan(ctx_stream, bit_stream, counts, boundaries=None, *,
            maxseg: int):
    """Phase B: the MQ automaton over compacted (ctx, bit) streams,
    vmapped across blocks.  ctx 240/241 are flush steps (segment ends).
    Returns (bytes (B, L*3), per-step-validity-packed byte stream is
    compacted to the front), per-block byte counts, and per-segment byte
    counts (fake lead bytes included)."""

    qe_t = jnp.asarray(_QE)
    si_ids = jnp.arange(_QE.shape[0], dtype=jnp.int32)
    nmps_t = jnp.asarray(_NMPS)
    nlps_t = jnp.asarray(_NLPS)
    init_ctx = jnp.asarray(_INIT_CTX)

    # decisions per scan step: on the TPU the per-iteration fusion-launch
    # overhead dwarfs the body, so amortize it; on CPU (tests) keep the
    # body small — XLA compile time grows with the unroll on 1 core
    CHUNK = 8 if jax.default_backend() != "cpu" else 1

    def one(ctxs, bits, n, bnd):
        L = ctxs.shape[0]

        ctx_ids = jnp.arange(19, dtype=jnp.int32)

        def decision(carry, cn, d):
            a, c, ct, last, states, seg, pos = carry
            live = pos < n
            is_flush1 = live & (cn == _FLUSH1)
            is_flush2 = live & (cn == _FLUSH2)
            is_dec = live & (cn < 19)

            # ---- decision path (no scatters or gathers: one-hot
            # reductions — TPU per-lane gathers cost microseconds each)
            cn_i = jnp.minimum(cn, 18).astype(jnp.int32)
            oh_cn = ctx_ids == cn_i
            si = jnp.sum(jnp.where(oh_cn, states, 0)).astype(jnp.int32)
            oh_si = si_ids == si
            qe = jnp.sum(jnp.where(oh_si, qe_t, 0))
            is_lps = ((d.astype(jnp.uint32) ^ si.astype(jnp.uint32)) & 1)
            a2 = a - qe
            no_renorm = ((a2 >> 15) & 1) & (1 - is_lps)
            small = (a2 < qe).astype(jnp.uint32)
            addq = no_renorm | (small ^ is_lps ^ 1)
            c_d = c + jnp.where(addq == 1, qe, 0)
            a_renorm = jnp.where((small ^ is_lps) == 1, qe, a2)
            a_d = jnp.where(no_renorm == 1, a2, a_renorm)
            nsi = jnp.sum(jnp.where(
                oh_si, jnp.where(is_lps == 1, nlps_t, nmps_t), 0)).astype(
                jnp.uint8)
            si_new = jnp.where(no_renorm == 1, si.astype(jnp.uint8), nsi)
            # renorm (no-op when bit 15 already set)
            n_sh = (jnp.uint32(15)
                    - (31 - jax.lax.clz(jnp.maximum(a_d, 1))).astype(
                        jnp.uint32))
            n_sh = jnp.where(a_d & 0x8000, jnp.uint32(0), n_sh)
            ct_d = ct
            last_d = last
            ems = [jnp.uint32(0), jnp.uint32(0), jnp.uint32(0)]
            evs = [jnp.bool_(False), jnp.bool_(False), jnp.bool_(False)]
            for j in range(2):
                do = n_sh >= ct_d
                s = jnp.where(do, ct_d, 0)
                a_d = a_d << s
                c_d = c_d << s
                n_sh = n_sh - s
                c_n, ct_n, last_n, em = _byteout(c_d, ct_d, last_d)
                ems[j] = jnp.where(do, em, 0)
                evs[j] = do & is_dec
                c_d = jnp.where(do, c_n, c_d)
                ct_d = jnp.where(do, ct_n, ct_d)
                last_d = jnp.where(do, last_n, last_d)
            a_d = (a_d << n_sh) & 0xFFFF
            c_d = c_d << n_sh
            ct_d = ct_d - n_sh
            do = ct_d == 0
            c_n, ct_n, last_n, em = _byteout(c_d, ct_d, last_d)
            ems[2] = jnp.where(do, em, 0)
            evs[2] = do & is_dec
            c_d = jnp.where(do, c_n, c_d)
            ct_d = jnp.where(do, ct_n, ct_d)
            last_d = jnp.where(do, last_n, last_d)

            # ---- flush step 1: SETBITS + shift + byteout
            tempc = c + a
            c_f = c | jnp.uint32(0xFFFF)
            c_f = jnp.where(c_f >= tempc, c_f - 0x8000, c_f)
            c_f = c_f << ct
            c_f1, ct_f1, last_f1, em_f1 = _byteout(c_f, ct, last)
            # ---- flush step 2: shift + byteout + emit final last + reinit
            c_f2 = c << ct
            _, _, last_f2, em_f2 = _byteout(c_f2, ct, last)

            a_out = jnp.where(is_dec, a_d,
                              jnp.where(is_flush2, jnp.uint32(0x8000), a))
            c_out = jnp.where(is_dec, c_d,
                              jnp.where(is_flush1, c_f1,
                                        jnp.where(is_flush2,
                                                  jnp.uint32(0), c)))
            ct_out = jnp.where(is_dec, ct_d,
                               jnp.where(is_flush1, ct_f1,
                                         jnp.where(is_flush2,
                                                   jnp.uint32(12), ct)))
            last_out = jnp.where(is_dec, last_d,
                                 jnp.where(is_flush1, last_f1,
                                           jnp.where(is_flush2,
                                                     jnp.uint32(0), last)))
            states_out = jnp.where(is_dec & (ctx_ids == cn_i),
                                   si_new, states)
            e0 = jnp.where(is_flush1, em_f1,
                           jnp.where(is_flush2, em_f2, ems[0]))
            v0 = is_flush1 | is_flush2 | evs[0]
            e1 = jnp.where(is_flush2, last_f2, ems[1])
            v1 = is_flush2 | evs[1]
            emits = jnp.stack([e0, e1, ems[2]])
            emit_v = jnp.stack([v0, v1, evs[2]])
            seg_out = jnp.where(is_flush2, seg + 1, seg)
            return ((a_out, c_out, ct_out, last_out, states_out, seg_out,
                     pos + live.astype(jnp.int32)),
                    (emits.astype(jnp.uint8), emit_v, seg))

        def step(carry, x):
            cns, ds = x
            outs = []
            for k in range(CHUNK):
                carry, out = decision(carry, cns[k], ds[k])
                outs.append(out)
            emits = jnp.stack([o[0] for o in outs])      # (CHUNK, 3)
            emit_v = jnp.stack([o[1] for o in outs])
            segs = jnp.stack([o[2] for o in outs])       # (CHUNK,)
            return carry, (emits, emit_v, segs)

        lpad = -(-L // CHUNK) * CHUNK
        ctxs = jnp.pad(ctxs.astype(jnp.int32), (0, lpad - L),
                       constant_values=_PAD).reshape(-1, CHUNK)
        bits = jnp.pad(bits.astype(jnp.int32),
                       (0, lpad - L)).reshape(-1, CHUNK)
        init = (jnp.uint32(0x8000), jnp.uint32(0), jnp.uint32(12),
                jnp.uint32(0), init_ctx, jnp.int32(0), jnp.int32(0))
        _, (emits, emit_v, segs) = jax.lax.scan(step, init, (ctxs, bits))
        emits = emits.reshape(-1)
        emit_v = emit_v.reshape(-1)
        seg_of = jnp.repeat(segs.reshape(-1), 3)
        byts, nbytes = _compact(emits, emit_v, emits.shape[0])
        seg_counts = jnp.sum(
            (emit_v[:, None] & (seg_of[:, None]
                                == jnp.arange(maxseg))).astype(jnp.int32),
            axis=0)
        # cumulative byteout count after each DECISION, gathered at the
        # pass-boundary decision indices — the device equivalent of the
        # host coder's bp - b0 (rates of non-terminated passes)
        per_dec = jnp.sum(emit_v.reshape(-1, 3).astype(jnp.int32), -1)
        cum = jnp.cumsum(per_dec)
        bat = jnp.where(bnd > 0, cum[jnp.maximum(bnd - 1, 0)], 0)
        return byts, nbytes, seg_counts, bat

    if boundaries is None:
        boundaries = jnp.zeros((ctx_stream.shape[0], 1), jnp.int32)
    return jax.vmap(one)(ctx_stream, bit_stream, counts, boundaries)


# ------------------------------------------------------------ host side

def _raw_payload(bits: np.ndarray) -> bytes:
    """Serialize raw-pass bits with the bypass writer's semantics: pack
    MSB-first with 7-bit capacity after a 0xFF byte, zero-pad the final
    byte, then drop a trailing 0xFF."""
    from .ht_encode import stuff_bits

    n = int(bits.shape[0])
    if n == 0:
        return b""
    packed = np.packbits(bits.astype(np.uint8))
    out = np.frombuffer(stuff_bits(packed, n), dtype=np.uint8)
    # stuff_bits appends a guard 0x00 after a trailing 0xFF; the raw
    # writer instead DROPS the trailing 0xFF.  Recover the payload byte
    # count from the capacities implied by the output itself.
    caps = np.full(out.shape, 8, dtype=np.int64)
    caps[1:][out[:-1] == 0xFF] = 7
    m = int(np.searchsorted(np.cumsum(caps), n))
    payload = out[:m + 1]
    if payload.size and payload[-1] == 0xFF:
        payload = payload[:-1]
    return payload.tobytes()


_DISTS_JIT = None


def _dists_fn():
    """Build (lazily, under a scoped x64 context) the exact per-pass
    distortion kernel: cumulative sum((m - m_rec)^2) decrease per coding
    pass, derived in closed form from the significance schedule — the
    reconstruction after refining to plane bp is trunc(m, bp) + 2^(bp-1)
    (bp >= 1) or m (bp = 0), so no per-event tracking is needed.  All
    deltas are integers; with the device numbps cap the sums stay below
    2^53, so the result is EXACT and order-independent — byte-identical
    PCRD decisions vs the host coder."""
    global _DISTS_JIT
    if _DISTS_JIT is None:
        with jax.enable_x64(True):
            @functools.partial(jax.jit, static_argnames=("maxp",))
            def impl(mags, times, numbps, *, maxp: int):
                def one(mag, t, nb):
                    m = mag.astype(jnp.int64)
                    evt = (t >> _POS_BITS).astype(jnp.int32)
                    ever = t < _INF
                    sig_i = evt // 3
                    sig_cup = (evt % 3) == 2
                    i = jnp.arange(maxp, dtype=jnp.int32)[:, None, None]
                    bp = jnp.maximum(nb - 1 - i, 0).astype(jnp.int64)
                    valid = (i < nb)
                    one_ = jnp.int64(1) << bp
                    nr = one_ | (one_ >> 1)
                    dsig = (m * m - (m - nr) * (m - nr)).astype(jnp.float64)
                    sig_here = ever & (sig_i[None] == i) & valid
                    spp = jnp.sum(
                        dsig * (sig_here & ~sig_cup[None]), axis=(1, 2))
                    cup = jnp.sum(
                        dsig * (sig_here & sig_cup[None]), axis=(1, 2))
                    trunc_hi = (m >> (bp + 1)) << (bp + 1)
                    old = trunc_hi + one_
                    new = jnp.where(bp >= 1,
                                    ((m >> bp) << bp) + (one_ >> 1), m)
                    dref = ((m - old) * (m - old)
                            - (m - new) * (m - new)).astype(jnp.float64)
                    ref_here = ever & (sig_i[None] < i) & valid
                    mrp = jnp.sum(dref * ref_here, axis=(1, 2))
                    flat = jnp.stack([spp, mrp, cup], -1).reshape(-1)
                    e0 = jnp.sum((m * m).astype(jnp.float64))
                    return jnp.cumsum(flat), e0

                return jax.vmap(one)(mags, times, numbps)
            _DISTS_JIT = impl
    return _DISTS_JIT


def _raw_completed_bytes(bits: np.ndarray, nbits: int) -> int:
    """Bytes fully emitted by the bypass writer after consuming `nbits`
    of this segment's bit stream (stuffing-aware) — the host coder's
    RawEnc.num_bytes() at a pass boundary."""
    if nbits <= 0 or bits.shape[0] == 0:
        return 0
    from .ht_encode import stuff_bits

    packed = np.packbits(bits.astype(np.uint8))
    out = np.frombuffer(stuff_bits(packed, int(bits.shape[0])),
                        dtype=np.uint8)
    caps = np.full(out.shape, 8, dtype=np.int64)
    caps[1:][out[:-1] == 0xFF] = 7
    cum = np.cumsum(caps)
    full = int(np.searchsorted(cum, nbits, side="right"))
    consumed = int(cum[full - 1]) if full else 0
    # the host RawEncoder counts a partially-filled accumulator as one
    # more byte (num_bytes = len(bytes) + (1 if used))
    return full + (1 if nbits > consumed else 0)


def _assemble_one(byts, seg_counts, raw_bits, raw_plane_counts, numbps,
                  lazy, bytes_at=None, raw_spp=None):
    """Splice one block's MQ segments and raw segments into the final
    codeword stream; returns (data, passes).  Non-terminated pass rates
    use the scan's per-boundary byteout counts (bytes_at) and the raw
    SPP bit split (raw_spp) to reproduce the host coder's
    out_bytes + pending estimates exactly."""
    from ..t1.coder import PassInfo

    nb = int(numbps)
    if nb == 0:
        return b"", []
    terms = [i for i in range(nb) if (lazy and i >= 3) or i == nb - 1]
    term_set = set(terms)
    # split the MQ byte stream into segments; drop each segment's fake
    # lead byte and any trailing 0xFF (the host flush conventions)
    mq_segs = []
    seg_start_emit = []
    off = 0
    for k in range(len(terms)):
        cnt = int(seg_counts[k])
        seg_start_emit.append(off)
        seg = bytes(byts[off + 1:off + cnt])
        off += cnt
        if seg and seg[-1] == 0xFF:
            seg = seg[:-1]
        mq_segs.append(seg)
    # raw segments per plane (lazy, i >= 4), contiguous in plane order
    raw_segs = {}
    raw_seg_bits = {}
    roff = 0
    for i in range(nb):
        c = int(raw_plane_counts[i])
        if c:
            raw_seg_bits[i] = raw_bits[roff:roff + c]
            raw_segs[i] = _raw_payload(raw_seg_bits[i])
            roff += c
    data = bytearray()
    passes = []
    mq_k = 0
    for i in range(nb):
        p = nb - 1 - i
        if i > 0:
            raw_i = lazy and i >= 4
            if raw_i:
                nspp = int(raw_spp[i]) if raw_spp is not None else 0
                done = _raw_completed_bytes(
                    raw_seg_bits.get(i, np.zeros(0, np.uint8)), nspp)
                passes.append(PassInfo(0, p, False,
                                       len(data) + done + 1, 0.0))
                data += raw_segs.get(i, b"")
                passes.append(PassInfo(1, p, True, len(data), 0.0))
            else:
                base = seg_start_emit[mq_k] if mq_k < len(terms) else 0
                for pt, k in ((0, 3 * i), (1, 3 * i + 1)):
                    nbyt = (int(bytes_at[k]) - base
                            if bytes_at is not None else 0)
                    passes.append(PassInfo(pt, p, False,
                                           len(data) + nbyt + 4, 0.0))
        if i in term_set:
            data += mq_segs[mq_k]
            passes.append(PassInfo(2, p, True, len(data), 0.0))
            mq_k += 1
        else:
            base = seg_start_emit[mq_k] if mq_k < len(terms) else 0
            nbyt = (int(bytes_at[3 * i + 2]) - base
                    if bytes_at is not None else 0)
            passes.append(PassInfo(2, p, False, len(data) + nbyt + 4, 0.0))
    # enforce monotone rates (host encoder does the same clamp)
    total = len(data)
    rates = [min(pp.rate, total) for pp in passes]
    for j in range(len(rates) - 2, -1, -1):
        rates[j] = min(rates[j], rates[j + 1])
    for pp, r in zip(passes, rates):
        pp.rate = r
    return bytes(data), passes


def encode_cblks_mq_device(coeffs_batch, orients, lazy: bool,
                           numbps_bound: int | None = None,
                           need_dist: bool = False):
    """End-to-end device MQ encode of a uniform-shape batch.

    coeffs_batch: (B, H, W) int32 — numpy, or a device array (transform
    outputs stay resident, no coefficient round trip); orients: (B,).
    numbps_bound: static magnitude bit bound (band M_b) so the plane
    bucket needs no device sync; derived from the data for numpy inputs.
    Returns [(data, numbps, passes, e0)] byte-identical to the host
    coder with style NONE (lazy=False) or LAZY (lazy=True); with
    need_dist the per-pass distortions (and e0) are computed on-device
    in exact integer-valued float64 (see _dists_fn), matching the host
    accumulation bit for bit within the device numbps range."""
    b, h, w = coeffs_batch.shape
    if numbps_bound is None:
        if isinstance(coeffs_batch, np.ndarray):
            numbps_bound = int(np.abs(coeffs_batch).max(initial=0)
                               ).bit_length()
        else:
            numbps_bound = int(jnp.abs(coeffs_batch).max()).bit_length()
    if numbps_bound > MAX_NUMBPS_DEVICE:
        raise ValueError("magnitudes exceed the device MQ range")
    maxp = next(bkt for bkt in NUMBPS_BUCKETS
                if bkt >= max(numbps_bound, 1))
    xb = jnp.asarray(coeffs_batch)
    mags = jnp.abs(xb).astype(jnp.int32)
    signs = (xb < 0).astype(jnp.int32)
    res = build_streams(mags, signs, jnp.asarray(orients, jnp.int32),
                        h=h, w=w, maxp=maxp, lazy=lazy)
    (mq_ctx, mq_bit, mq_n, raw_c, raw_n, raw_counts, numbps,
     times_f, sec_counts, raw_spp_counts) = res
    n_host = np.asarray(mq_n)
    lmax = int(n_host.max(initial=1))
    L = 1 << max(4, (lmax - 1).bit_length())
    boundaries = jnp.cumsum(sec_counts.reshape(b, -1),
                            axis=1).astype(jnp.int32)
    byts, nbytes, seg_counts, bytes_at = mq_scan(
        mq_ctx[:, :L], mq_bit[:, :L], mq_n, boundaries, maxseg=maxp + 1)
    # fetch the small metadata together, then slice the big padded
    # streams ON DEVICE before they cross the (slow) D2H link
    nbytes_h = np.asarray(nbytes)
    raw_n_h = np.asarray(raw_n)
    bmax = max(1, int(nbytes_h.max(initial=1)))
    rmax = max(1, int(raw_n_h.max(initial=1)))
    byts = np.asarray(byts[:, :bmax])
    raw_c = np.asarray(raw_c[:, :rmax])
    seg_counts = np.asarray(seg_counts)
    raw_counts = np.asarray(raw_counts)
    raw_spp_h = np.asarray(raw_spp_counts)
    bytes_at_h = np.asarray(bytes_at)
    numbps_h = np.asarray(numbps)
    dists_h = e0_h = None
    if need_dist:
        with jax.enable_x64(True):  # tracing happens on first call
            dists, e0s = _dists_fn()(mags, times_f, numbps, maxp=maxp)
        dists_h = np.asarray(dists)
        e0_h = np.asarray(e0s)
    out = []
    for bi in range(b):
        data, passes = _assemble_one(byts[bi], seg_counts[bi], raw_c[bi],
                                     raw_counts[bi], numbps_h[bi], lazy,
                                     bytes_at=bytes_at_h[bi],
                                     raw_spp=raw_spp_h[bi])
        if need_dist and passes:
            nb = int(numbps_h[bi])
            # flat kernel layout is (SPP, MRP, CUP) x plane; the pass
            # sequence starts at plane 0's CUP (flat index 2)
            idx = [2] + list(range(3, 3 * nb))
            cum = dists_h[bi]
            for pp, k in zip(passes, idx):
                pp.dist = float(cum[k])
        out.append((data, int(numbps_h[bi]), passes,
                    float(e0_h[bi]) if need_dist else None))
    return out
