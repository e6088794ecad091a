"""Device-side EBCOT Tier-1 MQ DECODER.

Unlike the encoder (ops/mq_encode.py), decode cannot precompute pass
membership: every decision must be decoded before the significance it
implies is known.  The decoder therefore runs as one `jax.lax.scan`
over the static (plane, pass, stripe-column) sequence with the FULL
coding state in the carry — significance/sign/visited/refined planes,
the doubled-domain reconstruction, the MQ register set with its byte
cursor, and the raw (bypass) bit cursor.  Segment byte ranges and the
pass->segment mapping are precomputed on the host from the packet
headers (they depend only on numbps/style/seg_lengths).  The scan is
vmapped across the codeblock batch, so the serial per-step cost is
paid once per batch, not per block.

Byte-identical to t1/coder.py::decode_cblk for styles NONE and LAZY
(no VSC/RESET/TERMALL/SEGSYM — those keep the host decoder), checked
by tests/test_device_ops.py differential tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mq_encode import (
    _CTX_MAG,
    _CTX_RL,
    _CTX_UNI,
    _INIT_CTX,
    _NLPS,
    _NMPS,
    _QE,
    _SC_CN,
    _SC_XOR,
    _ZC_LUT,
    MAX_NUMBPS_DEVICE,
    NUMBPS_BUCKETS,
)


@functools.partial(jax.jit, static_argnames=("h", "w", "maxp"))
def decode_batch(data, seg_bounds, pass_seg, pass_raw, num_passes, numbps,
                 orients, *, h: int, w: int, maxp: int):
    """Scan-decode a (B, Lb) byte batch into (B, h, w) doubled-domain
    signed int32 values.

    seg_bounds: (B, NSEG, 2) absolute [start, end) byte ranges per
    codeword segment (missing segments: (0, 0) -> all-0xFF reads, the
    host decoder's convention); pass_seg (B, NPASS): segment index per
    pass; pass_raw (B, NPASS): bypass flag per pass."""
    S = (h + 3) // 4
    PH = 4 * S + 2  # padded plane height (full stripes + 1-row borders)
    NSEG = seg_bounds.shape[1]
    NPASS = pass_seg.shape[1]
    Lb = data.shape[1]

    zc_lut = jnp.asarray(_ZC_LUT)
    sc_cn_t = jnp.asarray(_SC_CN.astype(np.int32))
    sc_xor_t = jnp.asarray(_SC_XOR.astype(np.int32))
    qe_t = jnp.asarray(_QE)
    nmps_t = jnp.asarray(_NMPS)
    nlps_t = jnp.asarray(_NLPS)
    si_ids = jnp.arange(_QE.shape[0], dtype=jnp.int32)
    ctx_ids = jnp.arange(19, dtype=jnp.int32)
    seg_ids = jnp.arange(NSEG, dtype=jnp.int32)
    pass_ids = jnp.arange(NPASS, dtype=jnp.int32)

    # static step sequence: plane i -> pass type -> stripe -> column
    ii, pp, ss, xx = np.meshgrid(
        np.arange(maxp, dtype=np.int32), np.arange(3, dtype=np.int32),
        np.arange(S, dtype=np.int32), np.arange(w, dtype=np.int32),
        indexing="ij")
    xs = (jnp.asarray(ii.reshape(-1)), jnp.asarray(pp.reshape(-1)),
          jnp.asarray(ss.reshape(-1)), jnp.asarray(xx.reshape(-1)),
          jnp.asarray(((ss == 0) & (xx == 0)).reshape(-1)),
          jnp.asarray(((ss == S - 1) & (xx == w - 1)).reshape(-1)),
          jnp.asarray(np.minimum(4, h - 4 * ss.astype(np.int64))
                      .astype(np.int32).reshape(-1)))

    def first_rec(bpno):
        one = jnp.int32(1) << bpno
        return one | (one >> 1)

    def refined(old, bpno, bit):
        half = jnp.int32(1) << jnp.maximum(bpno - 1, 0)
        with_half = jnp.where(bit == 1, old + half, old - half)
        at_zero = jnp.where(bit == 1, old, old - 1)
        return jnp.where(bpno > 0, with_half, at_zero)

    def one(dat, bounds, p_seg, p_raw, npass, nb, orient):
        zc_o = zc_lut[orient]

        def at(i, e):
            v = jax.lax.dynamic_slice(
                dat, (jnp.clip(i, 0, Lb - 1),), (1,))[0].astype(jnp.uint32)
            return jnp.where((i < e) & (i < Lb) & (i >= 0), v,
                             jnp.uint32(0xFF))

        def bytein(c, ct, bp, e):
            b0 = at(bp, e)
            b1 = at(bp + 1, e)
            is_ff = b0 == 0xFF
            stall = is_ff & (b1 > 0x8F)
            c2 = jnp.where(stall, c + 0xFF00,
                           jnp.where(is_ff, c + (b1 << 9), c + (b1 << 8)))
            ct2 = jnp.where(is_ff & ~stall, jnp.uint32(7), jnp.uint32(8))
            bp2 = jnp.where(stall, bp, bp + 1)
            return c2, ct2, bp2

        def initdec(s0, e0):
            c = at(s0, e0) << 16
            c, ct, bp = bytein(c, jnp.uint32(0), s0, e0)
            return (jnp.uint32(0x8000), c << 7, ct - 7, bp,
                    e0.astype(jnp.int32))

        def mq_decode(st, cn, do):
            """One masked MQ decision: returns (st', bit).  st = (a, c,
            ct, bp, e, states); nothing advances when `do` is False."""
            a, c, ct, bp, e, states = st
            oh_cn = ctx_ids == cn
            si = jnp.sum(jnp.where(oh_cn, states, 0)).astype(jnp.int32)
            oh_si = si_ids == si
            qe = jnp.sum(jnp.where(oh_si, qe_t, 0))
            mps = (si & 1).astype(jnp.uint32)
            a2 = a - qe
            ge = ((c >> 16) & 0xFFFF) >= qe
            c1 = jnp.where(ge, c - (qe << 16), c)
            hi = (((a2 >> 15) & 1) == 1) & ge
            small = a2 < qe
            lps = (small == ge) & (~hi)
            a3 = jnp.where(ge, a2, qe)
            nsi = jnp.where(
                lps, jnp.sum(jnp.where(oh_si, nlps_t, 0)),
                jnp.sum(jnp.where(oh_si, nmps_t, 0))).astype(jnp.uint8)
            states2 = jnp.where((~hi) & oh_cn, nsi, states)
            d = (mps ^ lps.astype(jnp.uint32)) & 1
            n = (jnp.uint32(15) - (31 - jax.lax.clz(
                jnp.maximum(a3 & 0xFFFF, 1)).astype(jnp.uint32)))
            n = jnp.where((a3 & 0x8000) != 0, jnp.uint32(0), n)
            a4 = (a3 << n) & 0xFFFF
            c2, ct2, bp2 = c1, ct, bp
            for _ in range(3):
                need = n > 0
                refill = need & (ct2 == 0)
                cb, ctb, bpb = bytein(c2, ct2, bp2, e)
                c2 = jnp.where(refill, cb, c2)
                ct2 = jnp.where(refill, ctb, ct2)
                bp2 = jnp.where(refill, bpb, bp2)
                sft = jnp.where(need, jnp.minimum(n, ct2), 0)
                c2 = c2 << sft
                ct2 = ct2 - sft
                n = n - sft
            new = (a4, c2, ct2, bp2, e, states2)
            old = (a, c, ct, bp, e, states)
            st2 = tuple(jnp.where(do, nv, ov) for nv, ov in zip(new, old))
            return st2, jnp.where(do, d.astype(jnp.int32), 0)

        def raw_decode(rw, do):
            acc, avail, prev_ff, rbp, e = rw
            need = avail == 0
            b = at(rbp, e)
            acc2 = jnp.where(need, b, acc)
            avail2 = jnp.where(
                need, jnp.where(prev_ff, jnp.uint32(7), jnp.uint32(8)),
                avail)
            prev2 = jnp.where(need, b == 0xFF, prev_ff)
            rbp2 = jnp.where(need, rbp + 1, rbp)
            avail3 = avail2 - 1
            bit = (acc2 >> avail3) & 1
            new = (acc2, avail3, prev2, rbp2, e)
            rw2 = tuple(jnp.where(do, nv, ov) for nv, ov in zip(new, rw))
            return rw2, jnp.where(do, bit.astype(jnp.int32), 0)

        def dec_bit(st, rw, cn, do, is_raw):
            st, mb = mq_decode(st, cn, do & ~is_raw)
            rw, rb = raw_decode(rw, do & is_raw)
            return st, rw, jnp.where(is_raw, rb, mb)

        def zc9(sig9):
            return (sig9[0, 0] | (sig9[0, 1] << 1) | (sig9[0, 2] << 2)
                    | (sig9[1, 0] << 3) | (sig9[1, 2] << 4)
                    | (sig9[2, 0] << 5) | (sig9[2, 1] << 6)
                    | (sig9[2, 2] << 7))

        def sc9(sig9, sgn9):
            return (sig9[1, 0] | ((sig9[1, 0] & sgn9[1, 0]) << 1)
                    | (sig9[1, 2] << 2) | ((sig9[1, 2] & sgn9[1, 2]) << 3)
                    | (sig9[0, 1] << 4) | ((sig9[0, 1] & sgn9[0, 1]) << 5)
                    | (sig9[2, 1] << 6) | ((sig9[2, 1] & sgn9[2, 1]) << 7))

        def step(carry, x_in):
            (sig, sgn, vis, ref, rec, st, rw, cur_seg) = carry
            i, pt, s, x, pstart, pend, rows = x_in
            p = jnp.maximum(nb - 1 - i, 0)
            bpno = p + 1  # doubled-domain reconstruction plane
            ordl = jnp.where(i == 0, jnp.int32(0), 3 * i + pt - 2)
            live = (i < nb) & ~((i == 0) & (pt < 2)) & (ordl < npass)

            # ---- segment bookkeeping at pass starts
            oh_pass = pass_ids == ordl
            segi = jnp.sum(jnp.where(oh_pass, p_seg, 0)).astype(jnp.int32)
            is_raw = jnp.sum(jnp.where(
                oh_pass, p_raw.astype(jnp.int32), 0)) > 0
            switch = live & pstart & (segi != cur_seg)
            oh_seg = seg_ids == segi
            s0 = jnp.sum(jnp.where(oh_seg, bounds[:, 0], 0)).astype(
                jnp.int32)
            e0 = jnp.sum(jnp.where(oh_seg, bounds[:, 1], 0)).astype(
                jnp.int32)
            a_n, c_n, ct_n, bp_n, e_n = initdec(s0, e0)
            mq_states = st[5]
            st = (jnp.where(switch & ~is_raw, a_n, st[0]),
                  jnp.where(switch & ~is_raw, c_n, st[1]),
                  jnp.where(switch & ~is_raw, ct_n, st[2]),
                  jnp.where(switch & ~is_raw, bp_n, st[3]),
                  jnp.where(switch & ~is_raw, e_n, st[4]),
                  mq_states)
            rw = (jnp.where(switch & is_raw, jnp.uint32(0), rw[0]),
                  jnp.where(switch & is_raw, jnp.uint32(0), rw[1]),
                  jnp.where(switch & is_raw, jnp.bool_(False), rw[2]),
                  jnp.where(switch & is_raw, s0, rw[3]),
                  jnp.where(switch & is_raw, e0, rw[4]))
            cur_seg = jnp.where(switch, segi, cur_seg)

            # ---- local 6x3 patches around the stripe-column
            y0 = 4 * s
            sigp = jax.lax.dynamic_slice(sig, (y0, x), (6, 3))
            sgnp = jax.lax.dynamic_slice(sgn, (y0, x), (6, 3))
            visp = jax.lax.dynamic_slice(vis, (y0 + 1, x + 1), (4, 1))[:, 0]
            refp = jax.lax.dynamic_slice(ref, (y0 + 1, x + 1), (4, 1))[:, 0]
            recp = jax.lax.dynamic_slice(rec, (y0 + 1, x + 1), (4, 1))[:, 0]

            is_spp = live & (pt == 0)
            is_mrp = live & (pt == 1)
            is_cup = live & (pt == 2)

            # ---- cleanup aggregation decision (column state BEFORE any
            # coding this column)
            blocked = []
            for k in range(4):
                s9 = jax.lax.dynamic_slice(sigp, (k, 0), (3, 3))
                blocked.append((sigp[k + 1, 1] != 0) | (visp[k] != 0)
                               | (zc9(s9) != 0))
            agg = is_cup & (rows == 4) & ~(blocked[0] | blocked[1]
                                           | blocked[2] | blocked[3])
            st, rl_bit = mq_decode(st, jnp.int32(_CTX_RL), agg)
            have_first = agg & (rl_bit == 1)
            st, u1 = mq_decode(st, jnp.int32(_CTX_UNI), have_first)
            st, u2 = mq_decode(st, jnp.int32(_CTX_UNI), have_first)
            first = (u1 << 1) | u2
            kstart = jnp.where(agg,
                               jnp.where(have_first, first + 1, 4),
                               0)

            # ---- per-row decoding in scan order
            for k in range(4):
                row_ok = k < rows
                s9 = jax.lax.dynamic_slice(sigp, (k, 0), (3, 3))
                g9 = jax.lax.dynamic_slice(sgnp, (k, 0), (3, 3))
                own = sigp[k + 1, 1]
                nb_idx = zc9(s9)
                scx = sc9(s9, g9)
                sc_ctx = sc_cn_t[scx]
                sc_flip = sc_xor_t[scx]

                # SPP: not significant, has neighbors
                spp_el = is_spp & row_ok & (own == 0) & (nb_idx != 0)
                # MRP: significant, not visited
                mrp_el = is_mrp & row_ok & (own != 0) & (visp[k] == 0)
                # CUP: the aggregated first sample codes only its sign;
                # rows >= kstart code normally when not sig/visited
                cup_first = have_first & (first == k)
                cup_el = is_cup & row_ok & (k >= kstart) & (own == 0) \
                    & (visp[k] == 0) & ~cup_first

                zc_ctx = zc_o[nb_idx].astype(jnp.int32)
                mr_ctx = jnp.where(refp[k] == 0,
                                   _CTX_MAG + (nb_idx != 0).astype(
                                       jnp.int32),
                                   jnp.int32(_CTX_MAG + 2))

                # magnitude/significance bit
                bit_cn = jnp.where(is_mrp, mr_ctx, zc_ctx)
                st, rw, bit = dec_bit(st, rw, bit_cn,
                                      spp_el | mrp_el | cup_el, is_raw)

                newsig = (spp_el & (bit == 1)) | (cup_el & (bit == 1)) \
                    | cup_first
                # sign bit: raw in bypassed SPP, else SC-coded
                st, rw, sbit = dec_bit(st, rw, sc_ctx, newsig, is_raw)
                sgn_val = jnp.where(is_raw, sbit, sbit ^ sc_flip)

                sigp = sigp.at[k + 1, 1].set(
                    jnp.where(newsig, 1, sigp[k + 1, 1]))
                sgnp = sgnp.at[k + 1, 1].set(
                    jnp.where(newsig, sgn_val, sgnp[k + 1, 1]))
                recp = recp.at[k].set(jnp.where(
                    newsig, first_rec(bpno),
                    jnp.where(mrp_el, refined(recp[k], bpno, bit),
                              recp[k])))
                refp = refp.at[k].set(
                    jnp.where(mrp_el, 1, refp[k]))
                visp = visp.at[k].set(
                    jnp.where(spp_el, 1, visp[k]))

            # ---- write the column state back
            sig = jax.lax.dynamic_update_slice(sig, sigp[1:5, 1:2],
                                               (y0 + 1, x + 1))
            sgn = jax.lax.dynamic_update_slice(sgn, sgnp[1:5, 1:2],
                                               (y0 + 1, x + 1))
            vis = jax.lax.dynamic_update_slice(vis, visp[:, None],
                                               (y0 + 1, x + 1))
            ref = jax.lax.dynamic_update_slice(ref, refp[:, None],
                                               (y0 + 1, x + 1))
            rec = jax.lax.dynamic_update_slice(rec, recp[:, None],
                                               (y0 + 1, x + 1))
            # visited clears after each cleanup pass
            vis = jnp.where(is_cup & pend, jnp.zeros_like(vis), vis)

            return (sig, sgn, vis, ref, rec, st, rw, cur_seg), None

        zero = jnp.zeros((PH, w + 2), jnp.int32)
        st0 = (jnp.uint32(0x8000), jnp.uint32(0), jnp.uint32(0),
               jnp.int32(0), jnp.int32(0), jnp.asarray(_INIT_CTX))
        rw0 = (jnp.uint32(0), jnp.uint32(0), jnp.bool_(False),
               jnp.int32(0), jnp.int32(0))
        init = (zero, zero, zero, zero, zero, st0, rw0, jnp.int32(-1))
        (sig, sgn, _, _, rec, _, _, _), _ = jax.lax.scan(step, init, xs)
        mags = rec[1:h + 1, 1:w + 1]
        signs = sgn[1:h + 1, 1:w + 1]
        return jnp.where(signs != 0, -mags, mags)

    return jax.vmap(one)(data, seg_bounds, pass_seg, pass_raw, num_passes,
                         numbps, orients)


def decode_cblks_mq_device(items):
    """Decode a batch of MQ codeblocks on the device.

    items: list of (data: bytes, seg_lengths, num_passes, numbps, h, w,
    orient, style) — uniform (h, w), styles NONE/LAZY only.  Returns a
    list of (h, w) doubled-domain int32 arrays, byte-identical to
    t1/coder.py::decode_cblk."""
    from ..params import CblkStyle
    from ..t1.coder import segment_layout

    b = len(items)
    h, w = items[0][4], items[0][5]
    nbmax = max((it[3] for it in items), default=1)
    if nbmax > MAX_NUMBPS_DEVICE:
        raise ValueError("numbps exceeds the device MQ range")
    maxp = next(bkt for bkt in NUMBPS_BUCKETS if bkt >= max(nbmax, 1))
    npass = 3 * maxp - 2
    nseg = npass  # upper bound on segment count

    lens = [max(1, len(it[0])) for it in items]
    Lb = 1 << (max(lens) - 1).bit_length()
    bpad = 1 << (b - 1).bit_length()
    data = np.zeros((bpad, Lb), np.uint8)
    seg_bounds = np.zeros((bpad, nseg, 2), np.int32)
    pass_seg = np.full((bpad, npass), nseg - 1, np.int32)
    pass_raw = np.zeros((bpad, npass), bool)
    num_passes = np.zeros(bpad, np.int32)
    numbps = np.zeros(bpad, np.int32)
    orients = np.zeros(bpad, np.int32)
    for bi, (dat, seg_lengths, np_, nb, hh, ww, orient, style) in \
            enumerate(items):
        if (hh, ww) != (h, w):
            raise ValueError("mixed shapes in device MQ decode batch")
        data[bi, :len(dat)] = np.frombuffer(dat, np.uint8)
        off = 0
        for si, L in enumerate(seg_lengths[:nseg]):
            seg_bounds[bi, si] = (off, off + L)
            off += L
        if nb > 0:
            for si, (plist, is_raw) in enumerate(
                    segment_layout(CblkStyle(int(style)), nb)):
                for pn in plist:
                    if pn < npass:
                        pass_seg[bi, pn] = si if si < nseg else nseg - 1
                        pass_raw[bi, pn] = is_raw
        num_passes[bi] = np_
        numbps[bi] = nb
        orients[bi] = orient

    out = decode_batch(
        jnp.asarray(data), jnp.asarray(seg_bounds), jnp.asarray(pass_seg),
        jnp.asarray(pass_raw), jnp.asarray(num_passes),
        jnp.asarray(numbps), jnp.asarray(orients), h=h, w=w, maxp=maxp)
    out = np.asarray(out)
    return [out[i] for i in range(b)]
