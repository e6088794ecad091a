"""Device-side HT (Part 15) cleanup-pass DECODER.

Counterpart of ops/ht_encode.py: the host destuffs the three byte
streams (0xFF stuffing removal is a cheap deterministic pass — native
`grk_destuff_bits`), then a single `jax.lax.scan` over the quad sequence
— vmapped across the codeblock batch — replays the MEL automaton, the
VLC quad parse with the u-predictor chain, and the MagSgn reads, carrying
three bit cursors.  Variable-length codes are read as fixed-width windows
via `lax.dynamic_slice` and the cursor advances by the consumed length.

Bit-identical inverse of t1/ht.py::encode_cblk_ht for even-dimension
blocks (tests/test_device_ops.py); ragged blocks keep the host decoder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..t1.ht import MEL_E, _BitReaderMSB

_MS_WIN = 31        # umax (<=30) + sign
_VLC_WIN = 17       # max 7-bit CxtVLC cwd + '111' + 7-bit escape
_MEL_RUN_WIN = 5    # max run-length field width
_PAD = 64           # cursor overrun guard

_MEL_E_ARR = np.asarray(MEL_E, dtype=np.int32)


def _window(bits, pos, n):
    """Read n bits MSB-first starting at pos (bits: (L,) int32 0/1,
    zero-padded past the stream end)."""
    w = jax.lax.dynamic_slice(bits, (pos,), (n,))
    weights = (1 << jnp.arange(n - 1, -1, -1)).astype(jnp.int32)
    return jnp.sum(w * weights)


def _decode_one(ms_bits, mel_bits, vlc_bits, qxs, qys, qh, qw, cqw):
    """Scan-decode one block's quad sequence on a canonical padded grid.

    qxs/qys: (NQ,) int32 quad coordinates of the canonical grid in scan
    order (qx == 0 resets the u predictor); qh/qw: the block's REAL quad
    dims (traced scalars); cqw: the canonical grid width (static).
    Quads outside the real grid are masked: they consume no bits and
    change no state, so a single compilation serves every block shape
    that fits the canonical grid (VERDICT round-1: gigapixel tilings
    must not recompile per ragged shape).  The carry holds the previous
    quad row's rho values (plus left/upleft scalars) for the CxtVLC
    neighbor-significance context — on decode the context chain is
    inherently sequential, so it rides the same scan as the bit cursors.
    Returns (NQ, 4) doubled-domain signed samples in TL,BL,TR,BR order."""
    e_tab = jnp.asarray(_MEL_E_ARR)

    def step(carry, qc):
        (k0, pz0, pone0, mpos0, vpos0, spos0, upred0,
         rrow0, left0, pup0) = carry
        qx, qy = qc
        valid = (qx < qw) & (qy < qh)
        upred0 = jnp.where((qx == 0) & valid, jnp.int32(1), upred0)
        # ---- CxtVLC context from neighbor-quad significance
        up = rrow0[qx]
        left = jnp.where(qx == 0, 0, left0)
        upleft = jnp.where(qx == 0, 0, pup0)
        ctx = ((left > 0) + 2 * (up > 0) + 4 * (upleft > 0)).astype(
            jnp.int32)

        # ---- one MEL event (mirrors t1.ht.MELDecoder)
        fresh = (pz0 == 0) & (~pone0)
        bit = jnp.where(fresh, _window(mel_bits, mpos0, 1), 0)
        e = e_tab[k0]
        t = jnp.int32(1) << e
        run = jnp.where(fresh & (bit == 0),
                        _window(mel_bits, mpos0 + 1, _MEL_RUN_WIN)
                        >> (_MEL_RUN_WIN - e), 0)
        consumed = jnp.where(fresh, jnp.where(bit == 1, 1, 1 + e), 0)
        # state transitions
        ev = jnp.where(
            ~fresh, jnp.where(pz0 > 0, 0, 1),
            jnp.where(bit == 1, 0, jnp.where(run > 0, 0, 1)))
        k = jnp.where(fresh,
                      jnp.where(bit == 1, jnp.minimum(12, k0 + 1),
                                jnp.maximum(0, k0 - 1)), k0)
        pz_new = jnp.where(
            ~fresh, jnp.where(pz0 > 0, pz0 - 1, pz0),
            jnp.where(bit == 1, t - 1, jnp.where(run > 0, run - 1, 0)))
        pone_new = jnp.where(
            ~fresh, jnp.where(pz0 > 0, pone0, jnp.bool_(False)),
            jnp.where((bit == 0) & (run > 0), True, False))
        mpos = mpos0 + consumed

        # ---- VLC quad parse when the event says "nonempty": prefix-code
        # window read — peek the max-width codeword window, look up
        # (rho, consumed length) in the CxtVLC decode LUT baked at trace
        # time (t1/ht_tables.py; the jit cache is cleared on set_tables)
        win = _window(vlc_bits, vpos0, _VLC_WIN)
        from ..t1 import ht_tables as _vt

        maxc = _vt.MAX_CWD_LEN
        lut_rho = jnp.asarray(_vt.DEC_LUT_RHO, dtype=jnp.int32)
        lut_len = jnp.asarray(_vt.DEC_LUT_LEN, dtype=jnp.int32)
        cw = win >> (_VLC_WIN - maxc)
        rho = lut_rho[ctx, cw]
        clen = lut_len[ctx, cw]
        uw = (win >> (_VLC_WIN - clen - 10)) & 0x3FF  # 10-bit u window
        u0 = (uw >> 9) & 1
        u1 = (uw >> 8) & 1
        u2 = (uw >> 7) & 1
        esc = uw & 0x7F
        zz = jnp.where(u0 == 0, 0,
                       jnp.where(u1 == 0, 1,
                                 jnp.where(u2 == 0, 2, 3 + esc)))
        ulen = jnp.where(u0 == 0, 1,
                         jnp.where(u1 == 0, 2, jnp.where(u2 == 0, 3, 10)))
        diff = jnp.where(zz & 1, -((zz + 1) >> 1), zz >> 1)
        umax = upred0 + diff
        rho = jnp.where(ev == 1, rho, 0)
        vpos = vpos0 + jnp.where(ev == 1, clen + ulen, 0)
        upred = jnp.where(ev == 1, umax, upred0)

        # ---- MagSgn: four sequential variable-width reads
        vals = []
        spos = spos0
        for i in range(4):
            sig = (rho >> i) & 1
            win = _window(ms_bits, spos, _MS_WIN)
            m = (win >> (_MS_WIN - umax)) + 1
            sgn = (win >> (_MS_WIN - umax - 1)) & 1
            v = jnp.where(sig == 1,
                          jnp.where(sgn == 1, -(2 * m + 1), 2 * m + 1), 0)
            vals.append(v.astype(jnp.int32))
            spos = spos + jnp.where(sig == 1, umax + 1, 0)

        # mask: padding quads consume nothing and leave all state intact
        carry_new = (jnp.where(valid, k, k0),
                     jnp.where(valid, pz_new, pz0),
                     jnp.where(valid, pone_new, pone0),
                     jnp.where(valid, mpos, mpos0),
                     jnp.where(valid, vpos, vpos0),
                     jnp.where(valid, spos, spos0),
                     jnp.where(valid, upred, upred0),
                     rrow0.at[qx].set(jnp.where(valid, rho, up)),
                     jnp.where(valid, rho, left0),
                     jnp.where(valid, up, pup0))
        out = jnp.where(valid, jnp.stack(vals), 0)
        return carry_new, out

    init = (jnp.int32(0), jnp.int32(0), jnp.bool_(False),
            jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(1),
            jnp.zeros((cqw,), jnp.int32), jnp.int32(0), jnp.int32(0))
    _, out = jax.lax.scan(step, init, (qxs, qys))
    return out


@functools.partial(jax.jit, static_argnames=("cqh", "cqw"))
def decode_batch_device(ms_bits, mel_bits, vlc_bits, qhs, qws, *,
                        cqh: int, cqw: int):
    """Decode a batch on the canonical (cqh, cqw) quad grid; qhs/qws give
    each block's real quad dims.  Returns (B, 2*cqh, 2*cqw) samples."""
    qxs = jnp.tile(jnp.arange(cqw, dtype=jnp.int32), cqh)
    qys = jnp.repeat(jnp.arange(cqh, dtype=jnp.int32), cqw)
    out = jax.vmap(
        lambda a, b, c, qh, qw: _decode_one(a, b, c, qxs, qys, qh, qw,
                                            cqw))(
        ms_bits, mel_bits, vlc_bits, qhs, qws)
    # (B, NQ, 4) TL,BL,TR,BR -> (B, 2cqh, 2cqw)
    b = out.shape[0]
    q = out.reshape(b, cqh, cqw, 2, 2)     # [..., x, y] (sample order)
    return q.transpose(0, 1, 4, 2, 3).reshape(b, cqh * 2, cqw * 2)


def _destuff_py(data: bytes) -> np.ndarray:
    br = _BitReaderMSB(data)
    n = len(data) * 8
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        out[i] = br.get()
    return out


def _destuff(data: bytes) -> np.ndarray:
    if not data:
        return np.zeros(0, dtype=np.uint8)
    try:
        from ..t1 import native as nat

        return nat.destuff_bits_native(data)
    except Exception:
        return _destuff_py(data)


def decode_cblks_ht_device(items: list[tuple[bytes, int, int]]):
    """Decode a batch of HT cleanup segments of MIXED shapes on the device.

    items: (data, h, w) per codeblock, even dims.  Every block decodes on
    one canonical quad grid (per-dim power-of-two of the batch maxima)
    with per-block validity masking, so a gigapixel tiling with ragged
    edge blocks triggers a single compilation per canonical grid instead
    of one per (h, w).  Returns a list of (h, w) int32 arrays."""
    b = len(items)
    streams = []
    for data, h, w in items:
        if h % 2 or w % 2:
            raise ValueError("device HT path requires even codeblock dims")
        if len(data) < 2:
            streams.append((np.zeros(0, np.uint8),) * 3)
            continue
        scup = ((data[-1] & 0xFF) << 4) | (data[-2] & 0x0F)
        if scup < 2 or scup > len(data):
            streams.append((np.zeros(0, np.uint8),) * 3)
            continue
        suffix = data[len(data) - scup:len(data) - 2]
        ms = data[: len(data) - scup]
        streams.append((_destuff(ms), _destuff(suffix),
                        _destuff(suffix[::-1])))
    lens = [max(max(len(a), len(m), len(v)), 1) for a, m, v in streams]
    # bucket the padded length and batch to powers of two: the scan jit
    # re-specializes on both, and raw stream lengths vary continuously
    L = 1 << (max(lens) + _PAD - 1).bit_length()
    bpad = 1 << (b - 1).bit_length()
    cqh = 1 << (max(h // 2 for _, h, _ in items) - 1).bit_length()
    cqw = 1 << (max(w // 2 for _, _, w in items) - 1).bit_length()
    pads = np.zeros((3, bpad, L), dtype=np.int32)
    for i, (a, m, v) in enumerate(streams):
        pads[0, i, :len(a)] = a
        pads[1, i, :len(m)] = m
        pads[2, i, :len(v)] = v
    qhs = np.zeros(bpad, dtype=np.int32)
    qws = np.zeros(bpad, dtype=np.int32)
    for i, (_, h, w) in enumerate(items):
        qhs[i], qws[i] = h // 2, w // 2
    out = decode_batch_device(
        jnp.asarray(pads[0]), jnp.asarray(pads[1]), jnp.asarray(pads[2]),
        jnp.asarray(qhs), jnp.asarray(qws), cqh=cqh, cqw=cqw)
    out = np.asarray(out)
    return [out[i, :h, :w] for i, (_, h, w) in enumerate(items)]
