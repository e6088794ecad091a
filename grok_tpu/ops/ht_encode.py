"""Device-side HT (Part 15) cleanup-pass ENCODER.

The TPU-native Tier-1 milestone (SURVEY.md §7 roadmap step 2, after
ops/ht_meta.py): the whole HT cleanup pass — quad significance, MEL
run-length coding, VLC quad codes with the u-residual predictor chain,
MagSgn payload — runs on the accelerator for a BATCH of codeblocks:

- per-quad metadata and MagSgn values are pure data-parallel VPU math,
- the u predictor ("umax of the previous nonempty quad in the row") is a
  `jax.lax.associative_scan` with a last-valid combiner,
- the 13-state MEL automaton is a `jax.lax.scan` over the quad sequence,
  vmapped across the codeblock batch (the TPU answer to the reference's
  per-codeblock threads: one serial chain per block, thousands of blocks
  in flight),
- each stream is bit-packed UNSTUFFED on device via exclusive-prefix-sum
  offsets + scatter (33 scatter rounds bound the max code length).

The host then applies the deterministic 0xFF bit-stuffing re-serialization
(native C when available) and assembles segments; output is bit-identical
to t1/ht.py::encode_cblk_ht (tests/test_device_ops.py).

Only even codeblock dimensions take this path — ragged edge blocks keep
the host coder (they are a vanishing fraction of a tiled image).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..t1.ht import MEL_E, _BitWriterMSB

# device path supports magnitudes below 2^25 (MagSgn value fits int32 and
# every VLC u-residual fits the 7-bit escape); callers fall back to the
# host coder above that
MAX_NUMBPS_DEVICE = 25
_MS_MAXLEN = MAX_NUMBPS_DEVICE + 1   # (m-1) in umax bits + sign
_VLC_MAXLEN = 7 + 10                 # max CxtVLC cwd + '111' + 7-bit escape
_MEL_MAXLEN = 6                      # '0' + up to 5 run bits

_MEL_E_ARR = np.asarray(MEL_E, dtype=np.int32)


def _pack_bits(vals, lens, max_len: int, total_bits: int):
    """MSB-first unstuffed bit packing of variable-length codes.

    vals/lens: (N,) int32.  Returns (bytes (total_bits//8,) uint8, nbits).
    total_bits must be a static multiple of 8 bounding the stream size.
    Gather-based: output bit q belongs to the code i whose cumulative
    length first exceeds q (searchsorted); TPU scatters serialize,
    gathers do not."""
    del max_len
    lens = lens.astype(jnp.int32)
    cs = jnp.cumsum(lens)
    nbits = cs[-1]
    q = jnp.arange(total_bits, dtype=jnp.int32)
    i = jnp.searchsorted(cs, q, side="right")
    i = jnp.minimum(i, vals.shape[0] - 1)
    offs = cs[i] - lens[i]
    j = q - offs
    bit = (vals[i] >> jnp.maximum(lens[i] - 1 - j, 0)) & 1
    bits = jnp.where(q < nbits, bit, 0).astype(jnp.int32)
    weights = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], dtype=jnp.int32)
    byts = (bits.reshape(-1, 8) @ weights).astype(jnp.uint8)
    return byts, nbits


def _mel_scan(events):
    """MEL-encode a (nq,) 0/1 event sequence -> per-step (val, len) plus a
    final flush step; mirrors t1.ht.MELEncoder exactly."""
    e_tab = jnp.asarray(_MEL_E_ARR)

    def step(carry, ev):
        k, run = carry
        e = e_tab[k]
        t = jnp.int32(1) << e
        run0 = run + 1
        hit = run0 == t
        # event == 0: emit '1' when the run fills, else nothing
        val0 = jnp.int32(1)
        len0 = jnp.where(hit, jnp.int32(1), jnp.int32(0))
        k0 = jnp.where(hit, jnp.minimum(12, k + 1), k)
        run0 = jnp.where(hit, jnp.int32(0), run0)
        # event == 1: emit '0' + run in E[k] bits
        val1 = run  # leading 0 bit is implicit in length e+1
        len1 = e + 1
        k1 = jnp.maximum(0, k - 1)
        val = jnp.where(ev == 1, val1, val0)
        ln = jnp.where(ev == 1, len1, len0)
        k = jnp.where(ev == 1, k1, k0)
        run = jnp.where(ev == 1, jnp.int32(0), run0)
        return (k, run), (val, ln)

    (k, run), (vals, lens) = jax.lax.scan(
        step, (jnp.int32(0), jnp.int32(0)), events.astype(jnp.int32))
    flush_val = jnp.int32(1)
    flush_len = jnp.where(run > 0, jnp.int32(1), jnp.int32(0))
    return (jnp.concatenate([vals, flush_val[None]]),
            jnp.concatenate([lens, flush_len[None]]))


def _u_pred(umax, valid):
    """Per quad row: umax of the previous nonempty quad, init 1
    (associative last-valid scan along the qx axis)."""

    def combine(a, b):
        va, fa = a
        vb, fb = b
        return jnp.where(fb, vb, va), fa | fb

    sv, sf = jax.lax.associative_scan(combine, (umax, valid), axis=-1)
    pred = jnp.concatenate(
        [jnp.ones_like(sv[..., :1]), sv[..., :-1]], axis=-1)
    predf = jnp.concatenate(
        [jnp.zeros_like(sf[..., :1]), sf[..., :-1]], axis=-1)
    return jnp.where(predf, pred, 1)


def _encode_one(coeffs):
    """Device HT cleanup of one (H, W) int32 block with even H, W.
    Returns unstuffed (ms_bytes, ms_bits, mel_bytes, mel_bits, vlc_bytes,
    vlc_bits, numbps)."""
    h, w = coeffs.shape
    mags = jnp.abs(coeffs)
    signs = (coeffs < 0).astype(jnp.int32)
    numbps = 32 - jax.lax.clz(jnp.max(mags))

    qh, qw = h // 2, w // 2
    q = mags.reshape(qh, 2, qw, 2)
    s = signs.reshape(qh, 2, qw, 2)
    # sample order TL, BL, TR, BR
    qm = jnp.stack([q[:, 0, :, 0], q[:, 1, :, 0],
                    q[:, 0, :, 1], q[:, 1, :, 1]], axis=-1)  # (qh,qw,4)
    qs = jnp.stack([s[:, 0, :, 0], s[:, 1, :, 0],
                    s[:, 0, :, 1], s[:, 1, :, 1]], axis=-1)
    sig = (qm > 0).astype(jnp.int32)
    rho = sig[..., 0] | (sig[..., 1] << 1) | (sig[..., 2] << 2) \
        | (sig[..., 3] << 3)
    nonempty = rho != 0
    bl = 32 - jax.lax.clz(qm)
    umax = jnp.max(bl, axis=-1)

    # ---- MEL over row-major quad sequence
    mel_vals, mel_lens = _mel_scan(nonempty.reshape(-1))

    # ---- VLC: rho nibble + zigzagged u residual per nonempty quad
    up = _u_pred(umax, nonempty)
    diff = umax - up
    zz = jnp.where(diff >= 0, diff << 1, (-diff << 1) - 1)
    ucode = jnp.where(
        zz == 0, 0,
        jnp.where(zz == 1, 0b10,
                  jnp.where(zz == 2, 0b110, (0b111 << 7) | (zz - 3))))
    ulen = jnp.where(
        zz == 0, 1, jnp.where(zz == 1, 2, jnp.where(zz == 2, 3, 10)))
    # quad significance through the CxtVLC table (t1/ht_tables.py swap
    # point); the table is baked at trace time and the jit cache is
    # cleared on set_tables().  The neighbor-significance CONTEXT chain
    # is fully data-parallel on encode — every quad's rho is known up
    # front, so the left/up/upleft selectors are plain shifted views.
    from ..t1 import ht_tables as _vt

    enc_tbl = jnp.asarray(_vt.ENC_CWD, dtype=jnp.int32)   # (NUM_CTX, 16)
    len_tbl = jnp.asarray(_vt.ENC_LEN, dtype=jnp.int32)
    left = jnp.pad(rho[:, :-1], ((0, 0), (1, 0)))
    up = jnp.pad(rho[:-1, :], ((1, 0), (0, 0)))
    upleft = jnp.pad(rho[:-1, :-1], ((1, 0), (1, 0)))
    ctx = ((left > 0) + 2 * (up > 0) + 4 * (upleft > 0)).astype(jnp.int32)
    vlc_vals = ((enc_tbl[ctx, rho] << ulen) | ucode).reshape(-1)
    vlc_lens = jnp.where(nonempty, len_tbl[ctx, rho] + ulen, 0).reshape(-1)

    # ---- MagSgn: ((m-1) << 1 | sign) in umax+1 bits per significant sample
    ms_vals = (((qm - 1) << 1) | qs).reshape(-1)
    ms_lens = jnp.where(sig > 0, umax[..., None] + 1, 0).reshape(-1)

    ms_total = 8 * ((qh * qw * 4 * _MS_MAXLEN + 7) // 8)
    vlc_total = 8 * ((qh * qw * _VLC_MAXLEN + 7) // 8)
    mel_total = 8 * ((qh * qw * _MEL_MAXLEN + 8 + 7) // 8)
    ms_b, ms_n = _pack_bits(ms_vals, ms_lens, _MS_MAXLEN, ms_total)
    vlc_b, vlc_n = _pack_bits(vlc_vals, vlc_lens, _VLC_MAXLEN, vlc_total)
    mel_b, mel_n = _pack_bits(mel_vals, mel_lens, _MEL_MAXLEN, mel_total)
    return ms_b, ms_n, mel_b, mel_n, vlc_b, vlc_n, numbps


@functools.partial(jax.jit, static_argnames=("h", "w"))
def encode_batch_device(coeffs, *, h: int, w: int):
    """vmapped device HT cleanup over a (B, h, w) int32 batch."""
    del h, w
    return jax.vmap(_encode_one)(coeffs)


def _stuff_bits_py(raw: np.ndarray, nbits: int) -> bytes:
    """Re-serialize an unstuffed MSB-first bit buffer with 0xFF stuffing
    (7-bit capacity after a 0xFF byte) + the writer's flush semantics."""
    bw = _BitWriterMSB()
    for i in range(int(nbits)):
        bw.put((int(raw[i >> 3]) >> (7 - (i & 7))) & 1)
    return bw.flush()


_native_stuff = None


def _get_native_stuff():
    global _native_stuff
    if _native_stuff is None:
        try:
            from ..t1 import native as nat

            _native_stuff = nat.stuff_bits_native
        except Exception:
            _native_stuff = _stuff_bits_py
    return _native_stuff


def stuff_bits(raw: np.ndarray, nbits: int) -> bytes:
    if nbits == 0:
        return b""
    return _get_native_stuff()(raw, nbits)


def assemble_segments(ms_b, ms_n, mel_b, mel_n, vlc_b, vlc_n, numbps):
    """Host assembly: stuff each stream, reverse VLC, append Scup.
    Inputs are the (numpy) outputs of encode_batch_device; returns a list
    of (segment bytes, numbps) matching t1.ht.encode_cblk_ht."""
    out = []
    for i in range(ms_b.shape[0]):
        nb = int(numbps[i])
        if nb == 0:
            out.append((b"", 0))
            continue
        ms = stuff_bits(ms_b[i], int(ms_n[i]))
        mel = stuff_bits(mel_b[i], int(mel_n[i]))
        vlc = stuff_bits(vlc_b[i], int(vlc_n[i]))[::-1]
        suffix = mel + vlc
        scup = len(suffix) + 2
        if scup > 4079:
            raise ValueError("HT suffix overflow")
        seg = ms + suffix + bytes([0x0F & scup, (scup >> 4) & 0xFF])
        out.append((seg, nb))
    return out


def encode_cblks_ht_device(coeffs_batch: np.ndarray):
    """End-to-end: (B, H, W) int32 batch (even H, W, magnitudes < 2^25)
    -> [(segment, numbps)] bit-identical to the host coder."""
    b, h, w = coeffs_batch.shape
    if h % 2 or w % 2:
        raise ValueError("device HT path requires even codeblock dims")
    res = encode_batch_device(jnp.asarray(coeffs_batch), h=h, w=w)
    ms_b, ms_n, mel_b, mel_n, vlc_b, vlc_n, numbps = map(np.asarray, res)
    if numbps.max(initial=0) > MAX_NUMBPS_DEVICE:
        raise ValueError("magnitudes exceed device HT range")
    return assemble_segments(ms_b, ms_n, mel_b, mel_n, vlc_b, vlc_n, numbps)
