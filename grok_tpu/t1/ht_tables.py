"""CxtVLC code tables for the HT cleanup pass — the single swap point.

Parity: the normative HTJ2K quad-significance coder (ITU-T T.814 §7.3.5,
ref: src/lib/core/t1/ht/ [P]) maps, per quad, a CONTEXT (derived from
neighbor-quad significance) and the quad pattern rho (+ EMB bits) to a
variable-length codeword through fixed code tables — one table set for
initial-row quad pairs, one for non-initial rows.

**Construction rules, as far as reconstructible without T.814 text:**
the normative tables are prefix codes over (rho, EMB) pairs optimized per
context, at most 7 bits, generated from the probability model in the
standard's Annex; the context is formed from the significance of the
previous quad in the pair and the two quads above.  None of the actual
codeword assignments can be derived in this environment (no T.814 source
and no HT oracle), so the DEFAULT tables below are a self-consistent
stand-in: context-independent, fixed-length-4, identity (codeword ==
rho).  Everything AROUND the table — MEL automaton, segment layout, Scup
framing, MagSgn packing, u-prediction — follows the spec structure and
is pinned by frozen golden vectors (tests/test_ht_tables.py), so
swapping in the normative tables is a change to THIS module only:

    set_tables(enc_cwd, enc_len) -> all three coder paths (Python
    reference, native C++, device/XLA) pick up the new code.

Current constraint carried by the three decoders: codewords must be a
fixed length of 4 bits per context (bijective nibble mapping).  The
interface is already (context, rho) -> (codeword, length) so lifting to
variable-length prefix codes is localized to the decoders' window reads.
"""

from __future__ import annotations

import numpy as np

NUM_CTX = 8        # context slots (the stand-in uses only ctx 0)
CWD_LEN = 4        # fixed codeword length all decoders currently assume


def _identity_tables():
    enc_cwd = np.tile(np.arange(16, dtype=np.uint8), (NUM_CTX, 1))
    enc_len = np.full((NUM_CTX, 16), CWD_LEN, dtype=np.uint8)
    return enc_cwd, enc_len


def _invert(enc_cwd: np.ndarray) -> np.ndarray:
    dec = np.zeros_like(enc_cwd)
    for c in range(enc_cwd.shape[0]):
        dec[c, enc_cwd[c]] = np.arange(16, dtype=np.uint8)
    return dec


ENC_CWD, ENC_LEN = _identity_tables()
DEC_RHO = _invert(ENC_CWD)

# callbacks run on table swap (native installer, device jit-cache flush)
_listeners: list = []


def on_swap(fn) -> None:
    _listeners.append(fn)
    fn()  # apply current tables immediately


def _flush_device_caches() -> None:
    # device coders bake the table at trace time; drop their jit caches
    import sys

    for name in ("grok_tpu.ops.ht_encode", "grok_tpu.ops.ht_decode"):
        mod = sys.modules.get(name)
        if mod is None:
            continue
        for attr in ("encode_batch_device", "decode_batch_device"):
            fn = getattr(mod, attr, None)
            if fn is not None and hasattr(fn, "clear_cache"):
                fn.clear_cache()


def set_tables(enc_cwd, enc_len) -> None:
    """Install a CxtVLC table set (shape (NUM_CTX, 16)); codewords must
    be a bijective nibble mapping per context (see module docstring)."""
    global ENC_CWD, ENC_LEN, DEC_RHO
    enc_cwd = np.asarray(enc_cwd, dtype=np.uint8)
    enc_len = np.asarray(enc_len, dtype=np.uint8)
    if enc_cwd.shape != (NUM_CTX, 16) or enc_len.shape != (NUM_CTX, 16):
        raise ValueError(f"tables must be ({NUM_CTX}, 16)")
    if (enc_len != CWD_LEN).any():
        raise ValueError(f"decoders currently require {CWD_LEN}-bit "
                         f"codewords")
    for c in range(NUM_CTX):
        if len(set(enc_cwd[c].tolist())) != 16:
            raise ValueError(f"context {c}: codewords are not bijective")
    ENC_CWD, ENC_LEN = enc_cwd, enc_len
    DEC_RHO = _invert(enc_cwd)
    _flush_device_caches()
    for fn in _listeners:
        fn()


def reset_tables() -> None:
    """Restore the default stand-in tables."""
    enc_cwd, enc_len = _identity_tables()
    set_tables(enc_cwd, enc_len)


def quad_context(rho_left: int, rho_up: int, rho_upleft: int) -> int:
    """Quad coding context from neighbor significance (T.814-shaped:
    3 significance indicators -> 8 contexts).  The stand-in tables are
    context-independent, so every context selects the same code today;
    the hook keeps the normative interface in place."""
    return ((1 if rho_left else 0)
            | ((1 if rho_up else 0) << 1)
            | ((1 if rho_upleft else 0) << 2))
