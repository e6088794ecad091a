"""CxtVLC table module (VERDICT r2 #3): the HT quad-significance code is
a swappable table set in t1/ht_tables.py; everything around it (MEL
automaton, Scup framing, segment layout, MagSgn packing, u prediction)
is pinned by frozen golden vectors so a table swap provably cannot move
the layout, and a table-injection differential test proves all coder
paths consume the installed tables."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, GrkImage
from grok_tpu.t1 import ht, ht_tables

# frozen segment bytes for fixed inputs (generated from the default
# stand-in tables; regenerating them is ONLY legitimate when the table
# module itself changes — any other diff means the MEL/Scup/segment
# framing regressed)
GOLDEN_8x8_SEED7 = bytes.fromhex(
    "b0af304f48559c921ea26cc3826d7e9156746197c20b15f81e6807e7ab94020d"
    "c471788872874e8c2e2a3f99c0b5157eb7328d170404ba5d0d01782fa4630000"
    "f0de27fedefbc4dffb3ef1d7de27fe0301")
GOLDEN_SPARSE_4x6 = bytes.fromhex("33e7807080c531f0100800")


@pytest.fixture(autouse=True)
def _restore_tables():
    yield
    ht_tables.reset_tables()


def _permuted_tables():
    enc = np.tile(np.arange(16, dtype=np.uint8) ^ 5, (ht_tables.NUM_CTX, 1))
    ln = np.full((ht_tables.NUM_CTX, 16), 4, dtype=np.uint8)
    return enc, ln


# a synthetic VARIABLE-LENGTH prefix code (canonical construction,
# lengths 2..7 = the T.814 range, Kraft sum 127/128): proves the decoders
# window-read true prefix codes, not fixed-width nibbles
VL_LENS = [2, 7, 3, 5, 4, 6, 3, 5, 4, 7, 3, 5, 4, 6, 5, 7]


def _canonical_code(lens):
    order = sorted(range(16), key=lambda r: (lens[r], r))
    cwds = [0] * 16
    code, prev = 0, lens[order[0]]
    for r in order[1:]:
        code = (code + 1) << (lens[r] - prev)
        cwds[r] = code
        prev = lens[r]
    return cwds


def _vl_tables():
    cwds = _canonical_code(VL_LENS)
    enc = np.tile(np.asarray(cwds, np.uint8), (ht_tables.NUM_CTX, 1))
    ln = np.tile(np.asarray(VL_LENS, np.uint8), (ht_tables.NUM_CTX, 1))
    return enc, ln


def ctx_varying_tables():
    """A table set where every CONTEXT carries a DIFFERENT prefix code
    (VL_LENS rotated by the context index): decoding with the wrong
    context yields the wrong rho, so byte-parity under this set proves
    each coder path forms the neighbor-significance context."""
    enc = np.zeros((ht_tables.NUM_CTX, 16), np.uint8)
    ln = np.zeros((ht_tables.NUM_CTX, 16), np.uint8)
    for c in range(ht_tables.NUM_CTX):
        lens = VL_LENS[c:] + VL_LENS[:c]
        enc[c] = _canonical_code(lens)
        ln[c] = lens
    return enc, ln


def test_golden_layout_vectors():
    rng = np.random.default_rng(7)
    a = rng.integers(-99, 100, (8, 8)).astype(np.int32)
    assert int(a.astype(np.int64).sum()) == 451  # input self-check
    seg, nb = ht.encode_cblk_ht(a)
    assert nb == 7
    assert seg == GOLDEN_8x8_SEED7
    b = np.zeros((4, 6), np.int32)
    b[0, 0] = 1
    b[3, 5] = -1000
    b[2, 2] = 7
    seg2, nb2 = ht.encode_cblk_ht(b)
    assert (seg2, nb2) == (GOLDEN_SPARSE_4x6, 10)


def test_table_injection_round_trip():
    """A different (bijective) table set must round-trip in the Python
    reference AND produce a different stream (proof the table is
    actually consumed), with the layout bytes (Scup trailer) unmoved."""
    rng = np.random.default_rng(7)
    a = rng.integers(-99, 100, (8, 8)).astype(np.int32)
    exp = np.where(a != 0, np.sign(a) * (2 * np.abs(a) + 1), 0)
    ht_tables.set_tables(*_permuted_tables())
    seg, _ = ht.encode_cblk_ht(a)
    assert seg != GOLDEN_8x8_SEED7
    assert len(seg) == len(GOLDEN_8x8_SEED7)  # same framing footprint
    assert seg[-2:] == GOLDEN_8x8_SEED7[-2:]  # Scup trailer identical
    assert np.array_equal(ht.decode_cblk_ht(seg, 8, 8), exp)
    ht_tables.reset_tables()
    seg3, _ = ht.encode_cblk_ht(a)
    assert seg3 == GOLDEN_8x8_SEED7


def test_table_injection_native_matches_python(rng):
    """The native coder consumes the installed tables and stays
    byte-identical to the Python reference under a swap."""
    from grok_tpu.t1 import backend as bk
    from grok_tpu.t1 import native as nat

    coeffs = rng.integers(-500, 500, (32, 32)).astype(np.int32)
    for swap in (False, True):
        if swap:
            ht_tables.set_tables(*_permuted_tables())
        seg_py, nb_py = ht.encode_cblk_ht(coeffs)
        j = bk.EncodeJob(coeffs, 0, 0, ht=True, need_dist=False)
        nat.ht_encode_batch_native([j])
        assert j.data == seg_py, f"swap={swap}"
        dj = bk.DecodeJob(seg_py, [len(seg_py)], 1, nb_py, 32, 32, 0, 0,
                          ht=True)
        nat.ht_decode_batch_native([dj])
        assert np.array_equal(dj.out, ht.decode_cblk_ht(seg_py, 32, 32))


def test_table_swap_full_codec_round_trip(rng):
    """End-to-end: an HT encode under swapped tables decodes bit-exactly
    through the public API, and differs on the wire from the default."""
    arr = rng.integers(0, 256, (96, 96)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=8)
    p = CompressParams(numresolution=3, ht=True)
    d_default = grok_tpu.compress(img, p)
    ht_tables.set_tables(*_permuted_tables())
    d_swapped = grok_tpu.compress(img, p)
    assert d_swapped != d_default
    assert np.array_equal(grok_tpu.decompress(d_swapped).to_array(), arr)


def test_table_validation():
    enc, ln = _permuted_tables()
    with pytest.raises(ValueError):
        ht_tables.set_tables(enc[:, :8], ln[:, :8])
    bad = enc.copy()
    bad[0, 0] = bad[0, 1]  # duplicate codeword = prefix violation
    with pytest.raises(ValueError):
        ht_tables.set_tables(bad, ln)
    with pytest.raises(ValueError):
        ht_tables.set_tables(enc, ln * 0 + 8)  # beyond MAX_CWD_LEN
    with pytest.raises(ValueError):
        ht_tables.set_tables(enc, ln * 0)  # zero length
    vle, vll = _vl_tables()
    bad = vll.copy()
    bad[0, 1] = 3  # rho-1's code becomes a prefix of a longer codeword
    with pytest.raises(ValueError):
        ht_tables.set_tables(vle, bad)
    wide = vle.copy()
    wide[0, 0] = 0x7F  # 7-bit codeword declared 2 bits long
    with pytest.raises(ValueError):
        ht_tables.set_tables(wide, vll)


def test_variable_length_tables_round_trip(rng):
    """Variable-length prefix codes flow through the Python reference AND
    the native coder byte-identically, and round-trip (VERDICT r3 #2)."""
    from grok_tpu.t1 import backend as bk
    from grok_tpu.t1 import native as nat

    ht_tables.set_tables(*_vl_tables())
    for shape in ((8, 8), (32, 32), (64, 52)):
        coeffs = rng.integers(-500, 500, shape).astype(np.int32)
        coeffs[rng.random(shape) < 0.5] = 0
        seg_py, nb_py = ht.encode_cblk_ht(coeffs)
        exp = np.where(coeffs != 0,
                       np.sign(coeffs) * (2 * np.abs(coeffs) + 1), 0)
        assert np.array_equal(ht.decode_cblk_ht(seg_py, *shape), exp)
        j = bk.EncodeJob(coeffs, 0, 0, ht=True, need_dist=False)
        nat.ht_encode_batch_native([j])
        assert j.data == seg_py
        dj = bk.DecodeJob(seg_py, [len(seg_py)], 1, nb_py, shape[0],
                          shape[1], 0, 0, ht=True)
        nat.ht_decode_batch_native([dj])
        assert np.array_equal(dj.out, exp)
    # the 8x8 golden input produces a DIFFERENT stream under the VL code
    a = np.random.default_rng(7).integers(-99, 100, (8, 8)).astype(np.int32)
    seg, _ = ht.encode_cblk_ht(a)
    assert seg != GOLDEN_8x8_SEED7
    ht_tables.reset_tables()
    seg2, _ = ht.encode_cblk_ht(a)
    assert seg2 == GOLDEN_8x8_SEED7


def test_variable_length_full_codec(rng):
    """End-to-end public-API HT round trip under variable-length tables."""
    arr = rng.integers(0, 256, (96, 96)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=8)
    p = CompressParams(numresolution=3, ht=True)
    ht_tables.set_tables(*_vl_tables())
    d = grok_tpu.compress(img, p)
    assert np.array_equal(grok_tpu.decompress(d).to_array(), arr)


def test_context_varying_tables_round_trip(rng):
    """Under a table set where every context carries a DIFFERENT prefix
    code, the Python reference and the native coder stay byte-identical
    and round-trip — proof both paths form the T.814-shaped
    neighbor-significance quad context (left/up/up-left rho)."""
    from grok_tpu.t1 import backend as bk
    from grok_tpu.t1 import native as nat

    ht_tables.set_tables(*ctx_varying_tables())
    for shape in ((8, 8), (32, 32), (64, 52)):
        coeffs = rng.integers(-500, 500, shape).astype(np.int32)
        coeffs[rng.random(shape) < 0.5] = 0
        seg_py, nb_py = ht.encode_cblk_ht(coeffs)
        exp = np.where(coeffs != 0,
                       np.sign(coeffs) * (2 * np.abs(coeffs) + 1), 0)
        assert np.array_equal(ht.decode_cblk_ht(seg_py, *shape), exp)
        j = bk.EncodeJob(coeffs, 0, 0, ht=True, need_dist=False)
        nat.ht_encode_batch_native([j])
        assert j.data == seg_py, f"native/python mismatch at {shape}"
        dj = bk.DecodeJob(seg_py, [len(seg_py)], 1, nb_py, shape[0],
                          shape[1], 0, 0, ht=True)
        nat.ht_decode_batch_native([dj])
        assert np.array_equal(dj.out, exp)
    # the context dimension is genuinely consumed: a dense block (many
    # significant neighbors) must code differently than under a
    # context-0-everywhere copy of the same tables
    dense = rng.integers(1, 500, (16, 16)).astype(np.int32)
    seg_ctx, _ = ht.encode_cblk_ht(dense)
    enc, ln = ctx_varying_tables()
    flat = np.tile(enc[0], (ht_tables.NUM_CTX, 1))
    flat_ln = np.tile(ln[0], (ht_tables.NUM_CTX, 1))
    ht_tables.set_tables(flat, flat_ln)
    seg_flat, _ = ht.encode_cblk_ht(dense)
    assert seg_ctx != seg_flat


def test_context_varying_full_codec(rng):
    """End-to-end public-API HT round trip under context-varying tables."""
    arr = rng.integers(0, 256, (96, 96)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=8)
    p = CompressParams(numresolution=3, ht=True)
    ht_tables.set_tables(*ctx_varying_tables())
    d = grok_tpu.compress(img, p)
    assert np.array_equal(grok_tpu.decompress(d).to_array(), arr)


def test_randomized_context_table_fuzz(rng):
    """Randomized context-table fuzz (VERDICT r4 weak #6): random
    prefix-free per-context codes (random symbol permutations of valid
    Kraft length sets, a fresh permutation per context) must keep the
    full public-API codec round-tripping AND the native coder
    byte-identical to the Python reference — context-dependent decode
    exercised on real streams, not just the synthetic rotation."""
    from grok_tpu.t1 import backend as bk
    from grok_tpu.t1 import native as nat

    base_lens = [
        VL_LENS,
        [4] * 16,                                      # Kraft = 1
        [1, 3, 3, 4, 5, 5, 5, 6, 6, 6, 7, 7, 7, 7, 7, 7],  # Kraft = 1
    ]
    arr = rng.integers(0, 256, (64, 64)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=8)
    p = CompressParams(numresolution=3, ht=True)
    for trial in range(6):
        enc = np.zeros((ht_tables.NUM_CTX, 16), np.uint8)
        ln = np.zeros((ht_tables.NUM_CTX, 16), np.uint8)
        for c in range(ht_tables.NUM_CTX):
            lens = list(base_lens[int(rng.integers(0, len(base_lens)))])
            perm = rng.permutation(16)
            lens = [lens[i] for i in perm]
            enc[c] = _canonical_code(lens)
            ln[c] = lens
        ht_tables.set_tables(enc, ln)
        d = grok_tpu.compress(img, p)
        assert np.array_equal(grok_tpu.decompress(d).to_array(), arr), \
            f"trial {trial}: full-codec round trip failed"
        coeffs = rng.integers(-300, 300, (32, 32)).astype(np.int32)
        coeffs[rng.random((32, 32)) < 0.4] = 0
        seg_py, nb = ht.encode_cblk_ht(coeffs)
        j = bk.EncodeJob(coeffs, 0, 0, ht=True, need_dist=False)
        nat.ht_encode_batch_native([j])
        assert j.data == seg_py, f"trial {trial}: native byte mismatch"
        dj = bk.DecodeJob(seg_py, [len(seg_py)], 1, nb, 32, 32, 0, 0,
                          ht=True)
        nat.ht_decode_batch_native([dj])
        exp = np.where(coeffs != 0,
                       np.sign(coeffs) * (2 * np.abs(coeffs) + 1), 0)
        assert np.array_equal(dj.out, exp), f"trial {trial}: decode"
