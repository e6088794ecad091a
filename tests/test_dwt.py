"""Wavelet lifting tests (SURVEY.md B.1): bit-exact 5/3 round-trips across
sizes/parities (property test per SURVEY.md §4 implication (c)), 9/7
numerics, geometry consistency."""

import numpy as np
import pytest

from grok_tpu.tile.geometry import Rect, band_rect
from grok_tpu.transform.dwt import (
    forward_dwt,
    fwd_53_1d,
    fwd_97_1d,
    inv_53_1d,
    inv_97_1d,
    inverse_dwt,
)


@pytest.mark.parametrize("x0", [0, 1, 5, 100, 101])
def test_53_1d_roundtrip(x0, rng):
    for n in list(range(1, 20)) + [64, 65, 127]:
        x = rng.integers(-1000, 1000, size=(3, n)).astype(np.int32)
        lo, hi = fwd_53_1d(x, x0)
        pos = np.arange(x0, x0 + n)
        assert lo.shape[-1] == int(((pos & 1) == 0).sum())
        y = inv_53_1d(lo, hi, x0, n)
        assert np.array_equal(y, x)


@pytest.mark.parametrize("x0", [0, 1, 7])
def test_97_1d_roundtrip(x0, rng):
    for n in list(range(1, 20)) + [64, 65]:
        x = rng.normal(0, 100, size=(3, n)).astype(np.float32)
        lo, hi = fwd_97_1d(x, x0)
        y = inv_97_1d(lo, hi, x0, n)
        assert np.abs(y - x).max() < 1e-2


@pytest.mark.parametrize(
    "h,w,x0,y0", [(64, 64, 0, 0), (37, 53, 3, 11), (1, 17, 0, 1),
                  (16, 1, 5, 0), (128, 96, 1, 1)])
def test_2d_multilevel(h, w, x0, y0, rng):
    rect = Rect(x0, y0, x0 + w, y0 + h)
    x = rng.integers(-2000, 2000, size=(h, w)).astype(np.int32)
    for numres in (1, 2, 3, 6):
        bands = forward_dwt(x, rect, numres, True)
        assert np.array_equal(inverse_dwt(bands, rect, numres, True), x)
    xf = x.astype(np.float32)
    bands = forward_dwt(xf, rect, 5, False)
    assert np.abs(inverse_dwt(bands, rect, 5, False) - xf).max() < 0.5


def test_band_shapes_match_geometry(rng):
    rect = Rect(3, 11, 56, 48)
    x = rng.integers(-100, 100, size=(37, 53)).astype(np.int32)
    bands = forward_dwt(x, rect, 4, True)
    for (r, o), arr in bands.items():
        br = band_rect(rect, 4, r, o)
        assert arr.shape == (br.h, br.w)


def test_signed_extremes_16bit(rng):
    """SURVEY.md §7 hard part #3: int32 bit-exactness on 16-bit extremes."""
    rect = Rect(0, 0, 64, 64)
    for _ in range(3):
        x = rng.choice(
            np.array([-32768, -32767, -1, 0, 1, 32766, 32767], np.int32),
            size=(64, 64))
        bands = forward_dwt(x, rect, 6, True)
        assert np.array_equal(inverse_dwt(bands, rect, 6, True), x)


def test_native53_level_matches_python(rng):
    """native/dwt.cc must be bit-identical to the numpy reference for
    even-parity levels (the production host fast path)."""
    from grok_tpu.t1 import native as nat
    from grok_tpu.tile.geometry import Rect
    from grok_tpu.transform.dwt import _merge_2d, _split_2d

    for (h, w) in [(64, 64), (37, 53), (2, 2), (5, 8), (1, 7), (8, 1),
                   (256, 192)]:
        x = rng.integers(-(1 << 20), 1 << 20, size=(h, w)).astype(np.int32)
        rect = Rect(0, 0, w, h)
        rll, rhl, rlh, rhh = _split_2d(x, rect, True)
        ll, hl, lh, hh = nat.fwd53_level_native(x)
        assert np.array_equal(ll, rll) and np.array_equal(hl, rhl)
        assert np.array_equal(lh, rlh) and np.array_equal(hh, rhh)
        back = nat.inv53_level_native(ll, hl, lh, hh, h, w)
        ref = _merge_2d(rll, rhl, rlh, rhh, rect, True)
        assert np.array_equal(back, ref)
        assert np.array_equal(back, x)


def test_native97_level_close_to_python(rng):
    """native/dwt.cc 9/7 levels follow the same float32 lifting order as
    the numpy reference; values agree within float tolerance and the
    native round trip reconstructs the input."""
    from grok_tpu.t1 import native as nat
    from grok_tpu.tile.geometry import Rect
    from grok_tpu.transform.dwt import _merge_2d, _split_2d

    for (h, w) in [(64, 64), (37, 53), (2, 2), (5, 8), (256, 192)]:
        x = rng.integers(-(1 << 12), 1 << 12, size=(h, w)).astype(
            np.float32)
        rect = Rect(0, 0, w, h)
        rll, rhl, rlh, rhh = _split_2d(x, rect, False)
        ll, hl, lh, hh = nat.fwd97_level_native(x)
        for got, ref in ((ll, rll), (hl, rhl), (lh, rlh), (hh, rhh)):
            assert np.abs(got - ref).max() < 2e-2, (h, w)
        back = nat.inv97_level_native(ll, hl, lh, hh, h, w)
        assert np.abs(back - x).max() < 2e-2, (h, w)


def test_inverse_dwt_fused_dequant_matches_upfront(rng):
    """inverse_dwt(deltas=...) fuses dequantization into the native 9/7
    band loads; it must be bit-identical (float32) to dequantizing every
    band upfront and running the plain inverse."""
    from grok_tpu.transform import quant as quant_mod

    for (w, h, x0, y0) in [(123, 77, 0, 0), (64, 64, 0, 0), (31, 45, 2, 4),
                           (1, 9, 0, 0)]:
        tcr = Rect(x0, y0, x0 + w, y0 + h)
        numres = 3
        bands, deltas = {}, {}
        for resno in range(numres):
            for o in ((0,) if resno == 0 else (1, 2, 3)):
                br = band_rect(tcr, numres, resno, o)
                bands[(resno, o)] = rng.integers(
                    -201, 201, (br.h, br.w)).astype(np.int32)
                deltas[(resno, o)] = float(rng.uniform(0.001, 0.1))
        fused = inverse_dwt(dict(bands), tcr, numres, reversible=False,
                            deltas=dict(deltas))
        upfront = inverse_dwt(
            {k: quant_mod.dequantize(v, deltas[k]) for k, v in bands.items()},
            tcr, numres, reversible=False)
        assert fused.dtype == np.float32
        assert np.array_equal(fused, upfront), (w, h, x0, y0)


def test_native53_inverse_wraps_like_numpy(rng):
    """Corrupt streams can hand the inverse lifting arbitrary int32 band
    values; numpy int32 arithmetic wraps, so the native inverse must
    wrap identically (signed-overflow UB here was a real fuzz finding).
    Covers both the plain and the fused-halving band loads."""
    from grok_tpu.t1 import native as nat
    from grok_tpu.tile.geometry import Rect
    from grok_tpu.transform.dwt import _merge_2d

    lo, hi = np.int32(-(2 ** 31)), np.int32(2 ** 31 - 1)
    for (h, w) in [(64, 64), (37, 53), (2, 2), (1, 9), (8, 1), (6, 6)]:
        eh, ew, oh, ow = (h + 1) // 2, (w + 1) // 2, h // 2, w // 2
        def extreme(shape):
            a = rng.integers(-(2 ** 31), 2 ** 31, size=shape,
                             dtype=np.int64).astype(np.int32)
            # salt with exact extremes so the lifting sums overflow
            flat = a.reshape(-1)
            if flat.size:
                flat[:: 3] = hi
                flat[1:: 3] = lo
            return a
        ll, hl = extreme((eh, ew)), extreme((eh, ow))
        lh, hh = extreme((oh, ew)), extreme((oh, ow))
        rect = Rect(0, 0, w, h)
        with np.errstate(over="ignore"):
            ref = _merge_2d(ll, hl, lh, hh, rect, True)
        back = nat.inv53_level_native(ll, hl, lh, hh, h, w)
        assert np.array_equal(back, ref), (h, w)
        # fused halving loads (doubled-domain path), halve all bands
        def halved(p):
            return (p - (p >> 31)) >> 1
        with np.errstate(over="ignore"):
            ref_h = _merge_2d(halved(ll), halved(hl), halved(lh),
                              halved(hh), rect, True)
        back_h = nat.inv53_level_native(ll, hl, lh, hh, h, w, halve=3)
        assert np.array_equal(back_h, ref_h), (h, w, "halve")
