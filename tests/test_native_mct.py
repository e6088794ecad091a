"""Fused native MCT differentials (SURVEY.md B.3): native/mct.cc fuses
the decode tail (inverse MCT -> rint -> DC unshift -> clip) and the
encode ingest (DC shift -> forward MCT) into single passes; each fused
entry point must be bit-identical to composing the numpy oracles in
transform/mct.py (the GROK_TPU_NATIVE_MCT=0 path)."""

import numpy as np
import pytest

from grok_tpu.transform import mct as M

SHAPES = [(64, 64), (37, 53), (1, 1), (5, 128), (257, 311)]


def _planes_i32(rng, shape, prec, sgnd):
    if sgnd:
        lo, hi = -(1 << (prec - 1)), (1 << (prec - 1)) - 1
    else:
        lo, hi = 0, (1 << prec) - 1
    return rng.integers(lo, hi + 1, shape).astype(np.int32)


@pytest.mark.parametrize("prec,sgnd", [(8, False), (12, False), (16, True)])
def test_rct_forward_inverse_shift_roundtrip(rng, prec, sgnd):
    for shape in SHAPES:
        rgb = [_planes_i32(rng, shape, prec, sgnd) for _ in range(3)]
        precs, sgnds = (prec,) * 3, (sgnd,) * 3
        fused = M.rct_forward_shift(*rgb, precs, sgnds)
        ref = M.rct_forward(*(M.dc_shift_forward(p, prec, sgnd)
                              for p in rgb))
        for a, b in zip(fused, ref):
            assert a.dtype == np.int32 and np.array_equal(a, b)
        back_f = M.rct_inverse_shift(*fused, precs, sgnds)
        back_r = [M.dc_shift_inverse(M.round_to_int(p, prec), prec, sgnd)
                  for p in M.rct_inverse(*fused)]
        for a, b, orig in zip(back_f, back_r, rgb):
            assert np.array_equal(a, b)
            assert np.array_equal(a, orig)


@pytest.mark.parametrize("prec,sgnd", [(8, False), (12, False), (16, True)])
def test_ict_forward_inverse_shift_bitexact(rng, prec, sgnd):
    for shape in SHAPES:
        rgb = [_planes_i32(rng, shape, prec, sgnd) for _ in range(3)]
        precs, sgnds = (prec,) * 3, (sgnd,) * 3
        fused = M.ict_forward_shift(*rgb, precs, sgnds)
        ref = M.ict_forward(*(M.dc_shift_forward(p, prec, sgnd)
                              for p in rgb))
        for a, b in zip(fused, ref):
            assert a.dtype == np.float32 and np.array_equal(a, b)
        # inverse from perturbed float planes (simulating lossy synthesis)
        ycc = [p + rng.normal(0, 0.7, shape).astype(np.float32)
               for p in fused]
        back_f = M.ict_inverse_shift(*ycc, precs, sgnds)
        back_r = [M.dc_shift_inverse(M.round_to_int(p, prec), prec, sgnd)
                  for p in M.ict_inverse(*ycc)]
        for a, b in zip(back_f, back_r):
            assert a.dtype == np.int32 and np.array_equal(a, b)


def test_shift_round_clip_and_shift_to_float(rng):
    for prec, sgnd in [(8, False), (12, False), (16, True), (24, False)]:
        for shape in SHAPES:
            x = _planes_i32(rng, shape, prec, sgnd)
            f = M.shift_to_float(x, prec, sgnd)
            ref = M.dc_shift_forward(x, prec, sgnd).astype(np.float32)
            assert f.dtype == np.float32 and np.array_equal(f, ref)
            # float plane back to clipped int samples (incl. out-of-range)
            p = f + rng.normal(0, 3.0, shape).astype(np.float32)
            got = M.shift_round_clip(p, prec, sgnd)
            exp = M.dc_shift_inverse(M.round_to_int(p, prec), prec, sgnd)
            assert got.dtype == np.int32 and np.array_equal(got, exp)
            # int32 doubled/plain plane variant
            q = x - (0 if sgnd else 1 << (prec - 1)) + rng.integers(
                -5, 6, shape).astype(np.int32)
            got_i = M.shift_round_clip(q, prec, sgnd)
            exp_i = M.dc_shift_inverse(q, prec, sgnd)
            assert np.array_equal(got_i, exp_i)


def test_native_mct_gate_falls_back(rng, monkeypatch):
    """GROK_TPU_NATIVE_MCT=0 must route every fused helper through the
    numpy composition with identical results."""
    monkeypatch.setenv("GROK_TPU_NATIVE_MCT", "0")
    M._NATIVE_MCT.clear()
    try:
        rgb = [_planes_i32(rng, (33, 47), 8, False) for _ in range(3)]
        fused = M.rct_forward_shift(*rgb, (8,) * 3, (False,) * 3)
        ref = M.rct_forward(*(M.dc_shift_forward(p, 8, False) for p in rgb))
        for a, b in zip(fused, ref):
            assert np.array_equal(a, b)
    finally:
        M._NATIVE_MCT.clear()


def test_fused_tail_nonfinite_matches_oracle(rng):
    """Corrupt lossy streams can synthesize NaN/inf/out-of-range floats;
    the fused (and SIMD) tails must reproduce numpy's hardware
    conversion (rint -> int32 with the x86 INT32_MIN indefinite) lane
    for lane, including partial-vector tails."""
    for shape in [(64, 64), (37, 53), (1, 19)]:
        planes = []
        for _ in range(3):
            p = (rng.normal(0, 1e3, shape) * 8).astype(np.float32)
            m = rng.random(shape)
            p[m < 0.1] = np.nan
            p[(m >= 0.1) & (m < 0.2)] = np.inf
            p[(m >= 0.2) & (m < 0.3)] = -np.inf
            p[(m >= 0.3) & (m < 0.4)] = 3e9
            p[(m >= 0.4) & (m < 0.5)] = -3e9
            p[(m >= 0.5) & (m < 0.55)] = 2147483520.0  # largest f32 < 2^31
            planes.append(p)
        precs, sgnds = (8,) * 3, (False,) * 3
        with np.errstate(invalid="ignore", over="ignore"):
            got = M.ict_inverse_shift(*planes, precs, sgnds)
            ref = [M.dc_shift_inverse(M.round_to_int(q, 8), 8, False)
                   for q in M.ict_inverse(*planes)]
        for a, b in zip(got, ref):
            assert a.dtype == np.int32 and np.array_equal(a, b)
        with np.errstate(invalid="ignore"):
            one = M.shift_round_clip(planes[0], 12, True)
            one_ref = M.dc_shift_inverse(M.round_to_int(planes[0], 12),
                                         12, True)
        assert np.array_equal(one, one_ref)
