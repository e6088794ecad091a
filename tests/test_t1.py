"""EBCOT Tier-1 self tests across mode switches (SURVEY.md B.4)."""

import numpy as np
import pytest

from grok_tpu.params import CblkStyle
from grok_tpu.t1.coder import decode_cblk, encode_cblk, segment_layout

STYLES = [
    CblkStyle.NONE,
    CblkStyle.TERMALL,
    CblkStyle.VSC,
    CblkStyle.SEGSYM,
    CblkStyle.LAZY,
    CblkStyle.LAZY | CblkStyle.TERMALL,
    CblkStyle.RESET,
    CblkStyle.LAZY | CblkStyle.VSC | CblkStyle.SEGSYM,
]


def _roundtrip(coeffs, orient, style):
    h, w = coeffs.shape
    data, numbps, passes = encode_cblk(coeffs, orient, style)
    if numbps == 0:
        assert np.all(coeffs == 0)
        return
    segs = segment_layout(style, numbps)
    seg_lengths = []
    prev = 0
    for plist, _ in segs:
        seg_lengths.append(passes[plist[-1]].rate - prev)
        prev = passes[plist[-1]].rate
    doubled = decode_cblk(data, seg_lengths, len(passes), numbps,
                          h, w, orient, style)
    dec = np.sign(doubled) * (np.abs(doubled) >> 1)
    assert np.array_equal(dec, coeffs), (orient, style)


@pytest.mark.parametrize("style", STYLES)
def test_t1_roundtrip_styles(style, rng):
    for _ in range(6):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        scale = int(rng.integers(1, 3000))
        coeffs = rng.integers(-scale, scale + 1, size=(h, w)).astype(np.int32)
        coeffs[rng.random((h, w)) < 0.6] = 0
        for orient in (0, 1, 2, 3):
            _roundtrip(coeffs, orient, style)


def test_t1_all_zero(rng):
    data, numbps, passes = encode_cblk(np.zeros((16, 16), np.int32), 0)
    assert numbps == 0 and data == b"" and passes == []


def test_t1_single_sample():
    for v in (-5, 0, 7, 1023):
        c = np.array([[v]], dtype=np.int32)
        _roundtrip(c, 0, CblkStyle.NONE)


def test_t1_truncation_prefix_decodes(rng):
    """Decoding a pass prefix must yield sane midpoint reconstructions."""
    coeffs = rng.integers(-500, 501, size=(32, 32)).astype(np.int32)
    data, numbps, passes = encode_cblk(coeffs, 0, CblkStyle.NONE)
    for keep in (1, len(passes) // 2, len(passes)):
        rate = passes[keep - 1].rate
        doubled = decode_cblk(data[:rate], [rate], keep, numbps,
                              32, 32, 0, CblkStyle.NONE)
        dec = np.sign(doubled) * (np.abs(doubled) >> 1)
        # magnitudes can only shrink information-wise: no wild values
        assert np.abs(dec).max() <= (1 << numbps)
    # error decreases with more passes
    errs = []
    for keep in range(1, len(passes) + 1, max(1, len(passes) // 6)):
        rate = passes[keep - 1].rate
        doubled = decode_cblk(data[:rate], [rate], keep, numbps,
                              32, 32, 0, CblkStyle.NONE)
        dec = np.sign(doubled) * (np.abs(doubled) / 2.0)
        errs.append(float(((dec - coeffs) ** 2).sum()))
    assert errs[-1] <= errs[0]


def test_pass_rates_monotone(rng):
    coeffs = rng.integers(-2000, 2001, size=(24, 24)).astype(np.int32)
    for style in STYLES:
        _, _, passes = encode_cblk(coeffs, 1, style)
        rates = [p.rate for p in passes]
        assert rates == sorted(rates)
        dists = [p.dist for p in passes]
        assert all(b >= a - 1e-9 for a, b in zip(dists, dists[1:]))
