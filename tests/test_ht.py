"""HTJ2K (Part 15) block coder tests.

SURVEY.md B.9/B.10 item 7: no HT oracle exists in this environment, so
correctness is gated on self round-trip plus structural checks (CAP
marker, COD HT bit, Scup segment layout).  See grok_tpu/t1/ht.py for the
conformance status of the VLC tables.
"""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.t1.ht import (
    MELDecoder,
    MELEncoder,
    decode_cblk_ht,
    encode_cblk_ht,
)


def test_mel_roundtrip(rng):
    for trial in range(30):
        p = 0.1 + 0.8 * (trial % 5) / 4
        events = (rng.random(int(rng.integers(1, 300))) < p).astype(int)
        enc = MELEncoder()
        for e in events:
            enc.encode(int(e))
        data = enc.flush()
        dec = MELDecoder(data)
        assert [dec.decode() for _ in events] == list(events)


def test_ht_block_roundtrip(rng):
    for trial in range(30):
        h = int(rng.integers(1, 65))
        w = int(rng.integers(1, 65))
        scale = int(rng.integers(1, 30000))
        coeffs = rng.integers(-scale, scale + 1, size=(h, w)).astype(np.int32)
        if trial % 3 == 0:
            coeffs[rng.random((h, w)) < 0.8] = 0
        data, numbps = encode_cblk_ht(coeffs)
        if numbps == 0:
            assert np.all(coeffs == 0)
            continue
        doubled = decode_cblk_ht(data, h, w)
        dec = np.sign(doubled) * (np.abs(doubled) >> 1)
        assert np.array_equal(dec, coeffs), (trial, h, w)


def test_ht_scup_layout(rng):
    coeffs = rng.integers(-100, 101, size=(32, 32)).astype(np.int32)
    data, _ = encode_cblk_ht(coeffs)
    scup = ((data[-1] & 0xFF) << 4) | (data[-2] & 0x0F)
    assert 2 <= scup <= len(data)


def test_ht_truncated_tolerant(rng):
    coeffs = rng.integers(-500, 501, size=(32, 32)).astype(np.int32)
    data, numbps = encode_cblk_ht(coeffs)
    for frac in (0.0, 0.3, 0.9):
        out = decode_cblk_ht(data[: int(len(data) * frac)], 32, 32)
        assert out.shape == (32, 32)  # no crash


def _content(rng, h, w, ncomp=1):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    base = 128 + 90 * np.sin(xx / 13) * np.cos(yy / 9)
    planes = [base, xx * 255 / w, yy * 255 / h][:ncomp]
    arr = np.stack(planes, axis=-1) if ncomp > 1 else base
    return (arr + rng.normal(0, 3, arr.shape)).clip(0, 255).astype(np.int32)


def test_ht_codec_lossless(rng):
    arr = _content(rng, 96, 96, 3)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(numresolution=4, ht=True))
    hi = grok_tpu.read_header(data)
    assert hi.cp.tcps[0].tccps[0].ht
    assert hi.cap is not None and (hi.cap["pcap"] & (1 << 17))
    assert hi.siz.rsiz & 0x4000  # Part-15 capability bit
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)


def test_ht_codec_lossy(rng):
    arr = _content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=4, ht=True, irreversible=True))
    out = grok_tpu.decompress(data)
    err = out.comps[0].data.astype(float) - arr
    psnr = 10 * np.log10(255 ** 2 / (err ** 2).mean())
    assert psnr > 40, psnr


def test_ht_16bit_tiled(rng):
    arr = rng.integers(0, 65536, size=(80, 80)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=16)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, ht=True, tile_size=(32, 32)))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)


def test_ht_region_decode(rng):
    """BASELINE config 5 shape: HT + tiled + region decode."""
    arr = _content(rng, 128, 128)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, ht=True, tile_size=(64, 64),
        cblk_width=32, cblk_height=32))
    full = grok_tpu.decompress(data)
    win = grok_tpu.decompress(data, DecompressParams(window=(30, 40, 100, 90)))
    assert np.array_equal(win.comps[0].data,
                          full.comps[0].data[40:90, 30:100])


def test_ht_refinement_passes(rng):
    """HT SigProp/MagRef refinement passes (T.814 pass structure): full
    decode recovers everything except unreachable isolated magnitude-1
    samples; cleanup-only decode is a valid coarser truncation."""
    from grok_tpu.t1.ht import (
        decode_cblk_ht_refined,
        encode_cblk_ht_refined,
    )

    for trial in range(8):
        h = int(rng.integers(4, 64))
        w = int(rng.integers(4, 64))
        c = rng.integers(-300, 301, size=(h, w)).astype(np.int32)
        if trial % 2:
            c[rng.random((h, w)) < 0.6] = 0
        cu, rf, nb = encode_cblk_ht_refined(c)
        d = decode_cblk_ht_refined(cu, rf, h, w)
        dec = np.sign(d) * (np.abs(d) >> 1)
        for (y, x) in np.argwhere(dec != c):
            assert abs(c[y, x]) == 1 and dec[y, x] == 0, (y, x)
        d0 = decode_cblk_ht_refined(cu, b"", h, w)
        dec0 = np.sign(d0) * (np.abs(d0) >> 1)
        err_full = float(((dec - c) ** 2).mean())
        err_trunc = float(((dec0 - c) ** 2).mean())
        assert err_full <= err_trunc + 1e-9


def test_ht_extreme_magnitude_contrast():
    """Adjacent quads with wildly different magnitudes exercise the wide
    u-residual escape (a 5-bit escape silently truncated these)."""
    from grok_tpu.t1.ht import decode_cblk_ht, encode_cblk_ht

    c = np.zeros((4, 8), dtype=np.int32)
    c[0, 0] = 1 << 25
    c[0, 2] = 1
    c[2, 6] = -(1 << 29)
    seg, nb = encode_cblk_ht(c)
    assert nb == 30
    out = decode_cblk_ht(seg, 4, 8)
    ref = np.sign(c) * (2 * np.abs(c) + 1) * (np.abs(c) > 0)
    assert np.array_equal(out, ref)


def test_ht_mixed_set_roundtrip(rng):
    """Part-15 MIXED set: LL blocks MQ-coded, others HT; lossless
    round-trip and CAP signaling (SURVEY.md B.9 'MIXED')."""
    arr = _content(rng, 96, 96, 3)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=4, ht=True, ht_mixed=True))
    hi = grok_tpu.read_header(data)
    assert hi.cp.ht_mixed
    assert any((c >> 14) == 3 for c in hi.cap["ccap"])
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)
    # streams genuinely mix: MIXED differs from HTONLY on the same input
    only = grok_tpu.compress(img, CompressParams(numresolution=4, ht=True))
    assert data != only


def test_ht_mixed_multilayer_rates(rng):
    """MIXED with rate-targeted layers: the MQ LL blocks carry multiple
    truncation points while HT blocks contribute all-or-nothing."""
    arr = _content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, ht=True, ht_mixed=True, irreversible=True,
        layer_rates=[20, 5]))
    out = grok_tpu.decompress(data)
    err = out.comps[0].data.astype(float) - arr
    psnr = 10 * np.log10(255 ** 2 / (err ** 2).mean())
    assert psnr > 30, psnr
    low = grok_tpu.decompress(data, DecompressParams(max_layers=1))
    errl = low.comps[0].data.astype(float) - arr
    assert (errl ** 2).mean() >= (err ** 2).mean() - 1e-9


def test_ht_mixed_tiled_16bit(rng):
    arr = rng.integers(0, 65536, size=(80, 80)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=16)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, ht=True, ht_mixed=True, tile_size=(32, 32)))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)
