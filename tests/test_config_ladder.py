"""BASELINE.json workload-ladder integration tests (configs 1-5 at
build-appropriate scale; the shapes and feature combinations match the
driver's five configs)."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.params import Profile


def _photo(rng, h, w, ncomp=1, prec=8):
    mx = (1 << prec) - 1
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = mx / 2 + mx / 3 * np.sin(xx / 23) * np.cos(yy / 17)
    planes = [base]
    for c in range(1, ncomp):
        planes.append(mx / 2 + mx / 3 * np.sin(xx / (17 + 6 * c))
                      * np.cos(yy / (29 - 4 * c)))
    arr = np.stack(planes, -1) if ncomp > 1 else base
    arr = arr + rng.normal(0, mx * 0.01, arr.shape)
    return arr.clip(0, mx).astype(np.int32)


def test_config1_512_gray_lossless(rng):
    arr = _photo(rng, 512, 512)
    img = GrkImage.from_array(arr, prec=8)
    data = grok_tpu.compress(img, CompressParams(numresolution=6))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)


@pytest.mark.slow
def test_config2_2048_rgb_lossy_rate(rng):
    arr = _photo(rng, 1024, 1024, ncomp=3)  # scaled-down config 2
    img = GrkImage.from_array(arr, prec=8)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=5, irreversible=True, layer_rates=[20]))
    # the rate target is a ceiling: compression may beat 20:1 on easy
    # content but must never blow the budget
    ratio = arr.size / len(data)  # 1 byte per 8-bit sample raw
    assert ratio > 18, ratio
    out = grok_tpu.decompress(data)
    err = out.to_array().astype(float) - arr
    psnr = 10 * np.log10(255 ** 2 / (err ** 2).mean())
    assert psnr > 32, psnr


def test_config3_tiled_16bit_medical(rng):
    arr = _photo(rng, 512, 512, prec=16)  # scaled-down 1024-tile medical
    img = GrkImage.from_array(arr, prec=16)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=5, tile_size=(256, 256), tlm=True))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)
    # random tile access (j2k_random_tile_access parity, SURVEY.md §4)
    full = out.comps[0].data
    for tidx in (3, 0, 2, 1):
        t = grok_tpu.decompress(data, DecompressParams(tile_index=tidx))
        ty, tx = divmod(tidx, 2)
        sl = t.comps[0].data[ty * 256:(ty + 1) * 256,
                             tx * 256:(tx + 1) * 256]
        assert np.array_equal(
            sl, full[ty * 256:(ty + 1) * 256, tx * 256:(tx + 1) * 256])


def test_config4_cinema(rng):
    arr = _photo(rng, 270, 480, ncomp=3, prec=12)
    img = GrkImage.from_array(arr, prec=12)
    data = grok_tpu.compress(img, CompressParams(
        profile=Profile.CINEMA_2K, framerate=24))
    hi = grok_tpu.read_header(data)
    assert hi.siz.rsiz == int(Profile.CINEMA_2K)
    out = grok_tpu.decompress(data)
    err = out.to_array().astype(float) - arr
    psnr = 10 * np.log10(4095 ** 2 / (err ** 2).mean())
    assert psnr > 40, psnr


@pytest.mark.slow
def test_config5_ht_tiled_geospatial_roi(rng):
    """HT block coder on a large tiled image with region-of-interest
    decode (gigapixel-workflow shape at test scale)."""
    arr = _photo(rng, 1536, 1536, prec=16)
    img = GrkImage.from_array(arr, prec=16)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=5, ht=True, tile_size=(512, 512), tlm=True, plt=True))
    # full-image strip streaming (bounded memory)
    from grok_tpu.codec import decompress_strips

    strips = list(decompress_strips(data))
    full = np.concatenate([s[1][0] for s in strips], axis=0)
    assert np.array_equal(full, arr)
    # ROI window decode touching 4 tiles
    win = grok_tpu.decompress(data, DecompressParams(
        window=(400, 450, 700, 800)))
    assert np.array_equal(win.comps[0].data, arr[450:800, 400:700])
    # reduced-resolution overview (the map-viewer path)
    ov = grok_tpu.decompress(data, DecompressParams(reduce=3))
    assert ov.comps[0].data.shape == (192, 192)
