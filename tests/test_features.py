"""Feature tests: ROI, quality mode, PLT, tile-parts, window decode,
layer-limited decode (SURVEY.md §2 inventory rows)."""

import io

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.errors import GrkError
from grok_tpu.params import Progression


def _content(rng, h, w, ncomp=1):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    base = 128 + 90 * np.sin(xx / 13) * np.cos(yy / 9)
    planes = [base] + [xx * 255 / w, yy * 255 / h][:ncomp - 1]
    arr = np.stack(planes, axis=-1) if ncomp > 1 else base
    arr = (arr + rng.normal(0, 3, arr.shape)).clip(0, 255)
    return arr.astype(np.int32)


def test_roi_lossless_roundtrip(rng):
    arr = _content(rng, 64, 64, 3)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, roi_comp=0, roi_shift=4))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)
    hi = grok_tpu.read_header(data)
    assert hi.cp.tcps[0].tccps[0].roi_shift == 4


def test_roi_oracle_decodes(rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    arr = _content(rng, 64, 64).astype(np.uint8)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, roi_comp=0, roi_shift=3))
    dec = np.asarray(Image.open(io.BytesIO(data)))
    assert np.array_equal(dec, arr)


def test_quality_mode(rng):
    arr = _content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=4, irreversible=True, layer_psnr=[35, 45]))
    full = grok_tpu.decompress(data)
    err = full.comps[0].data.astype(float) - arr
    psnr_full = 10 * np.log10(255 ** 2 / (err ** 2).mean())
    # actual-error calibration: achieved PSNR within 0.6 dB of the target
    # (the residual slack is truncation-point granularity)
    assert abs(psnr_full - 45) < 0.6, psnr_full
    one = grok_tpu.decompress(data, DecompressParams(max_layers=1))
    err1 = one.comps[0].data.astype(float) - arr
    psnr_1 = 10 * np.log10(255 ** 2 / (err1 ** 2).mean())
    assert abs(psnr_1 - 35) < 0.6, psnr_1
    assert psnr_1 < psnr_full + 1e-9, (psnr_1, psnr_full)


def test_plt_emission_and_decode(rng):
    arr = _content(rng, 64, 64)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(numresolution=3, plt=True))
    assert b"\xffX" in data or b"\xff\x58" in data
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)


def test_plt_oracle_decodes(rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    arr = _content(rng, 64, 64).astype(np.uint8)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(numresolution=3, plt=True))
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(data))), arr)


def test_tlm_emission(rng):
    arr = _content(rng, 80, 80)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, tile_size=(32, 32), tlm=True))
    hi = grok_tpu.read_header(data)
    assert hi.cp.tlm is not None
    assert len(hi.cp.tlm) == 9  # 3x3 tiles
    # TLM lengths must be exact tile-part lengths
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)


@pytest.mark.parametrize("mode", ["R", "L", "C"])
def test_tile_parts(mode, rng):
    arr = _content(rng, 64, 64, 3)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, layer_rates=[10, 1],
        new_tile_part_progression=mode))
    # multiple SOT markers for one tile
    count = data.count(b"\xff\x90")
    assert count > 1, count
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)


def test_tile_parts_oracle(rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    arr = _content(rng, 64, 64).astype(np.uint8)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, new_tile_part_progression="R"))
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(data))), arr)


def test_window_decode_matches_crop(rng):
    arr = _content(rng, 128, 128)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=4, cblk_width=16, cblk_height=16))
    full = grok_tpu.decompress(data)
    win = grok_tpu.decompress(data, DecompressParams(
        window=(40, 30, 90, 100)))
    assert win.comps[0].data.shape == (70, 50)
    assert np.array_equal(win.comps[0].data,
                          full.comps[0].data[30:100, 40:90])


def test_window_decode_multitile(rng):
    arr = _content(rng, 100, 100)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, tile_size=(48, 48)))
    win = grok_tpu.decompress(data, DecompressParams(window=(50, 50, 90, 90)))
    full = grok_tpu.decompress(data)
    assert np.array_equal(win.comps[0].data,
                          full.comps[0].data[50:90, 50:90])


def test_max_layers_cap(rng):
    arr = _content(rng, 64, 64)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, layer_rates=[20, 5, 1]))
    full = grok_tpu.decompress(data)
    assert np.array_equal(full.comps[0].data, arr)
    prev_err = None
    for nl in (1, 2, 3):
        out = grok_tpu.decompress(data, DecompressParams(max_layers=nl))
        err = float(((out.comps[0].data.astype(float) - arr) ** 2).mean())
        if prev_err is not None:
            assert err <= prev_err + 1e-9
        prev_err = err
    assert prev_err == 0.0  # all three layers = lossless


def test_sop_resync_on_corruption(rng):
    """SOP error resilience: a corrupted packet must not take down the
    rest of the tile (SURVEY.md §5 error-resilience options)."""
    arr = _content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, sop=True, eph=True, precincts=[(32, 32)]))
    ba = bytearray(data)
    mid = len(ba) // 2
    ba[mid:mid + 4] = b"\x00\x00\x00\x00"
    out = grok_tpu.decompress(bytes(ba))  # must not raise
    err_frac = (out.comps[0].data != arr).mean()
    assert err_frac < 0.8  # partial recovery, not total loss
    clean = grok_tpu.decompress(data)
    assert np.array_equal(clean.comps[0].data, arr)


def _sop_offsets(data: bytes, npackets: int) -> list[int]:
    """Offsets of the Nsop=0..npackets-1 SOP marker segments, found by
    walking the strictly increasing counter (stray 0xFF91 bytes inside
    entropy data fail the Lsop/Nsop filter)."""
    offs = []
    scan = 0
    for k in range(npackets):
        want = b"\xff\x91\x00\x04" + k.to_bytes(2, "big")
        o = data.find(want, scan)
        assert o >= 0, f"SOP {k} not found"
        offs.append(o)
        scan = o + 6
    return offs


def test_sop_resync_later_precincts_bit_exact(rng):
    """Mid-tile SOP resynchronization (VERDICT r4 #2): corrupting ONE
    packet in a sop=eph multi-precinct stream loses only that precinct —
    every later precinct decodes bit-exactly via the Nsop-consistent
    resume."""
    arr = _content(rng, 128, 128)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=1, sop=True, eph=True, precincts=[(32, 32)]))
    offs = _sop_offsets(data, 16)  # 4x4 precinct grid, 1 layer/res/comp

    def regions_equal(out, skip):
        bad = []
        for p in range(16):
            y, x = 32 * (p // 4), 32 * (p % 4)
            if np.array_equal(out.comps[0].data[y:y + 32, x:x + 32],
                              arr[y:y + 32, x:x + 32]) != (p not in skip):
                bad.append(p)
        return bad

    # (a) packet 5's header smashed (SOP kept, header bytes zeroed):
    # the parse fails inside packet 5, resync resumes at packet 6
    ba = bytearray(data)
    ba[offs[5] + 6:offs[5] + 14] = b"\xff" * 8
    out = grok_tpu.decompress(bytes(ba))
    assert regions_equal(out, {5}) == []
    # (b) packet 3's SOP destroyed: "expected SOP" raises at packet 3,
    # the scan lands on packet 4's marker (Nsop=4 > 3 -> consistent)
    ba = bytearray(data)
    ba[offs[3]:offs[3] + 6] = b"\x00" * 6
    out = grok_tpu.decompress(bytes(ba))
    assert regions_equal(out, {3}) == []
    # (c) a whole packet spliced OUT of the stream: at index 7 the
    # decoder meets Nsop=8 — the mismatch raises and the resume maps
    # the counter forward instead of mis-attaching bodies
    ba = bytearray(data[:offs[7]] + data[offs[8]:])
    out = grok_tpu.decompress(bytes(ba))
    assert regions_equal(out, {7}) == []
    # strict mode still refuses all three corruptions
    ba = bytearray(data)
    ba[offs[3]:offs[3] + 6] = b"\x00" * 6
    with pytest.raises(GrkError):
        grok_tpu.decompress(bytes(ba), DecompressParams(strict=True))


def test_ppm_roundtrip_and_oracle(rng):
    """PPM: all packet headers packed into the main header, one Nppm-framed
    chunk per tile-part (emission + decode routing)."""
    import io

    from PIL import Image

    arr = _content(rng, 80, 96)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, tile_size=(32, 32), ppm=True,
        layer_rates=[10, 1.0]))
    assert b"\xff\x60" in data
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)
    assert np.array_equal(np.asarray(Image.open(io.BytesIO(data))), arr)


def test_tlm_seek_single_tile(rng):
    """With a TLM index present, single-tile decode must not parse (or
    copy bodies of) unrelated tile-parts (SURVEY.md §2.1: TLM seeks)."""
    from grok_tpu.codestream.decompress import CodestreamDecoder

    arr = _content(rng, 128, 128) if "_content" in dir() else (
        rng.integers(0, 256, (128, 128)).astype(np.int32))
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, tile_size=(32, 32), tlm=True))
    dec = CodestreamDecoder(data)
    dec.parse()
    assert dec._lazy_spans, "TLM fast path not taken"
    out = dec.decode(DecompressParams(tile_index=5))
    t = out.comps[0].data[32:64, 32:64]
    assert np.array_equal(t, arr[32:64, 32:64])
    # only tile 5 was materialized; the other 15 stay lazy
    assert 5 not in dec._lazy_spans
    assert len(dec._lazy_spans) == 15
    assert list(dec.tile_parts) == [5]
    # full decode afterwards still works and is exact
    full = dec.decode(DecompressParams())
    assert np.array_equal(full.comps[0].data, arr)


def test_window_decode_is_o_window(rng):
    """Region decode must touch O(window) band memory and return exactly
    the full-decode crop (SURVEY.md §3.3 window-aware inverse DWT +
    sparse band storage)."""
    from grok_tpu.codestream.decompress import CodestreamDecoder

    yy, xx = np.mgrid[0:1024, 0:1024].astype(float)
    arr = ((np.sin(xx / 31) * np.cos(yy / 17) + 1) * 120).astype(np.uint8)
    data = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(numresolution=6))

    dec = CodestreamDecoder(data)
    dec.parse()
    win = (400, 320, 528, 416)  # 128x96
    out = dec.decode(DecompressParams(window=win))
    win_bytes = dec.last_band_bytes

    dec2 = CodestreamDecoder(data)
    dec2.parse()
    full = dec2.decode(DecompressParams())
    full_bytes = dec2.last_band_bytes

    assert np.array_equal(out.comps[0].data,
                          full.comps[0].data[320:416, 400:528])
    # window covers ~1.2% of the tile; band memory must scale with the
    # window (margins included), not the tile
    assert win_bytes < full_bytes / 12, (win_bytes, full_bytes)
    # output canvas is window-sized, not image-sized
    assert out.comps[0].data.shape == (96, 128)


def test_window_decode_with_reduce_o_window(rng):
    yy, xx = np.mgrid[0:512, 0:512].astype(float)
    arr = ((np.sin(xx / 13) + 1) * 100).astype(np.uint8)
    data = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(numresolution=5))
    win = (100, 60, 240, 200)
    full = grok_tpu.decompress(data, DecompressParams(reduce=2))
    wind = grok_tpu.decompress(data, DecompressParams(reduce=2, window=win))
    assert np.array_equal(wind.comps[0].data,
                          full.comps[0].data[15:50, 25:60])


def test_window_decode_lossy_psnr(rng):
    """9/7 window decode matches the full-decode crop to float tolerance."""
    yy, xx = np.mgrid[0:512, 0:512].astype(float)
    arr = ((np.sin(xx / 23) * np.cos(yy / 19) + 1) * 110 +
           rng.normal(0, 4, (512, 512))).clip(0, 255).astype(np.uint8)
    data = grok_tpu.compress(GrkImage.from_array(arr), CompressParams(
        numresolution=5, irreversible=True))
    win = (130, 250, 290, 380)
    full = grok_tpu.decompress(data)
    wind = grok_tpu.decompress(data, DecompressParams(window=win))
    crop = full.comps[0].data[250:380, 130:290]
    assert np.abs(wind.comps[0].data - crop).max() <= 1


def test_quality_mode_multitile(rng):
    """-q calibration operates per tile; the assembled image must land
    near the target."""
    arr = _content(rng, 128, 128)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, irreversible=True, tile_size=(64, 64),
        layer_psnr=[36.0]))
    out = grok_tpu.decompress(data)
    err = out.comps[0].data.astype(float) - arr
    psnr = 10 * np.log10(255 ** 2 / (err ** 2).mean())
    assert abs(psnr - 36) < 1.2, psnr  # per-tile targeting, global slack


def test_window_decode_subsampled(rng):
    """Region decode with 4:2:0-style subsampled chroma: each component's
    window scales by its sampling factors."""
    arr = _content(rng, 96, 96, 3)
    img = GrkImage.from_array(arr)
    for c in img.comps[1:]:
        c.data = c.data[::2, ::2]
        c.dx = c.dy = 2
        c.h, c.w = c.data.shape
    data = grok_tpu.compress(img, CompressParams(numresolution=3, mct=0))
    full = grok_tpu.decompress(data)
    win = grok_tpu.decompress(data, DecompressParams(window=(24, 16, 72, 80)))
    assert np.array_equal(win.comps[0].data,
                          full.comps[0].data[16:80, 24:72])
    assert np.array_equal(win.comps[1].data,
                          full.comps[1].data[8:40, 12:36])


def test_cross_feature_interactions(rng):
    """Combinations the reference's non-regression suite would cover:
    PPM x tiles x window, POC x PLT x window, MIXED x tiles x PLT."""
    import grok_tpu
    from grok_tpu import CompressParams, DecompressParams, GrkImage
    from grok_tpu.params import Progression, ProgressionChange

    arr = rng.integers(0, 256, (160, 200)).astype(np.int32)

    def check(p, win=None):
        d = grok_tpu.compress(GrkImage.from_array(arr, prec=8), p)
        dp = DecompressParams()
        if win:
            dp.window = win
        out = grok_tpu.decompress(d, dp).comps[0].data
        want = arr[win[1]:win[3], win[0]:win[2]] if win else arr
        assert np.array_equal(out, want)

    check(CompressParams(numresolution=4, tile_size=(64, 64), ppm=True,
                         layer_rates=[8, 1.0]))
    check(CompressParams(numresolution=4, tile_size=(64, 64), ppm=True),
          win=(30, 40, 100, 120))
    check(CompressParams(numresolution=4, plt=True, numlayers=2,
                         layer_rates=[10, 1.0],
                         progression_changes=[
                             ProgressionChange(0, 0, 2, 4, 1,
                                               Progression.CPRL)]),
          win=(10, 10, 60, 60))
    check(CompressParams(numresolution=4, ht=True, ht_mixed=True,
                         tile_size=(64, 64), plt=True),
          win=(50, 30, 120, 90))


def test_device_strips_pipelined_bit_exact(rng):
    """Decode-side pipelining: device-backend strip decode (deferred
    synthesis overlapping next tile's entropy) stays bit-exact."""
    arr = rng.integers(0, 256, (192, 128)).astype(np.int32)
    d = grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                          CompressParams(tile_size=(64, 64),
                                         numresolution=3))
    strips = list(grok_tpu.decompress_strips(
        d, DecompressParams(backend="device")))
    out = np.vstack([s[1][0] for s in strips])
    assert np.array_equal(out, arr)


def test_window_decode_empty_low_resolution(rng):
    """Window decode of a tile whose low resolutions are EMPTY in one
    axis (odd-origin width-1 column ranges): the produce-chain merge
    must reconstruct the odd edge column from the high band alone
    (500-trial interop sweep regression)."""
    arr = rng.integers(0, 256, (55, 106, 3)).astype(np.int32)
    data = grok_tpu.compress(
        GrkImage.from_array(arr),
        CompressParams(numresolution=6, tile_size=(16, 32),
                       precincts=[(32, 32)]))
    full = grok_tpu.decompress(data)
    assert np.array_equal(full.to_array(), arr)
    dp = DecompressParams(window=(30, 11, 66, 30))
    out = grok_tpu.decompress(data, dp)
    assert np.array_equal(out.to_array(), arr[11:30, 30:66])


def test_jph_container_brand(rng):
    """HTJ2K streams wrapped as JP2 carry the 'jph ' brand (ITU-T T.814)
    and round-trip through the container path."""
    arr = rng.integers(0, 256, (64, 64, 3)).astype(np.int32)
    d = grok_tpu.compress(GrkImage.from_array(arr),
                          CompressParams(numresolution=3, ht=True,
                                         cod_format="jp2"))
    assert b"jph " in d[:64]
    assert np.array_equal(grok_tpu.decompress(d).to_array(), arr)
    d2 = grok_tpu.compress(GrkImage.from_array(arr),
                           CompressParams(numresolution=3,
                                          cod_format="jp2"))
    assert b"jp2 " in d2[:64] and b"jph " not in d2[:64]


def test_unsignaled_sop_markers_tolerated(rng):
    """A stream whose packets carry SOP markers while COD does NOT
    signal them (Scod bit cleared post-encode) must still decode — the
    per-packet parser skips them unconditionally, and the native
    whole-tile sequential path has to apply the same tolerance."""
    from grok_tpu.codestream import markers as mk

    arr = _content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, sop=True, precincts=[(32, 32)]))
    ba = bytearray(data)
    pos = 2
    patched = 0
    while pos + 4 <= len(ba):
        m = int.from_bytes(ba[pos:pos + 2], "big")
        ln = int.from_bytes(ba[pos + 2:pos + 4], "big")
        if m == mk.COD:
            assert ba[pos + 4] & 0x02  # SOP was signaled
            ba[pos + 4] &= ~0x02
            patched += 1
        if m == mk.SOT:
            break
        pos += 2 + ln
    assert patched == 1
    out = grok_tpu.decompress(bytes(ba))
    assert np.array_equal(out.comps[0].data, arr)


def test_window_decode_odd_tile_origin_zero_margin():
    """Window decodes that begin exactly at the clipped produce edge of
    an ODD-origin tile must still equal the full-decode crop: the high
    band extends one sample left of the low band there (floor vs ceil),
    and the merge must consume that real sample instead of mirror-faking
    it (fuzz trial 63 regression).  Sweeps both parities, both filters,
    multiple window offsets."""
    rng = np.random.default_rng(6363)
    arr = rng.integers(0, 65536, size=(55, 115)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=16)
    for irrev in (False, True):
        for tile in [(37, 41), (41, 37), (33, 39)]:
            p = CompressParams(numresolution=4, tile_size=tile,
                               irreversible=irrev)
            data = grok_tpu.compress(img, p)
            full = grok_tpu.decompress(data).comps[0].data
            # windows starting 0..3 samples inside each tile seam
            tw = tile[0]
            for dx in (0, 1, 2, 3):
                for dy in (0, 1, 2, 3):
                    wx0, wy0 = tw + dx, tile[1] + dy
                    wx1 = min(wx0 + 30, 115)
                    wy1 = min(wy0 + 12, 55)
                    if wx0 >= 115 or wy0 >= 55:
                        continue
                    dp = DecompressParams()
                    dp.window = (wx0, wy0, wx1, wy1)
                    got = grok_tpu.decompress(data, dp).comps[0].data
                    want = full[wy0:wy1, wx0:wx1]
                    assert np.array_equal(got, want), (
                        irrev, tile, (wx0, wy0, wx1, wy1))
