"""Cinema/Broadcast/IMF profile tests (SURVEY.md §2.2 -w/-x/-U/-z;
BASELINE config 4: DCI cinema profile with rate caps)."""

import io

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.codestream import profiles
from grok_tpu.errors import ParamError
from grok_tpu.params import Profile, Progression


def _xyz12(rng, w=640, h=360):
    yy, xx = np.mgrid[0:h, 0:w].astype(float)
    base = 2048 + 1500 * np.sin(xx / 37) * np.cos(yy / 23)
    arr = np.stack([base, xx * 4095 / w, yy * 4095 / h], axis=-1)
    arr = (arr + rng.normal(0, 20, arr.shape)).clip(0, 4095)
    return arr.astype(np.int32)


def test_cinema2k_roundtrip(rng):
    arr = _xyz12(rng)
    img = GrkImage.from_array(arr, prec=12)
    p = CompressParams(profile=Profile.CINEMA_2K, framerate=24,
                       numresolution=6)
    data = grok_tpu.compress(img, p)
    assert len(data) <= profiles.CINEMA_24_CS
    hi = grok_tpu.read_header(data)
    assert hi.siz.rsiz == int(Profile.CINEMA_2K)
    assert hi.cp.tcps[0].prog_order == Progression.CPRL
    assert hi.cp.tcps[0].tccps[0].cblkw == 5  # 32x32
    assert not profiles.validate_decoded_profile(hi.siz.rsiz, hi)
    out = grok_tpu.decompress(data)
    err = out.to_array().astype(float) - arr
    psnr = 10 * np.log10(4095 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 38, psnr


def test_cinema2k_oracle_decodes(rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    arr = _xyz12(rng, 320, 180)
    img = GrkImage.from_array(arr, prec=12)
    data = grok_tpu.compress(img, CompressParams(
        profile=Profile.CINEMA_2K, framerate=24))
    # Pillow renders 12-bit RGB to 8 bits on load and does not clamp lossy
    # overshoot before scaling (wraparound on ~0.1% of near-saturated
    # pixels), so compare statistically against our reconstruction
    dec = np.asarray(Image.open(io.BytesIO(data))).astype(np.int64)
    ours = grok_tpu.decompress(data).to_array().astype(np.int64)
    d = np.abs(dec - (ours >> 4))
    assert (d > 1).mean() < 0.01
    assert np.median(d) <= 1


def test_decode_oracle_cinema_stream(rng):
    """The oracle's own cinema2k encoder output must decode in our decoder
    (SURVEY.md A.4: oracle supports cinema_mode)."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    arr = (rng.normal(128, 30, (1080, 512, 3))).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG2000", no_jp2=True,
                              cinema_mode="cinema2k-24", irreversible=True,
                              quality_mode="rates", quality_layers=[0])
    data = buf.getvalue()
    ours = grok_tpu.decompress(data).to_array()
    theirs = np.asarray(Image.open(io.BytesIO(data)))
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 1


def test_cinema_size_validation(rng):
    arr = rng.integers(0, 4096, size=(32, 3000, 3)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=12)
    with pytest.raises(ParamError):
        grok_tpu.compress(img, CompressParams(profile=Profile.CINEMA_2K))


def test_cinema4k_poc(rng):
    arr = _xyz12(rng, 512, 270)
    img = GrkImage.from_array(arr, prec=12)
    data = grok_tpu.compress(img, CompressParams(
        profile=Profile.CINEMA_4K, numresolution=7))
    hi = grok_tpu.read_header(data)
    assert hi.siz.rsiz == int(Profile.CINEMA_4K)
    assert len(hi.cp.tcps[0].progression_changes) == 2
    out = grok_tpu.decompress(data)
    assert out.to_array().shape == arr.shape


def test_imf_reversible(rng):
    arr = rng.integers(0, 256, size=(64, 64, 3)).astype(np.int32)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(
        profile=Profile.IMF_2K_R, irreversible=True))  # profile forces 5/3
    hi = grok_tpu.read_header(data)
    assert hi.cp.tcps[0].tccps[0].qmfbid == 1
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)


def test_imf_full_constraints(rng):
    """IMF full constraint set: 32x32 cblk, 256/128 precincts, TLM,
    resolution tile-parts, level bits in Rsiz, decoder validation."""
    arr = rng.integers(0, 4096, (128, 160, 3)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=12)
    p = CompressParams(profile=Profile.IMF_2K_R, profile_level=5,
                       profile_sublevel=2, numresolution=5)
    data = grok_tpu.compress(img, p)
    hi = grok_tpu.read_header(data)
    assert hi.siz.rsiz == (int(Profile.IMF_2K_R) | 5 | (2 << 4))
    t = hi.cp.tcps[0].tccps[0]
    assert (1 << t.cblkw, 1 << t.cblkh) == (32, 32)
    assert t.qmfbid == 1  # _R variant forces 5/3
    assert hi.cp.tlm  # mandatory TLM
    assert profiles.validate_decoded_profile(hi.siz.rsiz, hi) == []
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)


def test_imf_rejects_bad_geometry(rng):
    arr = rng.integers(0, 256, (64, 64)).astype(np.int32)
    img = GrkImage.from_array(arr)
    img.x0 = img.comps[0].x0 = 2  # nonzero offset
    img.x1 += 2
    with pytest.raises(ParamError):
        grok_tpu.compress(img, CompressParams(profile=Profile.IMF_2K))
    big = GrkImage.from_array(
        rng.integers(0, 256, (8, 4096)).astype(np.int32))
    with pytest.raises(ParamError):
        grok_tpu.compress(big, CompressParams(profile=Profile.IMF_2K))


def test_broadcast_full_constraints(rng):
    arr = rng.integers(0, 1024, (96, 96, 3)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=10)
    p = CompressParams(profile=Profile.BC_MULTI_R, profile_level=4,
                       tile_size=(48, 48), numresolution=4)
    data = grok_tpu.compress(img, p)
    hi = grok_tpu.read_header(data)
    assert hi.siz.rsiz == (int(Profile.BC_MULTI_R) | 4)
    assert hi.cp.numtiles == 4
    assert hi.cp.tcps[0].tccps[0].qmfbid == 1  # MULTI_R reversible
    assert profiles.validate_decoded_profile(hi.siz.rsiz, hi) == []
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)
    # 9 tiles is not a legal broadcast tiling
    with pytest.raises(ParamError):
        grok_tpu.compress(img, CompressParams(
            profile=Profile.BC_MULTI, tile_size=(32, 32)))
    with pytest.raises(ParamError):
        grok_tpu.compress(img, CompressParams(
            profile=Profile.BC_SINGLE, profile_level=12))


def test_cinema4k_full_scale_conformance(rng):
    """BASELINE config 4 at its stated scale (VERDICT r3 #5): a full
    4096x2160 DCI 4K encode honors the 24 fps codestream cap, carries the
    4K Rsiz, the two-volume POC (2K sub-resolutions first), CPRL
    ordering, per-component tile-parts, and passes the decoder-side
    profile conformance report."""
    arr = _xyz12(rng, 4096, 2160)
    img = GrkImage.from_array(arr, prec=12)
    p = CompressParams(profile=Profile.CINEMA_4K, framerate=24,
                       numresolution=7)
    data = grok_tpu.compress(img, p)
    assert len(data) <= profiles.CINEMA_24_CS
    hi = grok_tpu.read_header(data)
    assert hi.siz.rsiz == int(Profile.CINEMA_4K)
    tcp = hi.cp.tcps[0]
    assert tcp.prog_order == Progression.CPRL
    assert tcp.tccps[0].cblkw == 5 and tcp.tccps[0].cblkh == 5  # 32x32
    assert len(tcp.progression_changes) == 2
    assert tcp.progression_changes[0].res_e == 6  # 2K volume first
    assert tcp.progression_changes[1].res_s == 6
    assert not profiles.validate_decoded_profile(hi.siz.rsiz, hi)
    # single tile; -u C splits at component changes in CPRL order, and
    # the two POC volumes each cycle the 3 components: 6 tile-parts, so
    # the 2K volume is extractable as whole tile-parts (DCI 4K layout)
    # (walk the marker stream — a byte scan would hit FF90 in packet data)
    assert hi.cp.numtiles == 1
    pos, sots = 2, 0
    while pos < len(data) - 3:
        assert data[pos] == 0xFF
        m = data[pos + 1]
        if m == 0xD9:
            break
        if m == 0x90:
            sots += 1
            pos += int.from_bytes(data[pos + 6:pos + 10], "big")
        else:
            pos += 2 + int.from_bytes(data[pos + 2:pos + 4], "big")
    assert sots == 6
    out = grok_tpu.decompress(data)
    err = out.to_array().astype(float) - arr
    psnr = 10 * np.log10(4095 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 32, psnr
