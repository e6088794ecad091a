"""End-to-end codec self round-trips (BASELINE config ladder, SURVEY.md §6)."""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.params import CblkStyle, Progression


def _gray(rng, h, w, prec=8):
    hi = (1 << prec) - 1
    x = np.linspace(0, 6 * np.pi, w)
    base = (np.sin(x)[None, :] * np.cos(x * 0.7)[: h if h <= w else w][
        : h, None] if False else
        np.sin(x)[None, :] * np.linspace(-1, 1, h)[:, None])
    arr = ((base * 0.4 + 0.5) * hi + rng.normal(0, hi * 0.02, (h, w)))
    return arr.clip(0, hi).astype(np.int32)


def _roundtrip(arr, cparams, prec=8, sgnd=False, **dec_kw):
    img = GrkImage.from_array(arr, prec=prec, sgnd=sgnd)
    data = grok_tpu.compress(img, cparams)
    out = grok_tpu.decompress(data, DecompressParams(**dec_kw))
    return data, out


def test_lossless_gray_64(rng):
    arr = _gray(rng, 64, 64)
    _, out = _roundtrip(arr, CompressParams(numresolution=3))
    assert np.array_equal(out.comps[0].data, arr)


def test_lossless_gray_odd_sizes(rng):
    for (h, w) in [(65, 37), (1, 100), (100, 1), (33, 129)]:
        arr = _gray(rng, h, w)
        _, out = _roundtrip(arr, CompressParams(numresolution=4))
        assert np.array_equal(out.comps[0].data, arr), (h, w)


def test_lossless_rgb_rct(rng):
    arr = rng.integers(0, 256, size=(48, 48, 3)).astype(np.int32)
    _, out = _roundtrip(arr, CompressParams(numresolution=3))
    assert np.array_equal(out.to_array(), arr)


def test_lossless_16bit(rng):
    arr = rng.integers(0, 65536, size=(40, 40)).astype(np.int32)
    _, out = _roundtrip(arr, CompressParams(numresolution=3), prec=16)
    assert np.array_equal(out.comps[0].data, arr)


def test_lossless_signed(rng):
    arr = rng.integers(-128, 128, size=(32, 32)).astype(np.int32)
    _, out = _roundtrip(arr, CompressParams(numresolution=3), prec=8,
                        sgnd=True)
    assert np.array_equal(out.comps[0].data, arr)


def test_lossy_97_psnr(rng):
    arr = _gray(rng, 64, 64)
    _, out = _roundtrip(arr, CompressParams(numresolution=3,
                                            irreversible=True))
    err = out.comps[0].data.astype(np.float64) - arr
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 40, psnr


def test_lossy_rgb_ict(rng):
    arr = rng.integers(0, 256, size=(32, 32, 3)).astype(np.int32)
    arr[:, :16] = 128  # smooth region
    _, out = _roundtrip(arr, CompressParams(numresolution=3,
                                            irreversible=True))
    err = out.to_array().astype(np.float64) - arr
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 30, psnr


def test_multitile(rng):
    arr = _gray(rng, 70, 90)
    data, out = _roundtrip(
        arr, CompressParams(numresolution=3, tile_size=(32, 32)))
    assert np.array_equal(out.comps[0].data, arr)


@pytest.mark.parametrize("prog", list(Progression))
def test_progression_orders(prog, rng):
    arr = _gray(rng, 48, 48)
    data, out = _roundtrip(
        arr, CompressParams(numresolution=3, prog_order=prog,
                            precincts=[(32, 32)]))
    assert np.array_equal(out.comps[0].data, arr), prog


@pytest.mark.parametrize("style", [
    CblkStyle.LAZY, CblkStyle.TERMALL, CblkStyle.VSC, CblkStyle.SEGSYM,
    CblkStyle.LAZY | CblkStyle.TERMALL])
def test_mode_switches(style, rng):
    arr = _gray(rng, 48, 48)
    _, out = _roundtrip(arr, CompressParams(numresolution=3,
                                            cblk_style=style))
    assert np.array_equal(out.comps[0].data, arr), style


def test_reduced_resolution_decode(rng):
    arr = _gray(rng, 64, 64)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(numresolution=4))
    out = grok_tpu.decompress(data, DecompressParams(reduce=2))
    assert out.comps[0].data.shape == (16, 16)


def test_multilayer_rates(rng):
    arr = _gray(rng, 64, 64)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(
        img, CompressParams(numresolution=3, layer_rates=[8, 4, 1]))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)  # last layer lossless
    # decoding fewer layers still works and degrades gracefully
    out1 = grok_tpu.decompress(data, DecompressParams(max_layers=1))
    assert out1.comps[0].data.shape == arr.shape


def test_jp2_container(rng):
    arr = rng.integers(0, 256, size=(32, 32, 3)).astype(np.int32)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(numresolution=3,
                                                 cod_format="jp2"))
    assert data[:4] == b"\x00\x00\x00\x0c"
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr)


def test_tile_offset_odd_origin(rng):
    """Canvas-parity DWT phase (SURVEY.md B.1 off-by-one trap)."""
    arr = _gray(rng, 47, 61)
    img = GrkImage.from_array(arr, offset=(3, 5))
    data = grok_tpu.compress(img, CompressParams(numresolution=3,
                                                 tile_size=(32, 32),
                                                 tile_offset=(1, 1)))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr)


def test_header_parse(rng):
    arr = _gray(rng, 64, 64)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(numresolution=3))
    hi = grok_tpu.read_header(data)
    assert hi.siz.xsiz == 64 and hi.siz.ysiz == 64
    assert hi.cp.tcps[0].tccps[0].numresolutions == 3
    assert any("grok_tpu" in c for c in hi.comments)


def test_truncated_stream_tolerant(rng):
    arr = _gray(rng, 64, 64)
    img = GrkImage.from_array(arr)
    data = grok_tpu.compress(img, CompressParams(numresolution=3))
    out = grok_tpu.decompress(data[: int(len(data) * 0.6)])
    assert out.comps[0].data.shape == arr.shape


@pytest.mark.parametrize("prec,sgnd", [(20, False), (24, False), (25, True)])
def test_deep_precision_lossless(prec, sgnd, rng):
    """Precisions beyond 16 bits (medical/scientific range) round-trip
    bit-exactly through the reversible path (SURVEY.md §2.1 GrkImage:
    'precision 1-16+ bits signed/unsigned')."""
    import grok_tpu
    from grok_tpu import CompressParams, GrkImage

    if sgnd:
        arr = rng.integers(-(1 << (prec - 1)), 1 << (prec - 1),
                           (64, 80)).astype(np.int32)
    else:
        arr = rng.integers(0, 1 << prec, (64, 80)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=prec, sgnd=sgnd)
    d = grok_tpu.compress(img, CompressParams(numresolution=4))
    out = grok_tpu.decompress(d).comps[0].data
    assert np.array_equal(out, arr)


def test_stepsize_signaling_bounds():
    """QCD step-size signaling edges: a step below the representable
    range snaps to the NEAREST signalable value (expn=31, mant=0 — the
    old clamp kept a stale mantissa, coarsening up to 2x extra), and
    reversible precisions whose exponent cannot fit the 5-bit field
    raise a clean ParamError instead of a struct.error mid-QCD-write."""
    import pytest as _pytest

    from grok_tpu.errors import ParamError
    from grok_tpu.transform import quant

    ss = quant.encode_stepsize(2.0 ** -25 * 1.3, 10)
    assert (ss.expn, ss.mant) == (31, 0)
    # round-trips: decode(encode(x)) stays within one mantissa step
    for step in (0.5, 1.0, 1.7, 3.2e-4, 12.0):
        ss = quant.encode_stepsize(step, 12)
        got = quant.decode_stepsize(ss, 12)
        assert abs(got - step) / step < 1.0 / 2048 + 1e-9
    # signalable reversible depth encodes; beyond it raises cleanly
    quant.default_stepsizes(29, 5, reversible=True)
    with _pytest.raises(ParamError):
        quant.default_stepsizes(30, 5, reversible=True)


def test_from_array_infers_signedness(rng):
    """A signed-dtype array holding negatives must encode as a signed
    component (it cannot round-trip as unsigned); nonnegative arrays
    keep the unsigned default regardless of dtype."""
    a16 = rng.integers(-30000, 30000, (45, 37)).astype(np.int16)
    img = GrkImage.from_array(a16)
    assert img.comps[0].prec == 16 and img.comps[0].sgnd
    out = grok_tpu.decompress(grok_tpu.compress(img, CompressParams()))
    assert np.array_equal(out.to_array(), a16.astype(np.int32))

    a8 = rng.integers(-128, 128, (30, 30)).astype(np.int8)
    img8 = GrkImage.from_array(a8)
    assert img8.comps[0].prec == 8 and img8.comps[0].sgnd
    out8 = grok_tpu.decompress(grok_tpu.compress(img8, CompressParams()))
    assert np.array_equal(out8.to_array(), a8.astype(np.int32))

    nonneg = rng.integers(0, 4096, (30, 30)).astype(np.int32)
    imgn = GrkImage.from_array(nonneg)
    assert imgn.comps[0].prec == 12 and not imgn.comps[0].sgnd

    deep = rng.integers(-(1 << 20), 1 << 20, (20, 20)).astype(np.int32)
    imgd = GrkImage.from_array(deep)
    assert imgd.comps[0].sgnd and imgd.comps[0].prec >= 21
    outd = grok_tpu.decompress(grok_tpu.compress(imgd, CompressParams()))
    assert np.array_equal(outd.to_array(), deep)
