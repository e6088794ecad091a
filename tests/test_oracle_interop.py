"""Interop against the OpenJPEG 2.5.x oracle bundled with Pillow.

SURVEY.md §4 implication (b): with no ISO conformance corpus available,
cross-decoding with OpenJPEG is the conformance gate — our streams must
decode bit-exactly in OpenJPEG and vice versa (stronger than self
round-trip).  Oracle driver options verified in SURVEY.md Appendix A.4.
"""

import io

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def oracle_encode(arr, **kw):
    mode = {1: "L", 3: "RGB"}[1 if arr.ndim == 2 else arr.shape[2]]
    buf = io.BytesIO()
    kw.setdefault("no_jp2", True)
    if arr.dtype == np.uint16:
        mode = "I;16"
    Image.fromarray(arr, mode).save(buf, "JPEG2000", **kw)
    return buf.getvalue()


def oracle_decode(data, layers=None, reduce=None):
    img = Image.open(io.BytesIO(data))
    if reduce is not None:
        img.reduce = reduce
    if layers is not None:
        img.layers = layers
    return np.asarray(img)


def content(rng, h, w, ncomp=1, prec=8):
    hi = (1 << prec) - 1
    x = np.linspace(0, 8 * np.pi, w)
    base = np.sin(x)[None, :] * np.linspace(-1, 1, h)[:, None]
    out = []
    for c in range(ncomp):
        a = ((base * (0.35 + 0.1 * c) + 0.5) * hi
             + rng.normal(0, hi * 0.03, (h, w)))
        out.append(a.clip(0, hi))
    arr = np.stack(out, axis=-1) if ncomp > 1 else out[0]
    return arr.astype(np.uint16 if prec > 8 else np.uint8)


# ------------------------------------------------------------ decode oracle

def test_decode_oracle_lossless_gray(rng):
    arr = content(rng, 96, 96)
    data = oracle_encode(arr, irreversible=False, num_resolutions=3)
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr.astype(np.int32))


def test_decode_oracle_lossless_rgb_rct(rng):
    arr = content(rng, 64, 80, ncomp=3)
    data = oracle_encode(arr, irreversible=False, num_resolutions=4, mct=1)
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr.astype(np.int32))


def test_decode_oracle_lossless_16bit(rng):
    arr = content(rng, 64, 64, prec=16)
    data = oracle_encode(arr, irreversible=False, num_resolutions=3)
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr.astype(np.int32))


def test_decode_oracle_lossy_97(rng):
    arr = content(rng, 96, 96)
    data = oracle_encode(arr, irreversible=True, num_resolutions=3)
    ours = grok_tpu.decompress(data).comps[0].data
    theirs = oracle_decode(data)
    # both decoders reconstruct the same stream: near-identical output
    diff = np.abs(ours.astype(int) - theirs.astype(int))
    assert diff.max() <= 1, diff.max()


def test_decode_oracle_tiled(rng):
    arr = content(rng, 100, 90)
    data = oracle_encode(arr, irreversible=False, num_resolutions=3,
                         tile_size=(48, 32))
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr.astype(np.int32))


def test_decode_oracle_precincts_rpcl_multilayer(rng):
    arr = content(rng, 128, 128)
    data = oracle_encode(arr, irreversible=False, num_resolutions=4,
                         progression="RPCL", precinct_size=(64, 64),
                         codeblock_size=(32, 32),
                         quality_mode="rates", quality_layers=[20, 5, 1])
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.comps[0].data, arr.astype(np.int32))


def test_decode_oracle_jp2(rng):
    arr = content(rng, 64, 64, ncomp=3)
    data = oracle_encode(arr, irreversible=False, no_jp2=False)
    out = grok_tpu.decompress(data)
    assert np.array_equal(out.to_array(), arr.astype(np.int32))


# ------------------------------------------------------------ oracle decodes

def test_oracle_decodes_ours_lossless_gray(rng):
    arr = content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    ours = grok_tpu.compress(img, CompressParams(numresolution=3))
    assert np.array_equal(oracle_decode(ours), arr)


def test_oracle_decodes_ours_rgb_rct(rng):
    arr = content(rng, 64, 80, ncomp=3)
    img = GrkImage.from_array(arr)
    ours = grok_tpu.compress(img, CompressParams(numresolution=4))
    assert np.array_equal(oracle_decode(ours), arr)


def test_oracle_decodes_ours_16bit(rng):
    arr = content(rng, 48, 48, prec=16)
    img = GrkImage.from_array(arr, prec=16)
    ours = grok_tpu.compress(img, CompressParams(numresolution=3))
    assert np.array_equal(oracle_decode(ours), arr.astype(np.int32))


def test_oracle_decodes_ours_lossy(rng):
    arr = content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    ours = grok_tpu.compress(
        img, CompressParams(numresolution=3, irreversible=True))
    dec = oracle_decode(ours).astype(np.float64)
    err = dec - arr
    psnr = 10 * np.log10(255.0 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 40, psnr


def test_oracle_decodes_ours_tiled(rng):
    arr = content(rng, 100, 90)
    img = GrkImage.from_array(arr)
    ours = grok_tpu.compress(
        img, CompressParams(numresolution=3, tile_size=(48, 32)))
    assert np.array_equal(oracle_decode(ours), arr)


def test_oracle_decodes_ours_jp2(rng):
    arr = content(rng, 64, 64, ncomp=3)
    img = GrkImage.from_array(arr)
    ours = grok_tpu.compress(
        img, CompressParams(numresolution=3, cod_format="jp2"))
    assert np.array_equal(oracle_decode(ours), arr)


def test_oracle_decodes_ours_multilayer(rng):
    arr = content(rng, 96, 96)
    img = GrkImage.from_array(arr)
    ours = grok_tpu.compress(
        img, CompressParams(numresolution=3, layer_rates=[10, 1]))
    assert np.array_equal(oracle_decode(ours), arr)


def test_rd_parity_with_oracle_encoder(rng):
    """R-D parity with the independent OpenJPEG encoder at matched MCT
    settings: lossless within 1% of its size, rate-targeted lossy within
    0.15 dB at matched bytes (round-3 quantization-default fix — the
    old 2^gain/norm steps cost 0.3-0.7 dB)."""
    import io
    import math

    yy, xx = np.mgrid[0:384, 0:384].astype(float)
    rgb = np.stack([128 + 90 * np.sin(xx / 23) * np.cos(yy / 17),
                    128 + 80 * np.sin(xx / 15),
                    128 + 80 * np.cos(yy / 19)], -1)
    rgb = (rgb + rng.normal(0, 3, rgb.shape)).clip(0, 255).astype(np.uint8)

    oj_ll = oracle_encode(rgb, irreversible=False)
    ours_ll = grok_tpu.compress(GrkImage.from_array(rgb.astype(np.int32)),
                                CompressParams(mct=0))
    assert len(ours_ll) <= 1.01 * len(oj_ll), (len(ours_ll), len(oj_ll))

    def psnr(a):
        mse = ((a.astype(float) - rgb.astype(float)) ** 2).mean()
        return 10 * math.log10(255 ** 2 / mse)

    for ratio in (10, 40):
        oj = oracle_encode(rgb, irreversible=True, quality_mode="rates",
                           quality_layers=[ratio])
        p_oracle = psnr(np.asarray(Image.open(io.BytesIO(oj))))
        ours = grok_tpu.compress(
            GrkImage.from_array(rgb.astype(np.int32)),
            CompressParams(irreversible=True, mct=0,
                           layer_rates=[float(ratio)]))
        assert len(ours) <= 1.03 * len(oj)
        p_ours = psnr(np.asarray(Image.open(io.BytesIO(ours))))
        assert p_ours >= p_oracle - 0.15, (ratio, p_ours, p_oracle)


def test_default_qcd_matches_oracle(rng):
    """The default irreversible step exponents match the oracle
    encoder's signaled QCD (image-domain-uniform Delta_b ~ 1/norm_b);
    mantissas may differ by <0.5% (their truncated norm tables)."""
    import io

    arr = rng.integers(0, 256, (64, 64)).astype(np.uint8)
    hi_o = grok_tpu.read_header(oracle_encode(arr, irreversible=True))
    ours = grok_tpu.compress(GrkImage.from_array(arr.astype(np.int32),
                                                 prec=8),
                             CompressParams(irreversible=True))
    hi_m = grok_tpu.read_header(ours)
    so = hi_o.cp.tcps[0].tccps[0].stepsizes
    sm = hi_m.cp.tcps[0].tccps[0].stepsizes
    assert [s.expn for s in so] == [s.expn for s in sm]
    for a, b in zip(so, sm):
        assert abs(a.mant - b.mant) <= 12, (a.mant, b.mant)


def test_no_truncation_layer_keeps_fine_quant(rng):
    """-r N,1 (progressive to the no-truncation cap): the final layer's
    quality is quantizer-bound, so the adaptive step coarsening must NOT
    apply (review regression: -r 40,1 lost 13 dB on the last layer)."""
    import io
    import math

    arr = rng.integers(0, 256, (128, 128)).astype(np.uint8)
    d = grok_tpu.compress(GrkImage.from_array(arr.astype(np.int32), prec=8),
                          CompressParams(irreversible=True,
                                         layer_rates=[40.0, 1.0]))
    dec = np.asarray(Image.open(io.BytesIO(d))).astype(float)
    mse = ((dec - arr) ** 2).mean()
    psnr = 10 * math.log10(255 ** 2 / mse)
    assert psnr > 50, psnr  # near-lossless final layer
