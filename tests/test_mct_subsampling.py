"""Part-2 custom MCT matrices and component subsampling paths
(SURVEY.md §2.1 "MCT": custom decorrelation via MCT/MCC/MCO; GrkImage
subsampled components)."""

import io

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.image import ImageComponent


def test_custom_mct_roundtrip(rng):
    arr = rng.integers(0, 256, size=(48, 48, 3)).astype(np.int32)
    img = GrkImage.from_array(arr)
    m = np.array([[0.5, 0.3, 0.2],
                  [-0.4, 0.8, -0.4],
                  [0.1, -0.6, 0.5]])
    data = grok_tpu.compress(img, CompressParams(
        numresolution=3, irreversible=True, custom_mct=m))
    hi = grok_tpu.read_header(data)
    assert hi.cp.tcps[0].mct == 2
    # the MCT/MCC/MCO triplet carries the decoding (inverse) matrix
    dec = hi.cp.tcps[0].mct_dec_matrix
    assert dec is not None
    assert np.allclose(np.linalg.inv(dec), m, atol=1e-5)
    assert np.array_equal(hi.cp.tcps[0].mct_offsets, [128, 128, 128])
    out = grok_tpu.decompress(data)
    err = out.to_array().astype(float) - arr
    psnr = 10 * np.log10(255 ** 2 / max((err ** 2).mean(), 1e-9))
    assert psnr > 30, psnr


def _subsampled_image(rng, w, h):
    img = GrkImage(x0=0, y0=0, x1=w, y1=h)
    specs = [(1, 1), (2, 2), (2, 2)]
    for (dx, dy) in specs:
        c = ImageComponent(dx=dx, dy=dy, prec=8, sgnd=False)
        cw, ch = -(-w // dx), -(-h // dy)
        c.data = rng.integers(0, 256, size=(ch, cw)).astype(np.int32)
        c.w, c.h = cw, ch
        img.comps.append(c)
    return img


def test_subsampled_roundtrip(rng):
    img = _subsampled_image(rng, 64, 48)
    ref = [c.data.copy() for c in img.comps]
    data = grok_tpu.compress(img, CompressParams(numresolution=3))
    hi = grok_tpu.read_header(data)
    assert hi.siz.comps[1][2] == 2  # dx preserved
    assert hi.cp.tcps[0].mct == 0  # MCT auto-disabled on mixed sampling
    out = grok_tpu.decompress(data)
    for c, r in zip(out.comps, ref):
        assert np.array_equal(c.data, r)


def test_subsampled_oracle_decodes(rng):
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    img = _subsampled_image(rng, 64, 48)
    ref = [c.data.copy() for c in img.comps]
    data = grok_tpu.compress(img, CompressParams(numresolution=3))
    # oracle upsamples subsampled components on load (sYCC-style); just
    # assert it can parse and decode the stream without error
    dec = np.asarray(Image.open(io.BytesIO(data)))
    assert dec.shape[0] == 48 and dec.shape[1] == 64


def test_subsampled_upsample_flag(rng):
    img = _subsampled_image(rng, 64, 48)
    data = grok_tpu.compress(img, CompressParams(numresolution=3))
    out = grok_tpu.decompress(data, DecompressParams(upsample=True))
    for c in out.comps:
        assert c.data.shape == (48, 64)
        assert c.dx == c.dy == 1


def test_mct_marker_triplet_fields():
    """Byte-level checks on the MCT/MCC/MCO segments themselves."""
    from grok_tpu.codestream import markers as mk

    m = np.array([[2.0, 0.0], [1.0, 1.0]])
    seg = mk.write_mct_record(
        1, mk.MCT_ARRAY_DECORRELATION, mk.MCT_ELEM_FLOAT32, m.ravel())
    assert seg[:2] == b"\xff\x74"
    idx, at, et, arr = mk.read_mct(seg[4:])
    assert (idx, at, et) == (1, mk.MCT_ARRAY_DECORRELATION,
                             mk.MCT_ELEM_FLOAT32)
    assert np.allclose(arr.reshape(2, 2), m)

    seg = mk.write_mct_record(2, mk.MCT_ARRAY_OFFSET, mk.MCT_ELEM_INT32,
                              [128, -5, 1 << 20])
    idx, at, et, arr = mk.read_mct(seg[4:])
    assert at == mk.MCT_ARRAY_OFFSET and list(arr) == [128, -5, 1 << 20]

    seg = mk.write_mcc(1, 3, deco_index=1, offset_index=2)
    assert seg[:2] == b"\xff\x75"
    index, inputs, outputs, di, oi, irrev = mk.read_mcc(seg[4:])
    assert index == 1 and inputs == [0, 1, 2] and outputs == [0, 1, 2]
    assert (di, oi, irrev) == (1, 2, True)

    # wide component indices (>255 components)
    seg = mk.write_mcc(7, 300, deco_index=3, offset_index=0)
    index, inputs, outputs, di, oi, irrev = mk.read_mcc(seg[4:])
    assert index == 7 and len(inputs) == 300 and inputs[299] == 299
    assert di == 3

    seg = mk.write_mco([1, 4])
    assert seg[:2] == b"\xff\x77"
    assert mk.read_mco(seg[4:]) == [1, 4]
