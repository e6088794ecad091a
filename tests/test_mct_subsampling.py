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
    assert hi.cp.tcps[0].mct_matrix is not None
    assert np.allclose(hi.cp.tcps[0].mct_matrix, m, atol=1e-6)
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
