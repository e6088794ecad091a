"""Opt-in gigapixel-scale run (VERDICT r3 #6, BASELINE config 5: tiled
geospatial imagery at gigapixel scale): a >= 1 GP tiled HTJ2K encode,
full strip-streamed decode in bounded memory, and an O(window) ROI
decode through the TLM/PLT indexes.

Slow (several minutes): runs only when GROK_TPU_SLOW=1.  The encode
streams through compress_strips_file — content is synthesized one tile
row at a time and tile-parts go straight to disk (TLM seek-back), so
neither a canvas nor the codestream is ever memory-resident; the decode
side mmaps the file.  Peak RSS is O(tile row) end to end.  Measured
numbers are recorded in PERF_NOTES.md ("Gigapixel run").
"""

import mmap
import os
import resource
import tempfile
import time

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage

pytestmark = pytest.mark.skipif(
    os.environ.get("GROK_TPU_SLOW") != "1",
    reason="gigapixel run is opt-in: set GROK_TPU_SLOW=1")

N = 32768  # 32768^2 = 1.074 GP


def _content(y0, y1):
    """Deterministic rows [y0, y1): smooth texture + structure, cheap to
    regenerate per strip so verification never needs a second canvas."""
    y = np.arange(y0, y1, dtype=np.int64)[:, None]
    x = np.arange(N, dtype=np.int64)[None, :]
    return (((x * 7 + y * 13) >> 5) ^ ((x >> 8) * (y >> 8))).astype(
        np.int32) & 0xFF


def test_gigapixel_ht_encode_strip_decode_roi():
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    meta = GrkImage(x0=0, y0=0, x1=N, y1=N)
    from grok_tpu.image import ImageComponent

    meta.comps.append(ImageComponent(prec=8, w=N, h=N))
    cp = CompressParams(numresolution=6, tile_size=(1024, 1024), ht=True,
                        tlm=True, plt=True)
    path = tempfile.mktemp(suffix=".j2k")
    try:
        t0 = time.perf_counter()
        nbytes = grok_tpu.compress_strips_file(
            meta, lambda y0, h: [_content(y0, y0 + h)], path, cp)
        t_enc = time.perf_counter() - t0
        mp = N * N / 1e6

        with open(path, "rb") as fobj:
            data = memoryview(mmap.mmap(fobj.fileno(), 0,
                                        access=mmap.ACCESS_READ))

            # O(window) ROI decode through TLM/PLT: a 512x512 window
            # crossing tile seams deep in the image, fast and exact
            dpw = DecompressParams()
            dpw.window = (20000 - 256, 28000 - 256,
                          20000 + 256, 28000 + 256)
            t0 = time.perf_counter()
            out = grok_tpu.decompress(data, dpw)
            t_roi = time.perf_counter() - t0
            assert np.array_equal(out.comps[0].data,
                                  _content(28000 - 256, 28000 + 256)
                                  [:, 20000 - 256:20000 + 256])
            assert t_roi < 0.05 * t_enc  # O(window), not O(image)

            # full strip-streamed decode: bounded, bit-exact everywhere
            t0 = time.perf_counter()
            rows = 0
            for y0, planes in grok_tpu.decompress_strips(
                    data, DecompressParams()):
                strip = planes[0]
                assert np.array_equal(
                    strip, _content(y0, y0 + strip.shape[0]))
                rows += strip.shape[0]
            t_dec = time.perf_counter() - t0
            assert rows == N
    finally:
        if os.path.exists(path):
            os.unlink(path)

    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    peak_gb = rss1 / 1e6
    # bounded end to end: no canvas and no memory-resident codestream in
    # either direction (the mmapped stream pages in read-only; a tile
    # row of bands is the real working set)
    assert peak_gb < 6, peak_gb
    print(f"\nGIGAPIXEL {mp:.0f} MP: encode {mp / t_enc:.1f} MP/s "
          f"({t_enc:.0f}s), strip-decode {mp / t_dec:.1f} MP/s "
          f"({t_dec:.0f}s), 512^2 ROI {t_roi * 1e3:.0f} ms, "
          f"stream {nbytes / 1e6:.0f} MB, peak RSS {peak_gb:.1f} GB "
          f"(baseline {rss0 / 1e6:.1f} GB)")
