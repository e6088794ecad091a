"""Benchmark harness: BASELINE.json config 1 on real hardware.

Measures full-codec encode+decode throughput (512x512 8-bit grayscale,
single tile, lossless 5/3 — BASELINE.json configs[0]) with the device
(TPU) transform pipeline + native host T1, and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

vs_baseline compares against the OpenJPEG single-thread CPU proxy measured
in BASELINE.md (encode 1.7 + decode 4.8 MP/s -> combined
1/(1/1.7 + 1/4.8) = 1.256 MP/s for an encode+decode round trip).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BASELINE_COMBINED_MPS = 1.0 / (1.0 / 1.7 + 1.0 / 4.8)


def make_image(h=512, w=512, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 20 * np.pi, w)
    arr = ((np.sin(x)[None, :] * np.linspace(-1, 1, h)[:, None] * 0.4 + 0.5)
           * 255 + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
    return arr


def main():
    import grok_tpu
    from grok_tpu import CompressParams, DecompressParams, GrkImage

    arr = make_image()
    img = GrkImage.from_array(arr)
    # Backend choice, measured on this machine (see PERF_NOTES.md): the
    # axon TPU is reached through a relay whose device-to-host path moves
    # ~0.25-0.6 MB/s, so any stage that returns coefficient planes to the
    # host (which Tier-1 currently requires) loses to host compute.  The
    # device pipeline stays opt-in until Tier-1 context formation runs
    # on-device and only compressed bytes cross back.
    backend = os.environ.get("GROK_TPU_BENCH_BACKEND", "native")

    cp = CompressParams(numresolution=6, backend=backend)
    dp = DecompressParams(backend=backend)

    # warm-up (jit compile + native lib load)
    data = grok_tpu.compress(img, cp)
    out = grok_tpu.decompress(data, dp)
    assert np.array_equal(out.comps[0].data, arr.astype(np.int32)), \
        "bench round-trip not bit-exact"

    # best-of-N timing: the box shares a noisy core, a single timed
    # iteration regularly wobbles by +-20%
    def best_of(fn, n=5):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    reps = 5
    te = best_of(lambda: grok_tpu.compress(img, cp), reps)
    td = best_of(lambda: grok_tpu.decompress(data, dp), reps)

    mp = arr.size / 1e6
    enc = mp / te
    dec = mp / td
    combined = 2 * mp / (te + td)  # enc+dec round trip

    # secondary: the HTJ2K fast block coder (BASELINE config 5 family)
    cph = CompressParams(numresolution=6, backend=backend, ht=True)
    datah = grok_tpu.compress(img, cph)
    outh = grok_tpu.decompress(datah, dp)
    assert np.array_equal(outh.comps[0].data, arr.astype(np.int32))
    the = best_of(lambda: grok_tpu.compress(img, cph), reps)
    thd = best_of(lambda: grok_tpu.decompress(datah, dp), reps)
    ht_combined = 2 * mp / (the + thd)

    # config 2: RGB lossy 9/7 rate-targeted (proxy 1.3 / 5.5 MP/s)
    rng2 = np.random.default_rng(1)
    yy, xx = np.mgrid[0:768, 0:768].astype(float)
    rgb = np.stack([128 + 90 * np.sin(xx / 23) * np.cos(yy / 17),
                    128 + 80 * np.sin(xx / 15),
                    128 + 80 * np.cos(yy / 19)], -1)
    rgb = (rgb + rng2.normal(0, 3, rgb.shape)).clip(0, 255).astype(np.int32)
    img2 = GrkImage.from_array(rgb)
    cp2 = CompressParams(numresolution=5, irreversible=True,
                         layer_rates=[20], backend=backend)
    d2 = grok_tpu.compress(img2, cp2)
    t2e = best_of(lambda: grok_tpu.compress(img2, cp2), 3)
    t2d = best_of(lambda: grok_tpu.decompress(d2, dp), 3)
    mp2 = rgb.size / 3 / 1e6

    # config 3: tiled 16-bit lossless (proxy 2.2 / 2.6 MP/s on noise)
    g16 = rng2.integers(0, 65536, size=(512, 512)).astype(np.int32)
    img3 = GrkImage.from_array(g16, prec=16)
    cp3 = CompressParams(numresolution=5, tile_size=(256, 256),
                         backend=backend)
    d3 = grok_tpu.compress(img3, cp3)
    t3e = best_of(lambda: grok_tpu.compress(img3, cp3), 3)
    out3 = grok_tpu.decompress(d3, dp)
    t3d = best_of(lambda: grok_tpu.decompress(d3, dp), 3)
    assert np.array_equal(out3.comps[0].data, g16)
    mp3 = g16.size / 1e6

    result = {
        "metric": "512x512 gray lossless 5/3 encode+decode round-trip "
                  "throughput (config 1)",
        "value": round(combined, 3),
        "unit": "MP/s",
        "vs_baseline": round(combined / BASELINE_COMBINED_MPS, 3),
        "encode_mps": round(enc, 3),
        "decode_mps": round(dec, 3),
        "ht_combined_mps": round(ht_combined, 3),
        "ht_encode_mps": round(mp / the, 3),
        "ht_decode_mps": round(mp / thd, 3),
        "lossy_encode_mps": round(mp2 / t2e, 3),
        "lossy_decode_mps": round(mp2 / t2d, 3),
        "tiled16_encode_mps": round(mp3 / t3e, 3),
        "tiled16_decode_mps": round(mp3 / t3d, 3),
        "backend": backend,
        "bytes": len(data),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
