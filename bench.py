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
    # Backend choice, measured on this machine (see PERF_NOTES.md):
    # device Tier-1 is byte-identical and keeps bands device-resident,
    # but this box's relay charges ~60 ms per host sync and ~40 us of
    # fusion-launch overhead per serial scan step (constant in batch
    # width), so end-to-end device encode only wins at >=10 MP batches
    # on production-attached chips.  The scored end-to-end path stays
    # native; device kernel throughput is reported separately below.
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

    # CPU-speed canary: this box's shared core has multi-minute slow
    # phases (+-25%); a fixed scalar workload timed alongside lets the
    # recorded numbers be normalized for machine state
    canary = np.arange(1 << 21, dtype=np.int64)
    tc_ = best_of(lambda: int((canary * canary % 1000003).sum()), 5)
    canary_mops = (1 << 21) / tc_ / 1e6

    reps = 8
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
    t2e = best_of(lambda: grok_tpu.compress(img2, cp2), 5)
    t2d = best_of(lambda: grok_tpu.decompress(d2, dp), 5)
    mp2 = rgb.size / 3 / 1e6

    # config 3: tiled 16-bit lossless (proxy 2.2 / 2.6 MP/s on noise)
    g16 = rng2.integers(0, 65536, size=(512, 512)).astype(np.int32)
    img3 = GrkImage.from_array(g16, prec=16)
    cp3 = CompressParams(numresolution=5, tile_size=(256, 256),
                         backend=backend)
    d3 = grok_tpu.compress(img3, cp3)
    t3e = best_of(lambda: grok_tpu.compress(img3, cp3), 5)
    out3 = grok_tpu.decompress(d3, dp)
    t3d = best_of(lambda: grok_tpu.decompress(d3, dp), 5)
    assert np.array_equal(out3.comps[0].data, g16)
    mp3 = g16.size / 1e6

    # config 4: DCI cinema 2K (XYZ 12-bit, CPRL, DCI rate caps)
    from grok_tpu.params import Profile

    yy, xx = np.mgrid[0:1080, 0:2048].astype(float)
    xyz = np.stack([2048 + 1500 * np.sin(xx / 37) * np.cos(yy / 23),
                    xx * 4095 / 2048, yy * 4095 / 1080], -1)
    xyz = (xyz + rng2.normal(0, 20, xyz.shape)).clip(0, 4095).astype(np.int32)
    img4 = GrkImage.from_array(xyz, prec=12)
    cp4 = CompressParams(profile=Profile.CINEMA_2K, framerate=24,
                         numresolution=6, backend=backend)
    d4 = grok_tpu.compress(img4, cp4)
    t4e = best_of(lambda: grok_tpu.compress(img4, cp4), 3)
    t4d = best_of(lambda: grok_tpu.decompress(d4, dp), 3)
    mp4 = xyz.size / 3 / 1e6

    # config 5 family: tiled HTJ2K image, O(window) region decode
    g5 = rng2.integers(0, 256, size=(2048, 2048)).astype(np.int32)
    img5 = GrkImage.from_array(g5, prec=8)
    cp5 = CompressParams(numresolution=6, tile_size=(512, 512), ht=True,
                         tlm=True, plt=True, backend=backend)
    d5 = grok_tpu.compress(img5, cp5)
    dp5 = DecompressParams(backend=backend)
    dp5.window = (700, 900, 956, 1156)  # 256x256 ROI crossing a tile seam
    out5 = grok_tpu.decompress(d5, dp5)  # window-sized canvas
    assert np.array_equal(out5.comps[0].data, g5[900:1156, 700:956])
    t5d = best_of(lambda: grok_tpu.decompress(d5, dp5), 5)
    roi_mp = 256 * 256 / 1e6

    # device Tier-1 kernel throughput (guarded: the experimental axon
    # relay worker can crash on large programs; never fail the bench)
    device_mq = device_ht = None
    try:
        import jax

        if any(d.platform != "cpu" for d in jax.devices()):
            from grok_tpu.ops.ht_encode import encode_cblks_ht_device
            from grok_tpu.ops.mq_encode import encode_cblks_mq_device

            rng3 = np.random.default_rng(7)
            blocks = rng3.integers(-8192, 8192, size=(64, 64, 64)).astype(
                np.int32)
            blocks[rng3.random(blocks.shape) < 0.3] = 0
            orients = (np.arange(64) % 4).astype(np.int32)
            encode_cblks_mq_device(blocks, orients, True, numbps_bound=14)
            t = best_of(lambda: encode_cblks_mq_device(
                blocks, orients, True, numbps_bound=14), 3)
            device_mq = round(64 * 64 * 64 / t / 1e6, 3)
            encode_cblks_ht_device(blocks)
            t = best_of(lambda: encode_cblks_ht_device(blocks), 3)
            device_ht = round(64 * 64 * 64 / t / 1e6, 3)
    except Exception as e:  # pragma: no cover - relay instability
        sys.stderr.write(f"device T1 bench skipped: {e}\n")

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
        "cinema2k_encode_mps": round(mp4 / t4e, 3),
        "cinema2k_decode_mps": round(mp4 / t4d, 3),
        "roi_window_decode_mps": round(roi_mp / t5d, 3),
        # on-device Tier-1 kernel throughput at a 64-block batch (byte-
        # identical streams; see PERF_NOTES.md for the relay economics —
        # scan cost is ~constant in batch size, so these scale with B on
        # production-attached TPUs)
        "device_mq_t1_mps": device_mq,
        "device_ht_t1_mps": device_ht,
        "backend": backend,
        "bytes": len(data),
        # fixed-workload canary (Mops): compare across bench runs to see
        # whether this shared core was in a slow phase
        "cpu_canary_mops": round(canary_mops, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
