"""Benchmark harness: BASELINE.json workload ladder on real hardware.

Measures full-codec encode+decode throughput for the BASELINE.md configs
(the scored metric is config 1: 512x512 8-bit grayscale, single tile,
lossless 5/3) with the native host Tier-1 coder, and prints ONE JSON line:

  {"metric": ..., "value": N, "unit": "MP/s", "vs_baseline": N}

vs_baseline compares against the OpenJPEG single-thread CPU proxy measured
in BASELINE.md (encode 1.7 + decode 4.8 MP/s -> combined
1/(1/1.7 + 1/4.8) = 1.256 MP/s for an encode+decode round trip).

Hang hardening (round 4): the experimental axon TPU relay can wedge so
that a trivial jnp op never returns (round 3's bench timed out there and
scored nothing).  The main process therefore NEVER touches the TPU:

  * jax is forced to CPU immediately after import (the axon sitecustomize
    registers the TPU in every interpreter; env vars alone are too late);
  * TPU health is checked by a SUBPROCESS (`bench.py --probe`) with a hard
    deadline — a hung relay is indistinguishable from a dead one, so the
    probe is killed rather than awaited;
  * the device Tier-1 kernel metrics run in a SUBPROCESS
    (`bench.py --device-metrics`) with its own deadline, only when the
    probe passed;
  * every ladder section is independently guarded, and the JSON line is
    printed UNCONDITIONALLY at the end (missing sections report null and
    the error is noted in "errors").

Reference analog: the reference CLI's `-e` repetition benchmarking
(src/bin/jp2/ [P], SURVEY.md §2.2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

BASELINE_COMBINED_MPS = 1.0 / (1.0 / 1.7 + 1.0 / 4.8)

PROBE_TIMEOUT = float(os.environ.get("GROK_TPU_BENCH_PROBE_TIMEOUT", "45"))
DEVICE_TIMEOUT = float(os.environ.get("GROK_TPU_BENCH_DEVICE_TIMEOUT", "420"))


def _force_cpu():
    """Pin this interpreter's jax to CPU (axon gotcha: must happen via
    jax.config after import, not env vars)."""
    import jax

    jax.config.update("jax_platforms", "cpu")


def make_image(h=512, w=512, seed=0):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 20 * np.pi, w)
    arr = ((np.sin(x)[None, :] * np.linspace(-1, 1, h)[:, None] * 0.4 + 0.5)
           * 255 + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.uint8)
    return arr


def best_of(fn, n=5):
    """Best-of-N timing: this box shares a noisy core, a single timed
    iteration regularly wobbles by +-20%."""
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


# ---------------------------------------------------------------------------
# Subprocess modes
# ---------------------------------------------------------------------------

def probe_main():
    """Touch the TPU with a tiny op; exit 0 iff it completes.

    Run in a subprocess with a deadline: a degraded relay HANGS (it does
    not crash), so the parent kills us rather than waiting.
    """
    import jax
    import jax.numpy as jnp

    devs = [d for d in jax.devices() if d.platform != "cpu"]
    if not devs:
        print("no accelerator")
        sys.exit(3)
    val = jax.device_get(jnp.ones((8, 8)).sum())
    assert int(val) == 64
    print("ok")
    sys.exit(0)


def device_metrics_main():
    """Device Tier-1 kernel throughput at a 64-block batch (byte-identical
    streams; see PERF_NOTES.md for the relay economics — scan cost is
    ~constant in batch size, so these scale with B on production-attached
    TPUs).  Prints one JSON line; run under a parent-enforced deadline."""
    from grok_tpu.ops.ht_encode import encode_cblks_ht_device
    from grok_tpu.ops.mq_encode import encode_cblks_mq_device

    rng = np.random.default_rng(7)
    blocks = rng.integers(-8192, 8192, size=(64, 64, 64)).astype(np.int32)
    blocks[rng.random(blocks.shape) < 0.3] = 0
    orients = (np.arange(64) % 4).astype(np.int32)
    out = {}

    # re-emit the cumulative dict after EVERY metric (flushed): the
    # parent keeps the last parseable line, so a relay hang in a later
    # stage (first-time Pallas compiles take 40-120 s here) no longer
    # discards the measurements that already completed
    def emit():
        print(json.dumps(out), flush=True)

    encode_cblks_mq_device(blocks, orients, True, numbps_bound=14)
    t = best_of(lambda: encode_cblks_mq_device(
        blocks, orients, True, numbps_bound=14), 3)
    out["device_mq_t1_mps"] = round(64 * 64 * 64 / t / 1e6, 3)
    emit()
    encode_cblks_ht_device(blocks)
    t = best_of(lambda: encode_cblks_ht_device(blocks), 3)
    out["device_ht_t1_mps"] = round(64 * 64 * 64 / t / 1e6, 3)
    emit()
    # Pallas vertical 5/3 analysis throughput (VERDICT r4 #4: record the
    # measured kernel number whenever the relay is healthy)
    import jax
    import jax.numpy as jnp

    from grok_tpu.ops.pallas_dwt import fwd_53_vertical

    plane = jnp.asarray(rng.integers(-512, 512, (2048, 2048)), jnp.int32)
    jax.block_until_ready(fwd_53_vertical(plane))
    t = best_of(lambda: jax.block_until_ready(fwd_53_vertical(plane)), 3)
    out["pallas_dwt53_gps"] = round(plane.size / t / 1e9, 3)
    emit()
    sys.exit(0)


def _run_sub(mode: str, timeout: float):
    """Run `bench.py <mode>` in a subprocess; return (rc, last_line).
    rc is None on timeout (process killed).  The child's stdout is
    drained LIVE by a reader thread: subprocess.run() on POSIX never
    drains the pipe after a timeout kill, which would discard the
    incrementally-emitted device metrics this path exists to preserve
    (CLAUDE.md: the axon sitecustomize imports jax in every child, so
    startup alone can eat tens of seconds of the deadline)."""
    import threading

    try:
        p = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), mode],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
            env=dict(os.environ))
        lines = []

        def _drain():
            for ln in p.stdout:
                if ln.strip():
                    lines.append(ln.strip())

        th = threading.Thread(target=_drain, daemon=True)
        th.start()
        try:
            rc = p.wait(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            p.wait()
            rc = None
        th.join(timeout=5)
        return rc, (lines[-1] if lines else "")
    except Exception as e:  # pragma: no cover - subprocess plumbing
        return -1, str(e)


# ---------------------------------------------------------------------------
# Scored ladder (host-only: native backend, jax pinned to CPU)
# ---------------------------------------------------------------------------

def main():
    _force_cpu()

    import grok_tpu
    from grok_tpu import CompressParams, DecompressParams, GrkImage
    from grok_tpu.params import Profile

    # Backend choice, measured on this machine (see PERF_NOTES.md):
    # device Tier-1 is byte-identical and keeps bands device-resident,
    # but this box's relay charges ~60 ms per host sync and ~40 us of
    # fusion-launch overhead per serial scan step (constant in batch
    # width), so end-to-end device encode only wins at >=10 MP batches
    # on production-attached chips.  The scored end-to-end path stays
    # native; device kernel throughput is reported separately below.
    backend = os.environ.get("GROK_TPU_BENCH_BACKEND", "native")
    dp = DecompressParams(backend=backend)
    errors = {}
    # Early relay probe (VERDICT r4 #4): the relay degrades in multi-
    # minute phases, so probe BEFORE the ~60 s ladder as well as after —
    # two timestamped attempts per run instead of one point of failure.
    probes = []
    early_device = None  # parsed device-metric dict from the early window
    if os.environ.get("GROK_TPU_BENCH_NO_DEVICE") != "1":
        rc0, _ = _run_sub("--probe", PROBE_TIMEOUT)
        probes.append({"ts": round(time.time(), 1),
                       "status": {0: "ok", None: "degraded"}.get(rc0,
                                                                 "absent")})
        if rc0 == 0:
            # The relay is healthy RIGHT NOW — grab the device numbers in
            # this window instead of betting on it still being up after
            # the multi-minute CPU ladder (it degraded between probes in
            # BENCH_r05's first capture).  The subprocess is deadline-
            # killed, so a mid-run hang costs DEVICE_TIMEOUT at most.
            rc0, line0 = _run_sub("--device-metrics", DEVICE_TIMEOUT)
            if line0:
                try:
                    early_device = json.loads(line0)
                except ValueError:
                    pass
    result = {
        "metric": "512x512 gray lossless 5/3 encode+decode round-trip "
                  "throughput (config 1)",
        "value": None,
        "unit": "MP/s",
        "vs_baseline": None,
        "backend": backend,
    }

    def section(name, fn):
        try:
            fn()
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"

    # CPU-speed canary: this box's shared core has multi-minute slow
    # phases (+-25%); a fixed scalar workload timed alongside lets the
    # recorded numbers be normalized for machine state
    canary = np.arange(1 << 21, dtype=np.int64)
    tc_ = best_of(lambda: int((canary * canary % 1000003).sum()), 5)
    result["cpu_canary_mops"] = round((1 << 21) / tc_ / 1e6, 1)

    def config1():
        arr = make_image()
        img = GrkImage.from_array(arr)
        cp = CompressParams(numresolution=6, backend=backend)
        data = grok_tpu.compress(img, cp)  # warm-up (native lib load)
        out = grok_tpu.decompress(data, dp)
        assert np.array_equal(out.comps[0].data, arr.astype(np.int32)), \
            "bench round-trip not bit-exact"
        te = best_of(lambda: grok_tpu.compress(img, cp), 8)
        td = best_of(lambda: grok_tpu.decompress(data, dp), 8)
        mp = arr.size / 1e6
        result["value"] = round(2 * mp / (te + td), 3)
        result["vs_baseline"] = round(
            2 * mp / (te + td) / BASELINE_COMBINED_MPS, 3)
        result["encode_mps"] = round(mp / te, 3)
        result["decode_mps"] = round(mp / td, 3)
        result["bytes"] = len(data)

        # secondary: the HTJ2K fast block coder
        cph = CompressParams(numresolution=6, backend=backend, ht=True)
        datah = grok_tpu.compress(img, cph)
        outh = grok_tpu.decompress(datah, dp)
        assert np.array_equal(outh.comps[0].data, arr.astype(np.int32))
        the = best_of(lambda: grok_tpu.compress(img, cph), 8)
        thd = best_of(lambda: grok_tpu.decompress(datah, dp), 8)
        result["ht_combined_mps"] = round(2 * mp / (the + thd), 3)
        result["ht_encode_mps"] = round(mp / the, 3)
        result["ht_decode_mps"] = round(mp / thd, 3)
        result["ht_bytes"] = len(datah)

        # Part-15 MIXED fast-lossless (VERDICT r4 #5): MQ on the res-0
        # LL band (standard-leaning where the bits concentrate), HT on
        # every detail band — the "fewer MQ decisions" product mode
        cpm = CompressParams(numresolution=6, backend=backend, ht=True,
                             ht_mixed=True)
        datam = grok_tpu.compress(img, cpm)
        outm = grok_tpu.decompress(datam, dp)
        assert np.array_equal(outm.comps[0].data, arr.astype(np.int32))
        tme = best_of(lambda: grok_tpu.compress(img, cpm), 8)
        tmd = best_of(lambda: grok_tpu.decompress(datam, dp), 8)
        result["mixed_combined_mps"] = round(2 * mp / (tme + tmd), 3)
        result["mixed_encode_mps"] = round(mp / tme, 3)
        result["mixed_decode_mps"] = round(mp / tmd, 3)
        result["mixed_bytes"] = len(datam)

    section("config1", config1)

    rng2 = np.random.default_rng(1)

    def config2():
        # RGB lossy 9/7 rate-targeted (proxy 1.3 / 5.5 MP/s)
        yy, xx = np.mgrid[0:768, 0:768].astype(float)
        rgb = np.stack([128 + 90 * np.sin(xx / 23) * np.cos(yy / 17),
                        128 + 80 * np.sin(xx / 15),
                        128 + 80 * np.cos(yy / 19)], -1)
        rgb = (rgb + rng2.normal(0, 3, rgb.shape)).clip(0, 255).astype(
            np.int32)
        img2 = GrkImage.from_array(rgb)
        cp2 = CompressParams(numresolution=5, irreversible=True,
                             layer_rates=[20], backend=backend)
        d2 = grok_tpu.compress(img2, cp2)
        t2e = best_of(lambda: grok_tpu.compress(img2, cp2), 5)
        t2d = best_of(lambda: grok_tpu.decompress(d2, dp), 5)
        mp2 = rgb.size / 3 / 1e6
        result["lossy_encode_mps"] = round(mp2 / t2e, 3)
        result["lossy_decode_mps"] = round(mp2 / t2d, 3)

    section("config2", config2)

    def config3():
        # tiled 16-bit lossless (proxy 2.2 / 2.6 MP/s on noise)
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
        result["tiled16_encode_mps"] = round(mp3 / t3e, 3)
        result["tiled16_decode_mps"] = round(mp3 / t3d, 3)

    section("config3", config3)

    def _cinema(w, h, profile, key, reps):
        yy, xx = np.mgrid[0:h, 0:w].astype(float)
        xyz = np.stack([2048 + 1500 * np.sin(xx / 37) * np.cos(yy / 23),
                        xx * 4095 / w, yy * 4095 / h], -1)
        xyz = (xyz + rng2.normal(0, 20, xyz.shape)).clip(0, 4095).astype(
            np.int32)
        img4 = GrkImage.from_array(xyz, prec=12)
        cp4 = CompressParams(profile=profile, framerate=24,
                             numresolution=6, backend=backend)
        d4 = grok_tpu.compress(img4, cp4)
        t4e = best_of(lambda: grok_tpu.compress(img4, cp4), reps)
        t4d = best_of(lambda: grok_tpu.decompress(d4, dp), reps)
        mp4 = xyz.size / 3 / 1e6
        result[f"{key}_encode_mps"] = round(mp4 / t4e, 3)
        result[f"{key}_decode_mps"] = round(mp4 / t4d, 3)

    # config 4: DCI cinema (XYZ 12-bit, CPRL, DCI rate caps) at 2K and 4K
    section("cinema2k",
            lambda: _cinema(2048, 1080, Profile.CINEMA_2K, "cinema2k", 3))
    section("cinema4k",
            lambda: _cinema(4096, 2160, Profile.CINEMA_4K, "cinema4k", 2))

    def config5():
        # tiled HTJ2K image, O(window) region decode
        g5 = rng2.integers(0, 256, size=(2048, 2048)).astype(np.int32)
        img5 = GrkImage.from_array(g5, prec=8)
        cp5 = CompressParams(numresolution=6, tile_size=(512, 512), ht=True,
                             tlm=True, plt=True, backend=backend)
        d5 = grok_tpu.compress(img5, cp5)
        dp5 = DecompressParams(backend=backend)
        dp5.window = (700, 900, 956, 1156)  # 256x256 ROI over a tile seam
        out5 = grok_tpu.decompress(d5, dp5)  # window-sized canvas
        assert np.array_equal(out5.comps[0].data, g5[900:1156, 700:956])
        t5d = best_of(lambda: grok_tpu.decompress(d5, dp5), 5)
        result["roi_window_decode_mps"] = round(256 * 256 / 1e6 / t5d, 3)

    section("config5", config5)

    # Device Tier-1 kernel metrics: probe the relay first with a hard
    # deadline (a degraded relay hangs rather than erroring), then run
    # the metrics in their own killable subprocess.  Never block the
    # scored JSON on the relay.
    result["device_mq_t1_mps"] = result["device_ht_t1_mps"] = None
    if os.environ.get("GROK_TPU_BENCH_NO_DEVICE") == "1":
        result["relay"] = "skipped"
    else:
        # ALWAYS probe again after the multi-minute ladder (the relay
        # degrades in phases — a healthy early probe says nothing about
        # the relay's state now): two timestamped attempts per run.
        rc, _line = _run_sub("--probe", PROBE_TIMEOUT)
        probes.append({"ts": round(time.time(), 1),
                       "status": {0: "ok", None: "degraded"}.get(
                           rc, "absent")})
        result["relay_probes"] = probes
        if early_device is not None:
            # captured in the healthy early window, before the ladder
            result["relay"] = "ok"
            result.update(early_device)
        elif rc == 0:
            result["relay"] = "ok"
            rc, line = _run_sub("--device-metrics", DEVICE_TIMEOUT)
            if line:
                try:
                    result.update(json.loads(line))
                except ValueError:
                    errors["device_metrics"] = f"unparseable: {line[:120]}"
            if rc is None:
                errors["device_metrics"] = (
                    f"timeout after {DEVICE_TIMEOUT:.0f}s (killed; "
                    "metrics measured before the hang kept)")
            elif rc != 0:
                errors["device_metrics"] = f"exit {rc}"
        elif rc is None:
            result["relay"] = "degraded"  # relay hung; probe killed
        else:
            result["relay"] = "absent"

    if errors:
        result["errors"] = errors
    # The one JSON line the driver parses — printed unconditionally.
    print(json.dumps(result))


if __name__ == "__main__":
    if "--probe" in sys.argv:
        probe_main()
    elif "--device-metrics" in sys.argv:
        device_metrics_main()
    else:
        main()
