"""Geometry pool (tile/processor.py acquire_tile/release_tile): pooled
trees must behave exactly like freshly built ones across heterogeneous
back-to-back workloads — every encode/decode below runs twice, once with
the pool cleared and once warm, and must produce identical bytes/pixels."""

import numpy as np
import pytest

import grok_tpu
import grok_tpu.tile.processor as proc
from grok_tpu import CompressParams, DecompressParams, GrkImage


def _run_matrix(rng):
    arr = rng.integers(0, 256, (96, 96, 3)).astype(np.int32)
    g = arr[:, :, 0]
    jobs = [
        ("lossless", lambda: grok_tpu.compress(
            GrkImage.from_array(arr), CompressParams(numresolution=3))),
        ("lossy", lambda: grok_tpu.compress(
            GrkImage.from_array(arr),
            CompressParams(numresolution=3, irreversible=True))),
        ("ht", lambda: grok_tpu.compress(
            GrkImage.from_array(arr), CompressParams(numresolution=3,
                                                     ht=True))),
        ("roi", lambda: grok_tpu.compress(
            GrkImage.from_array(g, prec=8),
            CompressParams(numresolution=3, roi_comp=0, roi_shift=5))),
        ("rates", lambda: grok_tpu.compress(
            GrkImage.from_array(arr),
            CompressParams(numresolution=3, layer_rates=[20, 5, 1]))),
    ]
    out = {}
    for name, fn in jobs:
        out[name] = fn()
    # decode variants on the layered stream (exercises decode_pass_cap)
    d = out["rates"]
    out["dec_ml1"] = grok_tpu.decompress(
        d, DecompressParams(max_layers=1)).to_array().tobytes()
    out["dec_full"] = grok_tpu.decompress(d).to_array().tobytes()
    out["dec_win"] = grok_tpu.decompress(
        d, DecompressParams(window=(16, 16, 80, 80))).to_array().tobytes()
    out["dec_red"] = grok_tpu.decompress(
        d, DecompressParams(reduce=1)).to_array().tobytes()
    return out


def test_pool_reuse_identical():
    seed = 1234
    proc._TILE_POOL.clear()
    fresh = _run_matrix(np.random.default_rng(seed))
    # warm pass: the pool now holds trees touched by every prior op
    warm = _run_matrix(np.random.default_rng(seed))
    # and a third pass, reusing trees scrubbed after DIFFERENT ops
    warm2 = _run_matrix(np.random.default_rng(seed))
    for k in fresh:
        assert fresh[k] == warm[k], k
        assert fresh[k] == warm2[k], k


def test_pool_reuse_upgrades_chunk_capacity():
    """A pooled tile first decoded from a stream whose codeblock style
    needs only 2 codeword-segment chunks per packet (no LAZY/TERMALL)
    keeps its native precinct handles; a later same-geometry TERMALL
    stream needs up to MAX_CHUNKS — the cached handle must be rebuilt at
    the larger capacity or the native parser rejects valid packets
    ("malformed packet header" resync => silent corruption)."""
    import grok_tpu
    from grok_tpu import CompressParams, GrkImage
    from grok_tpu.params import CblkStyle
    from grok_tpu.tile import processor as proc

    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (96, 96)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=8)
    a = grok_tpu.compress(img, CompressParams(
        numresolution=3, sop=True, cblk_style=CblkStyle.RESET))
    b = grok_tpu.compress(img, CompressParams(
        numresolution=3, sop=True, cblk_style=CblkStyle.TERMALL))
    proc._TILE_POOL.clear()  # decode A must CREATE the pooled handles
    outa = grok_tpu.decompress(a)
    assert np.array_equal(outa.comps[0].data, arr)
    outb = grok_tpu.decompress(b)
    assert np.array_equal(outb.comps[0].data, arr)
