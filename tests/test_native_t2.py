"""Differential tests: native Tier-2 packet coder vs the pure-Python oracle.

The native path (native/t2.cc via grok_tpu/t2/native.py) must produce
byte-identical codestreams and identical decoded images to the Python
reference implementation (encode_packet_py / decode_packet_py) across the
option space: layers, progressions, precincts, SOP/EPH, mode switches,
PPT packed headers, tiles.
"""

import numpy as np
import pytest

import grok_tpu
from grok_tpu import CompressParams, DecompressParams, GrkImage
from grok_tpu.params import Progression
from grok_tpu.t2 import packets


requires_native = pytest.mark.skipif(
    packets._native is None, reason="native T2 not built")


def _img(shape, seed=0, prec=8):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 1 << prec, shape,
                       dtype=np.uint16 if prec > 8 else np.uint8)
    if prec <= 8:
        arr = arr.astype(np.uint8)
    return GrkImage.from_array(arr, prec=prec)


def _with_python_t2(fn):
    saved = packets._native
    packets._native = None
    try:
        return fn()
    finally:
        packets._native = saved


CASES = [
    dict(),  # defaults: lossless 5/3 single layer
    dict(layer_rates=[40.0, 10.0, 2.5], irreversible=True),
    dict(prog_order=Progression.RPCL, precincts=[(128, 128)],
         sop=True, eph=True),
    dict(prog_order=Progression.PCRL, layer_rates=[20.0, 5.0]),
    dict(cblk_style=0x01 | 0x04),            # lazy + termall
    dict(tile_size=(64, 64), layer_rates=[8.0, 2.0]),
    dict(ppt=True, layer_rates=[10.0, 3.0]),
]


def test_case_fields_exist():
    """Guard against silently-dead dataclass attributes: every CASES key
    must be a real CompressParams field."""
    import dataclasses

    names = {f.name for f in dataclasses.fields(CompressParams)}
    for case in CASES:
        for k in case:
            assert k in names, k


@requires_native
@pytest.mark.parametrize("case", range(len(CASES)))
def test_encode_matches_python(case):
    kw = dict(CASES[case])
    img = _img((96, 112), seed=case)
    p = CompressParams()
    for k, v in kw.items():
        setattr(p, k, v)
    native_bytes = grok_tpu.compress(img, p)
    img2 = _img((96, 112), seed=case)
    py_bytes = _with_python_t2(lambda: grok_tpu.compress(img2, p))
    assert native_bytes == py_bytes


@requires_native
@pytest.mark.parametrize("case", range(len(CASES)))
def test_decode_matches_python(case):
    kw = dict(CASES[case])
    img = _img((96, 112), seed=100 + case)
    p = CompressParams()
    for k, v in kw.items():
        setattr(p, k, v)
    data = grok_tpu.compress(img, p)
    a = grok_tpu.decompress(data, DecompressParams()).to_array()
    b = _with_python_t2(
        lambda: grok_tpu.decompress(data, DecompressParams()).to_array())
    assert np.array_equal(a, b)


@requires_native
def test_decode_matches_python_layer_discard():
    img = _img((128, 128), seed=7)
    p = CompressParams()
    p.layer_rates = [40.0, 10.0, 2.5]
    p.irreversible = True
    data = grok_tpu.compress(img, p)
    dp = DecompressParams()
    dp.max_layers = 2
    a = grok_tpu.decompress(data, dp).to_array()
    b = _with_python_t2(lambda: grok_tpu.decompress(data, dp).to_array())
    assert np.array_equal(a, b)


@requires_native
def test_malformed_header_raises_not_crashes():
    img = _img((64, 64), seed=9)
    data = bytearray(grok_tpu.compress(img, CompressParams()))
    # find SOD and trash the first packet-header bytes after it
    sod = bytes(data).find(b"\xff\x93")
    assert sod > 0
    for i in range(sod + 2, min(sod + 8, len(data))):
        data[i] = 0xFF
    try:
        grok_tpu.decompress(bytes(data), DecompressParams(strict=False))
    except grok_tpu.CodestreamError:
        pass  # rejecting is fine; crashing or hanging is not


@requires_native
def test_oracle_stream_decodes_identically():
    # streams from the independent OpenJPEG encoder exercise tag-tree and
    # Lblock paths our encoder may not produce
    from io import BytesIO
    from PIL import Image

    arr = (np.random.default_rng(3).integers(0, 256, (130, 75, 3))
           .astype(np.uint8))
    buf = BytesIO()
    Image.fromarray(arr).save(buf, "JPEG2000", no_jp2=True,
                              quality_mode="rates", quality_layers=[30, 8, 1],
                              progression="RPCL", num_resolutions=4)
    data = buf.getvalue()
    a = grok_tpu.decompress(data).to_array()
    b = _with_python_t2(lambda: grok_tpu.decompress(data).to_array())
    assert np.array_equal(a, b)


@requires_native
def test_huge_precinct_header(rng):
    """A single maximal precinct holding thousands of tiny codeblocks
    produces a packet header beyond any fixed buffer; the native coder
    must grow and stay byte-identical to the Python coder (regression:
    the first native T2 had a hard 64KB header cap)."""
    arr = rng.integers(0, 256, (512, 512)).astype(np.uint8)
    img = GrkImage.from_array(arr)
    p = CompressParams(numresolution=2, cblk_width=4, cblk_height=4)
    native_bytes = grok_tpu.compress(img, p)
    py_bytes = _with_python_t2(
        lambda: grok_tpu.compress(GrkImage.from_array(arr), p))
    assert native_bytes == py_bytes
    out = grok_tpu.decompress(native_bytes).to_array()
    assert np.array_equal(out, arr.astype(out.dtype))


@requires_native
def test_vectorized_rate_sim_byte_identical(rng):
    """The vectorized Tier-2 dry-run path (grk_t2_size_layers +
    _simulate_size_fast) must produce byte-identical rate-targeted
    streams to the per-cblk _simulate_size loop it replaces."""
    from grok_tpu.tile.processor import TileCompressor

    yy, xx = np.mgrid[0:220, 0:180].astype(float)
    base = (128 + 90 * np.sin(xx / 19) * np.cos(yy / 13)
            + rng.normal(0, 8, (220, 180))).clip(0, 255).astype(np.uint8)
    orig = TileCompressor._build_sim_state
    cases = [
        dict(layer_rates=[80, 20, 5]),
        dict(irreversible=True, max_cs_size=6000, sop=True, eph=True),
        dict(layer_rates=[40, 10], ht=True, ht_mixed=True),
        dict(layer_rates=[30], tile_size=(96, 96)),
    ]
    for kw in cases:
        fast = grok_tpu.compress(GrkImage.from_array(base),
                                 CompressParams(**kw))
        TileCompressor._build_sim_state = lambda self, e, n: None
        try:
            legacy = grok_tpu.compress(GrkImage.from_array(base),
                                       CompressParams(**kw))
        finally:
            TileCompressor._build_sim_state = orig
        assert fast == legacy, kw


@requires_native
def test_seq_packet_decode_identical(rng):
    """The whole-tile native packet-sequence decode (_decode_packets_seq
    / grk_t2_decode_seq) must produce identical decoded images to the
    per-packet path across styles, layers, tiles, HT/MIXED, and on
    truncated streams (tolerant mode)."""
    from grok_tpu.tile.processor import TileDecompressor

    arr = rng.integers(0, 256, (150, 170, 3)).astype(np.uint8)
    orig = TileDecompressor._decode_packets_seq
    cases = [
        dict(),
        dict(numlayers=4, layer_rates=[40, 12, 4, 1.5]),
        dict(ht=True),
        dict(ht=True, ht_mixed=True),
        dict(cblk_style=0x3F),
        dict(tile_size=(64, 64)),
        dict(irreversible=True, roi_comp=-1, roi_shift=5),
    ]
    for kw in cases:
        data = grok_tpu.compress(GrkImage.from_array(arr),
                                 CompressParams(**kw))
        streams = [data, data[:len(data) // 2]]
        for s in streams:
            used = []

            def probe(self, d, o, _u=used):
                r = orig(self, d, o)
                _u.append(r)
                return r

            TileDecompressor._decode_packets_seq = probe
            try:
                a = grok_tpu.decompress(
                    s, DecompressParams(strict=False)).to_array()
                TileDecompressor._decode_packets_seq = \
                    lambda self, d, o: False
                b = grok_tpu.decompress(
                    s, DecompressParams(strict=False)).to_array()
            finally:
                TileDecompressor._decode_packets_seq = orig
            if len(s) == len(data):
                assert used and all(used), kw  # fast path actually ran
            assert np.array_equal(a, b), kw


@requires_native
def test_seq_decode_tile_cache_no_contamination(rng):
    """The packet-order / seq-state caches live on POOLED tile objects:
    alternating streams with different coding params but identical
    geometry must each keep decoding to their own reference output."""
    arr = rng.integers(0, 256, (130, 120, 3)).astype(np.uint8)
    variants = [dict(), dict(ht=True), dict(cblk_style=0x3F),
                dict(roi_comp=-1, roi_shift=6),
                dict(numlayers=3, layer_rates=[30, 8, 2]),
                dict(irreversible=True)]
    streams = [grok_tpu.compress(GrkImage.from_array(arr),
                                 CompressParams(**kw)) for kw in variants]
    refs = [grok_tpu.decompress(s).to_array() for s in streams]
    for _ in range(3):
        for kw, s, ref in zip(variants, streams, refs):
            assert np.array_equal(grok_tpu.decompress(s).to_array(),
                                  ref), kw


@requires_native
def test_seq_packet_encode_identical(rng):
    """The whole-tile native packet emission (_write_packets_seq /
    grk_t2_encode_seq) must produce byte-identical codestreams to the
    per-packet loop across progression orders, layers, SOP/EPH, PPT,
    precincts, tiles, HT/MIXED and ROI."""
    import grok_tpu.tile.processor as proc

    arr = rng.integers(0, 256, (150, 170, 3)).astype(np.uint8)
    cases = [
        dict(),
        dict(ht=True),
        dict(ht=True, ht_mixed=True),
        dict(numlayers=3, layer_rates=[30, 8, 2]),
        dict(sop=True, eph=True, numlayers=2, layer_rates=[20, 4]),
        dict(ppt=True, numlayers=2, layer_rates=[20, 4]),
        dict(precincts=[(64, 64)], prog_order=Progression.PCRL,
             numlayers=2, layer_rates=[20, 4], plt=True),
        dict(tile_size=(64, 64), tlm=True),
        dict(irreversible=True, roi_comp=-1, roi_shift=5),
        dict(cblk_style=0x3F),
    ]
    gi = GrkImage.from_array(arr)
    assert proc._T2_SEQ_ENC  # default on
    for kw in cases:
        a = grok_tpu.compress(gi, CompressParams(**kw))
        proc._T2_SEQ_ENC = False
        try:
            b = grok_tpu.compress(gi, CompressParams(**kw))
        finally:
            proc._T2_SEQ_ENC = True
        assert a == b, kw
