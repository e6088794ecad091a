"""Differential tests: native C++ T1 must be bit-identical to the Python
reference (SURVEY.md §7: 'keep the host T1 as fallback and differential-test
device vs host per codeblock' — same policy for the native backend)."""

import numpy as np
import pytest

from grok_tpu.params import CblkStyle
from grok_tpu.t1 import backend as bk
from grok_tpu.t1.coder import segment_layout

native = pytest.importorskip("grok_tpu.t1.native")

STYLES = [
    CblkStyle.NONE, CblkStyle.TERMALL, CblkStyle.LAZY, CblkStyle.VSC,
    CblkStyle.SEGSYM, CblkStyle.LAZY | CblkStyle.TERMALL, CblkStyle.RESET,
    CblkStyle.PTERM | CblkStyle.TERMALL,
]


def test_native_encode_matches_python(rng):
    for trial in range(16):
        h = int(rng.integers(1, 64))
        w = int(rng.integers(1, 64))
        scale = int(rng.integers(1, 5000))
        coeffs = rng.integers(-scale, scale + 1, size=(h, w)).astype(np.int32)
        if trial % 2:
            coeffs[rng.random((h, w)) < 0.6] = 0
        style = STYLES[trial % len(STYLES)]
        orient = trial % 4
        jp = bk.EncodeJob(coeffs, orient, style)
        jn = bk.EncodeJob(coeffs, orient, style)
        bk._encode_python([jp])
        native.encode_batch_native([jn])
        assert jp.data == jn.data, (trial, style)
        assert jp.numbps == jn.numbps
        assert [p.rate for p in jp.passes] == [p.rate for p in jn.passes]
        assert [p.term for p in jp.passes] == [p.term for p in jn.passes]


def test_native_decode_matches_python(rng):
    for trial in range(12):
        h = int(rng.integers(1, 48))
        w = int(rng.integers(1, 48))
        coeffs = rng.integers(-1000, 1001, size=(h, w)).astype(np.int32)
        style = STYLES[trial % len(STYLES)]
        orient = trial % 4
        j = bk.EncodeJob(coeffs, orient, style)
        bk._encode_python([j])
        if j.numbps == 0:
            continue
        segs = segment_layout(style, j.numbps)
        seg_lengths = []
        prev = 0
        for plist, _ in segs:
            seg_lengths.append(j.passes[plist[-1]].rate - prev)
            prev = j.passes[plist[-1]].rate
        dj = bk.DecodeJob(j.data, seg_lengths, len(j.passes), j.numbps,
                          h, w, orient, style)
        dn = bk.DecodeJob(j.data, seg_lengths, len(j.passes), j.numbps,
                          h, w, orient, style)
        bk._decode_python([dj])
        native.decode_batch_native([dn])
        assert np.array_equal(dj.out, dn.out), (trial, style)


def test_native_truncated_decode_no_crash(rng):
    coeffs = rng.integers(-500, 501, size=(32, 32)).astype(np.int32)
    j = bk.EncodeJob(coeffs, 0, CblkStyle.NONE)
    bk._encode_python([j])
    for frac in (0.1, 0.5, 0.9):
        ln = int(len(j.data) * frac)
        dn = bk.DecodeJob(j.data[:ln], [ln], len(j.passes), j.numbps,
                          32, 32, 0, CblkStyle.NONE)
        native.decode_batch_native([dn])
        assert dn.out.shape == (32, 32)


def test_full_pipeline_native_backend(rng):
    import grok_tpu
    from grok_tpu import CompressParams, DecompressParams, GrkImage

    arr = rng.integers(0, 256, size=(96, 96)).astype(np.int32)
    img = GrkImage.from_array(arr, prec=8)
    d_py = grok_tpu.compress(img, CompressParams(backend="python"))
    d_nat = grok_tpu.compress(img, CompressParams(backend="native"))
    assert d_py == d_nat  # codestreams bit-identical across backends
    out = grok_tpu.decompress(d_nat, DecompressParams(backend="native"))
    assert np.array_equal(out.comps[0].data, arr)


def test_thread_count_determinism(rng):
    """The reference's concurrency invariant (SURVEY.md §4): output must be
    byte-identical regardless of thread count (-H), for both coders."""
    import grok_tpu
    from grok_tpu import CompressParams, GrkImage

    arr = rng.integers(0, 256, (128, 128)).astype(np.int32)
    for ht in (False, True):
        outs = []
        for nt in (1, 4):
            p = CompressParams(numresolution=4, ht=ht, num_threads=nt)
            outs.append(grok_tpu.compress(GrkImage.from_array(arr, prec=8),
                                          p))
        assert outs[0] == outs[1]


def test_tile_decode_native_identical(rng):
    """grk_t1_decode_tile (one C call: record grouping, segment regroup,
    gather, MQ/HT batch dispatch into band arrays) must decode
    identically to the per-codeblock job loop across the option space,
    including pooled-tile reuse and mode-switch segment structures."""
    import grok_tpu
    from grok_tpu import CompressParams, DecompressParams, GrkImage
    from grok_tpu.tile.processor import TileDecompressor

    arr = rng.integers(0, 256, (150, 140, 3)).astype(np.uint8)
    orig = TileDecompressor._run_t1_tile_native
    cases = [
        dict(), dict(ht=True), dict(ht=True, ht_mixed=True),
        dict(cblk_style=0x01), dict(cblk_style=0x04), dict(cblk_style=0x3F),
        dict(numlayers=4, layer_rates=[40, 12, 4, 1.5], cblk_style=0x01),
        dict(tile_size=(64, 64)), dict(irreversible=True),
    ]
    for kw in cases:
        data = grok_tpu.compress(GrkImage.from_array(arr),
                                 CompressParams(**kw))
        used = []

        def probe(self, _u=used):
            r = orig(self)
            _u.append(r)
            return r

        TileDecompressor._run_t1_tile_native = probe
        try:
            a = grok_tpu.decompress(data).to_array()
            a2 = grok_tpu.decompress(data).to_array()  # cached statics
            TileDecompressor._run_t1_tile_native = lambda self: False
            b = grok_tpu.decompress(data).to_array()
        finally:
            TileDecompressor._run_t1_tile_native = orig
        assert used and all(used), kw  # the native tile path actually ran
        assert np.array_equal(a, b) and np.array_equal(a2, b), kw
    # ROI upshift must fall back (downshift post-processing is python)
    data = grok_tpu.compress(GrkImage.from_array(arr),
                             CompressParams(roi_comp=-2, roi_shift=6))
    used = []

    def probe(self, _u=used):
        r = orig(self)
        _u.append(r)
        return r

    TileDecompressor._run_t1_tile_native = probe
    try:
        out = grok_tpu.decompress(data).to_array()
    finally:
        TileDecompressor._run_t1_tile_native = orig
    assert used and not any(used)
    assert out.shape == (150, 140, 3)


def test_native_encode_deep_bitplanes(rng):
    """Near-full-depth incompressible coefficients (raw LAZY planes
    expand ~8/7 over 31 magnitude bits, landing ~31.4 coded bits per
    sample) must fit the numbps-scaled output cap and stay bit-identical
    to the Python coder."""
    coeffs = rng.integers(-(1 << 30), 1 << 30, size=(32, 32)).astype(
        np.int32)
    for style in (CblkStyle.LAZY, CblkStyle.LAZY | CblkStyle.TERMALL):
        jp = bk.EncodeJob(coeffs, 0, style, numbps_bound=31)
        jn = bk.EncodeJob(coeffs, 0, style, numbps_bound=31)
        bk._encode_python([jp])
        native.encode_batch_native([jn])
        assert jp.data == jn.data, style
        assert jp.numbps == jn.numbps


def test_tile_encode_native_identical(rng):
    """grk_t1_encode_tile (one C call: band-array views -> coded bytes +
    flat pass arrays feeding grk_t2_encode_seq directly) must produce
    byte-identical codestreams to the per-codeblock job loop across the
    option space, engage exactly when gated, and bridge back through
    _materialize_enc_seq when the per-packet Tier-2 writer runs."""
    import grok_tpu
    from grok_tpu import CompressParams, GrkImage
    from grok_tpu.tile import processor as proc

    arr = rng.integers(0, 256, (150, 140, 3)).astype(np.uint8)
    orig = proc.TileCompressor._run_t1_tile_native_enc
    fast_cases = [
        dict(), dict(ht=True), dict(ht=True, ht_mixed=True),
        dict(cblk_style=0x01), dict(cblk_style=0x3F),
        dict(irreversible=True), dict(ht=True, irreversible=True),
        dict(tile_size=(64, 64)), dict(sop=True, eph=True, plt=True),
        dict(ppt=True),
        # rate-targeted / multi-layer configurations ride the flat PCRD
        # path (grk_t1_encode_tile need_dist feed + _assign_layers_flat)
        dict(numlayers=2, layer_rates=[20, 1]),
        dict(numlayers=3, layer_rates=[40, 10, 2]),
        dict(numlayers=2),
        dict(ht=True, numlayers=2, layer_rates=[20, 5]),
        dict(irreversible=True, numlayers=2, layer_rates=[20, 5]),
        dict(ht=True, ht_mixed=True, layer_rates=[12]),
        dict(max_cs_size=9000),
        dict(ppt=True, numlayers=2, layer_rates=[20, 4]),
    ]
    for kw in fast_cases:
        used = []

        def probe(self, need_dist=False, _u=used):
            r = orig(self, need_dist)
            _u.append(r)
            return r

        proc.TileCompressor._run_t1_tile_native_enc = probe
        try:
            a = grok_tpu.compress(GrkImage.from_array(arr),
                                  CompressParams(**kw))
            a2 = grok_tpu.compress(GrkImage.from_array(arr),
                                   CompressParams(**kw))  # cached statics
            proc.TileCompressor._run_t1_tile_native_enc = \
                lambda self, need_dist=False: False
            b = grok_tpu.compress(GrkImage.from_array(arr),
                                  CompressParams(**kw))
        finally:
            proc.TileCompressor._run_t1_tile_native_enc = orig
        assert used and all(used), kw  # the native tile path actually ran
        assert a == b and a2 == b, kw
    # gated-out cases must keep the per-codeblock loop: ROI upshift,
    # -q quality targets (calibration re-decodes per-codeblock state)
    for kw in (dict(roi_comp=-2, roi_shift=6),
               dict(numlayers=2, layer_psnr=[30.0, 42.0])):
        used = []

        def probe(self, need_dist=False, _u=used):
            r = orig(self, need_dist)
            _u.append(r)
            return r

        proc.TileCompressor._run_t1_tile_native_enc = probe
        try:
            data = grok_tpu.compress(GrkImage.from_array(arr),
                                     CompressParams(**kw))
        finally:
            proc.TileCompressor._run_t1_tile_native_enc = orig
        assert not any(used), kw
        grok_tpu.decompress(data)
    # the _materialize_enc_seq bridge: run_t1 takes the whole-tile path,
    # then write_packets is forced to bridge back to per-codeblock state
    # BEFORE emission (so the bridge runs on a populated _enc_seq) and
    # the resulting streams stay byte-identical
    for kw in (dict(ht=True), dict(numlayers=2, layer_rates=[20, 1])):
        a = grok_tpu.compress(GrkImage.from_array(arr),
                              CompressParams(**kw))
        bridged = []
        orig_mat = proc.TileCompressor._materialize_enc_seq
        real_wp = proc.TileCompressor.write_packets

        def probe_mat(self, _b=bridged):
            if getattr(self, "_enc_seq", None) is not None:
                _b.append(True)
            return orig_mat(self)

        def wp(self, comp_info, sop=False, eph=False, ppt=False):
            self._materialize_enc_seq()
            return real_wp(self, comp_info, sop=sop, eph=eph, ppt=ppt)

        proc.TileCompressor._materialize_enc_seq = probe_mat
        proc.TileCompressor.write_packets = wp
        try:
            b = grok_tpu.compress(GrkImage.from_array(arr),
                                  CompressParams(**kw))
        finally:
            proc.TileCompressor.write_packets = real_wp
            proc.TileCompressor._materialize_enc_seq = orig_mat
        assert bridged, kw  # the bridge ran on a populated _enc_seq
        assert a == b, kw
