"""Marker-segment 64KB limit handling (TLM/PLT/PLM splitting) and
multi-segment TLM accumulation on decode (ADVICE round-1 findings)."""

import struct

import numpy as np

from grok_tpu.codestream import markers as mk


def _segments(buf: bytes, code: int):
    """Split a concatenation of marker segments; returns payload list."""
    out = []
    pos = 0
    while pos < len(buf):
        got = struct.unpack(">H", buf[pos:pos + 2])[0]
        assert got == code
        ln = struct.unpack(">H", buf[pos + 2:pos + 4])[0]
        assert ln <= 65535
        out.append(buf[pos + 4:pos + 2 + ln])
        pos += 2 + ln
    return out


def test_tlm_splits_past_64kb():
    entries = [(i % 70000 // 300, 14 + i) for i in range(30000)]
    buf = mk.write_tlm(0, entries)
    segs = _segments(buf, mk.TLM)
    assert len(segs) > 1
    acc = {}
    for p in segs:
        z, es = mk.read_tlm(p)
        acc[z] = es
    flat = [e for z in sorted(acc) for e in acc[z]]
    assert flat == entries


def test_plt_splits_past_64kb():
    lengths = list(np.random.default_rng(0).integers(1, 10 ** 6, 40000))
    buf = mk.write_plt(0, [int(v) for v in lengths])
    segs = _segments(buf, mk.PLT)
    assert len(segs) > 1
    got = []
    for p in segs:
        got += mk.read_plt(p)
    assert got == [int(v) for v in lengths]


def test_plm_splits_past_64kb():
    tp_lengths = [[100 + j for j in range(500)] for _ in range(100)]
    buf = mk.write_plm(0, tp_lengths)
    segs = _segments(buf, mk.PLM)
    assert len(segs) > 1
    for p in segs:
        assert len(p) <= 65533


def test_tlm_empty_still_one_segment():
    segs = _segments(mk.write_tlm(0, []), mk.TLM)
    assert len(segs) == 1


def test_multisegment_tlm_decode_accumulates(rng):
    """A stream whose TLM index spans two marker segments still takes the
    TLM fast path (decoder accumulates entries instead of overwriting)."""
    import grok_tpu
    from grok_tpu import CompressParams, DecompressParams, GrkImage
    from grok_tpu.codestream.decompress import CodestreamDecoder

    arr = rng.integers(0, 256, (64, 96), dtype=np.int32).astype(np.uint8)
    data = grok_tpu.compress(
        GrkImage.from_array(arr),
        CompressParams(tile_size=(32, 32), tlm=True))
    # locate the single TLM segment and rewrite it as two segments
    pos = 2
    tlm_at = None
    while pos + 4 <= len(data):
        code = struct.unpack(">H", data[pos:pos + 2])[0]
        if code == mk.SOT:
            break
        ln = struct.unpack(">H", data[pos + 2:pos + 4])[0]
        if code == mk.TLM:
            tlm_at = (pos, pos + 2 + ln)
        pos += 2 + ln
    assert tlm_at is not None
    z, entries = mk.read_tlm(data[tlm_at[0] + 4:tlm_at[1]])
    assert len(entries) >= 4
    half = len(entries) // 2
    two = mk.write_tlm(0, entries[:half]) + mk.write_tlm(1, entries[half:])
    patched = data[:tlm_at[0]] + two + data[tlm_at[1]:]

    dec = CodestreamDecoder(patched)
    dec.parse()
    assert dec.hi.cp.tlm == entries
    img = dec.decode(DecompressParams())
    assert np.array_equal(img.comps[0].data, arr.astype(np.int32))
    # fast path actually engaged: tile-parts were seeked lazily
    assert dec._lazy_spans or dec.tile_parts


def test_cap_parts_mapping_gates_mixed():
    """Only Part 15's own Ccap entry may enable the MIXED per-block coder
    bit; other capability bits' values must not (regression: the decoder
    used to scan every Ccap entry)."""
    import struct

    from grok_tpu.codestream import markers as mk

    # Pcap with bits for part 2 and part 15 set (MSB-first numbering)
    pcap = (1 << (32 - 2)) | (1 << (32 - 15))
    # part-2 entry looks like a MIXED signal (top bits 3), part-15 benign
    payload = struct.pack(">I", pcap) + struct.pack(">HH", 0xC001, 0x0000)
    cap = mk.read_cap(payload)
    assert cap["parts"][2] == 0xC001
    assert cap["parts"][15] == 0x0000
    assert (cap["parts"][15] >> 14) != 3  # decoder must NOT set ht_mixed

    # part-15 entry signaling MIXED
    payload2 = struct.pack(">I", 1 << (32 - 15)) + struct.pack(">H", 0xC000)
    cap2 = mk.read_cap(payload2)
    assert (cap2["parts"][15] >> 14) == 3
