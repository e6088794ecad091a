"""Bit IO + tag tree tests (SURVEY.md B.6)."""

import random

from grok_tpu.t2.bitio import BitReader, BitWriter
from grok_tpu.t2.tagtree import TagTree


def test_bitio_roundtrip():
    random.seed(1)
    for _ in range(100):
        n = random.randint(1, 300)
        bits = [random.randint(0, 1) for _ in range(n)]
        w = BitWriter()
        for b in bits:
            w.write_bit(b)
        w.flush()
        r = BitReader(w.getvalue())
        assert [r.read_bit() for _ in range(n)] == bits


def test_bitio_stuffing():
    w = BitWriter()
    for _ in range(32):
        w.write_bit(1)
    w.flush()
    data = w.getvalue()
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] < 0x80
    # trailing 0xFF must get a guard byte
    assert data[-1] != 0xFF


def test_bitio_align_consumes_stuffed_byte():
    w = BitWriter()
    for _ in range(8):
        w.write_bit(1)  # 0xFF
    w.flush()          # + guard byte
    data = w.getvalue() + b"\xab"
    r = BitReader(data)
    for _ in range(8):
        r.read_bit()
    r.align()
    assert data[r.pos] == 0xAB


def test_tagtree_roundtrip():
    random.seed(7)
    for _ in range(60):
        W = random.randint(1, 9)
        H = random.randint(1, 9)
        vals = [random.randint(0, 8) for _ in range(W * H)]
        te, td = TagTree(W, H), TagTree(W, H)
        for i, v in enumerate(vals):
            te.set_value(i, v)
        w = BitWriter()
        ops = []
        for thr in range(1, 10):
            for leaf in range(W * H):
                te.encode(w, leaf, thr)
                ops.append((leaf, thr))
        w.flush()
        r = BitReader(w.getvalue())
        for leaf, thr in ops:
            assert td.decode(r, leaf, thr) == (vals[leaf] < thr)


def test_tagtree_full_value_single_call():
    """Encoder communicates a leaf fully in one call with threshold v+1;
    decoder recovers it with incremental thresholds (zero-bitplane use)."""
    for v in range(7):
        te, td = TagTree(3, 2), TagTree(3, 2)
        for i in range(6):
            te.set_value(i, v + i % 2)
        w = BitWriter()
        leaf = 2
        te.encode(w, leaf, te.leaves[leaf].value + 1)
        w.flush()
        r = BitReader(w.getvalue())
        k = 1
        while not td.decode(r, leaf, k):
            k += 1
        assert k - 1 == te.leaves[leaf].value
