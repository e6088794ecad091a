"""MQ arithmetic coder tests (SURVEY.md B.5 — highest verification
priority; interop-level validation lives in test_oracle_interop.py)."""

import random

import pytest

from grok_tpu.t1.mq import MQDecoder, MQEncoder, RawDecoder, RawEncoder


@pytest.mark.parametrize("seed", range(5))
def test_mq_roundtrip_random(seed):
    random.seed(seed)
    for _ in range(60):
        n = random.randint(1, 600)
        bits = [random.randint(0, 1) for _ in range(n)]
        ctxs = [random.randrange(19) for _ in range(n)]
        enc = MQEncoder()
        for b, c in zip(bits, ctxs):
            enc.encode(b, c)
        data = enc.flush()
        dec = MQDecoder(data)
        assert [dec.decode(c) for c in ctxs] == bits


def test_mq_multi_segment_context_carry():
    """Contexts persist across segment restarts (TERMALL behavior)."""
    random.seed(7)
    bits = [random.randint(0, 1) for _ in range(200)]
    ctxs = [random.randrange(19) for _ in range(200)]
    enc = MQEncoder()
    segs = []
    for i, (b, c) in enumerate(zip(bits, ctxs)):
        enc.encode(b, c)
        if i % 50 == 49:
            segs.append(enc.flush())
            saved = enc.ctxs
            enc = MQEncoder()
            enc.ctxs = saved
    dec = MQDecoder(segs[0])
    out = []
    for i, c in enumerate(ctxs):
        out.append(dec.decode(c))
        if i % 50 == 49 and i // 50 + 1 < len(segs):
            dec.init_segment(segs[i // 50 + 1])
    assert out == bits


def test_mq_decode_past_end_feeds_ones():
    """Truncated-segment tolerance: decoder must not crash past the end."""
    enc = MQEncoder()
    for i in range(100):
        enc.encode(i & 1, 18)
    data = enc.flush()
    dec = MQDecoder(data[: len(data) // 2])
    for _ in range(200):
        dec.decode(18)  # must terminate without error


def test_raw_roundtrip():
    random.seed(3)
    for _ in range(50):
        n = random.randint(1, 300)
        bits = [random.randint(0, 1) for _ in range(n)]
        enc = RawEncoder()
        for b in bits:
            enc.encode(b)
        data = enc.flush()
        dec = RawDecoder(data)
        assert [dec.decode() for _ in range(n)] == bits


def test_raw_stuffing():
    """0xFF in raw output must be followed by a 7-bit byte (MSB 0)."""
    enc = RawEncoder()
    for _ in range(64):
        enc.encode(1)
    data = enc.flush()
    for i in range(len(data) - 1):
        if data[i] == 0xFF:
            assert data[i + 1] < 0x80
