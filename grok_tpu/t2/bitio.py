"""Packet-header bit I/O with 0xFF stuffing.

Parity: the reference's bit-level packet-header reader/writer (SURVEY.md
§2.1 "Tier-2", Appendix B.6): bits are written MSB-first; after emitting a
0xFF byte the next byte carries only 7 payload bits (MSB forced to 0), so no
two-byte sequence >= 0xFF90 can appear inside a packet header.  `flush` pads
with zero bits; if the final byte is 0xFF a guard byte is emitted (the
reader's `align` symmetrically consumes it).
"""

from __future__ import annotations


class BitWriter:
    def __init__(self) -> None:
        self._bytes = bytearray()
        self._acc = 0     # bits accumulated MSB-first
        self._used = 0    # bits in _acc
        self._cap = 8     # capacity of current byte (7 right after a 0xFF)

    def write_bit(self, b: int) -> None:
        self._acc = (self._acc << 1) | (b & 1)
        self._used += 1
        if self._used == self._cap:
            self._emit()

    def write_bits(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.write_bit((v >> i) & 1)

    def _emit(self) -> None:
        byte = self._acc  # cap==7 bytes have MSB 0 by construction
        self._bytes.append(byte)
        self._cap = 7 if byte == 0xFF else 8
        self._acc = 0
        self._used = 0

    def flush(self) -> None:
        if self._used:
            self._acc <<= self._cap - self._used
            self._used = self._cap
            self._emit()
            if self._cap == 7:  # the padded byte was 0xFF: emit guard byte
                self._emit()
        elif self._cap == 7:
            # last emitted byte was 0xFF with nothing pending: guard byte
            self._emit()
        self._cap = 8

    def getvalue(self) -> bytes:
        return bytes(self._bytes)

    def __len__(self) -> int:
        return len(self._bytes)


class BitReader:
    def __init__(self, data: bytes, pos: int = 0) -> None:
        self._data = data
        self._pos = pos
        self._acc = 0
        self._avail = 0
        self._prev_ff = False

    def read_bit(self) -> int:
        if self._avail == 0:
            self._load()
        self._avail -= 1
        return (self._acc >> self._avail) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def _load(self) -> None:
        if self._pos < len(self._data):
            b = self._data[self._pos]
            self._pos += 1
        else:
            b = 0  # tolerant: past-the-end reads zeros (truncated stream)
        self._acc = b
        self._avail = 7 if self._prev_ff else 8
        self._prev_ff = b == 0xFF

    def align(self) -> None:
        """Byte-align at end of packet header; a trailing 0xFF's stuffed
        7-bit byte belongs to the header and is consumed here."""
        self._avail = 0
        if self._prev_ff:
            if self._pos < len(self._data):
                self._pos += 1
            self._prev_ff = False

    @property
    def pos(self) -> int:
        return self._pos
