"""Host-side LSB-first bit reader.

Same contract as the reference's 64-bit bit-buffer reader
(deflate.lisp:139-242, io.lisp:3-59): bits are consumed LSB-first from a
byte stream, with exact bit-position bookkeeping so decode can be
suspended/resumed at any bit offset. Used by the pure-Python oracle and
the host tokenizer fallback; the native and device frontends implement
the same contract independently.
"""

from __future__ import annotations

from .errors import TruncatedError


class BitReader:
    __slots__ = ("data", "nbytes", "buf", "nbits", "byte_pos")

    def __init__(self, data: bytes | bytearray | memoryview, bit_pos: int = 0):
        self.data = bytes(data)
        self.nbytes = len(self.data)
        self.buf = 0          # bit buffer, LSB = next bit
        self.nbits = 0        # valid bits in buf
        self.byte_pos = 0     # next unread byte index
        if bit_pos:
            self.byte_pos = bit_pos >> 3
            rem = bit_pos & 7
            if rem:
                if self.byte_pos >= self.nbytes:
                    raise TruncatedError("bit_pos past end of input")
                self.buf = self.data[self.byte_pos] >> rem
                self.nbits = 8 - rem
                self.byte_pos += 1

    def bit_position(self) -> int:
        """Absolute bit offset of the next unconsumed bit."""
        return self.byte_pos * 8 - self.nbits

    def bits_available(self) -> int:
        return (self.nbytes - self.byte_pos) * 8 + self.nbits

    def _fill(self, n: int) -> None:
        while self.nbits < n:
            if self.byte_pos >= self.nbytes:
                raise TruncatedError("input underrun")
            self.buf |= self.data[self.byte_pos] << self.nbits
            self.byte_pos += 1
            self.nbits += 8

    def peek(self, n: int) -> int:
        """Up to n bits without consuming; short reads zero-padded."""
        while self.nbits < n and self.byte_pos < self.nbytes:
            self.buf |= self.data[self.byte_pos] << self.nbits
            self.byte_pos += 1
            self.nbits += 8
        return self.buf & ((1 << n) - 1)

    def bits(self, n: int) -> int:
        """Consume exactly n bits (n <= 56)."""
        self._fill(n)
        out = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return out

    def drop(self, n: int) -> None:
        self._fill(n)
        self.buf >>= n
        self.nbits -= n

    def align_to_byte(self) -> None:
        rem = self.nbits & 7
        self.buf >>= rem
        self.nbits -= rem

    def read_bytes_aligned(self, n: int) -> bytes:
        """Read n bytes; caller must be byte-aligned."""
        assert self.nbits & 7 == 0
        out = bytearray()
        while self.nbits and n:
            out.append(self.buf & 0xFF)
            self.buf >>= 8
            self.nbits -= 8
            n -= 1
        if n:
            if self.byte_pos + n > self.nbytes:
                raise TruncatedError("input underrun in stored block")
            out += self.data[self.byte_pos:self.byte_pos + n]
            self.byte_pos += n
        return bytes(out)
