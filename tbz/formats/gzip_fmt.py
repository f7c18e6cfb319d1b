"""gzip (RFC 1952) framing: full header parse, CRC-32 + ISIZE trailer,
multi-member iteration.

Parity with the reference's 11-state header machine (gzip.lisp:110-286):
magic, CM, reserved-FLG check, MTIME, XFL/OS, FEXTRA, FNAME/FCOMMENT
(UTF-8 with Latin-1 fallback, as gzip.lisp:198-241 via babel), FHCRC
verification against the CRC-32 of the header bytes. Beyond the
reference: ISIZE is *validated* (the reference reads but never checks it,
gzip.lisp:277-279) and multi-member archives are iterated (the reference
goes :done after one member, gzip.lisp:277-286).
"""

from __future__ import annotations

import dataclasses
import zlib as _zlib

from ..errors import (ChecksumError, DeflateError, TruncatedError,
                      ERR_CHECKSUM, ERR_HEADER)

FTEXT = 1
FHCRC = 2
FEXTRA = 4
FNAME = 8
FCOMMENT = 16

OS_NAMES = {
    0: "fat", 1: "amiga", 2: "vms", 3: "unix", 4: "vm/cms", 5: "atari",
    6: "hpfs", 7: "macintosh", 8: "z-system", 9: "cp/m", 10: "tops-20",
    11: "ntfs", 12: "qdos", 13: "acorn", 255: "unknown",
}


@dataclasses.dataclass
class GzipHeader:
    text: bool = False
    mtime: int = 0              # unix seconds (gzip.lisp keeps both unix
    xfl: int = 0                # and universal time; unix suffices here)
    os: int = 255
    os_name: str = "unknown"
    extra: bytes | None = None
    name: str | None = None
    comment: str | None = None
    header_crc_ok: bool | None = None  # None when no FHCRC present
    data_offset: int = 0        # byte offset where the deflate body starts

    def subfields(self) -> list:
        """FEXTRA (SI1SI2, data) subfields (RFC 1952 §2.3.1.1)."""
        return parse_extra_subfields(self.extra) if self.extra else []


def _decode_latin1_fallback(raw: bytes) -> str:
    """UTF-8 with Latin-1 fallback (gzip.lisp:205-212 babel semantics)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


def parse_header(data: bytes, offset: int = 0) -> GzipHeader:
    base = offset
    # magic before length: two garbage bytes are already a loud error
    # (stdlib BadGzipFile semantics), not a wait-for-more-input
    if len(data) - base >= 2 and (data[base] != 0x1F
                                  or data[base + 1] != 0x8B):
        raise DeflateError("bad gzip magic", ERR_HEADER)
    if len(data) - base < 10:
        raise TruncatedError("gzip header truncated")
    if data[base + 2] != 8:
        raise DeflateError(f"gzip CM {data[base + 2]} != 8", ERR_HEADER)
    flg = data[base + 3]
    if flg & 0xE0:
        raise DeflateError("gzip reserved FLG bits set", ERR_HEADER)
    h = GzipHeader(
        text=bool(flg & FTEXT),
        mtime=int.from_bytes(data[base + 4:base + 8], "little"),
        xfl=data[base + 8],
        os=data[base + 9],
        os_name=OS_NAMES.get(data[base + 9], "unknown"),
    )
    pos = base + 10
    if flg & FEXTRA:
        if pos + 2 > len(data):
            raise TruncatedError("gzip FEXTRA truncated")
        xlen = int.from_bytes(data[pos:pos + 2], "little")
        pos += 2
        if pos + xlen > len(data):
            raise TruncatedError("gzip FEXTRA payload truncated")
        h.extra = data[pos:pos + xlen]
        pos += xlen
    if flg & FNAME:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise TruncatedError("gzip FNAME unterminated")
        h.name = _decode_latin1_fallback(data[pos:end])
        pos = end + 1
    if flg & FCOMMENT:
        end = data.find(b"\x00", pos)
        if end < 0:
            raise TruncatedError("gzip FCOMMENT unterminated")
        h.comment = _decode_latin1_fallback(data[pos:end])
        pos = end + 1
    if flg & FHCRC:
        if pos + 2 > len(data):
            raise TruncatedError("gzip FHCRC truncated")
        stored = int.from_bytes(data[pos:pos + 2], "little")
        computed = _zlib.crc32(data[base:pos]) & 0xFFFF
        h.header_crc_ok = stored == computed
        if not h.header_crc_ok:
            raise ChecksumError(
                f"gzip FHCRC mismatch: {stored:#06x} != {computed:#06x}",
                ERR_CHECKSUM)
        pos += 2
    h.data_offset = pos
    return h


def parse_extra_subfields(extra: bytes) -> list[tuple[bytes, bytes]]:
    """Split an FEXTRA payload into (SI1SI2 id, data) subfields per
    RFC 1952 §2.3.1.1 (the reference stores the raw payload only,
    gzip.lisp:178-197; the subfield structure is this API's extension).
    Malformed subfield framing raises DeflateError."""
    out = []
    pos = 0
    while pos < len(extra):
        if pos + 4 > len(extra):
            raise DeflateError("gzip FEXTRA subfield header truncated",
                               ERR_HEADER)
        sid = extra[pos:pos + 2]
        ln = int.from_bytes(extra[pos + 2:pos + 4], "little")
        pos += 4
        if pos + ln > len(extra):
            raise DeflateError("gzip FEXTRA subfield payload truncated",
                               ERR_HEADER)
        out.append((bytes(sid), bytes(extra[pos:pos + ln])))
        pos += ln
    return out


def build_extra_subfields(subfields: list[tuple[bytes, bytes]]) -> bytes:
    """Inverse of parse_extra_subfields (for Compressor/compress use)."""
    parts = []
    for sid, payload in subfields:
        if len(sid) != 2:
            raise ValueError("subfield id must be exactly 2 bytes")
        if len(payload) > 0xFFFF:
            raise ValueError("subfield payload > 65535 bytes")
        parts.append(sid + len(payload).to_bytes(2, "little") + payload)
    blob = b"".join(parts)
    if len(blob) > 0xFFFF:
        raise ValueError("FEXTRA total > 65535 bytes")
    return blob


def read_trailer(data: bytes, offset: int) -> tuple[int, int]:
    """(CRC-32, ISIZE) — both little-endian (gzip.lisp:87-94, 100-106)."""
    if offset + 8 > len(data):
        raise TruncatedError("gzip trailer truncated")
    crc = int.from_bytes(data[offset:offset + 4], "little")
    isize = int.from_bytes(data[offset + 4:offset + 8], "little")
    return crc, isize


def check_trailer(crc_expected: int, crc_computed: int,
                  isize_expected: int, output_len: int) -> None:
    if crc_expected != crc_computed:
        raise ChecksumError(
            f"gzip CRC-32 mismatch: stream {crc_expected:#010x} != "
            f"computed {crc_computed:#010x}", ERR_CHECKSUM)
    if isize_expected != (output_len % (1 << 32)):
        raise ChecksumError(
            f"gzip ISIZE mismatch: stream {isize_expected} != "
            f"output {output_len % (1 << 32)}", ERR_CHECKSUM)
