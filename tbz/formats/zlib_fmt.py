"""zlib (RFC 1950) framing: header validation + Adler-32 trailer.

Validation parity with the reference (zlib.lisp:14-37): CM==8, CINFO<=7,
(CMF<<8|FLG) % 31 == 0. Beyond the reference: FDICT streams are
*supported* when the caller provides the dictionary (the reference
errors "preset dictionary not supported yet", zlib.lisp:33-36).
"""

from __future__ import annotations

import dataclasses
import zlib as _zlib

from ..errors import (ChecksumError, DeflateError, TruncatedError,
                      ERR_HEADER, ERR_CHECKSUM)


@dataclasses.dataclass
class ZlibHeader:
    cm: int
    cinfo: int
    level: int          # FLEVEL hint (0..3)
    fdict: bool
    dictid: int | None  # Adler-32 of the preset dictionary, if FDICT
    data_offset: int    # byte offset where the deflate body starts


def parse_header(data: bytes, zdict: bytes = b"") -> ZlibHeader:
    if len(data) < 2:
        raise TruncatedError("zlib header truncated")
    cmf, flg = data[0], data[1]
    cm = cmf & 0x0F
    cinfo = cmf >> 4
    if cm != 8:
        raise DeflateError(f"zlib CM {cm} != 8", ERR_HEADER)
    if cinfo > 7:
        raise DeflateError(f"zlib CINFO {cinfo} > 7", ERR_HEADER)
    if ((cmf << 8) | flg) % 31 != 0:
        raise DeflateError("zlib header check failed", ERR_HEADER)
    fdict = bool(flg & 0x20)
    level = flg >> 6
    dictid = None
    off = 2
    if fdict:
        if len(data) < 6:
            raise TruncatedError("zlib DICTID truncated")
        dictid = int.from_bytes(data[2:6], "big")
        if not zdict:
            raise DeflateError("stream requires a preset dictionary",
                              ERR_HEADER)
        if _zlib.adler32(zdict) != dictid:
            raise DeflateError("preset dictionary Adler-32 mismatch",
                              ERR_HEADER)
        off = 6
    return ZlibHeader(cm=cm, cinfo=cinfo, level=level, fdict=fdict,
                      dictid=dictid, data_offset=off)


def read_trailer(data: bytes, offset: int) -> int:
    """Adler-32 trailer — stored BIG-endian (zlib.lisp:87-90)."""
    if offset + 4 > len(data):
        raise TruncatedError("zlib Adler-32 trailer truncated")
    return int.from_bytes(data[offset:offset + 4], "big")


def check_adler(expected: int, computed: int) -> None:
    if expected != computed:
        raise ChecksumError(
            f"Adler-32 mismatch: stream {expected:#010x} != "
            f"computed {computed:#010x}", ERR_CHECKSUM)
