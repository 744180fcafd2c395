"""BGZF (blocked gzip) layer for BAM/BAI IO.

Replaces htslib's BGZF for this engine: block-level random access through
virtual file offsets (coffset<<16 | uoffset). Pure-Python/zlib implementation;
the C++ fast path (io/native) plugs in behind the same interface for bulk
window decode.
"""

from __future__ import annotations

import struct
import zlib
from typing import BinaryIO, Iterator, Tuple

BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")

_HDR = struct.Struct("<4BI2BH")          # magic..XLEN
_SUBFIELD = struct.Struct("<2BH")


def read_block(fh: BinaryIO) -> Tuple[bytes, int]:
    """Read one BGZF block at the current offset.

    Returns (inflated payload, compressed block size). Empty payload + size 0
    at clean EOF (zero bytes available). A PARTIAL block — header, extra
    field, cdata, or trailer cut short — raises instead of masquerading as
    EOF, so a truncated BAM (interrupted copy, writer killed before close)
    cannot silently pass as complete (htslib parity: 'EOF marker is
    absent' / 'truncated file'). Block CRC32 is verified: raw DEFLATE has
    no internal checksum, so this is the only corruption gate."""
    header = fh.read(12)
    if not header:
        return b"", 0
    if len(header) < 12:
        raise ValueError("truncated BGZF block header")
    id1, id2, cm, flg, _mtime, _xfl, _os, xlen = _HDR.unpack(header)
    if id1 != 0x1F or id2 != 0x8B or cm != 8 or not (flg & 4):
        raise ValueError("not a BGZF block")
    extra = fh.read(xlen)
    if len(extra) < xlen:
        raise ValueError("truncated BGZF extra field")
    bsize = None
    pos = 0
    while pos + 4 <= xlen:
        si1, si2, slen = _SUBFIELD.unpack_from(extra, pos)
        if si1 == 0x42 and si2 == 0x43 and slen == 2:
            bsize = struct.unpack_from("<H", extra, pos + 4)[0] + 1
        pos += 4 + slen
    if bsize is None:
        raise ValueError("BGZF BC subfield missing")
    cdata_len = bsize - 12 - xlen - 8
    if cdata_len < 0:
        # a corrupt BSIZE smaller than its own header would turn the next
        # read into read(-1) (the whole file) — typed error instead
        raise ValueError("BGZF BSIZE smaller than block header")
    cdata = fh.read(cdata_len)
    crc_isize = fh.read(8)
    if len(cdata) < cdata_len or len(crc_isize) < 8:
        raise ValueError("truncated BGZF block (file cut short?)")
    try:
        data = zlib.decompress(cdata, wbits=-15)
    except zlib.error as exc:
        raise ValueError(f"corrupt BGZF DEFLATE payload: {exc}") from exc
    crc, isize = struct.unpack("<II", crc_isize)
    if len(data) != isize:
        raise ValueError("BGZF ISIZE mismatch")
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("BGZF block CRC mismatch (corrupt data)")
    return data, bsize


def compress_block(data: bytes, level: int = 6) -> bytes:
    """Build one BGZF block from <=64KiB of payload."""
    assert len(data) <= 65536
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = co.compress(data) + co.flush()
    bsize = len(cdata) + 12 + 6 + 8  # header + BC extra + crc/isize
    out = struct.pack("<4BI2BH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, 6)
    out += struct.pack("<2BHH", 0x42, 0x43, 2, bsize - 1)
    out += cdata
    out += struct.pack("<II", zlib.crc32(data) & 0xFFFFFFFF, len(data))
    return out


class BgzfReader:
    """Random-access BGZF reader with virtual-offset seek and a one-block
    cache."""

    def __init__(self, fh: BinaryIO):
        self._fh = fh
        self._block_start = -1      # compressed offset of cached block
        self._block = b""
        self._block_csize = 0
        self._within = 0

    def _load_block(self, coffset: int) -> None:
        if coffset == self._block_start:
            return
        self._fh.seek(coffset)
        data, csize = read_block(self._fh)
        self._block_start = coffset
        self._block = data
        self._block_csize = csize

    def seek_virtual(self, voffset: int) -> None:
        self._load_block(voffset >> 16)
        self._within = voffset & 0xFFFF

    def tell_virtual(self) -> int:
        return (self._block_start << 16) | self._within

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            if self._block_start < 0:
                self._load_block(0)
            if self._within > len(self._block):
                # a virtual offset pointing past the block's payload can only
                # come from an index that does not match this file
                raise ValueError(
                    f"virtual offset {self._within} beyond block payload "
                    f"({len(self._block)} bytes) — stale .bai/.csi index?")
            avail = len(self._block) - self._within
            if avail == 0:
                nxt = self._block_start + self._block_csize
                self._fh.seek(nxt)
                data, csize = read_block(self._fh)
                if not data and csize == 0:
                    break  # EOF
                self._block_start = nxt
                self._block = data
                self._block_csize = csize
                self._within = 0
                if not data:
                    continue  # empty (EOF-marker) block mid-file
                avail = len(data)
            take = min(avail, n)
            out += self._block[self._within:self._within + take]
            self._within += take
            n -= take
        return bytes(out)

    def eof(self) -> bool:
        if self._block_start < 0:
            return False
        if self._within < len(self._block):
            return False
        # peek next block
        nxt = self._block_start + self._block_csize
        self._fh.seek(nxt)
        data, csize = read_block(self._fh)
        if csize == 0:
            return True
        if not data:
            # skip empty blocks (EOF marker has empty payload)
            self._block_start = nxt
            self._block = data
            self._block_csize = csize
            self._within = 0
            return self.eof()
        return False


class BgzfWriter:
    """Streaming BGZF writer that reports virtual offsets for indexing."""

    def __init__(self, fh: BinaryIO, level: int = 6,
                 block_payload: int = 0xFF00):
        self._fh = fh
        self._level = level
        self._buf = bytearray()
        self._coffset = 0
        self._limit = block_payload

    def tell_virtual(self) -> int:
        return (self._coffset << 16) | len(self._buf)

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= self._limit:
            self._flush_block(self._limit)

    def _flush_block(self, n: int) -> None:
        chunk = bytes(self._buf[:n])
        del self._buf[:n]
        block = compress_block(chunk, self._level)
        self._fh.write(block)
        self._coffset += len(block)

    def close(self) -> None:
        if self._buf:
            self._flush_block(len(self._buf))
        self._fh.write(BGZF_EOF)
        self._fh.flush()
