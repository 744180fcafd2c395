"""svio_inflate (io/native/inflate.cc): byte-exactness vs zlib + robustness.

The fast raw-DEFLATE decoder is the hot loop of BAM decode (~80% of
collection time); any error must fall back to zlib, never to wrong bytes.
Covers: stored/fixed/dynamic blocks across compression levels, BGZF blocks
from a BAM produced by io/bamwrite, RLE-heavy quality-score payloads
(dist==1/small-dist match copy), incompressible data, and corrupt input.
"""

import ctypes
import os
import random
import struct
import zlib

import pytest

from svision_tpu.io import native_io

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="libsvio.so not built")


def _lib():
    lib = ctypes.CDLL(native_io._LIB_PATH)
    lib.svio_inflate.restype = ctypes.c_int
    lib.svio_inflate.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                                 ctypes.c_char_p, ctypes.c_int64]
    return lib


def _inflate(lib, cdata: bytes, isize: int):
    inb = ctypes.create_string_buffer(cdata, len(cdata) + 8)   # input slack
    outb = ctypes.create_string_buffer(isize + 32)             # output slack
    rc = lib.svio_inflate(inb, len(cdata), outb, isize)
    return rc, outb.raw[:isize]


def _payloads(rng):
    out = [b"", b"A", b"ACGT" * 16000, bytes([30]) * 65000,
           os.urandom(60000), bytes(rng.choices(b"ACGTN", k=50000)),
           bytes(rng.choices(range(40), k=60000))]
    q = bytearray()   # quality-score shape: runs + noise
    while len(q) < 60000:
        q += bytes([rng.randrange(35, 45)]) * rng.randrange(1, 200)
    out.append(bytes(q))
    for _ in range(40):
        n = rng.randrange(0, 66000)
        kind = rng.randrange(3)
        if kind == 0:
            out.append(os.urandom(n))
        elif kind == 1:
            out.append(bytes(rng.choices(b"ACGT", k=n)))
        else:
            d = bytearray()
            while len(d) < n:
                d += bytes([rng.randrange(256)]) * rng.randrange(1, 300)
            out.append(bytes(d[:n]))
    return out


def test_roundtrip_vs_zlib_all_levels():
    lib = _lib()
    rng = random.Random(0)
    for data in _payloads(rng):
        for level in (0, 1, 4, 6, 9):
            co = zlib.compressobj(level, zlib.DEFLATED, -15)
            cdata = co.compress(data) + co.flush()
            rc, out = _inflate(lib, cdata, len(data))
            assert rc == 0, (len(data), level, rc)
            assert out == data, (len(data), level)


def test_bgzf_blocks_of_real_bam(tmp_path):
    from svision_tpu.io.bamwrite import SamRecord, write_bam
    rng = random.Random(1)
    path = str(tmp_path / "t.bam")
    recs = []
    for i in range(300):
        seq = "".join(rng.choices("ACGT", k=rng.randrange(200, 3000)))
        recs.append(SamRecord(f"r{i}", 0, "chr1", i * 700, 60,
                              f"{len(seq)}M", seq))
    write_bam(path, [("chr1", 1_000_000)], recs)

    lib = _lib()
    data = open(path, "rb").read()
    off, n_blocks = 0, 0
    while off < len(data) - 28:
        xlen = struct.unpack("<H", data[off + 10:off + 12])[0]
        extra = data[off + 12:off + 12 + xlen]
        bsize, p = None, 0
        while p + 4 <= len(extra):
            slen = struct.unpack("<H", extra[p + 2:p + 4])[0]
            if extra[p] == 66 and extra[p + 1] == 67 and slen == 2:
                bsize = struct.unpack("<H", extra[p + 4:p + 6])[0] + 1
            p += 4 + slen
        cdata = data[off + 12 + xlen:off + bsize - 8]
        isize = struct.unpack("<I", data[off + bsize - 4:off + bsize])[0]
        rc, out = _inflate(lib, cdata, isize)
        assert rc == 0
        assert out == zlib.decompress(cdata, -15)
        n_blocks += 1
        off += bsize
    assert n_blocks > 1


def test_crc32_matches_zlib():
    """svio_crc32 (crc32.cc, PCLMUL-folded when available) must equal zlib's
    crc32 for every length/alignment/seed — it gates block acceptance."""
    lib = ctypes.CDLL(native_io._LIB_PATH)
    lib.svio_crc32.restype = ctypes.c_uint32
    lib.svio_crc32.argtypes = [ctypes.c_uint32, ctypes.c_char_p,
                               ctypes.c_size_t]
    rng = random.Random(7)
    lengths = (list(range(0, 80)) +
               [127, 128, 129, 1000, 4096, 65535, 65536, 70000])
    for n in lengths:
        data = os.urandom(n)
        for seed in (0, 1, 0xdeadbeef):
            assert lib.svio_crc32(seed, data, n) == zlib.crc32(data, seed), n
    # unaligned starts exercise the loadu path
    blob = os.urandom(70000)
    for off in range(1, 16):
        sl = blob[off:]
        assert lib.svio_crc32(0, sl, len(sl)) == zlib.crc32(sl)


def test_corrupt_input_never_crashes():
    lib = _lib()
    rng = random.Random(2)
    for _ in range(500):
        cdata = os.urandom(rng.randrange(0, 2000))
        _inflate(lib, cdata, rng.randrange(0, 65536))
    # truncations of a valid stream
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    data = bytes(rng.choices(range(64), k=30000))
    cdata = co.compress(data) + co.flush()
    for cut in range(0, len(cdata), 97):
        rc, _ = _inflate(lib, cdata[:cut], len(data))
        assert rc != 0   # must detect, not fabricate
    # bit flips
    for _ in range(300):
        b = bytearray(cdata)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        rc, out = _inflate(lib, bytes(b), len(data))
        if rc == 0 and out != data:
            # a flip inside literal bytes can legitimately decode; the
            # stream structure must still have been self-consistent
            assert len(out) == len(data)
