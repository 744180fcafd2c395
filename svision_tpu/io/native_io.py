"""ctypes bridge to the native BAM decoder (io/native/libsvio.so).

Falls back gracefully: `available()` is False when the library has not been
built, and BamReader keeps using the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libsvio.so")
_lib = None
_load_failed = False

# must match svio_abi_version() in svio.cc; bump both together
_EXPECTED_ABI = 3


def _abi_of(lib) -> int:
    """Compiled ABI of a loaded library (1 = predates the version export)."""
    try:
        fn = lib.svio_abi_version
    except AttributeError:
        return 1
    fn.restype = ctypes.c_int
    fn.argtypes = []
    return int(fn())


def ensure_built(quiet: bool = True, force: bool = False) -> bool:
    """Build libsvio.so if missing or older than its sources."""
    if os.path.exists(_LIB_PATH) and not force:
        lib_mtime = os.path.getmtime(_LIB_PATH)
        srcs = [os.path.join(_NATIVE_DIR, f)
                for f in ("svio.cc", "inflate.cc", "crc32.cc")]
        if all(os.path.getmtime(s) <= lib_mtime
               for s in srcs if os.path.exists(s)):
            return True
    try:
        cmd = ["make", "-C", _NATIVE_DIR] + (["-B"] if force else [])
        subprocess.run(cmd, capture_output=quiet, check=True)
    except Exception:
        return os.path.exists(_LIB_PATH)
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # Not a permanent failure: the lib may be built later (ensure_built).
        return None
    # a checkout update can leave a stale .so next to newer sources; rebuild
    # before binding so new accessors (e.g. svio_voffset) resolve
    srcs = [os.path.join(_NATIVE_DIR, f) for f in ("svio.cc", "inflate.cc", "crc32.cc")]
    if any(os.path.exists(s)
           and os.path.getmtime(s) > os.path.getmtime(_LIB_PATH)
           for s in srcs):
        ensure_built()
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    # mtime checks can't catch a prebuilt/copied .so newer than the sources:
    # bind only when the compiled ABI matches what this loader expects, and
    # give a stale binary exactly one rebuild before refusing it
    if _abi_of(lib) != _EXPECTED_ABI:
        if ensure_built(quiet=True, force=True):
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                _load_failed = True
                return None
        if _abi_of(lib) != _EXPECTED_ABI:
            _load_failed = True
            return None
    lib.svio_fetch.restype = ctypes.c_void_p
    lib.svio_fetch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int]
    lib.svio_result_count.restype = ctypes.c_int64
    lib.svio_result_count.argtypes = [ctypes.c_void_p]
    lib.svio_result_error.restype = ctypes.c_int
    lib.svio_result_error.argtypes = [ctypes.c_void_p]
    for name, ctype in [
            ("svio_refid", ctypes.POINTER(ctypes.c_int32)),
            ("svio_pos", ctypes.POINTER(ctypes.c_int32)),
            ("svio_endpos", ctypes.POINTER(ctypes.c_int32)),
            ("svio_flag", ctypes.POINTER(ctypes.c_uint16)),
            ("svio_mapq", ctypes.POINTER(ctypes.c_uint8)),
            ("svio_qname_off", ctypes.POINTER(ctypes.c_int64)),
            ("svio_qname_buf", ctypes.POINTER(ctypes.c_char)),
            ("svio_cigar_off", ctypes.POINTER(ctypes.c_int64)),
            ("svio_cigar_buf", ctypes.POINTER(ctypes.c_uint32)),
            ("svio_seq_off", ctypes.POINTER(ctypes.c_int64)),
            ("svio_seq_buf", ctypes.POINTER(ctypes.c_char)),
            ("svio_seq_len", ctypes.POINTER(ctypes.c_int32))]:
        fn = getattr(lib, name)
        fn.restype = ctype
        fn.argtypes = [ctypes.c_void_p]
    for name in ("svio_qname_buf_len", "svio_cigar_buf_len", "svio_seq_buf_len"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
        fn.argtypes = [ctypes.c_void_p]
    try:                       # ABI >= 2 (prebuilt v1 libs: no voffsets)
        lib.svio_voffset.restype = ctypes.POINTER(ctypes.c_uint64)
        lib.svio_voffset.argtypes = [ctypes.c_void_p]
        lib._has_voffset = True
    except AttributeError:
        lib._has_voffset = False
    try:                       # ABI >= 3: scan-time prefilter features
        lib.svio_sig_hash.restype = ctypes.POINTER(ctypes.c_uint64)
        lib.svio_sig_hash.argtypes = [ctypes.c_void_p]
        lib.svio_max_indel.restype = ctypes.POINTER(ctypes.c_int32)
        lib.svio_max_indel.argtypes = [ctypes.c_void_p]
        lib._has_features = True
    except AttributeError:
        lib._has_features = False
    lib.svio_result_free.restype = None
    lib.svio_result_free.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


_autobuild_tried = False


def available() -> bool:
    """True when libsvio.so is loadable. On the first miss, try ONE in-place
    `make -C io/native` (clean checkouts / pip installs on a machine with a
    toolchain get the fast path without a manual build step; machines without
    g++ silently stay on the pure-Python BGZF path)."""
    global _autobuild_tried
    if _load() is not None:
        return True
    if not _autobuild_tried and not _load_failed:
        _autobuild_tried = True
        if ensure_built():
            return _load() is not None
    return False


def decode_threads() -> int:
    """Inflate worker threads per fetch. SVIO_THREADS overrides; the default
    leaves cores for the window-level process pool: serial on <=2-core
    hosts (block-parallel inflate would only contend with the collection
    workers there), up to 4 workers on bigger machines."""
    env = os.environ.get("SVIO_THREADS")
    if env is not None:
        try:
            return max(1, int(env))
        except ValueError:
            return 1
    n = os.cpu_count() or 1
    return 1 if n <= 2 else min(4, n // 2)


# BAM 4-bit base codes -> ASCII (SAM spec "=ACMGRSVTWYHKDBN")
_NT16 = np.frombuffer(b"=ACMGRSVTWYHKDBN", np.uint8)


class _ResultHandle:
    """Owns a SvioResult*: keeps the C++ buffers alive for the numpy views
    wrapping them and frees exactly once."""

    __slots__ = ("_lib", "_ptr")

    def __init__(self, lib, ptr):
        self._lib = lib
        self._ptr = ptr

    def __del__(self):
        if self._ptr:
            self._lib.svio_result_free(self._ptr)
            self._ptr = None


class NativeBatch:
    """One fetch's structure-of-arrays: numpy views over the native result
    buffers (zero-copy; `_res` pins their lifetime)."""

    __slots__ = ("n", "refid", "pos", "endpos", "flag", "mapq",
                 "qname_off", "qname_buf", "cigar_off", "cigar_buf",
                 "seq_off", "seq_buf", "seq_len", "packed", "voffset",
                 "sig_hash", "max_indel", "_res")

    def qname(self, i: int) -> str:
        return self.qname_buf[self.qname_off[i]:self.qname_off[i + 1]].decode()

    def cigar_ops(self, i: int) -> np.ndarray:
        return self.cigar_buf[self.cigar_off[i]:self.cigar_off[i + 1]]

    def seq(self, i: int) -> Optional[str]:
        lo, hi = self.seq_off[i], self.seq_off[i + 1]
        if hi == lo:
            return None
        if not getattr(self, "packed", False):
            chunk = self.seq_buf[lo:hi]
            if isinstance(chunk, np.ndarray):
                return chunk.tobytes().decode()
            return chunk.decode()
        # packed mode: raw nibble pairs, decoded here only for records the
        # prefilter kept — the C++ scan never pays the expand loop
        pk = np.frombuffer(self.seq_buf, np.uint8, count=hi - lo, offset=lo)
        out = np.empty(pk.size * 2, np.uint8)
        out[0::2] = _NT16[pk >> 4]
        out[1::2] = _NT16[pk & 0xF]
        return out[:self.seq_len[i]].tobytes().decode()


def decode_seqs(batch: NativeBatch, indices) -> list:
    """Sequences for the given record indices as one vectorized pass.

    Equivalent to [batch.seq(i) for i in indices] but gathers every kept
    record's packed bytes first and runs a single nibble-expand over the
    concatenation — per-record numpy-call overhead was ~60% of Aln
    construction time in a 30x window (io/bam.py _batch_to_alns)."""
    if not getattr(batch, "packed", False):
        return [batch.seq(i) for i in indices]
    off = batch.seq_off
    sl = batch.seq_len
    parts = []
    counts = []
    for i in indices:
        lo, hi = off[i], off[i + 1]
        parts.append(batch.seq_buf[lo:hi])
        counts.append(hi - lo)
    if not parts:
        return []
    packed = np.concatenate(parts)
    ascii_all = np.empty(packed.size * 2, np.uint8)
    ascii_all[0::2] = _NT16[packed >> 4]
    ascii_all[1::2] = _NT16[packed & 0xF]
    blob = ascii_all.tobytes()
    out = []
    pos = 0
    for i, cnt in zip(indices, counts):
        if cnt == 0:
            out.append(None)
            continue
        out.append(blob[pos:pos + int(sl[i])])
        pos += int(cnt) * 2
    return [s.decode() if isinstance(s, bytes) else s for s in out]


def empty_batch() -> NativeBatch:
    """A fully-populated zero-record batch (every array present, so
    consumers that read .pos/.flag/... before checking .n still work —
    e.g. a coverage-gap window with an index but no overlapping chunks)."""
    b = NativeBatch()
    b.n = 0
    b.refid = np.zeros(0, np.int32)
    b.pos = np.zeros(0, np.int32)
    b.endpos = np.zeros(0, np.int32)
    b.flag = np.zeros(0, np.uint16)
    b.mapq = np.zeros(0, np.uint8)
    b.qname_off = np.zeros(1, np.int64)
    b.cigar_off = np.zeros(1, np.int64)
    b.seq_off = np.zeros(1, np.int64)
    b.qname_buf = b""
    b.cigar_buf = np.zeros(0, np.uint32)
    b.seq_buf = b""
    b.packed = False
    b.seq_len = np.zeros(0, np.int32)
    b.voffset = np.zeros(0, np.uint64)
    b.sig_hash = np.zeros(0, np.uint64)
    b.max_indel = np.zeros(0, np.int32)
    return b


def fetch(bam_path: str, chunks: List[Tuple[int, int]], tid: int,
          start: int, end: int, count_only: bool = False,
          decode_seq=True, voffset0: int = 0,
          threads: Optional[int] = None):
    """Run the native fetch; returns record count (count_only) or NativeBatch.

    decode_seq: False/0 = none, True/1 = ASCII, "packed"/2 = raw nibbles
    decoded lazily by NativeBatch.seq. With an empty chunk list, scans
    forward from voffset0 (the body start) filtering by region — the
    no-index fallback. threads overrides decode_threads() for callers that
    own the whole machine (giant-window streaming)."""
    lib = _load()
    assert lib is not None
    seq_mode = 2 if decode_seq == "packed" else int(bool(decode_seq))
    n = len(chunks)
    beg = (ctypes.c_uint64 * n)(*[c[0] for c in chunks]) if n else None
    endv = (ctypes.c_uint64 * n)(*[c[1] for c in chunks]) if n else None
    res = lib.svio_fetch(bam_path.encode(), beg, endv, n, voffset0, tid,
                         start, end, int(count_only), seq_mode,
                         decode_threads() if threads is None
                         else max(1, threads))
    if not res:
        raise OSError(f"svio_fetch failed for {bam_path}")
    if lib.svio_result_error(res):
        lib.svio_result_free(res)
        raise OSError(f"{bam_path}: corrupt or truncated BGZF/BAM data "
                      "(CRC mismatch, partial block, or record cut short)")
    count = lib.svio_result_count(res)
    if count_only:
        lib.svio_result_free(res)
        return int(count)
    b = NativeBatch()
    b.n = int(count)
    # The batch wraps the C++ buffers zero-copy: views stay valid for the
    # batch's lifetime and the native result is freed by the finalizer.
    # Consumers never leak views past the batch (Aln construction copies
    # into Python objects, bam.py:_batch_to_alns).
    b._res = _ResultHandle(lib, res)
    def arr(fn, length, dtype):
        if length == 0:
            return np.zeros(0, dtype)
        ptr = fn(res)
        return np.ctypeslib.as_array(
            ctypes.cast(ptr, ctypes.POINTER(ctypes.c_uint8)),
            shape=(length * np.dtype(dtype).itemsize,)).view(dtype)
    b.refid = arr(lib.svio_refid, b.n, np.int32)
    b.pos = arr(lib.svio_pos, b.n, np.int32)
    b.endpos = arr(lib.svio_endpos, b.n, np.int32)
    b.flag = arr(lib.svio_flag, b.n, np.uint16)
    b.mapq = arr(lib.svio_mapq, b.n, np.uint8)
    b.qname_off = arr(lib.svio_qname_off, b.n + 1, np.int64)
    b.cigar_off = arr(lib.svio_cigar_off, b.n + 1, np.int64)
    b.seq_off = arr(lib.svio_seq_off, b.n + 1, np.int64)
    qlen = lib.svio_qname_buf_len(res)
    # qnames stay a bytes copy (small; sliced + .decode()d per record)
    b.qname_buf = ctypes.string_at(lib.svio_qname_buf(res), qlen) if qlen else b""
    clen = lib.svio_cigar_buf_len(res)
    b.cigar_buf = arr(lib.svio_cigar_buf, int(clen), np.uint32) if clen else np.zeros(0, np.uint32)
    slen = int(lib.svio_seq_buf_len(res))
    b.seq_buf = (arr(lib.svio_seq_buf, slen, np.uint8) if slen
                 else np.zeros(0, np.uint8))
    b.packed = seq_mode == 2
    b.seq_len = (arr(lib.svio_seq_len, b.n, np.int32) if seq_mode == 2
                 else None)
    b.voffset = (arr(lib.svio_voffset, b.n, np.uint64)
                 if lib._has_voffset else None)
    b.sig_hash = (arr(lib.svio_sig_hash, b.n, np.uint64)
                  if lib._has_features else None)
    b.max_indel = (arr(lib.svio_max_indel, b.n, np.int32)
                   if lib._has_features else None)
    return b
