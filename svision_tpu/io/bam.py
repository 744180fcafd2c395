"""BAM reader with BAI random access — the engine's htslib replacement.

Decodes BAM records into `svision_tpu.collect.records.Aln` views (hard clips
rewritten to soft, matching the reference's create_align,
collect_signatures.py:91). Region fetch uses the BAI binning + linear index
with htslib overlap semantics (pos < end and endpos > start; endpos = pos+1
for zero-ref-span records).

A compiled fast path (io/native/libsvio.so, ctypes) decodes whole windows into
structure-of-arrays when available; this module is the always-available
reference path and the fallback.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

from svision_tpu.collect.records import Aln
from svision_tpu.io.bgzf import BgzfReader, read_block as bgzf_read_block

SEQ_NT = "=ACMGRSVTWYHKDBN"
CIGAR_OPS = "MIDNSHP=X"
_REF_CONSUME = (1, 0, 1, 1, 0, 0, 0, 1, 1)  # per numeric op MIDNSHP=X


def reg2bins(beg: int, end: int) -> List[int]:
    """All index bins overlapping [beg, end) (SAM spec, 5-level 512Mb) —
    the BAI special case of reg2bins_csi."""
    return reg2bins_csi(beg, end, 14, 5)


def reg2bins_csi(beg: int, end: int, min_shift: int, depth: int) -> List[int]:
    """All CSI bins overlapping [beg, end) for arbitrary (min_shift, depth)
    binning (CSIv1 spec; equals reg2bins at min_shift=14, depth=5)."""
    bins = []
    end -= 1
    s = min_shift + depth * 3
    t = 0
    for level in range(depth + 1):
        bins.extend(range(t + (beg >> s), t + (end >> s) + 1))
        t += 1 << (level * 3)
        s -= 3
    return bins


def _merge_chunks(chunks: List[Tuple[int, int]], min_off: int
                  ) -> List[Tuple[int, int]]:
    kept = [(max(beg, min_off), end) for beg, end in chunks if end > min_off]
    kept.sort()
    merged: List[Tuple[int, int]] = []
    for beg, end in kept:
        if merged and beg <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], end))
        else:
            merged.append((beg, end))
    return merged


class _BaiIndex:
    """Parsed BAI: 5-level 512 Mb binning + 16 kb linear index."""

    def __init__(self, bins_per_ref, linear_per_ref, stats_per_ref):
        self.bins_per_ref = bins_per_ref
        self.linear_per_ref = linear_per_ref
        self.stats_per_ref = stats_per_ref

    def chunks_for(self, tid: int, start: int, stop: int
                   ) -> List[Tuple[int, int]]:
        if tid >= len(self.bins_per_ref):
            # a truncated/corrupt index with fewer references than the BAM
            # header must not silently read as "no reads on this contig"
            raise ValueError(
                f"BAI index covers {len(self.bins_per_ref)} references; "
                f"BAM asks for tid {tid} — corrupt or mismatched index")
        bins = self.bins_per_ref[tid]
        linear = self.linear_per_ref[tid]
        min_off = 0
        win = start >> 14
        if linear:
            if win >= len(linear):
                win = len(linear) - 1
            min_off = linear[win] if win >= 0 else 0
        chunks = []
        for b in reg2bins(start, stop):
            chunks.extend(bins.get(b, ()))
        return _merge_chunks(chunks, min_off)

    def stats(self, tid: int):
        """(mapped, unmapped) from the pseudo-bin, (-1,-1) if the ref has
        bins but no pseudo-bin, None if the ref is absent from the index."""
        if self.stats_per_ref[tid] is not None:
            return self.stats_per_ref[tid]
        if self.bins_per_ref[tid]:
            return (-1, -1)
        return None


class _CsiIndex:
    """Parsed CSI v1: (min_shift, depth)-parameterized binning; per-bin
    loffset replaces the BAI linear index (climb to the first existing
    ancestor of the leaf bin containing `start`, htslib semantics)."""

    def __init__(self, min_shift, depth, bins_per_ref, loff_per_ref,
                 stats_per_ref):
        self.min_shift = min_shift
        self.depth = depth
        self.bins_per_ref = bins_per_ref    # [ {bin: [(beg,end),...]} ]
        self.loff_per_ref = loff_per_ref    # [ {bin: loffset} ]
        self.stats_per_ref = stats_per_ref

    def chunks_for(self, tid: int, start: int, stop: int
                   ) -> List[Tuple[int, int]]:
        if tid >= len(self.bins_per_ref):
            raise ValueError(
                f"CSI index covers {len(self.bins_per_ref)} references; "
                f"BAM asks for tid {tid} — corrupt or mismatched index")
        bins = self.bins_per_ref[tid]
        loff = self.loff_per_ref[tid]
        # leaf bin containing `start`, then climb parents until one exists
        t = sum(1 << (l * 3) for l in range(self.depth))
        b = t + (start >> self.min_shift)
        min_off = 0
        while True:
            if b in loff:
                min_off = loff[b]
                break
            if b == 0:
                break
            b = (b - 1) >> 3
        chunks = []
        for b in reg2bins_csi(start, stop, self.min_shift, self.depth):
            chunks.extend(bins.get(b, ()))
        return _merge_chunks(chunks, min_off)

    def stats(self, tid: int):
        if self.stats_per_ref[tid] is not None:
            return self.stats_per_ref[tid]
        if self.bins_per_ref[tid]:
            return (-1, -1)
        return None


class BamRecordRaw:
    """Lazily-decoded BAM record (raw buffer + header-parsed fixed fields)."""

    __slots__ = ("buf", "refid", "pos", "mapq", "flag", "n_cigar", "l_seq",
                 "l_read_name", "bin")

    def __init__(self, buf: bytes):
        self.buf = buf
        (self.refid, self.pos, self.l_read_name, self.mapq, self.bin,
         self.n_cigar, self.flag, self.l_seq) = struct.unpack_from(
             "<iiBBHHHi", buf, 0)

    @property
    def qname(self) -> str:
        return self.buf[32:32 + self.l_read_name - 1].decode("ascii")

    def cigar_raw(self) -> List[Tuple[int, int]]:
        off = 32 + self.l_read_name
        out = []
        for v in struct.unpack_from(f"<{self.n_cigar}I", self.buf, off):
            out.append((v & 0xF, v >> 4))
        # long-CIGAR records (>65535 ops) store a placeholder kSmN cigar and
        # the real ops in the CG:B,I aux tag (SAM spec §4.2.2)
        if (len(out) == 2 and out[0][0] == 4 and out[0][1] == self.l_seq
                and out[1][0] == 3):
            cg = self._cg_ops()
            if cg is not None:
                return [(v & 0xF, v >> 4) for v in cg]
        return out

    def _cg_ops(self) -> Optional[List[int]]:
        """Raw uint32 ops from the CG:B,I aux tag, or None."""
        buf = self.buf
        off = (32 + self.l_read_name + 4 * self.n_cigar
               + (self.l_seq + 1) // 2 + self.l_seq)
        n = len(buf)
        sizes = {"c": 1, "C": 1, "s": 2, "S": 2, "i": 4, "I": 4, "f": 4}
        while off + 3 <= n:
            tag = buf[off:off + 2]
            typ = chr(buf[off + 2])
            off += 3
            if typ == "B":
                sub = chr(buf[off])
                cnt = struct.unpack_from("<i", buf, off + 1)[0]
                data_off = off + 5
                # file-supplied count: reject negative/oversized values
                if cnt < 0 or data_off + cnt * sizes.get(sub, 1) > n:
                    return None
                if tag == b"CG" and sub == "I":
                    return list(struct.unpack_from(f"<{cnt}I", buf, data_off))
                off = data_off + cnt * sizes.get(sub, 1)
            elif typ in "AcC":
                off += 1
            elif typ in "sS":
                off += 2
            elif typ in "iIf":
                off += 4
            elif typ in "ZH":
                end = buf.find(b"\x00", off)
                if end < 0:
                    return None
                off = end + 1
            else:
                return None
        return None

    def ref_span(self) -> int:
        return sum(ln for op, ln in self.cigar_raw() if _REF_CONSUME[op])

    def end_pos(self) -> int:
        span = self.ref_span()
        return self.pos + (span if span > 0 else 1)

    def seq(self) -> Optional[str]:
        if self.l_seq == 0:
            return None
        off = 32 + self.l_read_name + 4 * self.n_cigar
        packed = self.buf[off:off + (self.l_seq + 1) // 2]
        chars = []
        for b in packed:
            chars.append(SEQ_NT[b >> 4])
            chars.append(SEQ_NT[b & 0xF])
        return "".join(chars[:self.l_seq])

    def to_aln(self, reference_name: str) -> Aln:
        cigar = [("S" if CIGAR_OPS[op] == "H" else CIGAR_OPS[op], ln)
                 for op, ln in self.cigar_raw()]
        return Aln(
            query_name=self.qname,
            reference_name=reference_name,
            reference_id=self.refid,
            reference_start=self.pos,
            flag=self.flag,
            mapping_quality=self.mapq,
            cigar=cigar,
            query_sequence=self.seq(),
        )


# parsed BAI/CSI indexes shared across BamReader instances in one process
# (see BamReader._load_index); bounded FIFO, content-keyed (path, crc32, size)
import threading as _threading
_INDEX_CACHE: Dict = {}
_INDEX_CACHE_LOCK = _threading.Lock()


class BamReader:
    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "rb")
        self._bgzf = BgzfReader(self._fh)
        magic = self._bgzf.read(4)
        if magic != b"BAM\x01":
            raise ValueError(f"{path}: not a BAM file")
        l_text = struct.unpack("<i", self._bgzf.read(4))[0]
        self.header_text = self._bgzf.read(l_text).decode("ascii", "replace")
        n_ref = struct.unpack("<i", self._bgzf.read(4))[0]
        self.references: List[str] = []
        self.lengths: List[int] = []
        for _ in range(n_ref):
            l_name = struct.unpack("<i", self._bgzf.read(4))[0]
            name = self._bgzf.read(l_name)[:-1].decode("ascii")
            l_ref = struct.unpack("<i", self._bgzf.read(4))[0]
            self.references.append(name)
            self.lengths.append(l_ref)
        self._body_voffset = self._bgzf.tell_virtual()
        self._index = None
        self._tid: Dict[str, int] = {n: i for i, n in enumerate(self.references)}

    # -- header helpers ------------------------------------------------------
    @property
    def header(self) -> Dict:
        """Parsed @HD/@SQ lines ({'HD': {...}, ...}), pysam-header-like."""
        out: Dict = {}
        for line in self.header_text.splitlines():
            if line.startswith("@HD"):
                out["HD"] = dict(f.split(":", 1) for f in line.split("\t")[1:]
                                 if ":" in f)
        return out

    def get_tid(self, name: str) -> int:
        return self._tid.get(name, -1)

    def get_reference_length(self, name: str) -> int:
        return self.lengths[self._tid[name]]

    # -- index ---------------------------------------------------------------
    def _load_index(self):
        if self._index is not None:
            return self._index
        base = os.path.splitext(self.path)[0]
        # htslib order: .csi preferred over .bai when both exist
        for cand, reader in ((self.path + ".csi", _read_csi),
                             (base + ".csi", _read_csi),
                             (self.path + ".bai", _read_bai),
                             (base + ".bai", _read_bai)):
            if os.path.exists(cand):
                # process-wide parsed-index cache: a long-lived collection
                # worker opens the same BAM once per WINDOW, and a
                # whole-genome index parses in ~0.7 s — 322 windows paid
                # ~110 s of the round-4 WGS collect wall before this.
                # Keyed by the file CONTENT (crc32, ~5 ms on a 9 MB index
                # vs the 0.7 s parse) so a same-size rewrite within the
                # filesystem's timestamp granularity can never serve a
                # stale index; parsed indexes are read-only after load.
                with open(cand, "rb") as fh:
                    raw = fh.read()
                import zlib
                key = (os.path.abspath(cand), zlib.crc32(raw), len(raw))
                with _INDEX_CACHE_LOCK:
                    idx = _INDEX_CACHE.get(key)
                if idx is None:
                    idx = reader(cand, raw)
                    with _INDEX_CACHE_LOCK:
                        if len(_INDEX_CACHE) >= 8:  # a run touches 1-2 BAMs
                            _INDEX_CACHE.pop(next(iter(_INDEX_CACHE)))
                        _INDEX_CACHE[key] = idx
                self._index = idx
                return self._index
        self._index = False
        return self._index

    def has_index(self) -> bool:
        return bool(self._load_index())

    def check_index(self) -> bool:
        if not self.has_index():
            raise ValueError("missing index")
        return True

    def get_index_statistics(self):
        """[(name, mapped, unmapped)] from index pseudo-bins; refs with any
        index bins but no pseudo-bin report mapped=-1 (present, uncounted)."""
        idx = self._load_index()
        out = []
        if not idx:
            return out
        for i, name in enumerate(self.references):
            st = idx.stats(i)
            if st is not None:
                out.append((name, st[0], st[1]))
        return out

    # -- record iteration ----------------------------------------------------
    def _read_record(self) -> Optional[BamRecordRaw]:
        szb = self._bgzf.read(4)
        if len(szb) < 4:
            return None
        size = struct.unpack("<i", szb)[0]
        buf = self._bgzf.read(size)
        if len(buf) < size:
            return None
        return BamRecordRaw(buf)

    def __iter__(self) -> Iterator[BamRecordRaw]:
        self._bgzf.seek_virtual(self._body_voffset)
        while True:
            rec = self._read_record()
            if rec is None:
                return
            yield rec

    def fetch_raw(self, contig: str, start: int = 0, stop: int = None
                  ) -> Iterator[BamRecordRaw]:
        """Raw records overlapping [start, stop) on contig."""
        tid = self._tid[contig]
        if stop is None:
            stop = self.lengths[tid]
        start, stop = int(start), int(stop)
        idx = self._load_index()
        if idx:
            yield from self._fetch_indexed(tid, start, stop, idx)
        else:
            for rec in self:
                if rec.refid != tid:
                    continue
                if rec.pos >= stop:
                    continue
                if rec.end_pos() <= start:
                    continue
                yield rec

    def _chunks_for(self, tid: int, start: int, stop: int, idx
                    ) -> List[Tuple[int, int]]:
        return idx.chunks_for(tid, start, stop)

    def _fetch_indexed(self, tid, start, stop, idx):
        for beg, end in self._chunks_for(tid, start, stop, idx):
            self._bgzf.seek_virtual(beg)
            while self._bgzf.tell_virtual() < end:
                rec = self._read_record()
                if rec is None:
                    break
                if rec.refid != tid or rec.pos >= stop:
                    break
                if rec.end_pos() <= start:
                    continue
                yield rec

    # -- native fast path ------------------------------------------------
    def _native_args(self, contig: str, start: int, stop: int):
        from svision_tpu.io import native_io
        if not native_io.available():
            return None
        tid = self._tid[contig]
        if stop is None:
            stop = self.lengths[tid]
        idx = self._load_index()
        if idx:
            chunks = self._chunks_for(tid, int(start), int(stop), idx)
            if not chunks:
                return native_io, [], tid, int(start), int(stop), 0, True
            voffset0 = 0
        else:
            chunks = []
            voffset0 = self._body_voffset
        return native_io, chunks, tid, int(start), int(stop), voffset0, False

    def fetch_batch(self, contig: str, start: int = 0, stop: int = None,
                    decode_seq="packed", threads=None):
        """Native structure-of-arrays fetch (None if lib unavailable).

        decode_seq defaults to "packed": the C++ scan memcpys the raw 4-bit
        sequence bytes (half the traffic, no expand loop) and
        NativeBatch.seq decodes lazily — only for records that survive the
        clean-read prefilter. True = legacy ASCII, False = no sequences.
        threads overrides the inflate worker count (native_io.fetch)."""
        args = self._native_args(contig, start, stop)
        if args is None:
            return None
        native_io, chunks, tid, start, stop, voffset0, empty = args
        if empty:
            return native_io.empty_batch()
        return native_io.fetch(self.path, chunks, tid, start, stop,
                               count_only=False, decode_seq=decode_seq,
                               voffset0=voffset0, threads=threads)

    def fetch_batch_at(self, contig: str, voffsets, start: int = 0,
                       stop: int = None, decode_seq="packed", threads=None,
                       merge_gap: int = 1 << 16):
        """Native fetch of the records starting at the given BGZF virtual
        offsets (from a previous batch's .voffset), merged into chunk
        ranges so nearby records share one seek+inflate. The region filter
        (contig, start, stop) still applies; records BETWEEN two merged
        voffsets are also returned — callers re-apply their selection mask.
        None if the lib (or its voffset ABI) is unavailable."""
        from svision_tpu.io import native_io
        if not native_io.available() or not native_io._load()._has_voffset:
            return None
        tid = self._tid[contig]
        if stop is None:
            stop = self.lengths[tid]
        import numpy as np
        v = np.sort(np.asarray(voffsets, np.uint64))
        if v.size == 0:
            return native_io.empty_batch()
        chunks = []
        cb = ce = int(v[0])
        for x in v[1:].tolist():
            if (x >> 16) - (ce >> 16) <= merge_gap:
                ce = x
            else:
                chunks.append((cb, ce + 1))
                cb = ce = x
        chunks.append((cb, ce + 1))
        return native_io.fetch(self.path, chunks, tid, int(start), int(stop),
                               count_only=False, decode_seq=decode_seq,
                               threads=threads)

    def fetch(self, contig: str, start: int = 0, stop: int = None,
              decode_seq="packed") -> Iterator[Aln]:
        """decode_seq=False skips sequence decode on the native path
        (callers that only need positions/CIGARs/flags — e.g. the
        genotyper's ref-read scan); the pure-Python fallback always
        carries sequences."""
        name_cache = self.references
        batch = self.fetch_batch(contig, start, stop, decode_seq=decode_seq)
        if batch is not None:
            yield from _batch_to_alns(batch, name_cache)
            return
        for rec in self.fetch_raw(contig, start, stop):
            ref_name = name_cache[rec.refid] if rec.refid >= 0 else "*"
            yield rec.to_aln(ref_name)

    def count_overlapping(self, contig: str, start: int, stop: int) -> int:
        """len(list(fetch(...))) without decoding — Cluster coverage counting
        (classes.py:165-170 semantics)."""
        args = self._native_args(contig, start, stop)
        if args is not None:
            native_io, chunks, tid, start, stop, voffset0, empty = args
            if empty:
                return 0
            return native_io.fetch(self.path, chunks, tid, start, stop,
                                   count_only=True, voffset0=voffset0)
        return sum(1 for _ in self.fetch_raw(contig, start, stop))

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _batch_to_alns(batch, names: List[str], indices=None) -> Iterator[Aln]:
    """Native SoA batch -> Aln views (H->S rewrite applied). `indices`
    restricts decoding to a subset of records (collect/prefilter.py).
    Sequences for the whole selection are decoded in one vectorized pass
    (native_io.decode_seqs) and Alns built by the fused single-loop
    constructor (records.aln_from_ops)."""
    from svision_tpu.collect.records import aln_from_ops, batch_derived
    from svision_tpu.io.native_io import decode_seqs
    idx = list(range(batch.n)) if indices is None else [int(i) for i in indices]
    seqs = decode_seqs(batch, idx)
    pos, flag, mapq, refid = batch.pos, batch.flag, batch.mapq, batch.refid
    ops_list, ref_len, q_len, lead, tail = batch_derived(
        batch.cigar_buf, batch.cigar_off, idx)
    rl, ql, ld, tl = (ref_len.tolist(), q_len.tolist(), lead.tolist(),
                      tail.tolist())
    for k, i in enumerate(idx):
        rid = int(refid[i])
        yield aln_from_ops(
            batch.qname(i),
            names[rid] if rid >= 0 else "*",
            rid,
            int(pos[i]),
            int(flag[i]),
            int(mapq[i]),
            ops_list[k],
            seqs[k],
            _derived=(rl[k], ql[k], ld[k], tl[k]),
        )


def _read_bai(path: str, raw: bytes = None) -> _BaiIndex:
    """Parse a BAI file into a _BaiIndex."""
    if raw is not None:
        data = raw
    else:
        with open(path, "rb") as fh:
            data = fh.read()
    if data[:4] != b"BAI\x01":
        raise ValueError(f"{path}: not a BAI index")
    try:
        return _parse_bai(data)
    except struct.error as exc:    # truncated / corrupt counts
        raise ValueError(f"{path}: corrupt BAI index: {exc}") from exc


def _parse_bai(data: bytes) -> _BaiIndex:
    off = 4
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    bins_per_ref = []
    linear_per_ref = []
    stats_per_ref = []
    for _ in range(n_ref):
        n_bin = struct.unpack_from("<i", data, off)[0]
        off += 4
        bins: Dict[int, List[Tuple[int, int]]] = {}
        stats = None
        for _ in range(n_bin):
            bin_no, n_chunk = struct.unpack_from("<Ii", data, off)
            off += 8
            chunks = []
            for _ in range(n_chunk):
                beg, end = struct.unpack_from("<QQ", data, off)
                off += 16
                chunks.append((beg, end))
            if bin_no == 37450 and len(chunks) == 2:  # pseudo-bin metadata
                stats = (chunks[1][0], chunks[1][1])  # mapped, unmapped
            else:
                bins[bin_no] = chunks
        n_intv = struct.unpack_from("<i", data, off)[0]
        off += 4
        linear = list(struct.unpack_from(f"<{n_intv}Q", data, off))
        off += 8 * n_intv
        bins_per_ref.append(bins)
        linear_per_ref.append(linear)
        stats_per_ref.append(stats)
    return _BaiIndex(bins_per_ref, linear_per_ref, stats_per_ref)


def _read_csi(path: str, raw: bytes = None) -> _CsiIndex:
    """Parse a CSI v1 file (BGZF-compressed) into a _CsiIndex."""
    import io as _io
    parts = []
    with (_io.BytesIO(raw) if raw is not None
          else open(path, "rb")) as fh:
        while True:
            block, csize = bgzf_read_block(fh)
            if csize == 0:
                break
            parts.append(block)
    data = b"".join(parts)
    if data[:4] != b"CSI\x01":
        raise ValueError(f"{path}: not a CSI index")
    try:
        return _parse_csi(data)
    except struct.error as exc:    # truncated / corrupt counts
        raise ValueError(f"{path}: corrupt CSI index: {exc}") from exc


def _parse_csi(data: bytes) -> _CsiIndex:
    min_shift, depth, l_aux = struct.unpack_from("<iii", data, 4)
    off = 16 + l_aux
    n_ref = struct.unpack_from("<i", data, off)[0]
    off += 4
    # pseudo-bin number for (min_shift, depth) binning: max_bin + 1
    pseudo = ((1 << ((depth + 1) * 3)) - 1) // 7 + 1
    bins_per_ref = []
    loff_per_ref = []
    stats_per_ref = []
    for _ in range(n_ref):
        n_bin = struct.unpack_from("<i", data, off)[0]
        off += 4
        bins: Dict[int, List[Tuple[int, int]]] = {}
        loffs: Dict[int, int] = {}
        stats = None
        for _ in range(n_bin):
            bin_no, loffset, n_chunk = struct.unpack_from("<IQi", data, off)
            off += 16
            chunks = []
            for _ in range(n_chunk):
                beg, end = struct.unpack_from("<QQ", data, off)
                off += 16
                chunks.append((beg, end))
            if bin_no == pseudo and len(chunks) == 2:  # pseudo-bin metadata
                stats = (chunks[1][0], chunks[1][1])   # mapped, unmapped
            else:
                bins[bin_no] = chunks
                loffs[bin_no] = loffset
        bins_per_ref.append(bins)
        loff_per_ref.append(loffs)
        stats_per_ref.append(stats)
    return _CsiIndex(min_shift, depth, bins_per_ref, loff_per_ref,
                     stats_per_ref)
