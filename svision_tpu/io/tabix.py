"""bgzip + tabix (.tbi) for VCF output — first-party, no htslib.

The reference leaves its VCF uncompressed; every real-world consumer
(bcftools, IGV, truvari) wants `bgzip file.vcf && tabix -p vcf file.vcf.gz`.
This module produces both artifacts from the from-scratch BGZF stack:
`bgzip_vcf` streams the text through BgzfWriter recording each record's
virtual-offset span, builds the TBI index (BAI-style 14/5 binning + 16 kb
linear index, little-endian layout per the tabix spec), and writes it
BGZF-compressed. `TabixFile` is the matching reader (used by tests and any
downstream tooling): reg2bins + linear index over the .tbi, record overlap
by the VCF rule htslib's tbx_parse1 applies — end = POS-1+len(REF), or
INFO END= when present.
"""

from __future__ import annotations

import os
import struct
from typing import Dict, Iterator, List, Optional, Tuple

from svision_tpu.io.bamwrite import _reg2bin
from svision_tpu.io.bgzf import BgzfReader, BgzfWriter

# level start offsets for the TBI 5-level / 14-bit binning:
# ofs(l) = ((1 << 3l) - 1) / 7
_BIN_OFS = tuple(((1 << (3 * l)) - 1) // 7 for l in range(6))


def _bin_interval(b: int) -> Tuple[int, int]:
    """[beg, end) genomic interval covered by TBI bin number `b`
    (SAM spec §5.3 binning, min_shift=14, depth=5)."""
    for lvl in range(5, -1, -1):
        if b >= _BIN_OFS[lvl]:
            shift = 14 + 3 * (5 - lvl)
            beg = (b - _BIN_OFS[lvl]) << shift
            return beg, beg + (1 << shift)
    return 0, 1 << 29

_TBI_MAGIC = b"TBI\x01"
_VCF_PRESET = (2, 1, 2, 0, ord("#"), 0)   # format, col_seq, col_beg, col_end, meta, skip


def _vcf_span(fields: List[str]) -> Tuple[int, int]:
    """0-based half-open [beg, end) of one VCF record (htslib tbx semantics:
    POS + len(REF), widened by INFO END= when present)."""
    pos = int(fields[1])
    beg = pos - 1
    end = beg + max(len(fields[3]), 1)
    if len(fields) > 7:
        for token in fields[7].split(";"):
            if token.startswith("END="):
                try:
                    end = max(end, int(token[4:]))
                except ValueError:
                    pass
                break
    return beg, max(end, beg + 1)


def bgzip_vcf(vcf_path: str, out_path: Optional[str] = None,
              remove_original: bool = True) -> Tuple[str, str]:
    """Compress a text VCF to BGZF and index it; returns (gz_path, tbi_path).

    Equivalent to `bgzip vcf && tabix -p vcf vcf.gz` (the original is
    removed like bgzip does unless remove_original=False)."""
    gz_path = out_path or vcf_path + ".gz"
    names: List[str] = []
    name_id: Dict[str, int] = {}
    bins: List[Dict[int, List[Tuple[int, int]]]] = []
    linear: List[Dict[int, int]] = []

    with open(vcf_path, "rb") as src, open(gz_path, "wb") as dst:
        w = BgzfWriter(dst)
        for line in src:
            voff_start = w.tell_virtual()
            w.write(line)
            if line.startswith(b"#") or not line.strip():
                continue
            fields = line.decode("utf-8", "replace").rstrip("\n").split("\t")
            beg, end = _vcf_span(fields)
            chrom = fields[0]
            tid = name_id.get(chrom)
            if tid is None:
                tid = name_id[chrom] = len(names)
                names.append(chrom)
                bins.append({})
                linear.append({})
            voff_end = w.tell_virtual()
            b = _reg2bin(beg, end)
            chunk_list = bins[tid].setdefault(b, [])
            if chunk_list and chunk_list[-1][1] == voff_start:
                chunk_list[-1] = (chunk_list[-1][0], voff_end)
            else:
                chunk_list.append((voff_start, voff_end))
            for win in range(beg >> 14, ((end - 1) >> 14) + 1):
                if win not in linear[tid] or voff_start < linear[tid][win]:
                    linear[tid][win] = voff_start
        w.close()

    body = bytearray()
    body += _TBI_MAGIC
    nm = b"".join(n.encode() + b"\x00" for n in names)
    body += struct.pack("<7i", len(names), *_VCF_PRESET)
    body += struct.pack("<i", len(nm))
    body += nm
    for tid in range(len(names)):
        body += struct.pack("<i", len(bins[tid]))
        for bin_no in sorted(bins[tid]):
            chunks = bins[tid][bin_no]
            body += struct.pack("<Ii", bin_no, len(chunks))
            for cb, ce in chunks:
                body += struct.pack("<QQ", cb, ce)
        lin = linear[tid]
        n_intv = max(lin) + 1 if lin else 0
        body += struct.pack("<i", n_intv)
        prev = 0
        for i in range(n_intv):
            if i in lin:
                prev = lin[i]
            body += struct.pack("<Q", prev)

    tbi_path = gz_path + ".tbi"
    with open(tbi_path, "wb") as fh:
        w = BgzfWriter(fh)
        w.write(bytes(body))
        w.close()
    if remove_original:
        os.remove(vcf_path)
    return gz_path, tbi_path


class TabixFile:
    """Region fetch over a bgzipped, .tbi-indexed text file (VCF preset)."""

    def __init__(self, gz_path: str, tbi_path: Optional[str] = None):
        self.path = gz_path
        tbi_path = tbi_path or gz_path + ".tbi"
        parts = []
        with open(tbi_path, "rb") as fh:
            r = BgzfReader(fh)
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                parts.append(chunk)
        data = b"".join(parts)
        if data[:4] != _TBI_MAGIC:
            raise ValueError(f"{tbi_path}: not a TBI index")
        (n_ref, self.format, self.col_seq, self.col_beg, self.col_end,
         self.meta, self.skip, l_nm) = struct.unpack_from("<8i", data, 4)
        off = 36
        raw_names = data[off:off + l_nm]
        off += l_nm
        self.names = [n.decode() for n in raw_names.split(b"\x00") if n]
        self._tid = {n: i for i, n in enumerate(self.names)}
        self._bins: List[Dict[int, List[Tuple[int, int]]]] = []
        self._linear: List[List[int]] = []
        for _ in range(n_ref):
            n_bin = struct.unpack_from("<i", data, off)[0]
            off += 4
            b: Dict[int, List[Tuple[int, int]]] = {}
            for _ in range(n_bin):
                bin_no, n_chunk = struct.unpack_from("<Ii", data, off)
                off += 8
                chunks = []
                for _ in range(n_chunk):
                    cb, ce = struct.unpack_from("<QQ", data, off)
                    off += 16
                    chunks.append((cb, ce))
                b[bin_no] = chunks
            n_intv = struct.unpack_from("<i", data, off)[0]
            off += 4
            lin = list(struct.unpack_from(f"<{n_intv}Q", data, off))
            off += 8 * n_intv
            self._bins.append(b)
            self._linear.append(lin)
        self._fh = open(gz_path, "rb")
        self._reader = BgzfReader(self._fh)

    @property
    def contigs(self) -> List[str]:
        return list(self.names)

    def header(self) -> List[str]:
        """Leading meta lines (up to the first data record)."""
        self._reader.seek_virtual(0)
        out = []
        for line in self._iter_lines():
            if not line.startswith("#"):
                break
            out.append(line)
        return out

    def _iter_lines(self) -> Iterator[str]:
        buf = b""
        while True:
            chunk = self._reader.read(1 << 16)
            if not chunk:
                if buf:
                    yield buf.decode("utf-8", "replace")
                return
            buf += chunk
            parts = buf.split(b"\n")
            buf = parts.pop()
            for p in parts:
                yield p.decode("utf-8", "replace")

    def fetch(self, contig: str, start: int = 0, stop: Optional[int] = None
              ) -> Iterator[str]:
        """Data lines overlapping [start, stop) (0-based half-open)."""
        tid = self._tid.get(contig)
        if tid is None:
            return
        if stop is None:
            stop = 1 << 40
        bins = self._bins[tid]
        lin = self._linear[tid]
        win = min(start >> 14, len(lin) - 1) if lin else -1
        min_off = lin[win] if win >= 0 else 0
        # iterate the bins PRESENT in the index and keep those whose
        # interval overlaps the region — O(bins with data), not
        # O(region/16kb): enumerating all candidate bins via reg2bins costs
        # tens of millions of probes for whole-contig fetches (stop
        # defaults to 2^40) and dominated every fetch call
        chunks = []
        for b, clist in bins.items():
            bb, be = _bin_interval(b)
            if bb >= stop or be <= start:
                continue
            for cb, ce in clist:
                if ce > min_off:
                    chunks.append((max(cb, min_off), ce))
        if not chunks:
            return
        # tabix input is position-sorted per contig (bgzip_vcf writes it that
        # way), so one forward scan from the earliest chunk is correct: stop
        # at the first record past `stop` or once the contig block ends
        self._reader.seek_virtual(min(cb for cb, _ in chunks))
        seen = False
        for line in self._iter_lines():
            if not line or line.startswith("#"):
                continue
            fields = line.split("\t")
            if fields[0] != contig:
                if seen:
                    return
                continue
            seen = True
            beg, end = _vcf_span(fields)
            if beg >= stop:
                return
            if end > start:
                yield line

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
