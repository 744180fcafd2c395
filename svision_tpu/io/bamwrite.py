"""BAM + BAI writer (test fixtures, synthetic benchmarks, round-trip checks).

Produces coordinate-sorted BAM files with a standard binning/linear BAI index
including pseudo-bin mapped/unmapped counts, so BamReader.get_index_statistics
and region fetch behave like htslib on real data.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from svision_tpu.io.bgzf import BgzfWriter
from svision_tpu.io.bam import CIGAR_OPS, SEQ_NT

_NT_CODE = {c: i for i, c in enumerate(SEQ_NT)}
_NT_LUT = np.full(256, 15, np.uint8)
for _c, _i in _NT_CODE.items():
    _NT_LUT[ord(_c)] = _i


def _pack_seq(seq: str) -> bytes:
    """4-bit nibble packing, vectorized (the per-base Python loop made
    WGS-scale fixture writes take hours)."""
    a = _NT_LUT[np.frombuffer(seq.encode("ascii"), np.uint8)]
    if len(a) % 2:
        a = np.concatenate([a, np.zeros(1, np.uint8)])
    return ((a[0::2] << 4) | a[1::2]).astype(np.uint8).tobytes()
_OP_CODE = {c: i for i, c in enumerate(CIGAR_OPS)}
_REF_CONSUME = frozenset("MDN=X")
_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


@dataclass
class SamRecord:
    qname: str
    flag: int
    ref_name: str        # '*' for unmapped
    pos: int             # 0-based
    mapq: int
    cigar: str           # SAM cigar string or '*'
    seq: Optional[str] = None
    tags: bytes = b""
    # Optional structured CIGAR ([n, op_char] lists) set by writers that
    # already hold ops (noise.apply_edits_to_record) — _encode_record then
    # skips the regex string parse, which dominated noisy whole-genome
    # fixture writes. MUST equal fmt_cigar(ops) == cigar; the only
    # post-construction cigar mutator is apply_edits_to_record, which sets
    # both together.
    ops: Optional[List[List]] = None

    def ref_span(self) -> int:
        if self.cigar == "*":
            return 0
        if self.ops is not None:
            return sum(n for n, op in self.ops if op in _REF_CONSUME)
        return sum(int(m.group(1)) for m in _CIG_RE.finditer(self.cigar)
                   if m.group(2) in _REF_CONSUME)

    def end_pos(self) -> int:
        span = self.ref_span()
        return self.pos + (span if span > 0 else 1)


def _reg2bin(beg: int, end: int) -> int:
    """Smallest bin containing [beg, end) under BAI's fixed 14/5 binning —
    the special case of _reg2bin_csi."""
    return _reg2bin_csi(beg, end, 14, 5)


def _reg2bin_csi(beg: int, end: int, min_shift: int, depth: int) -> int:
    """Smallest bin containing [beg, end) under (min_shift, depth) binning
    (CSI spec; equals _reg2bin at min_shift=14, depth=5)."""
    end -= 1
    for level in range(depth, 0, -1):
        s = min_shift + (depth - level) * 3
        if beg >> s == end >> s:
            return ((1 << (level * 3)) - 1) // 7 + (beg >> s)
    return 0


def _bin_first_window(bin_no: int, min_shift: int, depth: int) -> int:
    """First min_shift-granularity window covered by a bin."""
    level = 0
    while ((1 << ((level + 1) * 3)) - 1) // 7 <= bin_no:
        level += 1
    offset = ((1 << (level * 3)) - 1) // 7
    beg = (bin_no - offset) << (min_shift + (depth - level) * 3)
    return beg >> min_shift


def _encode_record(rec: SamRecord, tid: int) -> Tuple[bytes, int]:
    """Returns (encoded bytes, end position) — the cigar is parsed exactly
    once; callers (write_bam's index builder) reuse the end instead of
    re-walking the cigar string per use (4x at WGS fixture scale)."""
    name = rec.qname.encode("ascii") + b"\x00"
    ref_span = 0
    cigar_ops: List[int] = []
    if rec.cigar != "*":
        if rec.ops is not None:
            # structured fast path (noisy fixtures: thousands of ops per
            # record made the regex parse the top cost of the write)
            for n, op in rec.ops:
                cigar_ops.append((n << 4) | _OP_CODE[op])
                if op in _REF_CONSUME:
                    ref_span += n
        else:
            at = 0
            for m in _CIG_RE.finditer(rec.cigar):
                if m.start() != at:
                    break
                at = m.end()
                n, op = int(m.group(1)), m.group(2)
                cigar_ops.append((n << 4) | _OP_CODE[op])
                if op in _REF_CONSUME:
                    ref_span += n
            if at != len(rec.cigar):
                # the regex must consume the whole string — a malformed
                # cigar (bad op letter, stray chars) must fail loudly, not
                # encode a record whose span/bin disagree with the intended
                # alignment
                raise ValueError(f"malformed cigar {rec.cigar!r}")
    end_pos = rec.pos + (ref_span if ref_span > 0 else 1)
    seq = rec.seq or ""
    l_seq = len(seq)
    tags = rec.tags
    if len(cigar_ops) > 0xFFFF:
        # SAM spec §4.2.2: placeholder kSmN cigar + real ops in CG:B,I
        real = cigar_ops
        cigar_ops = [(l_seq << 4) | _OP_CODE["S"],
                     (ref_span << 4) | _OP_CODE["N"]]
        tags = (tags + b"CGBI" + struct.pack("<i", len(real))
                + struct.pack(f"<{len(real)}I", *real))
    packed = _pack_seq(seq) if l_seq else b""
    qual = b"\xff" * l_seq  # 0xff = quality absent

    body = struct.pack(
        "<iiBBHHHiiii",
        tid, rec.pos, len(name), rec.mapq,
        _reg2bin(rec.pos, end_pos), len(cigar_ops), rec.flag, l_seq,
        -1, -1, 0)
    body += name
    body += struct.pack(f"<{len(cigar_ops)}I", *cigar_ops)
    body += bytes(packed) + qual + tags
    return struct.pack("<i", len(body)) + body, end_pos


def write_bam(path: str, references: Sequence[Tuple[str, int]],
              records, sort: bool = True,
              write_index: bool = True, index_format: str = "bai",
              min_shift: int = 14, depth: int = 5,
              compress_level: int = 6) -> None:
    """index_format 'bai' writes path.bai (fixed 14/5 binning); 'csi' writes
    path.csi with (min_shift, depth) binning — the index samtools produces
    with `samtools index -c`, required for contigs >= 512 Mb.

    With sort=False `records` may be any iterable already in coordinate
    order; it is consumed lazily, so WGS-scale fixture generators
    (sim.make_sv_bam(stream=True)) never hold the full read set in memory."""
    if index_format not in ("bai", "csi"):
        raise ValueError(f"unknown index_format {index_format!r}")
    if index_format == "bai" and (min_shift, depth) != (14, 5):
        raise ValueError("BAI binning is fixed at min_shift=14, depth=5")
    refs = list(references)
    tid_of: Dict[str, int] = {name: i for i, (name, _) in enumerate(refs)}
    if sort:
        recs = sorted(records,
                      key=lambda r: (tid_of.get(r.ref_name, 1 << 30), r.pos))
    else:
        recs = records

    header_text = "@HD\tVN:1.6\tSO:coordinate\n" + "".join(
        f"@SQ\tSN:{name}\tLN:{length}\n" for name, length in refs)

    # per-ref index structures (linear index kept at min_shift granularity;
    # for CSI it becomes the per-bin loffsets)
    bins: List[Dict[int, List[Tuple[int, int]]]] = [dict() for _ in refs]
    linear: List[Dict[int, int]] = [dict() for _ in refs]
    mapped = [0] * len(refs)
    unmapped = [0] * len(refs)
    ref_first = [None] * len(refs)
    ref_last = [None] * len(refs)

    with open(path, "wb") as fh:
        w = BgzfWriter(fh, level=compress_level)
        w.write(b"BAM\x01")
        text = header_text.encode("ascii")
        w.write(struct.pack("<i", len(text)) + text)
        w.write(struct.pack("<i", len(refs)))
        for name, length in refs:
            nb = name.encode("ascii") + b"\x00"
            w.write(struct.pack("<i", len(nb)) + nb + struct.pack("<i", length))

        for rec in recs:
            tid = tid_of.get(rec.ref_name, -1)
            voff_start = w.tell_virtual()
            data, endp = _encode_record(rec, tid)
            w.write(data)
            voff_end = w.tell_virtual()
            if tid < 0:
                continue
            if rec.flag & 0x4:
                unmapped[tid] += 1
            else:
                mapped[tid] += 1
            if index_format == "csi":
                b = _reg2bin_csi(rec.pos, endp, min_shift, depth)
            else:
                b = _reg2bin(rec.pos, endp)
            chunk_list = bins[tid].setdefault(b, [])
            if chunk_list and chunk_list[-1][1] == voff_start:
                chunk_list[-1] = (chunk_list[-1][0], voff_end)
            else:
                chunk_list.append((voff_start, voff_end))
            last_win = (max(endp, rec.pos + 1) - 1) >> min_shift
            for win in range(rec.pos >> min_shift, last_win + 1):
                if win not in linear[tid] or voff_start < linear[tid][win]:
                    linear[tid][win] = voff_start
            if ref_first[tid] is None:
                ref_first[tid] = voff_start
            ref_last[tid] = voff_end
        w.close()

    if not write_index:
        return
    if index_format == "csi":
        _write_csi(path + ".csi", refs, bins, linear, mapped, unmapped,
                   ref_first, ref_last, min_shift, depth)
        return
    with open(path + ".bai", "wb") as fh:
        fh.write(b"BAI\x01")
        fh.write(struct.pack("<i", len(refs)))
        for tid in range(len(refs)):
            ref_bins = bins[tid]
            n_bin = len(ref_bins) + (1 if ref_first[tid] is not None else 0)
            fh.write(struct.pack("<i", n_bin))
            for bin_no in sorted(ref_bins):
                chunks = ref_bins[bin_no]
                fh.write(struct.pack("<Ii", bin_no, len(chunks)))
                for beg, end in chunks:
                    fh.write(struct.pack("<QQ", beg, end))
            if ref_first[tid] is not None:  # pseudo-bin with counts
                fh.write(struct.pack("<Ii", 37450, 2))
                fh.write(struct.pack("<QQ", ref_first[tid], ref_last[tid]))
                fh.write(struct.pack("<QQ", mapped[tid], unmapped[tid]))
            lin = linear[tid]
            if lin:
                n_intv = max(lin) + 1
                fh.write(struct.pack("<i", n_intv))
                filled = []
                prev = 0
                for i in range(n_intv):
                    if i in lin:
                        prev = lin[i]
                    filled.append(prev)
                fh.write(struct.pack(f"<{n_intv}Q", *filled))
            else:
                fh.write(struct.pack("<i", 0))


def _write_csi(path, refs, bins, linear, mapped, unmapped, ref_first,
               ref_last, min_shift, depth):
    """Serialize a CSI v1 index (BGZF-compressed). Each bin's loffset is the
    filled linear-index value at the bin's first window (htslib semantics:
    virtual offset a reader may safely start from for that bin)."""
    pseudo = ((1 << ((depth + 1) * 3)) - 1) // 7 + 1
    body = bytearray()
    body += b"CSI\x01"
    body += struct.pack("<iii", min_shift, depth, 0)  # no aux
    body += struct.pack("<i", len(refs))
    for tid in range(len(refs)):
        lin = linear[tid]
        filled: Dict[int, int] = {}
        prev = 0
        for win in range(max(lin) + 1 if lin else 0):
            if win in lin:
                prev = lin[win]
            filled[win] = prev
        ref_bins = bins[tid]
        n_bin = len(ref_bins) + (1 if ref_first[tid] is not None else 0)
        body += struct.pack("<i", n_bin)
        for bin_no in sorted(ref_bins):
            chunks = ref_bins[bin_no]
            loffset = filled.get(_bin_first_window(bin_no, min_shift, depth), 0)
            body += struct.pack("<IQi", bin_no, loffset, len(chunks))
            for beg, end in chunks:
                body += struct.pack("<QQ", beg, end)
        if ref_first[tid] is not None:  # pseudo-bin with counts
            body += struct.pack("<IQi", pseudo, ref_first[tid], 2)
            body += struct.pack("<QQ", ref_first[tid], ref_last[tid])
            body += struct.pack("<QQ", mapped[tid], unmapped[tid])
    with open(path, "wb") as fh:
        w = BgzfWriter(fh)
        w.write(bytes(body))
        w.close()
