"""Lightweight alignment views used by the signature engine.

The reference wraps pysam.AlignedSegment objects and rebuilds them per read
(collect_signatures.py:63-99 `create_align`). svision-tpu has no pysam; the
BAM reader (svision_tpu.io.bam) emits `Aln` objects directly, with hard clips
already rewritten to soft clips (same as the reference's
`.cigarstring.replace('H', "S")`, collect_signatures.py:91).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

# BAM numeric cigar ops -> characters (SAM spec order MIDNSHP=X)
CIGAR_CHARS = "MIDNSHP=X"
_QUERY_CONSUMES = frozenset("MIS=X")
_REF_CONSUMES = frozenset("MDN=X")


class Aln:
    """One alignment record (primary or supplementary).

    Two construction paths share this class:
      * the tuple path (pure-Python reader, tests): `Aln(..., cigar=[...])`
        walks the tuples once for the derived fields, exactly the old
        dataclass __post_init__;
      * the raw path (native SoA batches, `aln_from_ops`/`alns_from_batch`):
        stores the BAM uint32 op words and materializes the tuple list ONLY
        when `.cigar` is actually read. In a 30x window ~95% of kept
        records never have their tuples built — the signature stack walks
        `raw_ops` directly (segments.analyze_inside_align) and tuple
        construction was the single largest Python cost of the window
        (docs/PERF.md round 5).
    """

    __slots__ = ("query_name", "reference_name", "reference_id",
                 "reference_start", "flag", "mapping_quality",
                 "query_sequence", "raw_ops", "_cigar", "reference_end",
                 "query_alignment_start", "query_alignment_end",
                 "query_length")

    def __init__(self, query_name: str, reference_name: str,
                 reference_id: int, reference_start: int, flag: int,
                 mapping_quality: int, cigar: List[Tuple[str, int]],
                 query_sequence: Optional[str] = None):
        self.query_name = query_name
        self.reference_name = reference_name
        self.reference_id = reference_id
        self.reference_start = reference_start
        self.flag = flag
        self.mapping_quality = mapping_quality
        self.query_sequence = query_sequence
        self.raw_ops = None
        self._cigar = cigar
        ref_len = 0
        q_len = 0
        lead_clip = 0
        tail_clip = 0
        seen_core = False
        for op, ln in cigar:
            if op in _REF_CONSUMES:
                ref_len += ln
            if op in _QUERY_CONSUMES:
                q_len += ln
            if op == "S":
                if not seen_core:
                    lead_clip += ln
                else:
                    tail_clip += ln
            elif op != "H":
                seen_core = True
        self.reference_end = self.reference_start + ref_len
        self.query_alignment_start = lead_clip
        self.query_alignment_end = q_len - tail_clip
        self.query_length = q_len

    @property
    def cigar(self) -> List[Tuple[str, int]]:
        c = self._cigar
        if c is None:
            c = self._cigar = [(_OPSTR_H2S[v & 0xF], v >> 4)
                               for v in self.raw_ops]
        return c

    @property
    def cigar_len(self) -> int:
        """Op count without materializing the tuple list."""
        ops = self.raw_ops
        return len(ops) if ops is not None else len(self._cigar)

    def cigar_source(self):
        """Cheapest faithful CIGAR representation: the raw BAM op-word list
        when this Aln came off a native batch (ints, H NOT yet rewritten —
        consumers treat op 5 as S), else the (H->S) tuple list. Both forms
        are accepted by segments.analyze_inside_align."""
        ops = self.raw_ops
        return ops if ops is not None else self._cigar

    def __eq__(self, other):
        if not isinstance(other, Aln):
            return NotImplemented
        return (self.query_name == other.query_name
                and self.reference_name == other.reference_name
                and self.reference_id == other.reference_id
                and self.reference_start == other.reference_start
                and self.flag == other.flag
                and self.mapping_quality == other.mapping_quality
                and self.cigar == other.cigar
                and self.query_sequence == other.query_sequence)

    def __repr__(self):
        return (f"Aln({self.query_name!r}, {self.reference_name!r}, "
                f"{self.reference_start}, flag={self.flag}, "
                f"ops={self.cigar_len})")

    # flag accessors (SAM spec)
    @property
    def is_unmapped(self) -> bool:
        return bool(self.flag & 0x4)

    @property
    def is_reverse(self) -> bool:
        return bool(self.flag & 0x10)

    @property
    def is_secondary(self) -> bool:
        return bool(self.flag & 0x100)

    @property
    def is_supplementary(self) -> bool:
        return bool(self.flag & 0x800)

    @property
    def mapq(self) -> int:
        return self.mapping_quality

    @property
    def qname(self) -> str:
        return self.query_name

    @property
    def cigarstring(self) -> str:
        return "".join(f"{ln}{op}" for op, ln in self.cigar)


# numeric-op tables for aln_from_ops (BAM op codes 0..8 = MIDNSHP=X with the
# H->S rewrite applied): query-consume includes S AND rewritten H, matching
# __post_init__ run on a hard_to_soft cigar; P (6) counts as core for the
# lead/tail clip split exactly like the seen_core loop above.
_OPSTR_H2S = ("M", "I", "D", "N", "S", "S", "P", "=", "X")
_NUM_QRY = (True, True, False, False, True, True, False, True, True)
_NUM_REF = (True, False, True, True, False, False, False, True, True)


def aln_from_ops(query_name: str, reference_name: str, reference_id: int,
                 reference_start: int, flag: int, mapping_quality: int,
                 raw_ops, query_sequence: Optional[str],
                 _derived=None) -> "Aln":
    """Build an Aln from raw BAM uint32 CIGAR ops, tuple list left lazy
    (behaviour-identical to Aln(..., cigar=hard_to_soft(decoded));
    asserted by tests). `_derived` = (ref_len, q_len, lead_clip, tail_clip)
    precomputed by `batch_derived` skips the per-op loop entirely — the
    production `_batch_to_alns` path."""
    ops = raw_ops.tolist() if hasattr(raw_ops, "tolist") else list(raw_ops)
    if _derived is None:
        ref_len = 0
        q_len = 0
        lead_clip = 0
        tail_clip = 0
        seen_core = False
        for v in ops:
            op = v & 0xF
            ln = v >> 4
            if _NUM_REF[op]:
                ref_len += ln
            if _NUM_QRY[op]:
                q_len += ln
            if op == 4 or op == 5:          # S (or H -> S)
                if seen_core:
                    tail_clip += ln
                else:
                    lead_clip += ln
            else:
                seen_core = True
    else:
        ref_len, q_len, lead_clip, tail_clip = _derived
    a = object.__new__(Aln)
    a.query_name = query_name
    a.reference_name = reference_name
    a.reference_id = reference_id
    a.reference_start = reference_start
    a.flag = flag
    a.mapping_quality = mapping_quality
    a._cigar = None
    a.raw_ops = ops
    a.query_sequence = query_sequence
    a.reference_end = reference_start + ref_len
    a.query_alignment_start = lead_clip
    a.query_alignment_end = q_len - tail_clip
    a.query_length = q_len
    return a


def batch_derived(cigar_buf, cigar_off, idx):
    """Vectorized derived-field computation for a selection of records in a
    native SoA batch: one numpy pass over ALL selected records' CIGAR ops
    replaces per-record Python loops. Returns
    (ops_list, ref_len, q_len, lead_clip, tail_clip) where ops_list[k] is
    record idx[k]'s op words as a plain int list and the rest are int64
    arrays aligned with idx. Semantics match aln_from_ops' loop exactly
    (tests/test_prefilter.py::test_aln_from_ops_equals_dataclass_path)."""
    import numpy as np

    idx = np.asarray(idx, np.int64)
    n = idx.size
    zeros = np.zeros(n, np.int64)
    if n == 0:
        return [], zeros, zeros, zeros, zeros
    starts = cigar_off[idx]
    counts = (cigar_off[idx + 1] - starts).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return [[] for _ in range(n)], zeros, zeros, zeros, zeros
    bounds = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=bounds[1:])
    # gather the selected records' op words contiguously
    gidx = np.arange(total, dtype=np.int64)
    gidx += np.repeat(starts.astype(np.int64) - bounds, counts)
    ops = cigar_buf[gidx]
    op = (ops & np.uint32(0xF)).astype(np.int64)
    ln = (ops >> np.uint32(4)).astype(np.int64)

    qry_tbl = np.array(_NUM_QRY, np.int64)
    ref_tbl = np.array(_NUM_REF, np.int64)
    # reduceat segments: counts >= 1 for every selected record is guaranteed
    # by the caller (record validity requires a non-empty CIGAR); zero-count
    # records would corrupt segment boundaries here
    ref_len = np.add.reduceat(ln * ref_tbl[op], bounds)
    q_len = np.add.reduceat(ln * qry_tbl[op], bounds)

    is_clip = (op == 4) | (op == 5)
    pos_in_rec = np.arange(total, dtype=np.int64) - np.repeat(bounds, counts)
    first_core = np.minimum.reduceat(
        np.where(is_clip, np.int64(1 << 60), pos_in_rec), bounds)
    fc_rep = np.repeat(first_core, counts)
    # clips strictly before the first non-clip op -> lead; clips after it
    # -> tail (mid-alignment S counts as tail, matching seen_core)
    lead = np.add.reduceat(ln * (is_clip & (pos_in_rec < fc_rep)), bounds)
    tail = np.add.reduceat(ln * (is_clip & (pos_in_rec > fc_rep)), bounds)

    flat = ops.tolist()
    ops_list = []
    lo = 0
    for c in counts.tolist():
        ops_list.append(flat[lo:lo + c])
        lo += c
    return ops_list, ref_len, q_len, lead, tail


def cigar_from_string(cs: str) -> List[Tuple[str, int]]:
    """Parse a SAM cigar string into [(op, len)] (cigar_to_list parity,
    collect_signatures.py:27-33)."""
    out: List[Tuple[str, int]] = []
    num = 0
    for ch in cs:
        if ch.isdigit():
            num = num * 10 + ord(ch) - 48
        else:
            out.append((ch, num))
            num = 0
    return out


def hard_to_soft(cigar: List[Tuple[str, int]]) -> List[Tuple[str, int]]:
    """H -> S rewrite (create_align parity, collect_signatures.py:91)."""
    return [("S" if op == "H" else op, ln) for op, ln in cigar]
