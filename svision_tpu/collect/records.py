"""Lightweight alignment views used by the signature engine.

The reference wraps pysam.AlignedSegment objects and rebuilds them per read
(collect_signatures.py:63-99 `create_align`). svision-tpu has no pysam; the
BAM reader (svision_tpu.io.bam) emits `Aln` objects directly, with hard clips
already rewritten to soft clips (same as the reference's
`.cigarstring.replace('H', "S")`, collect_signatures.py:91).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

# BAM numeric cigar ops -> characters (SAM spec order MIDNSHP=X)
CIGAR_CHARS = "MIDNSHP=X"
_QUERY_CONSUMES = frozenset("MIS=X")
_REF_CONSUMES = frozenset("MDN=X")


@dataclass
class Aln:
    """One alignment record (primary or supplementary)."""

    query_name: str
    reference_name: str
    reference_id: int
    reference_start: int            # 0-based
    flag: int
    mapping_quality: int
    cigar: List[Tuple[str, int]]    # [(op_char, length)], H already -> S
    query_sequence: Optional[str] = None   # None for supplementaries until set

    # derived, filled in __post_init__
    reference_end: int = field(init=False)
    query_alignment_start: int = field(init=False)
    query_alignment_end: int = field(init=False)
    query_length: int = field(init=False)

    def __post_init__(self):
        ref_len = 0
        q_len = 0
        lead_clip = 0
        tail_clip = 0
        seen_core = False
        for op, ln in self.cigar:
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
                 raw_ops, query_sequence: Optional[str]) -> "Aln":
    """Build an Aln from raw BAM uint32 CIGAR ops without the per-op
    __post_init__ Python loop — one pass over a plain int list computes the
    cigar tuples and every derived field (behaviour-identical to
    Aln(..., cigar=hard_to_soft(decoded)); asserted by tests)."""
    ref_len = 0
    q_len = 0
    lead_clip = 0
    tail_clip = 0
    seen_core = False
    cigar: List[Tuple[str, int]] = []
    append = cigar.append
    for v in raw_ops.tolist() if hasattr(raw_ops, "tolist") else raw_ops:
        op = v & 0xF
        ln = v >> 4
        append((_OPSTR_H2S[op], ln))
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
    a = object.__new__(Aln)
    a.query_name = query_name
    a.reference_name = reference_name
    a.reference_id = reference_id
    a.reference_start = reference_start
    a.flag = flag
    a.mapping_quality = mapping_quality
    a.cigar = cigar
    a.query_sequence = query_sequence
    a.reference_end = reference_start + ref_len
    a.query_alignment_start = lead_clip
    a.query_alignment_end = q_len - tail_clip
    a.query_length = q_len
    return a


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
