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
