"""Genotyper: VAF from reference-supporting vs variant-supporting reads.

Port of genotyper (genotype.py:17-73), backed by the engine's BamReader
instead of a fresh pysam handle per call. The native path consumes the
structure-of-arrays batch directly — the genotyper never looks at CIGARs
or sequences, so building full Aln objects (with their per-op CIGAR
lists) was ~60% of the per-call cost at WGS scale (round-4 profile,
docs/PERF.md)."""

from __future__ import annotations

from typing import List, Sequence, Tuple


def _rules(svtype, start: int, end: int, options):
    """(ins_like tuple, minimum_overlap) per the reference's per-type
    reference-read rules. See the tdup_gt note below."""
    # Reference quirk kept by default: "tDUP" matches NEITHER rule
    # (genotype.py:45-54 tests only DEL/INV and INS/DUP), so a tDUP call
    # never accrues reference support — DR stays 0, VAF is always 1.0,
    # and every het tandem duplication is genotyped 1/1. --tdup_gt opts
    # into the fix (tDUP uses the INS/DUP full-span rule, which is what
    # a tandem duplication's reference allele actually looks like).
    ins_like = ("INS", "DUP", "tDUP") \
        if getattr(options, "tdup_gt", False) else ("INS", "DUP")
    return ins_like, min((end - start) / 2, 2000)


def genotyper(candidate, support_reads: Sequence[str], bam, options
              ) -> Tuple[str, int, int]:
    """candidate = (contig, start, end, svtype_list). Returns (GT, DR, DV)."""
    gt = "./."
    contig, start, end, svtype = candidate

    contig_length = bam.get_reference_length(contig)
    lo = max(0, start - 1000)
    hi = min(contig_length, end + 1000)

    support_alt = set(support_reads)
    support_ref = set()

    batch = bam.fetch_batch(contig, lo, hi, decode_seq=False) \
        if hasattr(bam, "fetch_batch") else None
    if batch is not None:
        _scan_batch(batch, svtype, start, end, options,
                    support_alt, support_ref)
    else:
        _scan_alns(bam.fetch(contig, lo, hi, decode_seq=False), svtype,
                   start, end, options, support_alt, support_ref)

    alt_no = len(support_alt)
    ref_no = len(support_ref)

    if len(svtype) != 1:
        return gt, ref_no, alt_no

    if alt_no + ref_no >= options.min_gt_depth:
        ratio = alt_no / (alt_no + ref_no)
        if ratio >= options.homo_thresh:
            gt = "1/1"
        elif ratio >= options.hete_thresh:
            gt = "0/1"
        else:
            gt = "0/0"
    return gt, ref_no, alt_no


def _scan_batch(batch, svtype, start, end, options, support_alt,
                support_ref) -> None:
    """SoA scan: vectorized filter/rule masks; the 500-alignment cap and
    the support-name skip still walk records in fetch (position) order,
    so counting semantics are identical to the per-Aln loop."""
    import numpy as np
    flags = np.asarray(batch.flag)
    qual = (((flags & 0x104) == 0)          # not unmapped, not secondary
            & (np.asarray(batch.mapq) >= options.min_mapq))
    pos = np.asarray(batch.pos)
    endp = np.asarray(batch.endpos)
    if len(svtype) == 1:
        ins_like, minimum_overlap = _rules(svtype, start, end, options)
        if svtype[0] in ("DEL", "INV"):
            rule = (((pos < end - minimum_overlap) & (endp > end + 100))
                    | ((pos < start - 100)
                       & (endp > start + minimum_overlap)))
        elif svtype[0] in ins_like:
            rule = (pos < start - 100) & (endp > end + 100)
        else:
            rule = np.zeros(batch.n, bool)
    else:
        # CSV: every qualifying non-support read counts as reference
        rule = np.ones(batch.n, bool)
    aln_no = 0
    for i in range(batch.n):
        if aln_no >= 500:
            break
        name = batch.qname(i)
        if name in support_alt:
            continue
        if not qual[i]:
            continue
        aln_no += 1
        if rule[i]:
            support_ref.add(name)


def _scan_alns(aligns, svtype, start, end, options, support_alt,
               support_ref) -> None:
    """Pure-Python fallback (no native lib): the original per-Aln loop."""
    ins_like, minimum_overlap = _rules(svtype, start, end, options)
    aln_no = 0
    for aln in aligns:
        if aln_no >= 500:
            break
        if aln.query_name in support_alt:
            continue
        if aln.is_unmapped or aln.is_secondary or \
                aln.mapping_quality < options.min_mapq:
            continue
        aln_no += 1

        if len(svtype) == 1:
            if svtype[0] in ("DEL", "INV"):
                if (aln.reference_start < (end - minimum_overlap)
                        and aln.reference_end > (end + 100)) or \
                   (aln.reference_start < (start - 100)
                        and aln.reference_end > (start + minimum_overlap)):
                    support_ref.add(aln.query_name)
            if svtype[0] in ins_like:
                if aln.reference_start < (start - 100) and \
                        aln.reference_end > (end + 100):
                    support_ref.add(aln.query_name)
        else:
            support_ref.add(aln.query_name)
