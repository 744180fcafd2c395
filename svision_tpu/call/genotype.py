"""Genotyper: VAF from reference-supporting vs variant-supporting reads.

Port of genotyper (genotype.py:17-73), backed by the engine's BamReader
instead of a fresh pysam handle per call.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple


def genotyper(candidate, support_reads: Sequence[str], bam, options
              ) -> Tuple[str, int, int]:
    """candidate = (contig, start, end, svtype_list). Returns (GT, DR, DV)."""
    gt = "./."
    contig, start, end, svtype = candidate

    contig_length = bam.get_reference_length(contig)
    # positions/CIGARs/flags only — skip sequence decode on the native path
    aligns = bam.fetch(contig, max(0, start - 1000),
                       min(contig_length, end + 1000), decode_seq=False)

    support_alt = set(support_reads)
    support_ref = set()

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
            # Reference quirk kept by default: "tDUP" matches NEITHER rule
            # below (genotype.py:45-54 tests only DEL/INV and INS/DUP), so
            # a tDUP call never accrues reference support — DR stays 0,
            # VAF is always 1.0, and every het tandem duplication is
            # genotyped 1/1. --tdup_gt opts into the fix (tDUP uses the
            # INS/DUP full-span rule, which is what a tandem duplication's
            # reference allele actually looks like).
            ins_like = ("INS", "DUP", "tDUP") \
                if getattr(options, "tdup_gt", False) else ("INS", "DUP")
            if svtype[0] in ("DEL", "INV"):
                minimum_overlap = min((end - start) / 2, 2000)
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
            # CSV: every qualifying non-support read counts as reference
            support_ref.add(aln.query_name)

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
