"""Per-read segment extraction: inter-alignment and intra-alignment analysis.

Behavioral port of `analyze_between_aligns` (analyze_reads.py:619-801) and
`analyze_inside_align` (analyze_reads.py:804-970): project all alignments of a
read into primary-strand read coordinates, label segments main/other by the
0.8 mutual-overlap rule, and split main segments at CIGAR indels >= min_sv_size.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from svision_tpu.collect.gaps import cal_overlap_ratio
from svision_tpu.collect.records import Aln

Seg = Dict


def analyze_between_aligns(primary: Aln, supplementary: List[Aln], options,
                           ref=None) -> Tuple[List[Seg], List[Seg]]:
    """Main/other segment labeling across primary + supplementary alignments
    (analyze_reads.py:619-801)."""
    if not options.contig and len(supplementary) > 4:
        return [], []
    read_name = primary.query_name
    alignments = [primary] + list(supplementary)
    primary_forward = primary.is_reverse

    major_segs: List[Seg] = []
    minor_segs: List[Seg] = []
    all_forward_segs: List[Seg] = []

    for alignment in alignments:
        # project into primary-strand read coordinates (analyze_reads.py:650-655)
        if alignment.is_reverse != primary_forward:
            q_start = alignment.query_length - alignment.query_alignment_end
            q_end = alignment.query_length - alignment.query_alignment_start
        else:
            q_start = alignment.query_alignment_start
            q_end = alignment.query_alignment_end

        seg: Seg = {
            "q_start": q_start,
            "q_end": q_end,
            "qual": alignment.mapping_quality,
            "ref_id": alignment.reference_id,
            "ref_chr": alignment.reference_name,
            "ref_start": alignment.reference_start,
            "ref_end": alignment.reference_end,
            "read_name": read_name,
            # raw BAM op words on the native path, (H->S) tuples otherwise;
            # analyze_inside_align accepts both (records.Aln.cigar_source)
            "cigar": alignment.cigar_source(),
            "read_seq": alignment.query_sequence[q_start:q_end],
            "is_supplementary": alignment.is_supplementary,
        }
        if alignment.is_reverse == primary_forward:
            seg["is_reverse"] = False
            all_forward_segs.append(seg)
        else:
            seg["is_reverse"] = True
            seg["type"] = "other"
            minor_segs.append(seg)

    if len(all_forward_segs) == 1:
        major_segs.append(all_forward_segs[0])
        for seg in major_segs:
            seg["type"] = "main"
        for seg in minor_segs:
            seg["type"] = "other"
        return major_segs, minor_segs

    sorted_forward = sorted(all_forward_segs,
                            key=lambda a: (a["q_start"], a["q_end"]))
    left_most = min(s["ref_start"] for s in sorted_forward)
    right_most = max(s["ref_end"] for s in sorted_forward)

    for i, base_seg in enumerate(sorted_forward):
        if i == 0 or i == len(sorted_forward) - 1:
            base_seg["type"] = "main"
            major_segs.append(base_seg)
            continue
        covered = False
        for target_seg in sorted_forward:
            ratio = cal_overlap_ratio(base_seg, target_seg, left_most, right_most)
            if ratio >= 0.8 and base_seg not in minor_segs:
                base_seg["type"] = "other"
                minor_segs.append(base_seg)
                covered = True
                break
        if not covered:
            base_seg["type"] = "main"
            major_segs.append(base_seg)

    if options.hash and ref is not None:
        _hash_realign_read_gaps(major_segs, minor_segs, options, ref)

    for seg in major_segs:
        seg["type"] = "main"
    for seg in minor_segs:
        seg["type"] = "other"
    return major_segs, minor_segs


def _hash_realign_read_gaps(major_segs: List[Seg], minor_segs: List[Seg],
                            options, ref) -> None:
    """--hash: k-mer realign inter-main read gaps into extra 'other' segments
    (analyze_reads.py:731-790)."""
    from svision_tpu.collect.hashplot import hashplot_unmapped

    all_segs = sorted(major_segs + minor_segs,
                      key=lambda a: (a["q_start"], a["q_end"]))
    main_index = [i for i, s in enumerate(all_segs) if s["type"] == "main"]

    for i in range(len(main_index) - 1):
        if main_index[i + 1] - main_index[i] != 1:
            continue
        # NOTE(reference parity): indexes all_segs[i], not
        # all_segs[main_index[i]] (analyze_reads.py:747-748)
        cur_main = all_segs[i].copy()
        next_main = all_segs[i + 1].copy()
        if next_main["q_start"] - cur_main["q_end"] < options.min_sv_size:
            continue
        distance_on_read = next_main["q_start"] - cur_main["q_end"]
        distance_on_ref = next_main["ref_start"] - cur_main["ref_end"]
        diff = abs(distance_on_read - distance_on_ref)
        if not (distance_on_ref >= -options.min_sv_size
                and diff >= options.min_sv_size):
            continue

        ref_chr = cur_main["ref_chr"]
        read_start = cur_main["q_end"]
        read_end = next_main["q_start"]
        read_seq = cur_main["read_seq"][read_start:read_end]
        ref_start = min(cur_main["ref_start"], next_main["ref_start"])
        ref_end = max(cur_main["ref_end"], next_main["ref_end"])
        if len(read_seq) >= options.max_hash_len:
            continue
        ref_seq = ref.fetch(ref_chr, ref_start, ref_end)
        _, o_segs = hashplot_unmapped(ref_seq, read_seq, options.k_size,
                                      options.min_accept)
        for seg in o_segs:
            minor_segs.append({
                "q_start": seg.xStart() + read_start if seg.forward()
                else seg.xEnd() + read_start,
                "q_end": seg.xEnd() + read_start if seg.forward()
                else seg.xStart() + read_start,
                "qual": cur_main["qual"],
                "ref_id": cur_main["ref_id"],
                "ref_chr": ref_chr,
                "ref_start": seg.yStart() + ref_start,
                "ref_end": seg.yEnd() + ref_start,
                "read_name": cur_main["read_name"],
                "cigar": [],
                "type": "other",
                "read_seq": read_seq,
                "is_reverse": not seg.forward(),
                "is_supplementary": cur_main["is_supplementary"],
            })


def analyze_inside_align(seg_dict: Seg, cigar: List[Tuple[str, int]], options,
                         ref=None) -> Tuple[Optional[List[Seg]], Optional[List[Seg]]]:
    """Split one alignment at CIGAR I/D gaps >= min_sv_size
    (analyze_reads.py:804-970). Returns (None, None) when no long gap."""
    read_pos = 0
    ref_pos = seg_dict["ref_start"]
    read_seq = seg_dict["read_seq"]
    ref_start = seg_dict["ref_start"]
    ref_end = seg_dict["ref_end"]
    read_start = seg_dict["q_start"]
    ref_chr = seg_dict["ref_chr"]

    long_gaps = []     # [[read_lo, read_hi], [ref_lo, ref_hi], 'I'|'D']
    ins_seqs = []
    min_sv = options.min_sv_size
    if cigar and type(cigar[0]) is int:
        # raw BAM op words (native path, records.Aln.cigar_source): same
        # walk as the tuple branch below with op 5 (H) treated as S per the
        # reference's H->S rewrite (collect_signatures.py:91)
        for v in cigar:
            opc = v & 0xF
            op_len = v >> 4
            if opc == 1:                             # I
                if op_len >= min_sv:
                    long_gaps.append([[read_pos, read_pos + op_len],
                                      [ref_pos, ref_pos], "I"])
                    ins_seqs.append([read_pos, read_pos + op_len, ref_pos,
                                     ref_pos + 1,
                                     read_seq[read_pos - read_start:
                                              read_pos + op_len - read_start]])
                read_pos += op_len
            elif opc == 2:                           # D
                if op_len >= min_sv:
                    long_gaps.append([[read_pos, read_pos],
                                      [ref_pos, ref_pos + op_len], "D"])
                ref_pos += op_len
            elif opc == 0 or opc == 7 or opc == 8:   # M, =, X
                ref_pos += op_len
                read_pos += op_len
            elif opc == 3 or opc == 4 or opc == 5:   # N, S, H->S
                read_pos += op_len
            # P: no-op
    else:
        for op, op_len in cigar:
            if op in ("N", "S"):
                read_pos += op_len
            elif op == "I":
                if op_len >= min_sv:
                    long_gaps.append([[read_pos, read_pos + op_len],
                                      [ref_pos, ref_pos], "I"])
                    ins_seqs.append([read_pos, read_pos + op_len, ref_pos,
                                     ref_pos + 1,
                                     read_seq[read_pos - read_start:
                                              read_pos + op_len - read_start]])
                read_pos += op_len
            elif op == "D":
                if op_len >= min_sv:
                    long_gaps.append([[read_pos, read_pos],
                                      [ref_pos, ref_pos + op_len], "D"])
                ref_pos += op_len
            elif op in ("M", "X", "E", "="):
                ref_pos += op_len
                read_pos += op_len
            # H, P: no-op

    if not long_gaps:
        return None, None

    # main segments between consecutive long gaps (analyze_reads.py:865-896)
    major_cords = []
    virtual_read_pos = read_start
    gap = long_gaps[0]
    m_len = gap[1][0] - ref_start
    major_cords.append([virtual_read_pos, virtual_read_pos + m_len,
                        ref_start, gap[1][0] - 1])
    virtual_read_pos += m_len

    for i in range(len(long_gaps) - 1):
        cur_gap = long_gaps[i]
        if cur_gap[2] == "I":
            virtual_read_pos += cur_gap[0][1] - cur_gap[0][0]
        next_gap = long_gaps[i + 1]
        m_len = next_gap[1][0] - cur_gap[1][1]
        major_cords.append([virtual_read_pos + 1, virtual_read_pos + m_len + 1,
                            cur_gap[1][1], next_gap[1][0]])
        virtual_read_pos += m_len

    gap = long_gaps[-1]
    if gap[2] == "I":
        virtual_read_pos += gap[0][1] - gap[0][0]
    m_len = ref_end - gap[1][1]
    major_cords.append([virtual_read_pos + 1, virtual_read_pos + m_len + 1,
                        gap[1][1], ref_end])

    minor_dicts: List[Seg] = []
    if options.hash and ref is not None:
        from svision_tpu.collect.hashplot import hashplot_unmapped
        for ins in ins_seqs:
            seg_read_start = ins[0]
            ins_seq = ins[4]
            if len(ins_seq) >= options.max_hash_len:
                continue
            ref_seq = ref.fetch(ref_chr, ref_start, ref_end)
            _, other_segs = hashplot_unmapped(ref_seq, ins_seq, options.k_size,
                                              options.min_accept)
            for seg in other_segs:
                minor_dicts.append({
                    "q_start": seg.xStart() + seg_read_start if seg.forward()
                    else seg.xEnd() + seg_read_start,
                    "q_end": seg.xEnd() + seg_read_start if seg.forward()
                    else seg.xStart() + seg_read_start,
                    "qual": seg_dict["qual"],
                    "ref_id": seg_dict["ref_id"],
                    "ref_chr": ref_chr,
                    "ref_start": seg.yStart() + ref_start,
                    "ref_end": seg.yEnd() + ref_start,
                    "read_name": seg_dict["read_name"],
                    "cigar": [],
                    "type": "other",
                    "read_seq": "",
                    "is_reverse": not seg.forward(),
                    "is_supplementary": seg_dict["is_supplementary"],
                })

    major_dicts = []
    for cords in major_cords:
        major_dicts.append({
            "q_start": cords[0],
            "q_end": cords[1],
            "qual": seg_dict["qual"],
            "ref_id": seg_dict["ref_id"],
            "ref_chr": ref_chr,
            "ref_start": cords[2],
            "ref_end": cords[3],
            "read_name": seg_dict["read_name"],
            "cigar": [],
            "type": "main",
            "read_seq": seg_dict["read_seq"][cords[0] - read_start:
                                             cords[1] - read_start],
            "is_reverse": False,
            "is_supplementary": seg_dict["is_supplementary"],
        })
    return major_dicts, minor_dicts
