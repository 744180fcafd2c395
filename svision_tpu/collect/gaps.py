"""Signature-level SV typing from segment gaps.

Behavioral port of the reference detection core (src/collection/analyze_reads.py):
`analyze_gap` classifies a pair of main segments (plus helper segments between
them) into sigGap (INS/DEL/INV-like), sigDup (tandem dup via ref overlap) or
sigUncovered (strand-discordant pair), with left-normalized breakpoints
(shift_left) and rescaled segment boxes (trim_segs).

This layer is deliberately host-side: it is branchy per-read decision logic over
a handful of segments, not FLOPs. Throughput comes from the surrounding design
(single FASTA handle instead of the reference's per-event reopen —
analyze_reads.py:42-46 — and array-based candidate tables downstream).

Segments are plain dicts with the reference's key set so that the value-equality
semantics the reference relies on (`seg in help_aligns`, `seg == first_seg`,
trim_segs in-place mutation aliasing) carry over unchanged.

Known reference quirks preserved deliberately (SURVEY.md §7 bug-compat list):
  * DEL branch shifts current['ref_end'] to new_start+1 even when shift_len==0
    (analyze_reads.py:262)
  * the two malformed-bkps Uncovered sub-branches (analyze_reads.py:545,593)
    are provably unreachable; we raise if ever hit, which reproduces the
    reference's behavior (an exception swallowed at window level)
"""

from __future__ import annotations

from typing import Dict, List, Optional

from svision_tpu.collect.classes import Signature

Seg = Dict  # alias for readability


class UnreachableBranch(RuntimeError):
    """Raised where the reference would crash the window worker."""


def shift_left(ref_seq: str, ref_start: int, target_start: int, target_end: int):
    """Left-normalize an interval by identical-base shifting
    (analyze_reads.py:12-39)."""
    relative_start = target_start - ref_start
    relative_end = target_end - ref_start
    ref_len = len(ref_seq)
    if relative_start >= ref_len or relative_end >= ref_len:
        return target_start, target_end

    shift_len = 0
    while target_start - ref_start > 0:
        if ref_seq[relative_start - shift_len - 1] == ref_seq[relative_end - shift_len]:
            shift_len += 1
            target_start -= 1
            target_end -= 1
        else:
            break
    return target_start, target_end


def cal_overlap_ratio(base_seg: Seg, target_seg: Seg, left_most: int, right_most: int) -> float:
    """Mutual-overlap ratio used for main/other labeling
    (analyze_reads.py:49-80, conditions preserved verbatim)."""
    if base_seg == target_seg:
        return 0
    if base_seg["ref_start"] < left_most:
        return 1.0
    if base_seg["ref_end"] > right_most:
        return 1.0

    base_len = base_seg["ref_end"] - base_seg["ref_start"]
    if base_seg["ref_start"] >= target_seg["ref_start"] and \
            base_seg["ref_end"] <= target_seg["ref_end"]:
        return 1.0
    if base_seg["ref_end"] >= target_seg["ref_end"] > base_seg["ref_start"] \
            and target_seg["ref_start"] < base_seg["ref_start"]:
        return (target_seg["ref_end"] - base_seg["ref_start"]) / base_len
    if base_seg["ref_end"] < target_seg["ref_start"] < base_seg["ref_start"] \
            and target_seg["ref_end"] > base_seg["ref_end"]:
        return (base_seg["ref_end"] - target_seg["ref_start"]) / base_len
    return 0


def trim_segs(aligns_covered: List[Seg], first_seg: Seg, last_seg: Seg) -> None:
    """Rescale segment boxes around the event, in place
    (analyze_reads.py:82-152)."""
    distance_on_read = last_seg["q_start"] - first_seg["q_end"]
    distance_on_ref = last_seg["ref_start"] - first_seg["ref_end"]
    gap = max(distance_on_read, distance_on_ref)

    left_most = first_seg["ref_end"] - gap * 2
    right_most = last_seg["ref_start"] + gap * 2

    for seg in aligns_covered:
        if seg == first_seg:
            if seg["ref_start"] < left_most:
                adjust = left_most - seg["ref_start"]
                seg["ref_start"] = left_most
                seg["q_start"] = seg["q_start"] + adjust
            elif seg["ref_start"] > left_most:
                adjust = seg["ref_start"] - left_most
                seg["ref_start"] = left_most
                seg["q_end"] += adjust
                for other in aligns_covered:
                    if other != first_seg:
                        other["q_start"] += adjust
                        other["q_end"] += adjust
        elif seg == last_seg:
            if seg["ref_end"] > right_most:
                adjust = seg["ref_end"] - right_most
                seg["ref_end"] = right_most
                seg["q_end"] = seg["q_end"] - adjust
            elif seg["ref_end"] < right_most:
                adjust = right_most - seg["ref_end"]
                seg["ref_end"] = right_most
                seg["q_end"] += adjust
        else:
            seg_len = seg["q_end"] - seg["q_start"]
            if seg["ref_start"] < left_most:
                seg["ref_start"] = left_most
                seg["ref_end"] = seg["ref_start"] + seg_len
            if seg["ref_end"] > right_most:
                seg["ref_end"] = right_most
                seg["ref_start"] = seg["ref_end"] - seg_len


def _collect_bkps(first_bkp, sorted_aligns, help_aligns, extra=None):
    """Shared bkps assembly: leading event bkp + one per helper segment in
    read order (the pattern repeated at analyze_reads.py:224-237 etc.)."""
    all_bkps = [first_bkp]
    for align in sorted_aligns:
        if align in help_aligns or (extra is not None and align == extra):
            all_bkps.append([align["ref_start"], align["ref_end"],
                             align["ref_end"] - align["ref_start"]])
    lefts = [b[0] for b in all_bkps]
    rights = [b[1] for b in all_bkps]
    return all_bkps, min(lefts), max(rights)


def _gap_bkp(first_seg_end: int, second_seg_start: int, overlap_len, gap_len):
    """Leading breakpoint triple for a segment pair (overlap vs gap form)."""
    if second_seg_start <= first_seg_end:
        return [first_seg_end, first_seg_end + 1, overlap_len]
    return [first_seg_end, second_seg_start, gap_len]


def analyze_gap(current_align: Seg, next_align: Seg, ref, options,
                help_aligns: Optional[List[Seg]] = None) -> Optional[Signature]:
    """Classify a main-segment pair (+ helpers) into a Signature
    (analyze_reads.py:155-615). `ref` is an open FASTA reader with
    .fetch(chrom, start, end)."""
    if help_aligns is None:
        help_aligns = []
    aligns_covered: List[Seg] = list(help_aligns)
    qname = current_align["read_name"]

    if current_align["ref_id"] != next_align["ref_id"]:
        return None
    ref_chr = current_align["ref_chr"]

    if current_align["is_reverse"] != next_align["is_reverse"]:
        return _analyze_discordant_pair(current_align, next_align, aligns_covered,
                                        help_aligns, ref_chr, qname)

    # ---- same orientation ----
    # left-shift helper segments against the local reference window
    # (analyze_reads.py:178-194)
    ref_cords = [current_align["ref_start"], current_align["ref_end"],
                 next_align["ref_start"], next_align["ref_end"]]
    ref_start, ref_end = min(ref_cords), max(ref_cords)
    ref_seq = ref.fetch(ref_chr, ref_start, ref_end)
    for seg in help_aligns:
        if seg["is_reverse"]:
            continue
        seg["ref_start"], seg["ref_end"] = shift_left(
            ref_seq, ref_start, seg["ref_start"], seg["ref_end"])

    distance_on_read = next_align["q_start"] - current_align["q_end"]
    distance_on_ref = next_align["ref_start"] - current_align["ref_end"]

    if distance_on_ref >= -options.min_sv_size:
        diff = distance_on_read - distance_on_ref

        if diff >= options.min_sv_size:
            # INS (analyze_reads.py:207-246)
            aligns_covered.append(current_align)
            aligns_covered.append(next_align)
            sorted_aligns = sorted(aligns_covered,
                                   key=lambda a: (a["q_start"], a["q_end"]))
            first_bkp = _gap_bkp(current_align["ref_end"], next_align["ref_start"],
                                 abs(distance_on_read) + abs(distance_on_ref),
                                 abs(distance_on_read))
            all_bkps, left_most, right_most = _collect_bkps(
                first_bkp, sorted_aligns, help_aligns)
            trim_segs(sorted_aligns, current_align, next_align)
            if len(help_aligns) == 0:
                return Signature(ref_chr, left_most, right_most + diff, "sigGap",
                                 qname, sorted_aligns, all_bkps, "None")
            return Signature(ref_chr, left_most, right_most, "sigGap",
                             qname, sorted_aligns, all_bkps, "None")

        if -options.max_sv_size <= diff <= -options.min_sv_size:
            # DEL (analyze_reads.py:248-315): left-shift the deleted interval,
            # then move the flanks onto it
            ref_seq2 = ref.fetch(ref_chr, ref_start, ref_end)
            new_start, new_end = shift_left(ref_seq2, ref_start,
                                            current_align["ref_end"],
                                            next_align["ref_start"])
            current_align["ref_end"] = new_start + 1
            next_align["ref_start"] = new_end

            aligns_covered.append(current_align)
            aligns_covered.append(next_align)
            sorted_aligns = sorted(aligns_covered,
                                   key=lambda a: (a["q_start"], a["q_end"]))
            first_bkp = _gap_bkp(current_align["ref_end"], next_align["ref_start"],
                                 1, next_align["ref_start"] - current_align["ref_end"])
            all_bkps, left_most, right_most = _collect_bkps(
                first_bkp, sorted_aligns, help_aligns)

            # repair-mechanism annotation (analyze_reads.py:294-310)
            if len(help_aligns) != 0:
                mechanism = "None"
            elif distance_on_read > 10:
                mechanism = f"MMBIR+{distance_on_read}"
            elif distance_on_read >= -2:
                mechanism = (f"NHEJ+{distance_on_read}" if distance_on_read >= 0
                             else f"NHEJ{distance_on_read}")
            elif distance_on_read >= -20:
                mechanism = f"AltEJ{distance_on_read}"
            else:
                mechanism = f"NAHR{distance_on_read}"

            trim_segs(sorted_aligns, current_align, next_align)
            return Signature(ref_chr, left_most, right_most, "sigGap", qname,
                             sorted_aligns, all_bkps, mechanism)

        # INV-like small/huge diff (analyze_reads.py:317-352): only reported
        # when helpers exist and there is a positive ref gap
        aligns_covered.append(current_align)
        aligns_covered.append(next_align)
        if len(help_aligns) != 0:
            sorted_aligns = sorted(aligns_covered,
                                   key=lambda a: (a["q_start"], a["q_end"]))
            first_bkp = _gap_bkp(current_align["ref_end"], next_align["ref_start"],
                                 1, next_align["ref_start"] - current_align["ref_end"])
            all_bkps, left_most, right_most = _collect_bkps(
                first_bkp, sorted_aligns, help_aligns)
            trim_segs(sorted_aligns, current_align, next_align)
            if next_align["ref_start"] - current_align["ref_end"] > 0:
                return Signature(ref_chr, left_most, right_most, "sigGap",
                                 qname, sorted_aligns, all_bkps, "None")
        return None

    # ---- ref overlap => tandem duplication (analyze_reads.py:354-424) ----
    aligns_covered.append(current_align)
    dup_len = abs(distance_on_ref)
    dup_seg = {
        "q_start": next_align["q_start"],
        "q_end": next_align["q_start"] + dup_len,
        "qual": current_align["qual"],
        "ref_id": current_align["ref_id"],
        "ref_start": next_align["ref_start"],
        "ref_end": next_align["ref_start"] + dup_len,
        "is_reverse": current_align["is_reverse"],
        "read_name": current_align["read_name"],
    }
    aligns_covered.append(dup_seg)
    new_next_align = {
        "q_start": next_align["q_start"] + dup_len + 1,
        "q_end": next_align["q_end"],
        "qual": current_align["qual"],
        "ref_id": current_align["ref_id"],
        "ref_start": next_align["ref_start"] + dup_len + 1,
        "ref_end": next_align["ref_end"],
        "is_reverse": current_align["is_reverse"],
        "read_name": current_align["read_name"],
    }
    if new_next_align["q_end"] < new_next_align["q_start"]:
        new_next_align["q_end"] = dup_seg["q_end"] + dup_len
        new_next_align["ref_end"] = dup_seg["ref_end"] + dup_len
    aligns_covered.append(new_next_align)

    sorted_aligns = sorted(aligns_covered, key=lambda a: (a["q_start"], a["q_end"]))
    bkp_len = abs(distance_on_read) + abs(distance_on_ref)
    first_bkp = _gap_bkp(current_align["ref_end"], new_next_align["ref_start"],
                         bkp_len, bkp_len)
    all_bkps, left_most, right_most = _collect_bkps(
        first_bkp, sorted_aligns, help_aligns, extra=dup_seg)
    trim_segs(sorted_aligns, current_align, new_next_align)
    return Signature(ref_chr, left_most, right_most, "sigDup", qname,
                     sorted_aligns, all_bkps, "None")


def _analyze_discordant_pair(current_align: Seg, next_align: Seg,
                             aligns_covered: List[Seg], help_aligns: List[Seg],
                             ref_chr: str, qname: str) -> Optional[Signature]:
    """Strand-discordant pair: synthesize a phantom forward segment so the
    pair renders as two forward anchors (analyze_reads.py:427-615)."""
    aligns_covered.append(current_align)
    aligns_covered.append(next_align)

    if not current_align["is_reverse"]:
        # current forward, next reverse
        if len(help_aligns) != 0:
            return None
        help_aligns = [next_align]
        new_len = current_align["q_end"] - current_align["q_start"]

        if next_align["ref_end"] <= current_align["ref_end"]:
            added_next = {
                "q_start": next_align["q_end"],
                "q_end": next_align["q_end"] + new_len,
                "qual": current_align["qual"],
                "ref_id": current_align["ref_id"],
                "ref_start": current_align["ref_end"],
                "ref_end": current_align["ref_end"] + new_len,
                "is_reverse": current_align["is_reverse"],
                "read_name": current_align["read_name"],
            }
        else:
            fixed_inv_len = max(next_align["ref_end"] - current_align["ref_end"],
                                next_align["q_end"] - current_align["q_end"])
            added_next = {
                "q_start": current_align["q_end"] + fixed_inv_len,
                "q_end": current_align["q_end"] + fixed_inv_len + new_len,
                "qual": current_align["qual"],
                "ref_id": current_align["ref_id"],
                "ref_start": next_align["ref_end"],
                "ref_end": next_align["ref_end"] + new_len,
                "is_reverse": current_align["is_reverse"],
                "read_name": current_align["read_name"],
            }
        aligns_covered.append(added_next)
        sorted_aligns = sorted(aligns_covered,
                               key=lambda a: (a["q_start"], a["q_end"]))
        first_bkp = _gap_bkp(current_align["ref_end"], added_next["ref_start"],
                             1, added_next["ref_start"] - current_align["ref_end"])
        all_bkps, left_most, right_most = _collect_bkps(
            first_bkp, sorted_aligns, help_aligns)
        trim_segs(sorted_aligns, current_align, added_next)
        return Signature(ref_chr, left_most, right_most, "sigUncovered", qname,
                         sorted_aligns, all_bkps, "None")

    # current reverse, next forward
    if len(help_aligns) != 0:
        return None
    help_aligns = [current_align]
    new_len = next_align["q_end"] - next_align["q_start"]

    if current_align["ref_start"] >= next_align["ref_start"]:
        added_cur = {
            "q_start": 0,
            "q_end": new_len,
            "qual": current_align["qual"],
            "ref_id": current_align["ref_id"],
            "ref_start": next_align["ref_start"] - new_len,
            "ref_end": next_align["ref_start"] - 1,
            "is_reverse": next_align["is_reverse"],
            "read_name": current_align["read_name"],
        }
        shift = new_len
    else:
        fixed_inv_len = max(next_align["ref_start"] - current_align["ref_start"],
                            next_align["q_start"] - current_align["q_start"])
        added_cur = {
            "q_start": 0,
            "q_end": new_len,
            "qual": current_align["qual"],
            "ref_id": current_align["ref_id"],
            "ref_start": next_align["ref_start"] - fixed_inv_len - new_len,
            "ref_end": next_align["ref_start"] - fixed_inv_len - 1,
            "is_reverse": next_align["is_reverse"],
            "read_name": current_align["read_name"],
        }
        shift = new_len + abs((next_align["ref_start"] - current_align["ref_start"])
                              - (next_align["q_start"] - current_align["q_start"]))

    for align in aligns_covered:
        align["q_start"] += shift
        align["q_end"] += shift
    aligns_covered.append(added_cur)

    sorted_aligns = sorted(aligns_covered, key=lambda a: (a["q_start"], a["q_end"]))
    if next_align["ref_start"] <= added_cur["ref_end"]:
        # malformed-bkps branch of the reference (analyze_reads.py:545,593):
        # unreachable because added_cur['ref_end'] < next['ref_start'] by
        # construction; reference would crash the window worker here.
        raise UnreachableBranch("reference analyze_reads.py:545/593")
    first_bkp = [added_cur["ref_end"], next_align["ref_start"],
                 next_align["ref_start"] - added_cur["ref_end"]]
    all_bkps, left_most, right_most = _collect_bkps(
        first_bkp, sorted_aligns, help_aligns)
    trim_segs(sorted_aligns, added_cur, next_align)
    return Signature(ref_chr, left_most, right_most, "sigUncovered", qname,
                     sorted_aligns, all_bkps, "None")
