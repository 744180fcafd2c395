"""Per-window signature collection orchestrator.

Behavioral port of `analyze_alignments` (collect_signatures.py:114-310): group
fetched alignments by read name, run inter-/intra-alignment analysis, and emit
Signatures for adjacent main-segment pairs plus the first/last-reversed special
cases.
"""

from __future__ import annotations

from typing import Dict, Iterable, List

from svision_tpu.collect.gaps import analyze_gap, UnreachableBranch
from svision_tpu.collect.records import Aln
from svision_tpu.collect.segments import analyze_between_aligns, analyze_inside_align
from svision_tpu.collect.classes import Signature


def analyze_alignments(aligns: Iterable[Aln], options, ref) -> List[Signature]:
    """Collect signatures from all alignments in one genomic window.

    `ref` is an open FASTA reader (.fetch(chrom, start, end)); replaces the
    reference's per-event pysam.FastaFile reopen (analyze_reads.py:42-46).
    """
    min_mapq = 0 if options.contig else options.min_mapq

    # group by qname keeping primaries + supplementaries
    # (collect_signatures.py:130-155)
    reads_dict: Dict[str, List[Aln]] = {}
    for align in aligns:
        if align.cigar_len == 0:
            continue
        if align.is_unmapped or align.is_secondary or align.mapq < min_mapq:
            continue
        reads_dict.setdefault(align.query_name, []).append(align)

    generate_graph = None
    if options.graph:
        from svision_tpu.collect.graph import generate_graph

    seg_signatures: List[Signature] = []
    for qname, this_aligns in reads_dict.items():
        pm_align = None
        supp_aligns = []
        for align in this_aligns:
            if not align.is_supplementary:
                pm_align = align
            else:
                supp_aligns.append(align)
        if pm_align is None:
            continue

        # supplementaries adopt the primary's full sequence
        # (collect_signatures.py:185-186)
        for sa in supp_aligns:
            sa.query_sequence = pm_align.query_sequence
        whole_read_seq = pm_align.query_sequence

        majors, minors = analyze_between_aligns(pm_align, supp_aligns, options,
                                                ref=ref)
        all_segs = list(minors)
        for seg_dict in majors:
            # the Aln carries the decoded (H->S rewritten) op list already --
            # no cigar string round-trip (reference: cigar_to_list on
            # .cigarstring, collect_signatures.py:204)
            cigar = seg_dict["cigar"]
            mj, mn = analyze_inside_align(seg_dict, cigar, options, ref=ref)
            if mj is None and mn is None:
                all_segs.append(seg_dict)
            else:
                all_segs.extend(mj)
                all_segs.extend(mn)
        sorted_segs = sorted(all_segs, key=lambda a: (a["q_start"], a["q_end"]))

        if len(sorted_segs) <= 1:
            continue

        if getattr(options, "dotplots", False):
            # the reference's debug_plot dumps (collect_signatures.py:103-111,
            # call sites commented at :230,247)
            import os
            from svision_tpu.ops.dotplot import dump_read_dotplot
            dump_read_dotplot(sorted_segs, qname,
                              os.path.join(options.out_path, "dotplots"))

        def _emit(cur, nxt, helps, next_is_last=True):
            graph = None
            if generate_graph is not None:
                graph = generate_graph(cur, nxt, list(helps), options.min_sv_size,
                                       whole_read_seq, ref, qname, next_is_last)
            try:
                sig = analyze_gap(cur, nxt, ref, options, helps)
            except UnreachableBranch:
                raise  # window worker converts to an error, like the reference
            if sig is not None:
                sig.set_graph(graph)
                seg_signatures.append(sig)

        if len(sorted_segs) == 2:
            _emit(sorted_segs[0].copy(), sorted_segs[1].copy(), [])
            continue

        # first/last reversed-segment special cases
        # (collect_signatures.py:249-274)
        if sorted_segs[0]["is_reverse"]:
            _emit(sorted_segs[0].copy(), sorted_segs[1].copy(), [])
        if sorted_segs[-1]["is_reverse"]:
            _emit(sorted_segs[-2].copy(), sorted_segs[-1].copy(), [])

        main_aligns = []
        main_index = []
        for i, seg in enumerate(sorted_segs):
            if seg["type"] == "main":
                main_aligns.append(seg)
                main_index.append(i)

        for i in range(len(main_aligns) - 1):
            cur = main_aligns[i].copy()
            nxt = main_aligns[i + 1].copy()
            if nxt["q_start"] - cur["q_end"] < -25:
                continue  # read-gap gate (collect_signatures.py:293-294)
            helps = sorted_segs[main_index[i] + 1: main_index[i + 1]]
            _emit(cur, nxt, helps, next_is_last=(i == len(main_aligns) - 2))

    return seg_signatures
