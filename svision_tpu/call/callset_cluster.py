"""Callset clustering of Uncovered records (the reference's dead --cluster).

Port of the v2.0 path `cluster_original_callset` (output.py:153-246 with its
helpers `cal_new_cluster` output.py:13-84 and `convert_to_vcf_format`
output.py:87-149), whose invocation is commented out in the driver
(SVision:389-394). Records carrying FILTER=Uncovered that share a chromosome
and base SV type and sit within 100 bp of each other (|dstart| <= 100 or
|dend| < 100, output.py:215) are merged into one averaged record whose FILTER
flips to PASS when at least two members merged; everything else passes
through unchanged, clustered lines appended after (the reference `cat`s the
normal file before the cluster file, output.py:240-242).

The reference code is unrunnable against its own current VCFs (that is why it
is dead): it reads `record.info['VAF']`, which `write_results_to_vcf` never
emits (output.py:581-583), and parses BKPS as `type:start-end` although
v1.2.1 reordered the field to `type:len-start-end` (output.py:565). This
port implements the intended semantics against the current format:

* VAF of a lone record is computed from the sample column as DV/(DV+DR)
  (the genotyper's definition, genotype.py:58-66) instead of the missing
  INFO key;
* BKPS triples are parsed and averaged as (len, start, end) and re-emitted
  in the current `type:len-start-end` layout;
* chromosome equality uses `==` (the reference's `is not` on strings,
  output.py:204, only works through small-string interning).

Kept verbatim: the `<=` / `<` asymmetry of the distance gates, ALT = the
bare SVTYPE string (not `<SVTYPE>`), REF = 'N', the averaged (not summed)
QUAL, coverage counted as all fetched alignments including supplementaries,
VAF = 1.0 when the merged span has zero coverage, and the `clusterd`
spelling of the output filename (SVision:392).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np

from svision_tpu.call.vcfout import VcfRecord, read_vcf
from svision_tpu.io.bam import BamReader


def _record_vaf(rec: VcfRecord) -> float:
    """DV/(DV+DR) from the GT:DR:DV sample column; 0.0 when absent/empty."""
    if len(rec.parts) < 10:
        return 0.0
    fmt = rec.parts[8].split(":")
    vals = rec.parts[9].split(":")
    try:
        dr = int(vals[fmt.index("DR")])
        dv = int(vals[fmt.index("DV")])
    except (ValueError, IndexError):
        return 0.0
    return round(dv / (dv + dr), 2) if (dv + dr) > 0 else 0.0


def _item_from_record(rec: VcfRecord) -> list:
    """[contig, pos, stop, svlen, base_type, svtype, support, reads, bkps,
    id, vaf, qual] — the uncovered_list row of output.py:185."""
    svtype = rec.info.get("SVTYPE", "")
    return [
        rec.contig,
        rec.pos,
        rec.stop,
        int(rec.info.get("SVLEN", 0)),
        svtype.replace("t", ""),
        svtype,
        int(rec.info.get("SUPPORT", 0)),
        [r for r in rec.reads if r],
        [b for b in rec.info.get("BKPS", "").split(",") if b],
        rec.id,
        _record_vaf(rec),
        float(rec.qual),
    ]


def cal_new_cluster(item_list: Sequence[list]) -> list:
    """Merge a list of uncovered items (output.py:13-84): coordinates,
    length and QUAL averaged; supports summed; reads / ids concatenated;
    BKPS triples grouped per sub-type for later averaging."""
    start_sum = end_sum = length_sum = 0
    qual_sum = 0.0
    chrom = ""
    sv_type = ""
    vaf = 0.0
    clustered_id = ""
    all_supports = 0
    all_reads: List[str] = []
    all_bkps = {}

    for item in item_list:
        chrom = item[0]
        start_sum += int(item[1])
        end_sum += int(item[2])
        length_sum += int(item[3])
        sv_type = item[5]
        all_supports += int(item[6])
        all_reads.extend(item[7])
        vaf = item[10]
        qual_sum += item[11]
        clustered_id = item[9] if clustered_id == "" \
            else clustered_id + "_" + str(item[9])
        for bkp in item[8]:
            sub_type, triple = bkp.split(":", 1)
            ln, start, end = (int(x) for x in triple.split("-"))
            all_bkps.setdefault(sub_type, ([], [], []))
            all_bkps[sub_type][0].append(ln)
            all_bkps[sub_type][1].append(start)
            all_bkps[sub_type][2].append(end)

    n = len(item_list)
    return [chrom, start_sum // n, end_sum // n, length_sum // n, sv_type,
            all_supports, ",".join(all_reads), all_bkps, clustered_id, vaf,
            n, int(qual_sum / n)]


def convert_to_vcf_format(new_cluster: list, bam: Optional[BamReader],
                          filter_type: str) -> str:
    """One VCF line for a merged cluster (output.py:87-149)."""
    (chrom, start, end, length, sv_type, sv_supports, all_reads, all_bkps,
     clustered_id, vaf_single, item_num, qual) = new_cluster

    if item_num == 1:
        vaf = vaf_single
    else:
        coverage = bam.count_overlapping(chrom, start, end) if bam else 0
        vaf = 1.0 if coverage == 0 else round(sv_supports / coverage, 2)

    bkps_parts = []
    for sub_type in sv_type.split("+"):
        if sub_type not in all_bkps:
            continue
        lns, starts, ends = all_bkps[sub_type]
        bkps_parts.append("{0}:{1}-{2}-{3}".format(
            sub_type, int(np.mean(lns)), int(np.mean(starts)),
            int(np.mean(ends))))
    info = "END={0};SVLEN={1};SVTYPE={2};SUPPORT={3};BKPS={4};VAF={5}".format(
        end, length, sv_type, sv_supports, ",".join(bkps_parts), vaf)
    if all_reads:
        info += ";READS=" + all_reads

    return "\t".join([chrom, str(start), clustered_id, "N", sv_type,
                      str(qual), filter_type, info])


def cluster_original_callset(callset_path: str, bam_path: str,
                             cluster_out_file: str,
                             thresh: int = 100) -> int:
    """Cluster Uncovered records of `callset_path` into merged calls and
    write `cluster_out_file` (output.py:153-246). Returns the number of
    clustered (merged, FILTER->PASS) records."""
    header, records = read_vcf(callset_path)
    uncovered = [_item_from_record(r) for r in records
                 if r.filter == "Uncovered"]
    normal = [r.line for r in records if r.filter != "Uncovered"]

    uncovered.sort(key=lambda item: item[1])
    accessed = [False] * len(uncovered)
    cluster_lines: List[str] = []
    n_merged = 0

    bam = BamReader(bam_path) if (uncovered and os.path.exists(bam_path)) \
        else None
    try:
        for i in range(len(uncovered)):
            if accessed[i]:
                continue
            item_list = [uncovered[i]]
            new_cluster = cal_new_cluster(item_list)
            for j in range(i + 1, len(uncovered)):
                if accessed[j]:
                    continue
                if uncovered[j][0] != new_cluster[0]:
                    continue
                if uncovered[j][4] != new_cluster[4].replace("t", ""):
                    continue
                # the reference's asymmetric gates: <= on start, < on end
                # (output.py:215)
                if abs(int(uncovered[j][1]) - new_cluster[1]) <= thresh or \
                        abs(int(uncovered[j][2]) - new_cluster[2]) < thresh:
                    accessed[j] = True
                    item_list.append(uncovered[j])
            new_cluster = cal_new_cluster(item_list)
            filter_type = "Uncovered" if len(item_list) == 1 else "PASS"
            if len(item_list) > 1:
                n_merged += 1
            cluster_lines.append(
                convert_to_vcf_format(new_cluster, bam, filter_type))
    finally:
        if bam is not None:
            bam.close()

    with open(cluster_out_file, "w") as out:
        for line in header:
            print(line, file=out)
        for line in normal:          # normal file first, clusters appended
            print(line, file=out)    # (the reference's cat order,
        for line in cluster_lines:   # output.py:240-242)
            print(line, file=out)
    return n_merged
