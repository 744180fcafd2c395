"""VCF assembly: per-region record emission, header, merge, QUAL rescale.

Port of output.py: write_results_to_vcf (:469-598), merge_split_vcfs
(:251-348) and cal_scores_max_min (:601-612), preserving record layout, the
QUAL formula, the Uncovered filter rule and the reference's ID-renumbering
quirk (string-vs-int first comparison, output.py:311-321).
"""

from __future__ import annotations

import collections
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from svision_tpu.call.genotype import genotyper
from svision_tpu.call.refine import refine_type


def write_results_to_vcf(vcf_out, score_out, region_potential_svtypes,
                         region: str, read_num_name_pair: Dict[str, str],
                         sig_types: List[str], sig_score_pair: Dict[str, str],
                         predict_scores: List[float],
                         sig_mechanisms_pair: Dict[str, str],
                         bam, options) -> None:
    """Emit one region's records (output.py:469-598). bam = open BamReader
    used by the genotyper."""
    if len(region_potential_svtypes) == 0:
        return

    mean_score = np.mean(predict_scores)
    avg_predict_score = (1 - round(mean_score, 2)) * 100

    all_support_reads = []
    all_mechanisms = []
    all_support_num = []
    all_sv_types = []
    all_sv_bkps = []
    all_sig_scores = []

    region_split = region.split("+")
    chrom = region_split[0]
    start = int(region_split[1])
    end = int(region_split[2])
    length = end - start

    for sv in region_potential_svtypes:
        sv_type, read_ids, sv_bkps = sv
        if len(read_ids) < options.min_support:
            continue
        all_sv_types.append(sv_type)
        all_support_num.append(str(len(read_ids)))
        all_sv_bkps.append(sv_bkps)
        all_support_reads.append([read_num_name_pair[r] for r in read_ids])
        all_sig_scores.append([sig_score_pair[r] for r in read_ids])
        all_mechanisms.append([sig_mechanisms_pair[r] for r in read_ids])

    sig_type_stat = collections.Counter(sig_types)
    if "sigUncovered" in sig_type_stat and \
            sig_type_stat["sigUncovered"] >= 0.75 * len(sig_types):
        filter_type = "Uncovered"
    else:
        filter_type = "PASS"

    for i in range(len(all_sv_types)):
        svsupp_info = "SUPPORT=" + all_support_num[i]
        svreads_info = "READS=" + ",".join(all_support_reads[i])

        sv_score_std = np.std([int(s) for s in all_sig_scores[i]]) \
            / int(all_support_num[i])
        sum_score = min(100, (sv_score_std + avg_predict_score))

        original_type = all_sv_types[i].split("+")
        refined_type, refined_bkps = refine_type(original_type,
                                                 all_sv_bkps[i], options)

        svbkps_info = "BKPS=" + ",".join(
            f"{refined_type[j]}:{refined_bkps[j][2]}-{refined_bkps[j][0]}"
            f"-{refined_bkps[j][1]}" for j in range(len(refined_type)))
        svtype_info = "SVTYPE=" + "+".join(refined_type)

        new_type = "<CSV>" if len(refined_type) >= 2 else "<SV>"

        if options.qname:
            info = (f"END={end};SVLEN={length};{svtype_info};{svsupp_info};"
                    f"{svbkps_info};{svreads_info}")
        else:
            info = (f"END={end};SVLEN={length};{svtype_info};{svsupp_info};"
                    f"{svbkps_info}")

        candidate = (chrom, start, end, refined_type)
        gt, dr, dv = genotyper(candidate, all_support_reads[i], bam, options)
        gt_format = f"GT:DR:DV\t{gt}:{dr}:{dv}"

        line = (f"{chrom}\t{start}\t0\tN\t{new_type}\t{sum_score}\t"
                f"{filter_type}\t{info}\t{gt_format}")
        print(sum_score, file=score_out)
        print(line, file=vcf_out)


def vcf_header_lines(ref, sample: str, graph: bool,
                     version: str = "1.4") -> List[str]:
    """Merged-VCF header (output.py:260-303). ref = open FastaFile."""
    lines = ["##fileformat=VCFv4.3", f"##source=SVision v{version}"]
    for chrom in ref.references:
        lines.append(f"##contig=<ID={chrom},length={ref.get_reference_length(chrom)}>")
    lines += [
        '##CHROM=<CHROM=XXX,Description="Chromosome ID">',
        '##POS=<POS=XXX,Description="Start position of the SV described in this region">',
        '##ID=<ID=XXX,Description="ID of the SV described in this region">',
        '##REF=<REF=N,Description="Ref\'s sequence in that region, default=N">',
        '##QUAL=<QUAL=XXX,Description="The SV quality of the SV described in this region">',
        '##ALT=<ID=SV,Description="Simple SVs">',
        '##ALT=<ID=CSV,Description="Complex or nested SVs">',
        '##FILTER=<ID=Covered,Description="Covered mean the SV is spanned by reads">',
        '##FILTER=<ID=Uncovered,Description="UnCovered mean the SV is not spanned by reads">',
        '##FILTER=<ID=Clustered,Description="Clustered mean the SV is not spanned by reads, but can be cluster together with others">',
        '##INFO=<ID=END,Number=1,Type=Integer,Description="End position of the SV described in this region">',
        '##INFO=<ID=SVLEN,Number=1,Type=Integer,Description="Difference in length between REF and ALT alleles">',
        '##INFO=<ID=BKPS,Number=.,Type=String,Description="All breakpoints (length-start-end) in this region, where CSV might contain multiple breakpoints.">',
        '##INFO=<ID=SVTYPE,Number=1,Type=String,Description="CNN predicted SV type, containing INS, DEL, DUP, tDUP (tandem duplication) and INV">',
        '##INFO=<ID=SUPPORT,Number=1,Type=Integer,Description="SV support number in this region">',
        '##INFO=<ID=READS,Number=.,Type=String,Description="SV support read names in this region">',
    ]
    if graph:
        lines += [
            '##INFO=<ID=GraphID,Number=1,Type=String,Description="The corresponding graph id of isomorphic CSV graph structures">',
            '##INFO=<ID=GFA_FILE_PREFIX,Number=1,Type=String,Description="File name of CSV corresponding GFA file">',
            '##INFO=<ID=GFA_S,Number=1,Type=String,Description="Nodes contained in a CSV graph represented based on GFA format">',
            '##INFO=<ID=GFA_L,Number=1,Type=String,Description="Links contained in a CSV graph represented based on GFA format">',
        ]
    lines += [
        '##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">',
        '##FORMAT=<ID=DR,Number=1,Type=Integer,Description="high-quality reference reads">',
        '##FORMAT=<ID=DV,Number=1,Type=Integer,Description="high-quality variant reads">',
        f"#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t{sample}",
    ]
    return lines


def merge_split_vcfs(in_dir: str, merged_vcf_path: str, max_score: float,
                     min_score: float, spec_chroms: Sequence[str],
                     ref, options) -> None:
    """Merge per-chrom VCF fragments: header + ID renumbering + global QUAL
    rescale (output.py:251-348)."""
    with open(merged_vcf_path, "w") as merged:
        for line in vcf_header_lines(ref, options.sample, options.graph):
            print(line, file=merged)

        id_num = -1
        for chrom in spec_chroms:
            vcf_path = os.path.join(
                in_dir, f"{chrom}.predict.s{options.min_support}.vcf")
            with open(vcf_path) as fh:
                previous_start = 0   # int on purpose: first str-compare is
                previous_end = 1     # always False (output.py:311-321 quirk)
                sub_num = 1
                for record in fh.readlines():
                    parts = str(record).split("\t")
                    start = parts[1]
                    end = parts[7].split(";")[0][4:]
                    if start == previous_start and end == previous_end:
                        id_str = f"{id_num}_{sub_num}"
                        sub_num += 1
                    else:
                        previous_start = start
                        previous_end = end
                        id_num += 1
                        sub_num = 1
                        id_str = str(id_num)
                    parts[2] = id_str

                    old_score = float(parts[5])
                    new_score = 100
                    if max_score != min_score:
                        new_score = int(100 - (round(
                            (old_score - min_score) / (max_score - min_score), 2)
                            * 100))
                    parts[5] = str(new_score)
                    merged.write("\t".join(parts))


def cal_scores_max_min(predict_path: str) -> List[float]:
    """All raw QUAL scores across per-chrom score files; '0' lines skipped
    (output.py:601-612)."""
    all_scores = []
    for fname in os.listdir(predict_path):
        if "score.txt" not in fname:
            continue
        with open(os.path.join(predict_path, fname)) as fin:
            for line in fin.readlines():
                if line.strip() == "0":
                    continue
                all_scores.append(float(line.strip()))
    return all_scores


# ---------------------------------------------------------------------------
# minimal VCF reading (for the graph-annotation step; replaces
# pysam.VariantFile usage in graph.py:535-556)
# ---------------------------------------------------------------------------

class VcfRecord:
    def __init__(self, line: str):
        self.line = line.rstrip("\n")
        parts = self.line.split("\t")
        self.contig = parts[0]
        self.pos = int(parts[1])          # 1-based POS as written
        self.id = parts[2]
        self.alt = parts[4]
        self.qual = parts[5]
        self.filter = parts[6]
        self.info: Dict[str, str] = {}
        for item in parts[7].split(";"):
            if "=" in item:
                k, v = item.split("=", 1)
                self.info[k] = v
            else:
                self.info[item] = ""
        self.parts = parts

    @property
    def stop(self) -> int:
        return int(self.info.get("END", self.pos))

    @property
    def reads(self) -> Tuple[str, ...]:
        return tuple(self.info.get("READS", "").split(","))


def read_vcf(path: str) -> Tuple[List[str], List[VcfRecord]]:
    header = []
    records = []
    with open(path) as fh:
        for line in fh:
            if line.startswith("#"):
                header.append(line.rstrip("\n"))
            elif line.strip():
                records.append(VcfRecord(line))
    return header, records
