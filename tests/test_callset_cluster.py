"""--cluster: Uncovered-callset clustering (reference output.py:153-246,
invocation commented at SVision:389-394)."""
import os

from svision_tpu.call.callset_cluster import cluster_original_callset
from svision_tpu.io.bamwrite import SamRecord, write_bam

HEADER = "\n".join([
    "##fileformat=VCFv4.3",
    "##contig=<ID=chr1,length=100000>",
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS",
])


def _rec(pos, end, svtype, support, filt, rid, qual=50, dr=5, dv=3,
         reads=None):
    ln = end - pos
    info = (f"END={end};SVLEN={ln};SVTYPE={svtype};SUPPORT={support};"
            f"BKPS={svtype}:{ln}-{pos}-{end}")
    if reads:
        info += ";READS=" + ",".join(reads)
    return (f"chr1\t{pos}\t{rid}\tN\t<SV>\t{qual}\t{filt}\t{info}\t"
            f"GT:DR:DV\t0/1:{dr}:{dv}")


def _write_inputs(tmp_path, lines):
    vcf = str(tmp_path / "calls.vcf")
    with open(vcf, "w") as fh:
        fh.write(HEADER + "\n" + "\n".join(lines) + "\n")
    # 10 reads spanning the merged DEL locus -> coverage denominator
    bam = str(tmp_path / "cov.bam")
    recs = [SamRecord(f"r{i}", 0, "chr1", 4000, 60, "3000M", "A" * 3000)
            for i in range(10)]
    write_bam(bam, [("chr1", 100000)], recs)
    return vcf, bam


def test_merge_and_passthrough(tmp_path):
    lines = [
        _rec(1000, 1400, "INS", 4, "PASS", "0"),            # passes through
        _rec(5000, 5300, "DEL", 3, "Uncovered", "1",
             reads=["a", "b", "c"]),
        _rec(5050, 5350, "DEL", 2, "Uncovered", "2", qual=70,
             reads=["d", "e"]),                              # merges with 1
        _rec(5040, 5140, "INS", 2, "Uncovered", "3"),        # type mismatch
        _rec(9000, 9220, "tDUP", 2, "Uncovered", "4", dr=6, dv=2),  # lone
    ]
    vcf, bam = _write_inputs(tmp_path, lines)
    out = str(tmp_path / "clusterd.vcf")
    n = cluster_original_callset(vcf, bam, out)
    assert n == 1

    body = [l.rstrip("\n") for l in open(out) if not l.startswith("#")]
    # normal records first, cluster lines appended (the reference's cat
    # order, output.py:240-242)
    assert body[0] == lines[0]
    clustered = body[1:]
    assert len(clustered) == 3

    merged = [l for l in clustered if l.split("\t")[6] == "PASS"]
    assert len(merged) == 1
    cols = merged[0].split("\t")
    # averaged start, '_'-joined ids, ALT = bare SVTYPE, averaged QUAL
    assert cols[1] == "5025" and cols[2] == "1_2"
    assert cols[3] == "N" and cols[4] == "DEL" and cols[5] == "60"
    info = dict(kv.split("=", 1) for kv in cols[7].split(";"))
    assert info["END"] == "5325" and info["SVLEN"] == "300"
    assert info["SUPPORT"] == "5"                      # summed
    assert info["BKPS"] == "DEL:300-5025-5325"         # averaged triple
    assert info["READS"] == "a,b,c,d,e"
    assert info["VAF"] == "0.5"                        # 5 / 10 fetched reads

    # lone Uncovered records keep FILTER and get VAF from DV/(DV+DR)
    lone = {l.split("\t")[2]: l for l in clustered
            if l.split("\t")[6] == "Uncovered"}
    assert set(lone) == {"3", "4"}
    assert "VAF=0.25" in lone["4"]                     # 2/(6+2)
    assert "VAF=0.38" in lone["3"]                     # 3/(5+3) rounded


def test_same_type_far_apart_not_merged(tmp_path):
    lines = [
        _rec(5000, 5300, "DEL", 3, "Uncovered", "1"),
        _rec(20000, 20300, "DEL", 3, "Uncovered", "2"),
    ]
    vcf, bam = _write_inputs(tmp_path, lines)
    out = str(tmp_path / "clusterd.vcf")
    assert cluster_original_callset(vcf, bam, out) == 0
    body = [l for l in open(out) if not l.startswith("#")]
    assert len(body) == 2
    assert all(l.split("\t")[6] == "Uncovered" for l in body)


def test_tdup_merges_with_dup(tmp_path):
    """The 't'-stripped base-type comparison (output.py:184,209) puts DUP
    and tDUP in the same cluster."""
    lines = [
        _rec(5000, 5300, "DUP", 3, "Uncovered", "1"),
        _rec(5010, 5310, "tDUP", 2, "Uncovered", "2"),
    ]
    vcf, bam = _write_inputs(tmp_path, lines)
    out = str(tmp_path / "clusterd.vcf")
    assert cluster_original_callset(vcf, bam, out) == 1
    body = [l for l in open(out) if not l.startswith("#")]
    assert len(body) == 1 and body[0].split("\t")[6] == "PASS"
    # sv_type of the cluster = the LAST member's full SVTYPE
    # (cal_new_cluster overwrites it per item, output.py:43)
    assert body[0].split("\t")[4] == "tDUP"
    # BKPS iterates the final sv_type's components (output.py:126-129), so
    # only the tDUP member's triple survives — the DUP member's breakpoints
    # are dropped from the merged record (reference behavior)
    info = dict(kv.split("=", 1) for kv in body[0].split("\t")[7].split(";"))
    assert info["BKPS"] == "tDUP:300-5010-5310"


def test_missing_bam_means_zero_coverage_vaf_one(tmp_path):
    lines = [
        _rec(5000, 5300, "DEL", 3, "Uncovered", "1"),
        _rec(5050, 5350, "DEL", 2, "Uncovered", "2"),
    ]
    vcf, _ = _write_inputs(tmp_path, lines)
    out = str(tmp_path / "clusterd.vcf")
    assert cluster_original_callset(vcf, str(tmp_path / "absent.bam"),
                                    out) == 1
    merged = [l for l in open(out) if not l.startswith("#")][0]
    assert "VAF=1.0" in merged          # coverage 0 -> 1.0 (output.py:137)
