"""C16 repeat-annotation parsers vs the reference implementation
(src/network/annotation.py), executed via the ref harness on the same
fixtures (SURVEY.md §2.1 C16)."""

import os
import sys
import textwrap

import pytest

from svision_tpu.call import annotation


# A structurally faithful RepeatMasker .tbl summary: the reference keys on
# line numbers 6/11/15/20/37/39 (annotation.py:12-66); the labelled rows
# below land exactly on those lines.
RPMASK_TBL = """\
==================================================
file name: chr20-5015546-5015860.fa
sequences:             1
total length:        315 bp  (315 bp excl N/X-runs)
GC level:         41.27 %
bases masked:        280 bp ( 88.89 %)
==================================================
               number of      length   percentage
               elements*    occupied  of sequence
--------------------------------------------------
SINEs:                1          215 bp   68.25 %
      ALUs            1          215 bp   68.25 %
      MIRs            0            0 bp    0.00 %

LINEs:                0            0 bp    0.00 %
      LINE1           0            0 bp    0.00 %
      LINE2           0            0 bp    0.00 %
      L3/CR1          0            0 bp    0.00 %

LTR elements:         1           65 bp   20.63 %
      ERVL            0            0 bp    0.00 %
      ERVL-MaLRs      1           65 bp   20.63 %
      ERV_classI      0            0 bp    0.00 %
      ERV_classII     0            0 bp    0.00 %

DNA elements:         0            0 bp    0.00 %
     hAT-Charlie      0            0 bp    0.00 %
     TcMar-Tigger     0            0 bp    0.00 %

Unclassified:         0            0 bp    0.00 %

Total interspersed repeats:     280 bp   88.89 %


Small RNA:            0            0 bp    0.00 %

Satellites:           0            0 bp    0.00 %
Simple repeats:       0            0 bp    0.00 %
Low complexity:       0            0 bp    0.00 %
==================================================
"""

RPMASK_TBL_EMPTY = RPMASK_TBL.replace(
    "bases masked:        280 bp ( 88.89 %)",
    "bases masked:          0 bp (  0.00 %)")


def _trf_html(blocks, region="chr20-5453209-5453361"):
    """Minimal TRF .html report: one <pre> whose contents alternate text and
    anchor tags, mirroring what soup.find('pre').contents yields."""
    start, end = (int(x) for x in region.rsplit("-", 2)[1:3])
    head = (f"Sequence: {region}\n\n"
            f"Parameters: 2 7 7 80 10 50 500\n\n"
            f"Length: {end - start + 1}\n")
    parts = ["<HTML><BODY><PRE>", head]
    for i, (motif, matches) in enumerate(blocks):
        parts.append(f'<A NAME="{i}"></A>')
        rows = "\n".join(
            f"  {start + j * len(motif)} {motif}\n    {'*' * len(motif)}\n"
            f"    1 {motif}" for j in range(2))
        parts.append(textwrap.dedent(f"""\

            Indices: {start}--{end} Score: 231
            Period size: {len(motif)} Copynumber: 10.3 Consensus size: {len(motif)}

            {rows}

            Statistics
            Matches: {matches},  Mismatches: 4, Indels: 2

            Consensus pattern ({len(motif)} bp):
            {motif}

            """))
    parts.append("</PRE></BODY></HTML>")
    return "".join(parts)


def test_process_tbl(tmp_path):
    tbl = tmp_path / "region.fa.tbl"
    tbl.write_text(RPMASK_TBL)
    got = annotation.process_tbl(str(tbl))
    assert got == ["masked:88.89", "SINE:68.25", "LINE:0.00",
                   "LTR:20.63", "satellite:0.00", "lowCom:0.00"]


def test_process_tbl_matches_reference(tmp_path):
    from tests import ref_harness
    ref = ref_harness.load_reference_module("src.network.annotation")
    tbl = tmp_path / "region.fa.tbl"
    tbl.write_text(RPMASK_TBL)
    assert annotation.process_tbl(str(tbl)) == ref.process_tbl(str(tbl))
    assert annotation.parse_rpmask(str(tbl)) == ref.parse_rpmask(str(tbl))


def test_parse_rpmask(tmp_path):
    tbl = tmp_path / "region.fa.tbl"
    tbl.write_text(RPMASK_TBL)
    assert annotation.parse_rpmask(str(tbl)) == ["SINE:68.25", "LTR:20.63"]

    empty = tmp_path / "empty.fa.tbl"
    empty.write_text(RPMASK_TBL_EMPTY)
    assert annotation.parse_rpmask(str(empty)) == -1


def test_parse_trf_str(tmp_path):
    html = tmp_path / "r.fa.2.7.7.80.10.50.500.1.txt.html"
    html.write_text(_trf_html([("ATTCG", 120), ("ATT", 80)]))
    got = annotation.parse_trf(str(html))
    # region length 153; best block has 120 matches -> 78.43%
    assert got == "STRs:78.43"


def test_parse_trf_vntr_and_empty(tmp_path):
    html = tmp_path / "v.fa.2.7.7.80.10.50.500.1.txt.html"
    html.write_text(_trf_html([("ATTCGGA", 140)]))
    got = annotation.parse_trf(str(html))
    assert isinstance(got, str) and got.startswith("VNTRs:")

    empty = tmp_path / "e.fa.2.7.7.80.10.50.500.1.txt.html"
    empty.write_text("<HTML><BODY><PRE>Sequence: chr1-10-20\n</PRE></BODY></HTML>")
    assert annotation.parse_trf(str(empty)) == -1


def test_parse_trf_hyphenated_contig(tmp_path):
    """GRCh38 ALT/HLA contigs contain '-'; the region parse must rsplit."""
    html = tmp_path / "h.fa.2.7.7.80.10.50.500.1.txt.html"
    html.write_text(_trf_html([("ATTCG", 120)],
                              region="HLA-DRB1*13:01:01-2000-2152"))
    got = annotation.parse_trf(str(html))
    assert isinstance(got, str) and got.startswith("STRs:")


def test_annotate_mechanisms(tmp_path):
    """Full v2.0 path on pre-generated tool outputs (output.py:683-746)."""
    from svision_tpu.config import default_options

    out_dir = tmp_path / "mech"
    rp_dir = out_dir / "rpmask"
    trf_dir = out_dir / "trf"
    rp_dir.mkdir(parents=True)
    trf_dir.mkdir(parents=True)

    (rp_dir / "chr1-1000-1400.fa.tbl").write_text(RPMASK_TBL)
    (trf_dir / "chr1-2000-2300.fa.2.7.7.80.10.50.500.1.txt.html").write_text(
        _trf_html([("ATTCG", 120)], region="chr1-2000-2300"))

    vcf = tmp_path / "merged.vcf"
    vcf.write_text(
        "##fileformat=VCFv4.3\n"
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        "chr1\t1000\t1\tN\t<SV>\t50\tPASS\t"
        "END=1400;SVTYPE=DEL;MECHANISM=NHEJ+2\tGT\t0/1\n"
        "chr1\t2000\t2\tN\t<SV>\t50\tPASS\t"
        "END=2300;SVTYPE=INS;MECHANISM=None\tGT\t0/1\n"
        "chr1\t3000\t3\tN\t<SV>\t50\tPASS\t"
        "END=3100;SVTYPE=DEL;MECHANISM=AltEJ-3\tGT\t0/1\n")

    options = default_options(out_path=str(tmp_path), min_support=5)
    out = annotation.annotate_mechanisms(str(vcf), str(out_dir), options)
    recs = [l.split("\t") for l in open(out) if not l.startswith("#")]
    assert "MECHANISM=SINE:68.25,LTR:20.63" in recs[0][7]
    mech1 = [t for t in recs[1][7].split(";") if t.startswith("MECHANISM=")][0]
    assert mech1.startswith("MECHANISM=STRs:")
    # record without tool output keeps its CIGAR-derived mechanism
    assert "MECHANISM=AltEJ-3" in recs[2][7]
