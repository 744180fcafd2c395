"""Call-layer golden parity: refine/genotype/VCF writer/merge vs reference."""
import os
import random
from io import StringIO

import numpy as np
import pytest

from tests import ref_harness
from svision_tpu.call.refine import refine_type
from svision_tpu.call.genotype import genotyper
from svision_tpu.call.vcfout import (write_results_to_vcf, merge_split_vcfs,
                                     cal_scores_max_min)
from svision_tpu.infer.aggregate import get_region_potential_svtypes
from svision_tpu.config import default_options
from svision_tpu.io.fasta import write_fasta, FastaFile

ref_harness.install_fake_pysam()
import sys
import types

# annotation.py needs bs4 only on a dead path; stub the package + submodule
if "bs4" not in sys.modules:
    bs4 = types.ModuleType("bs4")
    bs4.__path__ = []  # mark as package
    bs4.BeautifulSoup = object
    element = types.ModuleType("bs4.element")
    element.NavigableString = str
    bs4.element = element
    sys.modules["bs4"] = bs4
    sys.modules["bs4.element"] = element

if ref_harness.REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, ref_harness.REFERENCE_ROOT)

import src.network.output as REF_OUTPUT           # noqa: E402
import src.network.genotype as REF_GENOTYPE       # noqa: E402


def _rand_types_bkps(rng):
    n = rng.randint(1, 4)
    pool = ["DEL", "INS", "INV", "DUP", "tDUP"]
    types = [rng.choice(pool) for _ in range(n)]
    bkps = [[rng.randint(0, 10000), rng.randint(0, 10000), rng.randint(1, 3000)]
            for _ in range(n)]
    return types, bkps


def test_refine_type_parity():
    rng = random.Random(0)
    opts = default_options()
    ref_opts = ref_harness.ref_options("x")
    for _ in range(500):
        types, bkps = _rand_types_bkps(rng)
        import copy
        t1, b1 = copy.deepcopy(types), copy.deepcopy(bkps)
        t2, b2 = copy.deepcopy(types), copy.deepcopy(bkps)
        got = refine_type(t1, b1, opts)
        want = REF_OUTPUT.refine_type(t2, b2, ref_opts)
        assert got == tuple(want) or list(got) == list(want), (types, bkps)


def test_aggregate_parity():
    import src.network.predict as REF_PREDICT
    rng = random.Random(1)
    for _ in range(50):
        reads_dict = {}
        for r in range(rng.randint(1, 8)):
            type_ids = rng.sample(range(5), rng.randint(1, 3))
            reads_dict[str(r) if rng.random() < 0.8 else f"{r}"] = {
                t: [rng.randint(0, 9999), rng.randint(0, 9999),
                    rng.randint(1, 500)] for t in type_ids}
        import copy
        p = REF_PREDICT.Predict("chr1", "unused")
        want = p.get_region_potential_svtypes(copy.deepcopy(reads_dict))
        got = get_region_potential_svtypes(copy.deepcopy(reads_dict))
        assert got == want


@pytest.fixture()
def genotype_env(tmp_path):
    """Shared fake-BAM + our-BAM env for genotyper comparison."""
    from svision_tpu.io.bamwrite import SamRecord, write_bam
    rng = random.Random(2)
    fakes = []
    recs = []
    for i in range(60):
        pos = rng.randrange(5000, 15000)
        m = rng.randrange(500, 4000)
        flag = rng.choice([0, 0, 0, 16, 256, 2048])
        f = ref_harness.FakeAlignedSegment()
        f.query_name = f"g{i}"
        f.reference_name = "chr1"
        f.reference_start = pos
        f.is_reverse = bool(flag & 16)
        f.is_secondary = bool(flag & 256)
        f.is_supplementary = bool(flag & 2048)
        f.mapping_quality = rng.choice([0, 5, 30, 60])
        f.cigarstring = f"{m}M"
        f.query_sequence = "A" * m
        fakes.append(f)
        recs.append(SamRecord(f"g{i}", flag | (0 if f.mapping_quality else 0),
                              "chr1", pos, f.mapping_quality, f"{m}M", "A" * m))
    ref_harness.FakeAlignmentFile.registry["geno.bam"] = {
        "refs": ["chr1"], "reads": fakes, "lengths": {"chr1": 1000000}}
    bam_path = str(tmp_path / "geno.bam")
    write_bam(bam_path, [("chr1", 1000000)], recs)
    return bam_path


def test_genotyper_parity(genotype_env):
    from svision_tpu.io.bam import BamReader
    rng = random.Random(3)
    opts = default_options(bam_path="geno.bam")
    ref_opts = ref_harness.ref_options("x", bam_path="geno.bam")
    bam = BamReader(genotype_env)
    for _ in range(40):
        start = rng.randrange(6000, 12000)
        end = start + rng.randrange(100, 4000)
        svtype = rng.choice([["DEL"], ["INS"], ["INV"], ["DUP"],
                             ["DEL", "INS"]])
        support = [f"g{rng.randrange(60)}" for _ in range(rng.randint(1, 6))]
        want = REF_GENOTYPE.genotyper(("chr1", start, end, svtype),
                                      list(support), ref_opts)
        got = genotyper(("chr1", start, end, svtype), list(support), bam, opts)
        assert got == want, (start, end, svtype, support)


def _region_inputs(rng):
    region = f"chr1+{rng.randrange(1000, 9000)}+{rng.randrange(9001, 20000)}+30"
    n_sv = rng.randint(1, 3)
    svtypes = []
    rid = 0
    read_num_name = {}
    sig_score = {}
    sig_mech = {}
    sig_types = []
    predict_scores = []
    for _ in range(n_sv):
        ids = []
        for _ in range(rng.randint(1, 6)):
            key = str(rid)
            ids.append(key)
            read_num_name[key] = f"read{rid}"
            sig_score[key] = str(rng.randint(0, 900))
            sig_mech[key] = rng.choice(["None", "NHEJ+1", "NAHR-30"])
            sig_types.append(rng.choice(["sigGap", "sigDup", "sigUncovered"]))
            predict_scores.append(round(rng.random(), 2))
            rid += 1
        tset = rng.sample(["DEL", "INS", "INV", "DUP", "tDUP"],
                          rng.randint(1, 3))
        bkps = [[rng.randint(0, 9999), rng.randint(0, 9999),
                 rng.randint(1, 900)] for _ in tset]
        svtypes.append(("+".join(tset), ids, bkps))
    return region, svtypes, read_num_name, sig_types, sig_score, \
        predict_scores, sig_mech


def test_write_results_to_vcf_parity(genotype_env, tmp_path):
    from svision_tpu.io.bam import BamReader
    import copy
    rng = random.Random(4)
    opts = default_options(bam_path="geno.bam", min_support=2, qname=True)
    ref_opts = ref_harness.ref_options("x", bam_path="geno.bam",
                                       min_support=2, qname=True)
    bam = BamReader(genotype_env)
    for trial in range(25):
        (region, svtypes, names, stypes, sscore, pscores,
         smech) = _region_inputs(rng)
        ref_vcf, ref_score = StringIO(), StringIO()
        REF_OUTPUT.write_results_to_vcf(
            ref_vcf, ref_score, copy.deepcopy(svtypes), region, names,
            list(stypes), sscore, list(pscores), smech, ref_opts)
        our_vcf, our_score = StringIO(), StringIO()
        write_results_to_vcf(our_vcf, our_score, copy.deepcopy(svtypes),
                             region, names, list(stypes), sscore,
                             list(pscores), smech, bam, opts)
        assert our_vcf.getvalue() == ref_vcf.getvalue(), trial
        assert our_score.getvalue() == ref_score.getvalue(), trial


def test_merge_split_vcfs_parity(tmp_path):
    rng = random.Random(5)
    genome = str(tmp_path / "g.fa")
    write_fasta(genome, {"chr1": "ACGT" * 2500, "chr2": "ACGT" * 1000})

    pred_dir = tmp_path / "predict_results"
    pred_dir.mkdir()
    scores = []
    for chrom in ("chr1", "chr2"):
        lines = []
        for i in range(12):
            start = rng.randrange(100, 9000)
            end = start + rng.randrange(50, 800)
            q = rng.choice([0, round(rng.uniform(1, 100), 3),
                            round(rng.uniform(1, 100), 3)])
            # duplicated start/end pair to exercise the id_sub path
            reps = 2 if i % 5 == 0 else 1
            for _ in range(reps):
                lines.append(
                    f"{chrom}\t{start}\t0\tN\t<SV>\t{q}\tPASS\tEND={end};"
                    f"SVLEN={end-start};SVTYPE=DEL;SUPPORT=5;"
                    f"BKPS=DEL:100-{start}-{end}\tGT:DR:DV\t0/1:3:5\n")
                if q != 0:
                    scores.append(q)
        with open(pred_dir / f"{chrom}.predict.s5.vcf", "w") as fh:
            fh.writelines(lines)
        with open(pred_dir / f"{chrom}.predict.s5.score.txt", "w") as fh:
            fh.write("".join(f"{l.split(chr(9))[5]}\n" for l in lines))

    got_scores = cal_scores_max_min(str(pred_dir))
    want_scores = REF_OUTPUT.cal_scores_max_min(str(pred_dir))
    assert got_scores == want_scores

    mx, mn = np.max(got_scores), np.min(got_scores)
    ref_opts = ref_harness.ref_options(genome, sample="s1")
    opts = default_options(genome=genome, sample="s1")

    ref_out = str(tmp_path / "ref_merged.vcf")
    REF_OUTPUT.merge_split_vcfs(str(pred_dir), ref_out, mx, mn,
                                ["chr1", "chr2"], ref_opts)
    our_out = str(tmp_path / "our_merged.vcf")
    merge_split_vcfs(str(pred_dir), our_out, mx, mn, ["chr1", "chr2"],
                     FastaFile(genome), opts)
    assert open(our_out).read() == open(ref_out).read()
