"""Golden parity: svision_tpu collection engine vs the actual reference code.

Randomized synthetic reads (CIGAR indels + split/supplementary layouts) are fed
to both the reference (executed via tests/ref_harness with fake pysam) and the
svision_tpu port; signatures, clusters and candidate bed lines must match
exactly (SURVEY.md §4(1),(3)).
"""

import random

import numpy as np
import pytest

from tests import ref_harness
from svision_tpu.collect.records import Aln, cigar_from_string, hard_to_soft
from svision_tpu.collect.signatures import analyze_alignments
from svision_tpu.collect.cluster import partition_and_cluster
from svision_tpu.collect.candidates import clusters_to_candidates, proc_one_sig
from svision_tpu.config import default_options
from svision_tpu.io.fasta import write_fasta, FastaFile

REF = ref_harness.import_reference()

GENOME_LEN = 200000


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    rng = random.Random(42)
    seq = "".join(rng.choice("ACGT") for _ in range(GENOME_LEN))
    path = str(tmp_path_factory.mktemp("genome") / "ref.fa")
    write_fasta(path, {"chr1": seq})
    return path


def _fake_read(qname, parts, seq_len, rng):
    """Build one read as FakeAlignedSegment list + equivalent Aln list.

    parts: list of dicts(flag, ref_start, cigar) — cigar must be consistent
    with seq_len after H->S.
    """
    seq = "".join(rng.choice("ACGT") for _ in range(seq_len))
    fakes, alns = [], []
    for p in parts:
        f = ref_harness.FakeAlignedSegment()
        f.query_name = qname
        f.reference_id = 0
        f.reference_name = "chr1"
        f.reference_start = p["ref_start"]
        f.flag = p["flag"]
        f.is_reverse = bool(p["flag"] & 0x10)
        f.is_supplementary = bool(p["flag"] & 0x800)
        f.is_secondary = bool(p["flag"] & 0x100)
        f.is_unmapped = False
        f.mapping_quality = p.get("mapq", 60)
        f.cigarstring = p["cigar"]
        if not f.is_supplementary:
            f.query_sequence = seq
        fakes.append(f)
        alns.append(Aln(
            query_name=qname, reference_name="chr1", reference_id=0,
            reference_start=p["ref_start"], flag=p["flag"],
            mapping_quality=p.get("mapq", 60),
            cigar=hard_to_soft(cigar_from_string(p["cigar"])),
            query_sequence=seq if not bool(p["flag"] & 0x800) else None))
    return fakes, alns


def _run_reference(fakes, options):
    bam = ref_harness.FakeAlignmentFile("fake.bam")
    return REF.collect.analyze_alignments(fakes, bam, options, 0)


def _cigar_for_span(read_span, ref_span, lead, tail, rng, min_sv=50):
    """Random cigar consuming read_span query and ref_span reference bases,
    optionally with one long I or D event."""
    ops = []
    if lead:
        ops.append(f"{lead}S")
    if read_span == ref_span:
        ops.append(f"{read_span}M")
    elif read_span > ref_span:
        ins = read_span - ref_span
        m1 = rng.randint(1, ref_span - 1)
        ops += [f"{m1}M", f"{ins}I", f"{ref_span - m1}M"]
    else:
        dl = ref_span - read_span
        m1 = rng.randint(1, read_span - 1)
        ops += [f"{m1}M", f"{dl}D", f"{read_span - m1}M"]
    if tail:
        ops.append(f"{tail}S")
    return "".join(ops)


def _random_reads(rng, n_reads, genome_len=GENOME_LEN):
    """Mix of read shapes: CIGAR DEL/INS, split DEL/INV/DUP, noise."""
    all_fakes, all_alns = [], []
    for ri in range(n_reads):
        qname = f"read{ri}"
        kind = rng.choice(["cigar_del", "cigar_ins", "split_del", "split_inv",
                           "split_dup", "clean", "multi", "small_noise",
                           "mixed_noise"])
        anchor = rng.randint(1000, genome_len - 20000)
        sv = rng.randint(50, 800)
        m = rng.randint(300, 3000)

        if kind == "cigar_del":
            parts = [dict(flag=0, ref_start=anchor,
                          cigar=f"{m}M{sv}D{m}M")]
            seq_len = 2 * m
        elif kind == "cigar_ins":
            parts = [dict(flag=0, ref_start=anchor,
                          cigar=f"{m}M{sv}I{m}M")]
            seq_len = 2 * m + sv
        elif kind == "split_del":
            seq_len = 2 * m
            parts = [
                dict(flag=0, ref_start=anchor, cigar=f"{m}M{m}S"),
                dict(flag=2048, ref_start=anchor + m + sv,
                     cigar=f"{m}H{m}M"),
            ]
        elif kind == "split_inv":
            seq_len = 3 * m
            parts = [
                dict(flag=0, ref_start=anchor, cigar=f"{m}M{2 * m}S"),
                dict(flag=2048 | 16, ref_start=anchor + m + 20,
                     cigar=f"{m}S{m}M{m}S"),
                dict(flag=2048, ref_start=anchor + 2 * m + 40,
                     cigar=f"{2 * m}H{m}M"),
            ]
        elif kind == "split_dup":
            seq_len = 2 * m
            back = rng.randint(60, m - 10)
            parts = [
                dict(flag=0, ref_start=anchor, cigar=f"{m}M{m}S"),
                dict(flag=2048, ref_start=anchor + m - back,
                     cigar=f"{m}H{m}M"),
            ]
        elif kind == "multi":
            seq_len = 3 * m
            parts = [
                dict(flag=0, ref_start=anchor, cigar=f"{m}M{2 * m}S"),
                dict(flag=2048, ref_start=anchor + m + sv,
                     cigar=f"{m}H{m}M{m}S"),
                dict(flag=2048, ref_start=anchor + 2 * m + 2 * sv,
                     cigar=f"{2 * m}H{m}M"),
            ]
        elif kind == "small_noise":
            # sub-threshold I/D ops only: analyze_inside_align must skip
            # every one (< min_sv_size gate, analyze_reads.py:828-838)
            i1, d1, i2 = rng.randint(1, 49), rng.randint(1, 49), \
                rng.randint(1, 49)
            parts = [dict(flag=0, ref_start=anchor,
                          cigar=f"{m}M{i1}I{m}M{d1}D{m}M{i2}I{m}M")]
            seq_len = 4 * m + i1 + i2
        elif kind == "mixed_noise":
            # a real deletion surrounded by sub-threshold noise ops: only
            # the big op may split the alignment
            small = rng.randint(1, 49)
            parts = [dict(flag=0, ref_start=anchor,
                          cigar=f"{m}M{small}I{m}M{sv}D{m}M{small}D{m}M")]
            seq_len = 4 * m + small
        else:  # clean
            parts = [dict(flag=0, ref_start=anchor, cigar=f"{2 * m}M")]
            seq_len = 2 * m

        fakes, alns = _fake_read(qname, parts, seq_len, rng)
        all_fakes.extend(fakes)
        all_alns.extend(alns)
    return all_fakes, all_alns


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_signature_parity(genome, seed):
    rng = random.Random(seed)
    fakes, alns = _random_reads(rng, 30)
    ref_opts = ref_harness.ref_options(genome)
    our_opts = default_options(genome=genome)
    ref = FastaFile(genome)

    ref_sigs = _run_reference(fakes, ref_opts)
    our_sigs = analyze_alignments(alns, our_opts, ref)

    assert len(our_sigs) == len(ref_sigs)
    for a, b in zip(our_sigs, ref_sigs):
        assert ref_harness.sig_tuple(a) == ref_harness.sig_tuple(b)


@pytest.mark.parametrize("seed", [10, 11])
def test_cluster_and_candidate_parity(genome, seed):
    rng = random.Random(seed)
    # many reads supporting the same few loci so clusters pass min_support
    all_fakes, all_alns = [], []
    loci = [30000, 80000, 80000 + 2000, 150000]
    for ri in range(40):
        qname = f"read{ri}"
        anchor = loci[ri % len(loci)] + rng.randint(-20, 20)
        sv = 200 + (ri % len(loci)) * 37
        m = 1500
        if ri % 2 == 0:
            parts = [dict(flag=0, ref_start=anchor, cigar=f"{m}M{sv}D{m}M")]
            seq_len = 2 * m
        else:
            parts = [dict(flag=0, ref_start=anchor, cigar=f"{m}M{sv}I{m}M")]
            seq_len = 2 * m + sv
        fakes, alns = _fake_read(qname, parts, seq_len, rng)
        all_fakes.extend(fakes)
        all_alns.extend(alns)

    ref_opts = ref_harness.ref_options(genome, min_support=3)
    our_opts = default_options(genome=genome, min_support=3)
    ref = FastaFile(genome)

    # reference path
    ref_harness.FakeAlignmentFile.registry["fake.bam"] = {
        "refs": ["chr1"], "reads": all_fakes}
    ref_sigs = _run_reference(all_fakes, ref_opts)
    ref_clusters = REF.cluster.partition_and_cluster(
        ref_sigs, "chr1", "fake.bam", ref_opts)

    our_sigs = analyze_alignments(all_alns, our_opts, ref)
    bamlike = ref_harness.FakeAlignmentFile("fake.bam")
    coverage = lambda c, s, e: sum(1 for _ in bamlike.fetch(c, s, e))
    our_clusters = partition_and_cluster(our_sigs, "chr1", coverage, our_opts)

    assert len(our_clusters) == len(ref_clusters)
    for oc, rc in zip(our_clusters, ref_clusters):
        assert (oc.contig, oc.cstart, oc.cend, oc.read_num, oc.coverage) == \
               (rc.contig, rc.cstart, rc.cend, rc.read_num, rc.coverage)

    # candidate records vs reference proc_one_sig lines
    our_cands = clusters_to_candidates(our_clusters, our_opts)
    ref_lines = []
    for rc in ref_clusters:
        if int(rc.cend) - int(rc.cstart) > ref_opts.max_sv_size:
            continue
        if rc.read_num < ref_opts.min_support:
            continue
        region = "{0}+{1}+{2}+{3}".format(rc.contig, int(rc.cstart),
                                          int(rc.cend), rc.coverage)
        cnt = 0
        for sig in rc.get_signatures():
            cnt += 1
            segs = REF.output_clusters.proc_one_sig(region, sig, cnt, ref_opts)
            if segs == -1:
                continue
            ref_lines.extend(segs)

    our_lines = [c.to_bed_line() for c in our_cands]
    assert our_lines == ref_lines
