"""End-to-end pipeline test: synthetic BAM -> CLI -> VCF (SURVEY.md §4(3))."""
import os
import random

import numpy as np
import pytest

from svision_tpu.cli import parse_arguments, run_pipeline
from svision_tpu.models import alexnet
from svision_tpu.models.checkpoint import save_params
from tests import synth


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    genome_path = str(root / "ref.fa")
    seqs = synth.make_genome(genome_path, {"chr1": 150000}, seed=7)
    bam_path = str(root / "sample.bam")
    events = synth.make_sv_bam(bam_path, seqs, seed=7, support=8,
                               events=[("DEL", "chr1", 20000, 300),
                                       ("INS", "chr1", 60000, 220),
                                       ("INV", "chr1", 100000, 400)])
    weights = str(root / "w.npz")
    import jax
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(0)).items()}, weights)
    return dict(root=root, genome=genome_path, bam=bam_path, weights=weights,
                events=events)


def _run(workspace, outdir, extra=()):
    args = ["-o", outdir, "-b", workspace["bam"], "-g", workspace["genome"],
            "-m", workspace["weights"], "-n", "synthsample", "-s", "3",
            "--batch_size", "32", *extra]
    options = parse_arguments(args)
    return run_pipeline(options)


def _records(vcf_path):
    out = []
    for line in open(vcf_path):
        if not line.startswith("#") and line.strip():
            out.append(line.rstrip("\n").split("\t"))
    return out


def test_end_to_end_calls(workspace, tmp_path):
    vcf = _run(workspace, str(tmp_path / "out"), extra=["--qname"])
    assert os.path.exists(vcf)
    recs = _records(vcf)
    assert len(recs) >= 2, recs
    # calls land at the planted loci (within cluster tolerance)
    starts = sorted(int(r[1]) for r in recs)
    planted = [e[2] for e in workspace["events"]]
    for anchor in planted[:2]:  # DEL and INS produce main-main candidates
        assert any(abs(s - anchor) < 2500 for s in starts), (anchor, starts)
    # format sanity
    for r in recs:
        assert r[0] == "chr1"
        assert r[4] in ("<SV>", "<CSV>")
        assert r[6] in ("PASS", "Uncovered")
        assert "SVTYPE=" in r[7] and "READS=" in r[7]
        assert r[8].startswith("GT:DR:DV")
    # header carries contig + sample line
    head = [l for l in open(vcf) if l.startswith("#")]
    assert any("##contig=<ID=chr1,length=150000>" in l for l in head)
    assert head[-1].rstrip().endswith("synthsample")


def test_determinism(workspace, tmp_path):
    v1 = _run(workspace, str(tmp_path / "o1"))
    v2 = _run(workspace, str(tmp_path / "o2"))
    assert _records(v1) == _records(v2)


def test_threaded_pipeline_matches_sequential(workspace, tmp_path):
    """-t 2 (process-pool collection overlapped with device inference)
    produces the same VCF as the sequential schedule."""
    v1 = _run(workspace, str(tmp_path / "seq"))
    v2 = _run(workspace, str(tmp_path / "par"), extra=["-t", "2"])
    assert _records(v1) == _records(v2)


def test_region_mode(workspace, tmp_path):
    # -c chr1 restricts to one chromosome and still calls
    vcf = _run(workspace, str(tmp_path / "o3"), extra=["-c", "chr1"])
    assert len(_records(vcf)) >= 2


def test_graph_mode(workspace, tmp_path):
    """--graph: per-read GFA dump + CSV graph VCF (BASELINE config 4)."""
    vcf = _run(workspace, str(tmp_path / "og"), extra=["--graph"])
    assert vcf.endswith(".graph.vcf") and os.path.exists(vcf)
    recs = _records(vcf)
    assert recs
    for r in recs:
        assert "GraphID=" in r[7], r
    # plain VCF was replaced by the graph VCF (SVision:348-358)
    assert not os.path.exists(vcf.replace(".graph.vcf", ".vcf"))
    # header advertises the graph INFO fields
    head = open(vcf).read()
    assert "GFA_S" in head and "GFA_L" in head


def test_hash_mode(workspace, tmp_path):
    """--hash: k-mer realignment of unmapped/inserted sequence stays green
    end-to-end and still calls the planted loci."""
    vcf = _run(workspace, str(tmp_path / "oh"), extra=["--hash"])
    assert len(_records(vcf)) >= 2


def test_mechanism_mode(workspace, tmp_path):
    """--mechanism: v2.0 annotation step emits the mechanism VCF; without
    RepeatMasker/TRF binaries every record gains MECHANISM from the
    CIGAR-derived default."""
    vcf = _run(workspace, str(tmp_path / "om"), extra=["--mechanism"])
    assert os.path.basename(vcf).endswith(".mechanism.vcf")
    recs = _records(vcf)
    assert recs
    for r in recs:
        assert "MECHANISM=" in r[7], r


def test_cluster_mode(workspace, tmp_path):
    """--cluster: the v2.0 Uncovered-callset clustering writes the
    clusterd VCF alongside the final callset (SVision:389-394)."""
    outdir = str(tmp_path / "oc")
    vcf = _run(workspace, outdir, extra=["--cluster", "--qname"])
    clusterd = os.path.join(outdir, "synthsample.svision.s3.clusterd.vcf")
    assert os.path.exists(clusterd)
    recs = _records(clusterd)
    # every final-VCF record survives into the clustered callset (merges can
    # only reduce the Uncovered count, never drop a locus)
    assert len(recs) >= 1 and len(recs) <= len(_records(vcf))
    for r in recs:
        assert r[6] in ("PASS", "Uncovered")


def test_resume_cache(workspace, tmp_path):
    """--resume: second run reloads cached candidate beds and produces an
    identical VCF (SURVEY.md §5.4)."""
    outdir = str(tmp_path / "or")
    v1 = _run(workspace, outdir, extra=["--resume"])
    r1 = _records(v1)
    seg_dir = os.path.join(outdir, "segments")
    assert os.path.isdir(seg_dir) and os.listdir(seg_dir)
    # candidate bed round-trip
    from svision_tpu.collect.candidates import Candidate
    bed = [f for f in os.listdir(seg_dir) if f.endswith(".bed")][0]
    line = open(os.path.join(seg_dir, bed)).readline()
    assert Candidate.from_bed_line(line).to_bed_line() == line
    # parameter sidecar guards the cache (stale-params findings)
    assert os.path.exists(os.path.join(seg_dir, ".collect_params.json"))

    v2 = _run(workspace, outdir, extra=["--resume"])
    assert _records(v2) == r1


def test_contig_mode(workspace, tmp_path):
    """--contig: assembly alignments, min_support forced to 1
    (SVision:161-162,179-180; BASELINE config 3)."""
    import random as _random
    from tests import synth as _synth

    root = tmp_path / "contig"
    root.mkdir()
    genome_path = str(root / "ref.fa")
    seqs = _synth.make_genome(genome_path, {"chr1": 120000}, seed=5)
    bam_path = str(root / "asm.bam")
    # two haplotype contigs carrying the same DEL (the reference's strict
    # `>` partition gate needs >min_support signatures even in contig mode,
    # cluster_signatures.py:57-64 — a diploid assembly provides 2)
    _synth.make_sv_bam(bam_path, seqs, seed=5, support=2,
                       events=[("DEL", "chr1", 40000, 400)])
    args = ["-o", str(root / "out"), "-b", bam_path, "-g",
            workspace["genome"].replace(workspace["genome"], genome_path),
            "-m", workspace["weights"], "-n", "asm", "-s", "5",
            "--contig", "--batch_size", "32"]
    options = parse_arguments(args)
    assert options.min_support == 1   # contig override applied
    vcf = run_pipeline(options)
    recs = _records(vcf)
    assert recs, "contig mode produced no calls"
    assert any(abs(int(r[1]) - 42000) < 2500 for r in recs), recs


def test_graph_implies_qname():
    """--graph needs READS= in the VCF to locate per-read GFAs; the
    reference crashes on record.info['READS'] (graph.py:574) when --qname is
    off, we auto-enable it."""
    opts = parse_arguments(["-o", "o", "-b", "b", "-g", "g", "-m", "m",
                            "-n", "n", "--graph"])
    assert opts.qname


def test_graph_mode_with_complex_events(tmp_path):
    """CSV records (multi-type regions) flow through the graph annotation
    step end-to-end without --qname given explicitly."""
    from tests import synth
    genome_path = str(tmp_path / "ref.fa")
    seqs = synth.make_genome(genome_path, {"chr1": 200000}, seed=21)
    bam_path = str(tmp_path / "s.bam")
    synth.make_sv_bam(bam_path, seqs, seed=21, support=8,
                      events=[("INV+DEL", "chr1", 60000, 300),
                              ("DEL+INS", "chr1", 140000, 400)])
    weights = str(tmp_path / "w.npz")
    import jax
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(3)).items()}, weights)
    args = ["-o", str(tmp_path / "out"), "-b", bam_path, "-g", genome_path,
            "-m", weights, "-n", "csvsample", "-s", "3",
            "--batch_size", "32", "--graph"]
    vcf = run_pipeline(parse_arguments(args))
    assert vcf.endswith(".graph.vcf") and os.path.exists(vcf)
    recs = _records(vcf)
    assert recs, "complex events must produce calls"


def test_resume_cache_invalidated_by_different_bam(workspace, tmp_path):
    """--resume must not serve cached candidates when the input BAM
    changed (review finding: the cache key omitted input identity)."""
    from svision_tpu.collect.window import cache_valid
    import dataclasses

    outdir = str(tmp_path / "ri")
    _run(workspace, outdir, extra=["--resume"])
    seg_dir = os.path.join(outdir, "segments")
    opts = parse_arguments(["-o", outdir, "-b", workspace["bam"],
                            "-g", workspace["genome"],
                            "-m", workspace["weights"], "-n", "synthsample",
                            "-s", "3", "--batch_size", "32", "--resume"])
    assert cache_valid(seg_dir, opts)
    other_bam = str(tmp_path / "other.bam")
    import shutil
    shutil.copy(workspace["bam"], other_bam)
    opts2 = dataclasses.replace(opts, bam_path=other_bam)
    assert not cache_valid(seg_dir, opts2)


def test_debug_dump_updates_cache_sidecar(workspace, tmp_path):
    """A --debug run (without --resume) rewrites the beds; the sidecar must
    follow them or a later --resume with the old params reads poisoned
    beds (review finding)."""
    from svision_tpu.collect.window import cache_valid
    outdir = str(tmp_path / "dbg")
    _run(workspace, outdir, extra=["--resume"])
    seg_dir = os.path.join(outdir, "segments")
    opts_resume = parse_arguments(
        ["-o", outdir, "-b", workspace["bam"], "-g", workspace["genome"],
         "-m", workspace["weights"], "-n", "synthsample", "-s", "3",
         "--batch_size", "32", "--resume"])
    assert cache_valid(seg_dir, opts_resume)
    # debug run with different collection params overwrites the beds...
    _run(workspace, outdir, extra=["--debug", "--min_sv_size", "60"])
    # ...and the sidecar now reflects THOSE params, not the stale ones
    assert not cache_valid(seg_dir, opts_resume)


def test_broken_pool_degrades_inline(workspace, tmp_path, monkeypatch):
    """A worker pool whose submit() raises (BrokenProcessPool et al.) must
    degrade to inline collection, not abort the pipeline (cli.start_chrom)."""
    import svision_tpu.utils.hostpool as hostpool

    class _BrokenPool:
        def submit(self, *a, **k):
            raise RuntimeError("pool is broken")

        def shutdown(self, *a, **k):
            pass

    monkeypatch.setattr(hostpool, "host_only_pool", lambda n: _BrokenPool())
    vcf_ok = _run(workspace, str(tmp_path / "ref_out"))
    vcf_broken = _run(workspace, str(tmp_path / "broken_out"),
                      extra=["-t", "2"])
    assert _records(vcf_broken) == _records(vcf_ok)
