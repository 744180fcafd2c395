"""Multi-sample cohort calling (BASELINE config 5): shard-count invariance
and cross-sample site merging."""

import os

import numpy as np
import pytest

from svision_tpu.config import default_options
from svision_tpu.parallel import cohort as cohort_mod
from tests import synth


@pytest.fixture(scope="module")
def cohort_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("cohort")
    genome_path = str(root / "ref.fa")
    seqs = synth.make_genome(genome_path, {"chr1": 120000}, seed=21)
    # shared DEL at 20k in both samples; private events per sample
    bam_a = str(root / "a.bam")
    synth.make_sv_bam(bam_a, seqs, seed=1, support=8,
                      events=[("DEL", "chr1", 20000, 300),
                              ("INS", "chr1", 60000, 200)])
    bam_b = str(root / "b.bam")
    synth.make_sv_bam(bam_b, seqs, seed=2, support=8,
                      events=[("DEL", "chr1", 20000, 300),
                              ("DEL", "chr1", 90000, 400)])
    weights = str(root / "w.npz")
    import jax
    from svision_tpu.models import alexnet
    from svision_tpu.models.checkpoint import save_params
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(0)).items()}, weights)
    return dict(root=root, genome=genome_path, bams={"A": bam_a, "B": bam_b},
                weights=weights)


def _opts(ws, outdir):
    return default_options(out_path=str(outdir), genome=ws["genome"],
                           model_path=ws["weights"], min_support=3,
                           batch_size=32)


def _records(path):
    return [l.rstrip("\n").split("\t") for l in open(path)
            if not l.startswith("#") and l.strip()]


def test_cohort_single_shard(cohort_ws, tmp_path):
    out = cohort_mod.run_cohort(cohort_ws["bams"], _opts(cohort_ws, tmp_path))
    recs = _records(out)
    assert recs, "cohort VCF empty"
    # two genotype columns, SUPP/SUPP_VEC INFO present
    for r in recs:
        assert len(r) == 11, r
        assert "SUPP=" in r[7] and "SUPP_VEC=" in r[7]
    # the shared DEL site must carry both samples
    shared = [r for r in recs if abs(int(r[1]) - 22000) < 3000
              and "SUPP=2" in r[7]]
    assert shared, recs
    # private sites carry exactly one sample and a ./. column
    private = [r for r in recs if "SUPP=1" in r[7]]
    assert private
    for r in private:
        assert "./.:0:0" in (r[9], r[10])


def test_cohort_shard_invariance(cohort_ws, tmp_path):
    """2-shard run (both shards executed in this process) produces the same
    merged VCF as the 1-shard run."""
    opts1 = _opts(cohort_ws, tmp_path / "one")
    os.makedirs(opts1.out_path, exist_ok=True)
    v1 = cohort_mod.run_cohort(cohort_ws["bams"], opts1)

    opts2 = _opts(cohort_ws, tmp_path / "two")
    os.makedirs(opts2.out_path, exist_ok=True)
    # per-process entry point for each shard (shard 1 drops its barrier
    # done-file and returns ""; shard 0 then passes the barrier and merges)
    assert cohort_mod.run_cohort(cohort_ws["bams"], opts2, num_shards=2,
                                 shard_id=1) == ""
    v2 = cohort_mod.run_cohort(cohort_ws["bams"], opts2, num_shards=2,
                               shard_id=0)
    assert _records(v1) == _records(v2)


def test_cohort_merge_contig_order(cohort_ws, tmp_path):
    """Cohort records follow header contig order, not lexicographic
    (chr2 before chr10), so tabix/bcftools accept the file."""
    from svision_tpu.io.fasta import write_fasta, FastaFile
    genome = str(tmp_path / "ref2.fa")
    write_fasta(genome, {"chr2": "ACGT" * 300, "chr10": "ACGT" * 300})
    v = str(tmp_path / "a.vcf")
    with open(v, "w") as fh:
        fh.write("##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                 "FILTER\tINFO\tFORMAT\tA\n")
        fh.write("chr10\t100\t0\tN\t<SV>\t90\tPASS\t"
                 "END=200;SVLEN=100;SVTYPE=DEL\tGT:DR:DV\t0/1:3:5\n")
        fh.write("chr2\t100\t1\tN\t<SV>\t90\tPASS\t"
                 "END=200;SVLEN=100;SVTYPE=DEL\tGT:DR:DV\t0/1:3:5\n")
    opts = _opts(cohort_ws, tmp_path)
    out = cohort_mod.merge_cohort_vcfs({"A": v}, str(tmp_path / "m.vcf"),
                                       opts, ref=FastaFile(genome))
    recs = _records(out)
    assert [r[0] for r in recs] == ["chr2", "chr10"]


def test_merge_all_empty_scores_aborts(cohort_ws, tmp_path):
    """Header-only merges are an error, like the reference's
    'Empty output in the score file' abort (SVision:330-334)."""
    from svision_tpu.parallel.dist import merge_all
    opts = _opts(cohort_ws, tmp_path / "empty")
    os.makedirs(os.path.join(opts.out_path, "predict_results"), exist_ok=True)
    with pytest.raises(SystemExit):
        merge_all(opts, ["chr1"])


def test_cohort_two_process_cli(cohort_ws, tmp_path):
    """The documented multi-process launch: two independent CLI processes,
    concurrent, over a shared out dir. Regression for the review findings
    that the merge barrier never engaged / deadlocked on a one-sided
    collective."""
    import subprocess, sys
    out = str(tmp_path / "mp")
    os.makedirs(out, exist_ok=True)
    args = [sys.executable, "-m", "svision_tpu.parallel.cohort",
            "-o", out, "-g", cohort_ws["genome"], "-m", cohort_ws["weights"],
            "--samples"] + [f"{n}={p}" for n, p in cohort_ws["bams"].items()] \
        + ["-s", "3", "--batch_size", "32", "--num-shards", "2"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(args + ["--shard-id", str(k)], env=env,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for k in (0, 1)]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o.decode(errors="replace")[-2000:]
    merged = os.path.join(out, "cohort.svision.s3.vcf")
    assert os.path.exists(merged)
    assert _records(merged), "cohort VCF empty"


@pytest.mark.slow
def test_cohort_two_process_disjoint_outdirs(cohort_ws, tmp_path):
    """Non-shared-filesystem cohort (BASELINE config 5 as specified): two
    jax.distributed processes with DISJOINT out dirs; per-sample fragments
    travel to process 0 over the distributed channel
    (dist.gather_cohort_fragments_to_host0) and process 0's merged
    multi-sample VCF must byte-equal the single-process run."""
    import socket
    import subprocess
    import sys

    # ground truth: single-process run
    opts1 = _opts(cohort_ws, tmp_path / "single")
    os.makedirs(opts1.out_path, exist_ok=True)
    single = cohort_mod.run_cohort(cohort_ws["bams"], opts1)

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    outs = [str(tmp_path / f"shard{k}") for k in (0, 1)]  # DISJOINT dirs
    args = [sys.executable, "-m", "svision_tpu.parallel.cohort",
            "-g", cohort_ws["genome"], "-m", cohort_ws["weights"],
            "--samples"] + [f"{n}={p}" for n, p in cohort_ws["bams"].items()] \
        + ["-s", "3", "--batch_size", "32", "--num-shards", "2",
           "--coordinator", coord]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(args + ["-o", outs[k], "--shard-id", str(k)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for k in (0, 1)]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, o in zip(procs, logs):
        assert p.returncode == 0, o.decode(errors="replace")[-3000:]

    merged = os.path.join(outs[0], "cohort.svision.s3.vcf")
    assert os.path.exists(merged), logs[0].decode(errors="replace")[-2000:]
    # shard 1 merged nothing locally: its out dir really was disjoint
    assert not os.path.exists(os.path.join(outs[1], "cohort.svision.s3.vcf"))
    with open(single) as a, open(merged) as b:
        assert a.read() == b.read()
