"""Shard-merge determinism: N shards must produce the 1-shard VCF bit-for-bit
(SURVEY.md §4(4))."""
import os

import numpy as np
import pytest

from svision_tpu.cli import parse_arguments, run_pipeline
from svision_tpu.parallel import dist
from svision_tpu.models import alexnet
from svision_tpu.models.checkpoint import save_params
from tests import synth


def test_assignments_cover_and_disjoint():
    chroms = [f"chr{i}" for i in range(7)]
    got = [dist.assign_chroms(chroms, 3, k) for k in range(3)]
    flat = sum(got, [])
    assert sorted(flat) == sorted(chroms)
    assert len(set(flat)) == len(flat)
    pairs = [dist.assign_cohort(["s1", "s2"], chroms, 4, k) for k in range(4)]
    flatp = sum(pairs, [])
    assert len(flatp) == 14 and len(set(flatp)) == 14


def test_exchange_score_minmax_single():
    assert dist.exchange_score_minmax(np.array([5.0, 1.5, 80.0])) == (1.5, 80.0)


@pytest.fixture(scope="module")
def multi_chrom_ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("dist")
    genome = str(root / "ref.fa")
    seqs = synth.make_genome(genome, {"chr1": 80000, "chr2": 80000}, seed=11)
    bam = str(root / "c.bam")
    # events on both chroms
    from svision_tpu.io.bamwrite import write_bam
    import random
    rng = random.Random(11)
    records = []
    for chrom in ("chr1", "chr2"):
        g = seqs[chrom]
        for s in range(6):
            a = 30000 + rng.randint(-10, 10)
            records += synth.del_read(f"{chrom}_d{s}", chrom, a, 2000,
                                      350 if chrom == "chr1" else 220, g)
        for i in range(0, 70000, 4000):
            records.append(synth.SamRecord(f"{chrom}_bg{i}", 0, chrom, i, 60,
                                           "5000M", g[i:i + 5000]))
    write_bam(bam, [(c, len(s)) for c, s in seqs.items()], records)
    weights = str(root / "w.npz")
    import jax
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(0)).items()}, weights)
    return dict(genome=genome, bam=bam, weights=weights)


def _opts(ws, outdir):
    return parse_arguments(["-o", outdir, "-b", ws["bam"], "-g", ws["genome"],
                            "-m", ws["weights"], "-n", "dist", "-s", "3",
                            "--batch_size", "16"])


def test_two_shards_equal_one(multi_chrom_ws, tmp_path):
    ws = multi_chrom_ws
    # single-shard run through the normal CLI pipeline
    vcf1 = run_pipeline(_opts(ws, str(tmp_path / "one")))

    # 2-shard run: each shard writes fragments into the same out dir,
    # then host-0 merges
    out2 = str(tmp_path / "two")
    opts2 = _opts(ws, out2)
    chroms_all = []
    for shard in range(2):
        chroms_all.extend(dist.run_shard(opts2, shard, 2))
    from svision_tpu.cli import build_task_list
    from svision_tpu.io.bam import BamReader
    from svision_tpu.io.fasta import FastaFile
    order = list(build_task_list(BamReader(ws["bam"]),
                                 FastaFile(ws["genome"]), opts2).keys())
    assert sorted(chroms_all) == sorted(order)
    vcf2 = dist.merge_all(opts2, order)

    body1 = [l for l in open(vcf1) if not l.startswith("#")]
    body2 = [l for l in open(vcf2) if not l.startswith("#")]
    assert body1 == body2
    assert open(vcf1).read() == open(vcf2).read()


def test_cli_shard_flags(multi_chrom_ws, tmp_path):
    """--num_shards/--shard_id/--merge_shards through the CLI equal a plain
    single-process run byte for byte."""
    ws = multi_chrom_ws
    vcf1 = run_pipeline(_opts(ws, str(tmp_path / "one")))

    out2 = str(tmp_path / "two")
    base = ["-o", out2, "-b", ws["bam"], "-g", ws["genome"],
            "-m", ws["weights"], "-n", "dist", "-s", "3",
            "--batch_size", "16"]
    for shard in range(2):
        frag_dir = run_pipeline(parse_arguments(
            base + ["--num_shards", "2", "--shard_id", str(shard)]))
        assert frag_dir.endswith("predict_results")
    vcf2 = run_pipeline(parse_arguments(base + ["--merge_shards"]))
    assert open(vcf1).read() == open(vcf2).read()


def test_cli_shard_graph_merge(multi_chrom_ws, tmp_path):
    """A sharded --graph run's --merge_shards must run the graph step
    (cli.finalize_vcf) and byte-equal the single-process --graph run —
    before round 3 the merge path skipped everything but bgzip, so the
    .graph.vcf was never produced."""
    ws = multi_chrom_ws
    gflags = ["--graph", "--qname"]
    vcf1 = run_pipeline(parse_arguments(
        ["-o", str(tmp_path / "one"), "-b", ws["bam"], "-g", ws["genome"],
         "-m", ws["weights"], "-n", "dist", "-s", "3", "--batch_size", "16"]
        + gflags))
    assert vcf1.endswith(".graph.vcf")

    out2 = str(tmp_path / "two")
    base = ["-o", out2, "-b", ws["bam"], "-g", ws["genome"],
            "-m", ws["weights"], "-n", "dist", "-s", "3",
            "--batch_size", "16"] + gflags
    for shard in range(2):
        run_pipeline(parse_arguments(
            base + ["--num_shards", "2", "--shard_id", str(shard)]))
    vcf2 = run_pipeline(parse_arguments(base + ["--merge_shards"]))
    assert vcf2.endswith(".graph.vcf")
    assert open(vcf1).read() == open(vcf2).read()
    # the plain VCF is deleted after graph annotation (reference semantics)
    assert not os.path.exists(vcf2.replace(".graph.vcf", ".vcf"))
