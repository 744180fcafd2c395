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
    cohort_mod.run_cohort_shard(cohort_ws["bams"], opts2, 1, 2)
    v2 = cohort_mod.run_cohort(cohort_ws["bams"], opts2, num_shards=2,
                               shard_id=0)
    assert _records(v1) == _records(v2)
