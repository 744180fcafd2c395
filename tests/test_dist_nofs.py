"""Non-shared-filesystem multi-host finish (VERDICT r1 item 3): two
jax.distributed processes with DISJOINT out dirs; shard fragments travel to
process 0 over the distributed channel and process 0's merged VCF must be
byte-identical to a single-process run."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.getcwd())

coord, pid, out, bam, genome, weights = sys.argv[1:7]
from svision_tpu.cli import parse_arguments, run_pipeline
vcf = run_pipeline(parse_arguments(
    ["-o", out, "-b", bam, "-g", genome, "-m", weights, "-n", "nofs",
     "-s", "3", "--batch_size", "16", "--num_shards", "2",
     "--shard_id", pid, "--coordinator", coord]))
print(f"DONE {pid} {vcf}", flush=True)
"""


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    from tests import synth
    from svision_tpu.models import alexnet
    from svision_tpu.models.checkpoint import save_params
    import jax

    root = tmp_path_factory.mktemp("nofs")
    genome = str(root / "ref.fa")
    seqs = synth.make_genome(genome, {"chr1": 80000, "chr2": 70000}, seed=31)
    bam = str(root / "s.bam")
    synth.make_sv_bam(bam, seqs, seed=31, support=6,
                      events=[("DEL", "chr1", 25000, 250),
                              ("INS", "chr2", 30000, 200)])
    weights = str(root / "w.npz")
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(0)).items()}, weights)
    return dict(root=root, genome=genome, bam=bam, weights=weights)


@pytest.mark.slow
def test_two_process_disjoint_outdirs(workspace, tmp_path):
    from svision_tpu.cli import parse_arguments, run_pipeline

    # ground truth: plain single-process run
    single_vcf = run_pipeline(parse_arguments(
        ["-o", str(tmp_path / "single"), "-b", workspace["bam"],
         "-g", workspace["genome"], "-m", workspace["weights"], "-n", "nofs",
         "-s", "3", "--batch_size", "16"]))

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    outs = [str(tmp_path / f"shard{k}") for k in (0, 1)]  # DISJOINT dirs
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), coord, str(k), outs[k],
         workspace["bam"], workspace["genome"], workspace["weights"]],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.getcwd(), env=env) for k in (0, 1)]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out)
        assert p.returncode == 0, out[-3000:]

    merged = os.path.join(outs[0], "nofs.svision.s3.vcf")
    assert os.path.exists(merged), logs[0][-2000:]
    # shard 1's chromosome fragments exist only in ITS local dir, yet made it
    # into the merge: prove the out dirs really were disjoint
    assert not os.path.exists(os.path.join(outs[1], "nofs.svision.s3.vcf"))
    with open(single_vcf) as a, open(merged) as b:
        assert a.read() == b.read()
