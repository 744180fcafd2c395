"""Multi-host scaling-efficiency harness (BASELINE: >=0.8 at 2 hosts).

Builds a synthetic multi-chromosome BAM, then times the sharded pipeline
(parallel/dist.py run_shard) at 1 and N simulated hosts (separate processes,
shared filesystem — the deployment layout of a real pod, where each host
runs its shard and host 0 merges). Prints per-config wall clock, reads/s,
and scaling efficiency, and verifies the N-shard merged VCF equals the
1-shard VCF line-for-line.

Usage: python scripts/scaling_bench.py [--hosts 2] [--chroms 4] [--mb 2]
"""
import argparse
import json
import multiprocessing as mp
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _force_cpu():
    # the harness sitecustomize re-forces the TPU platform after import;
    # update the config explicitly (same trick as tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _shard_worker(args):
    (out_path, genome, bam, weights, shard_id, num_shards, cores) = args
    # each "host" is its own process with its own JAX runtime, pinned to a
    # disjoint core slice so simulated hosts don't share compute (every
    # config, incl. 1-host, gets the same per-host core budget)
    if cores:
        try:
            os.sched_setaffinity(0, cores)
        except OSError:
            pass
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    _force_cpu()
    from svision_tpu.cli import build_task_list
    from svision_tpu.collect.window import run_detect
    from svision_tpu.config import default_options
    from svision_tpu.infer.engine import InferenceEngine, predict_chromosome
    from svision_tpu.io.bam import BamReader
    from svision_tpu.io.fasta import FastaFile
    from svision_tpu.models.checkpoint import load_params
    from svision_tpu.parallel.dist import assign_chroms
    options = default_options(out_path=out_path, genome=genome, bam_path=bam,
                              model_path=weights, min_support=3, batch_size=64,
                              sample="scale")

    bam_r = BamReader(bam)
    ref = FastaFile(genome)
    tasks = build_task_list(bam_r, ref, options)
    my_chroms = assign_chroms(list(tasks.keys()), num_shards, shard_id)
    predict_dir = os.path.join(out_path, "predict_results")
    os.makedirs(predict_dir, exist_ok=True)

    # warm lazy imports / native-lib load outside the timer
    if my_chroms:
        run_detect(options, bam, my_chroms[0], 9999, 0, 1000,
                   bam=bam_r, ref=ref)

    # the timed quantity is the host-bound collection stage — that is what
    # genome-axis sharding distributes; device inference is data-parallel by
    # construction (its scaling is the mesh's, not the host's)
    t0 = time.perf_counter()
    cands_by_chrom = {}
    for chrom in my_chroms:
        cands = []
        for part, (s, e) in enumerate(tasks[chrom]):
            res = run_detect(options, bam, chrom, part, s, e,
                             bam=bam_r, ref=ref)
            cands.extend(res.candidates)
        cands_by_chrom[chrom] = cands
    collect_s = time.perf_counter() - t0

    engine = InferenceEngine(load_params(weights),
                             batch_size=options.batch_size, bf16=options.bf16)
    for chrom, cands in cands_by_chrom.items():
        out_prefix = os.path.join(predict_dir,
                                  f"{chrom}.predict.s{options.min_support}")
        predict_chromosome(cands, engine, out_prefix, bam_r, options)
    return collect_s


def run_config(workdir, genome, bam, weights, n_hosts, n_reads,
               cores_per_host=None):
    out = os.path.join(workdir, f"hosts{n_hosts}")
    os.makedirs(out, exist_ok=True)
    all_cores = sorted(os.sched_getaffinity(0))
    if cores_per_host is None:
        cores_per_host = len(all_cores)
    jobs = [(out, genome, bam, weights, k, n_hosts,
             tuple(all_cores[k * cores_per_host:(k + 1) * cores_per_host]))
            for k in range(n_hosts)]
    if n_hosts == 1:
        work_times = [_shard_worker(jobs[0])]
    else:
        with mp.get_context("spawn").Pool(n_hosts) as pool:
            work_times = pool.map(_shard_worker, jobs)
    t0 = time.perf_counter()
    # host-0 merge
    from svision_tpu.config import default_options
    from svision_tpu.parallel.dist import merge_all
    from svision_tpu.io.bam import BamReader
    from svision_tpu.io.fasta import FastaFile
    from svision_tpu.cli import build_task_list
    options = default_options(out_path=out, genome=genome, bam_path=bam,
                              model_path=weights, min_support=3, batch_size=64,
                              sample="scale")
    chroms = list(build_task_list(BamReader(bam), FastaFile(genome),
                                  options).keys())
    vcf = merge_all(options, chroms)
    merge_s = time.perf_counter() - t0
    print(f"[hosts={n_hosts}] shard collect times: "
          f"{[round(w, 3) for w in work_times]}, merge {merge_s:.3f}s")
    # wall clock for the sharded stage = slowest host; merge is host-0 serial
    return max(work_times) + merge_s, vcf


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--chroms", type=int, default=4)
    ap.add_argument("--mb", type=float, default=1.0, help="chrom size in Mb")
    args = ap.parse_args()

    _force_cpu()

    import numpy as np
    from tests import synth
    from svision_tpu.models import alexnet
    from svision_tpu.models.checkpoint import save_params
    from svision_tpu.io.bamwrite import write_bam

    workdir = tempfile.mkdtemp(prefix="scaling_")
    genome = os.path.join(workdir, "ref.fa")
    size = int(args.mb * 1e6)
    chrom_sizes = {f"chr{i+1}": size for i in range(args.chroms)}
    seqs = synth.make_genome(genome, chrom_sizes, seed=13)

    # per-chrom events, all chroms in one BAM
    import random as _r
    records = []
    n_reads = 0
    for ci, (chrom, g) in enumerate(seqs.items()):
        events = [("DEL", chrom, 60000 + k * 150000, 300)
                  for k in range(max(1, size // 150000 - 1))]
        rng = _r.Random(ci)
        flank = 2000
        for ei, (kind, ch, anchor, sz) in enumerate(events):
            for s in range(6):
                q = f"{chrom}_sv{ei}_{s}"
                a = anchor + rng.randint(-12, 12)
                records += synth.del_read(q, ch, a, flank, sz, g)
                n_reads += 1
        for i in range(0, len(g) - 6000, 4000):
            records.append(synth.SamRecord(f"{chrom}_bg{i}", 0, chrom, i, 60,
                                           "5000M", g[i:i + 5000]))
            n_reads += 1
    bam = os.path.join(workdir, "scale.bam")
    write_bam(bam, [(c, len(s)) for c, s in seqs.items()], records)

    weights = os.path.join(workdir, "w.npz")
    import jax
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(0)).items()}, weights)

    cph = max(1, len(os.sched_getaffinity(0)) // args.hosts)
    t1, vcf1 = run_config(workdir, genome, bam, weights, 1, n_reads,
                          cores_per_host=cph)
    tn, vcfn = run_config(workdir, genome, bam, weights, args.hosts, n_reads,
                          cores_per_host=cph)

    recs1 = [l for l in open(vcf1) if not l.startswith("#")]
    recsn = [l for l in open(vcfn) if not l.startswith("#")]
    identical = recs1 == recsn

    eff = t1 / (args.hosts * tn)
    print(json.dumps({
        "reads": n_reads,
        "calls": len(recs1),
        "t_1host_s": round(t1, 2),
        f"t_{args.hosts}host_s": round(tn, 2),
        "reads_per_s_1host": round(n_reads / t1, 1),
        f"reads_per_s_{args.hosts}host": round(n_reads / tn, 1),
        "scaling_efficiency": round(eff, 3),
        "n_shard_vcf_identical": identical,
    }))
    shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
