"""Closed-loop bootstrap: simulate -> collect -> label -> train -> call -> score.

Demonstrates the framework is self-sufficient without the reference's
out-of-band checkpoint: trains the CNN on collection-derived labeled images
from one simulated genome, then runs the full caller on a held-out genome and
scores calls against the planted truth.

    python scripts/closed_loop.py --out /tmp/loop [--epochs 12]
       [--train-per-type 40] [--eval-per-type 10] [--bf16]

Prints one JSON line with train history + eval precision/recall/F1 per type.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True, help="working directory")
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--train-per-type", type=int, default=40)
    ap.add_argument("--eval-per-type", type=int, default=10)
    ap.add_argument("--train-seed", type=int, default=11)
    ap.add_argument("--eval-seed", type=int, default=77)
    ap.add_argument("--support", type=int, default=8)
    ap.add_argument("--bf16", action="store_true",
                    help="train in bfloat16 compute")
    ap.add_argument("--csv", action="store_true",
                    help="include complex events (DEL+INS, INV+DEL) in the "
                         "held-out genome and run the caller with --graph")
    ap.add_argument("--small-curriculum", action="store_true",
                    help="augment training with a second simulated genome "
                         "of SMALL events (50-300 bp, the INS/tDUP/DEL "
                         "confusable scale) and evaluate on 50-300 bp "
                         "events as well")
    ap.add_argument("--device-loop", action="store_true",
                    help="train with fit_device (whole run = one jitted "
                         "program; no per-step dispatch)")
    ap.add_argument("--noise", choices=["hifi", "ont"], default=None,
                    help="realistic read noise (svision_tpu.noise) on BOTH "
                         "the training and held-out genomes: donor "
                         "SNPs/small indels, per-base sequencing errors, "
                         "mapq variation")
    ap.add_argument("--noise-scope", choices=["both", "eval"],
                    default="both",
                    help="'eval' trains on CLEAN reads but evaluates on "
                         "noisy ones — the robustness ablation (how much "
                         "does noisy training buy?)")
    ap.add_argument("--gt", action="store_true",
                    help="plant het/hom genotypes on the held-out events "
                         "(haplotype-aware read sets) and score GT "
                         "concordance")
    ns = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from svision_tpu.models import alexnet
    from svision_tpu.models.dataset import build_dataset, simulate_events, \
        CLASS_NAMES
    from svision_tpu.models.train import fit, fit_device, evaluate
    from svision_tpu.models.checkpoint import save_params
    from svision_tpu.cli import parse_arguments, run_pipeline
    from svision_tpu.evaluate import score_vcf
    from svision_tpu.sim import make_genome, make_sv_bam

    os.makedirs(ns.out, exist_ok=True)
    report = {}

    # 1) training data from simulated genome A
    t0 = time.perf_counter()
    # compound curriculum under --csv: INV+DEL events teach the decoder the
    # "read gap + larger ref gap" mm-pair geometry (labeled DEL) that noisy
    # eval otherwise confuses with INS — see models/dataset.py
    train_kinds = ("DEL", "INS", "INV", "DUP", "tDUP")
    if ns.csv:
        train_kinds = train_kinds + ("INV+DEL",)
    train_noise = None if ns.noise_scope == "eval" else ns.noise
    specs, labels, _ = build_dataset(n_per_type=ns.train_per_type,
                                     seed=ns.train_seed, support=ns.support,
                                     profile=train_noise, kinds=train_kinds)
    if ns.small_curriculum:
        s2, l2, _ = build_dataset(n_per_type=ns.train_per_type,
                                  seed=ns.train_seed + 1000,
                                  support=ns.support, size_range=(50, 300),
                                  profile=train_noise)
        specs = np.concatenate([specs, s2])
        labels = np.concatenate([labels, l2])
    counts = {CLASS_NAMES[c]: int((labels == c).sum()) for c in range(5)}
    report["train_examples"] = counts
    print(f"[1/4] dataset: {len(labels)} examples {counts} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    # 2) train
    t0 = time.perf_counter()
    params = alexnet.init_params(jax.random.PRNGKey(0))
    dtype = jnp.bfloat16 if ns.bf16 else jnp.float32
    trainer = fit_device if ns.device_loop else fit
    extra = {}
    if ns.device_loop and train_noise:
        # raster-noise augmentation (fragmented diagonals + pixel dropout)
        # alongside noisy collection — fit_device only (and deliberately
        # off in the --noise-scope eval ablation's clean-train arm)
        extra["noise_aug"] = True
    params, history = trainer(params, specs, labels, epochs=ns.epochs,
                              batch_size=ns.batch_size, seed=1,
                              learning_rate=ns.lr, compute_dtype=dtype,
                              log=lambda m: print("   " + m, flush=True),
                              **extra)
    train_acc = evaluate(params, specs, labels)
    weights = os.path.join(ns.out, "trained.npz")
    save_params({k: np.asarray(v) for k, v in params.items()}, weights)
    report["loss_first"], report["loss_last"] = history[0], history[-1]
    report["train_acc"] = round(train_acc, 4)
    print(f"[2/4] trained {ns.epochs} epochs: loss {history[0]:.3f} -> "
          f"{history[-1]:.3f}, train acc {train_acc:.3f} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)

    # 3) held-out genome B + full caller
    t0 = time.perf_counter()
    kinds = ("DEL", "INS", "INV", "DUP", "tDUP")
    if ns.csv:
        kinds = kinds + ("DEL+INS", "INV+DEL")
    eval_sizes = (50, 300) if ns.small_curriculum else (120, 600)
    events, chrom_len = simulate_events(ns.eval_per_type, seed=ns.eval_seed,
                                        kinds=kinds, size_range=eval_sizes)
    eval_dir = os.path.join(ns.out, "eval")
    os.makedirs(eval_dir, exist_ok=True)
    genome = os.path.join(eval_dir, "ref.fa")
    bam = os.path.join(eval_dir, "sim.bam")
    seqs = make_genome(genome, {"chr1": chrom_len}, seed=ns.eval_seed)
    genotypes = None
    if ns.gt:
        import random as _random
        gt_rng = _random.Random(ns.eval_seed + 5)
        # CSV records are genotyped ./. by design (genotype.py:55-62):
        # plant genotypes on simple events only, hom on compounds
        genotypes = [gt_rng.choice(["0/1", "1/1"]) if "+" not in k[0]
                     else "1/1" for k in events]
    make_sv_bam(bam, seqs, seed=ns.eval_seed, support=ns.support,
                events=events, profile=ns.noise, genotypes=genotypes)
    cli_args = ["-o", os.path.join(eval_dir, "out"), "-b", bam, "-g", genome,
                "-m", weights, "-n", "loop", "-s", "3",
                "--batch_size", str(ns.batch_size)]
    if ns.csv:
        cli_args.append("--graph")
    if ns.gt:
        cli_args.append("--tdup_gt")       # het tDUPs are unmeasurable
                                           # under the reference rule
    options = parse_arguments(cli_args)
    vcf = run_pipeline(options)
    print(f"[3/4] called {vcf} ({time.perf_counter()-t0:.1f}s)", flush=True)

    # 4) score
    score = score_vcf(vcf, events, tol=1500, truth_gt=genotypes)
    report["eval"] = score
    gt_msg = (f" GT={score['gt_concordance']} "
              f"({score['gt_correct']}/{score['gt_eval']})"
              if genotypes is not None else "")
    print(f"[4/4] eval: P={score['precision']} R={score['recall']} "
          f"F1={score['f1']}{gt_msg} per-type="
          f"{ {k: v for k, v in score['per_type'].items()} }", flush=True)
    print(f"[4/4] breakpoint resolution: |dpos| {score['bkp']['dpos']} "
          f"within={score['bkp'].get('dpos_within')} "
          f"|dlen| {score['bkp']['dlen']} "
          f"strict={score.get('strict_recall')}", flush=True)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
