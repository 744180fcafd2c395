"""Demo-artifact concordance recipe (BASELINE config 1, VERDICT r1 missing #1).

The published artifacts are stripped from this mirror (the pretrained
`svision-cnn-model.ckpt` from README.md:85-86 and the demo BAM
`supports/HG00733.svision.demo.bam`); the moment they are available, run:

    python scripts/demo_parity.py \
        --bam HG00733.svision.demo.bam --genome GRCh38.fa \
        --ckpt svision-cnn-model.ckpt [--region chr1:xxx-yyy] [--graph]

It executes BOTH pipelines on the same inputs —
  * the actual reference implementation (in-process, pysam shimmed onto
    svision-tpu's own readers; the same harness the byte-identity CI uses,
    tests/ref_harness.py + tests/test_full_e2e_parity.py), TF1-compat graph
    restored from the published checkpoint, and
  * svision-tpu with --exact (f32, reference-faithful numerics), weights
    converted from the same checkpoint (models/checkpoint.py) —
then diffs the merged VCFs line by line and exits non-zero on any
difference. Requires tensorflow (compat.v1) for the reference side only.
"""
import argparse
import difflib
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bam", required=True, help="demo BAM (indexed)")
    ap.add_argument("--genome", required=True, help="reference FASTA (+.fai)")
    ap.add_argument("--ckpt", required=True,
                    help="published TF1 checkpoint prefix")
    ap.add_argument("--out", default="demo_parity_out")
    ap.add_argument("--sample", default="HG00733")
    ap.add_argument("--min-support", type=int, default=5)
    ap.add_argument("--region", default=None,
                    help="restrict to a region/chromosome (-c)")
    ap.add_argument("--graph", action="store_true")
    args = ap.parse_args()

    from tests import test_full_e2e_parity as par
    par.SAMPLE = args.sample
    par.MIN_SUPPORT = args.min_support

    flags = {}
    if args.region:
        flags["chrom"] = args.region
    if args.graph:
        flags.update(graph=True, qname=True)

    ws = dict(genome=args.genome, bam=args.bam, ckpt=args.ckpt)
    ref_out = os.path.join(args.out, "reference")
    tpu_out = os.path.join(args.out, "svision_tpu")
    os.makedirs(ref_out, exist_ok=True)
    os.makedirs(tpu_out, exist_ok=True)

    print("== running the reference implementation ==", flush=True)
    ref_vcf = par._run_reference(ws, ref_out, flags)

    print("== running svision-tpu (--exact) ==", flush=True)
    tpu_vcf = par._run_ours(ws, tpu_out, flags)

    with open(ref_vcf) as fh:
        ref_lines = fh.readlines()
    with open(tpu_vcf) as fh:
        tpu_lines = fh.readlines()
    if ref_lines == tpu_lines:
        n = sum(1 for l in ref_lines if not l.startswith("#"))
        print(f"PARITY OK: {n} records byte-identical\n  {ref_vcf}\n  {tpu_vcf}")
        return 0
    diff = list(difflib.unified_diff(ref_lines, tpu_lines,
                                     fromfile="reference", tofile="svision-tpu"))
    sys.stdout.writelines(diff[:200])
    print(f"\nPARITY FAILED: {len(diff)} diff lines (first 200 shown)")
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
