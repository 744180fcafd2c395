"""svision-tpu: a TPU-native structural-variant calling engine.

A from-scratch JAX/XLA/Pallas re-design of the SVision method (reference:
xjtu-omics/SVision v1.4): long-read alignment signatures -> per-locus clusters ->
three-channel 227x227 read-vs-reference similarity images -> AlexNet CNN ->
multi-object region aggregation -> (CSV) breakpoint graphs -> VCF.

Layer map (TPU-first redesign of reference layers, see SURVEY.md):
  io/        host IO: BGZF/BAM/BAI/FASTA readers + BAM writer + VCF text IO
  collect/   signature engine: read analysis, gap typing, clustering, candidates
  ops/       on-device ops: MXU line rasterizer (similarity-image encoder), LRN
  models/    AlexNet (pure JAX/flax-free pytree), TF1 ckpt converter, train step
  infer/     batched device inference pipeline + region aggregation
  call/      genotyper, type refinement, VCF assembly/merge
  parallel/  device mesh, sharded inference, cross-host reductions
"""

__version__ = "0.1.0"
# Reference implementation version this framework tracks for output parity.
REFERENCE_VERSION = "1.4"
