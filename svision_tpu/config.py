"""Typed configuration for the whole engine.

Flag names, defaults and semantics mirror the reference CLI so that users of the
reference can switch without relearning options (reference: SVision:27-106).
Unlike the reference (a raw argparse Namespace threaded positionally through every
layer), this is a single frozen dataclass; components take only what they need.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class Options:
    # I/O (reference: SVision:32-38)
    out_path: str = ""
    bam_path: str = ""
    model_path: str = ""          # CNN weights: TF1 .ckpt prefix or .npz pytree
    genome: str = ""              # FASTA, .fai required next to it
    sample: str = "sample"

    # Optional (reference: SVision:40-62)
    thread_num: int = 1
    min_support: int = 5
    chrom: Optional[str] = None   # 'chr1' or 'chr1:xxx-xxx'
    hash: bool = False            # local k-mer realignment of unmapped sequence
    qname: bool = False           # report support read names in INFO
    graph: bool = False           # CSV breakpoint graphs + GFA output
    contig: bool = False          # assembly-contig mode (min_support forced to 1)
    debug: bool = False           # keep intermediate outputs

    # Collect (reference: SVision:71-77)
    min_mapq: int = 10
    min_sv_size: int = 50
    max_sv_size: int = 1000000
    window_size: int = 10000000

    # Cluster (reference: SVision:79-84)
    patition_max_distance: int = 5000     # sic: reference spelling kept for parity
    cluster_max_distance: float = 0.3

    # Predict (reference: SVision:87-88)
    batch_size: int = 128

    # Genotype (reference: SVision:90-95)
    min_gt_depth: int = 4
    homo_thresh: float = 0.8
    hete_thresh: float = 0.2
    # opt-in fix for the reference's tDUP genotyping gap (genotype.py:45-54
    # matches 'tDUP' against neither ref-read rule => het tDUPs come out
    # 1/1); off by default for VCF parity
    tdup_gt: bool = False

    # Hash realigner (reference: SVision:97-102)
    k_size: int = 10
    min_accept: int = 50
    max_hash_len: int = 1000

    # --- svision-tpu additions (no reference equivalent) ---
    # Device mesh for data-parallel inference: 'auto' (all local devices when
    # more than one is attached), 'none' (single device), or a device count.
    mesh: str = "auto"
    # Use bfloat16 for the CNN forward pass (fp32 logits accumulation).
    bf16: bool = True
    # Cache per-window candidate beds and reuse them on rerun.
    resume: bool = False
    # bgzip-compress the final VCF and write a tabix .tbi (io/tabix.py).
    bgzip: bool = False
    # jax.profiler trace directory for the prediction stage.
    profile_dir: Optional[str] = None
    # Persistent XLA compilation cache dir (None -> default; 'none' off).
    jax_cache: Optional[str] = None
    # v2.0 mechanism annotation (SVision:64-69, commented in the reference).
    mechanism: bool = False
    rpmask: str = "RepeatMasker"
    trf: str = "trf"
    # v2.0 Uncovered-callset clustering (SVision:48-49,389-394, commented in
    # the reference; output.py:153-246).
    cluster: bool = False
    # Per-read debug dotplots (the reference's dead debug_plot,
    # collect_signatures.py:103-111).
    dotplots: bool = False
    # Multi-host genome-axis sharding (parallel/dist.py): this process runs
    # chromosomes i where i % num_shards == shard_id; merge_shards performs
    # the host-0 merge once all shards' fragments exist.
    num_shards: int = 1
    shard_id: int = 0
    merge_shards: bool = False
    # jax.distributed coordinator ('host:port'): one-command multi-host run
    # with NO shared filesystem — fragments gather to process 0 over the
    # distributed channel and process 0 merges (parallel/dist.py).
    coordinator: Optional[str] = None

    def normalized(self) -> "Options":
        """Apply the reference's dynamic overrides (SVision:161-162)."""
        out = self
        if out.contig and out.min_support != 1:
            out = dataclasses.replace(out, min_support=1)
        if out.graph and not out.qname:
            # the graph step locates per-read GFAs via the READS INFO field,
            # which only --qname emits (output.py:580-583); the reference
            # crashes on record.info['READS'] here (graph.py:574) — we
            # auto-enable qname instead. Module logger: a bare logging.info
            # would install a root handler and break the pipeline's later
            # basicConfig file handler.
            import logging
            logging.getLogger(__name__).info(
                "--graph requires read names in the VCF; enabling --qname")
            out = dataclasses.replace(out, qname=True)
        return out


def default_options(**kw) -> Options:
    return Options(**kw).normalized()
