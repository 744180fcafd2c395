"""Multi-host orchestration: genomic-shard data parallelism.

The domain's sequence parallelism is genome-axis sharding (SURVEY.md §2.3):
chromosomes (or (sample, chromosome) pairs in cohort mode) are assigned to
hosts; each host streams its BAM windows, runs collection + device inference
for its shard, and writes per-chrom VCF fragments. The single cross-shard
reduction — QUAL min/max over all raw scores (SVision:330-334) — rides a JAX
collective when a distributed runtime is up, else the shared-filesystem scan.

Shard assignment is deterministic, so an N-shard run merges to a VCF
bit-identical to the 1-shard run (tests/test_dist.py).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """jax.distributed bring-up (no-op when single-process)."""
    if num_processes is None or num_processes <= 1:
        return
    import jax
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def assign_chroms(chroms: Sequence[str], num_shards: int, shard_id: int
                  ) -> List[str]:
    """Deterministic chromosome -> shard assignment (round-robin in canonical
    order). Prediction is chrom-granular in the reference too (SVision:311-323),
    so this keeps region grouping intact."""
    return [c for i, c in enumerate(chroms) if i % num_shards == shard_id]


def assign_cohort(samples: Sequence[str], chroms: Sequence[str],
                  num_shards: int, shard_id: int) -> List[Tuple[str, str]]:
    """Cohort mode: (sample, chrom) pairs round-robined across shards."""
    pairs = [(s, c) for s in samples for c in chroms]
    return [p for i, p in enumerate(pairs) if i % num_shards == shard_id]


def exchange_score_minmax(local_scores: np.ndarray) -> Tuple[float, float]:
    """Global (min, max) of QUAL scores across processes.

    Multi-process: all-gather via jax.experimental.multihost_utils over ICI/
    DCN. Single process: local reduce.

    COLLECTIVE: when jax.process_count() > 1 every process must call this
    (it blocks until all join). The merge path (merge_all) deliberately does
    NOT use it — fragments land on a shared filesystem and the merger's scan
    already sees every shard's scores — so merging from a single process
    never deadlocks. Use this only from code running symmetrically on all
    processes (e.g. a future non-shared-FS reduction)."""
    import jax
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        local = np.asarray(local_scores, np.float64)
        # fixed-size summary per host: (min, max); identity elements keep
        # empty shards neutral without corrupting the other side
        summary = np.array([local.min(initial=np.inf),
                            local.max(initial=-np.inf)])
        gathered = multihost_utils.process_allgather(summary)
        return float(gathered[:, 0].min()), float(gathered[:, 1].max())
    if local_scores.size == 0:
        return float("inf"), float("-inf")
    return float(np.min(local_scores)), float(np.max(local_scores))


def _pack_files(base_dir: str, relnames: Sequence[str]) -> bytes:
    """Serialize files (paths relative to base_dir) into one length-prefixed
    blob: [u32 n_files][per file: u32 name_len, name, u64 size, bytes]."""
    import struct
    parts = [struct.pack("<I", len(relnames))]
    for name in relnames:
        with open(os.path.join(base_dir, name), "rb") as fh:
            data = fh.read()
        enc = name.encode()
        parts.append(struct.pack("<I", len(enc)) + enc
                     + struct.pack("<Q", len(data)) + data)
    return b"".join(parts)


def _pack_fragments(out_path: str) -> bytes:
    """This shard's merge inputs as one blob (paths relative to out_path):
    predict_results VCF/score fragments plus, under --graph, the per-read
    GFA region dirs the graph step consumes (graphs/{region}/{read}.gfa)."""
    rels: List[str] = []
    pdir = os.path.join(out_path, "predict_results")
    if os.path.isdir(pdir):
        rels.extend(f"predict_results/{f}" for f in sorted(os.listdir(pdir))
                    if f.endswith(".vcf") or f.endswith(".score.txt"))
    gdir = os.path.join(out_path, "graphs")
    if os.path.isdir(gdir):
        for sub in sorted(os.listdir(gdir)):
            subp = os.path.join(gdir, sub)
            if os.path.isdir(subp):
                rels.extend(f"graphs/{sub}/{f}"
                            for f in sorted(os.listdir(subp))
                            if f.endswith(".gfa"))
    return _pack_files(out_path, rels)


def _unpack_fragments(blob: bytes, dest_dir: str) -> List[str]:
    import struct
    os.makedirs(dest_dir, exist_ok=True)
    (n,) = struct.unpack_from("<I", blob, 0)
    off = 4
    written = []
    for _ in range(n):
        (name_len,) = struct.unpack_from("<I", blob, off)
        off += 4
        name = blob[off:off + name_len].decode()
        off += name_len
        (size,) = struct.unpack_from("<Q", blob, off)
        off += 8
        # relative subdirs are allowed (cohort fragments arrive as
        # sample/predict_results/x.vcf) but traversal out of dest is not
        if (os.path.isabs(name) or os.path.normpath(name) != name
                or ".." in name.split("/")):
            raise ValueError(f"fragment name escapes dest dir: {name!r}")
        dest = os.path.join(dest_dir, name)
        os.makedirs(os.path.dirname(dest) or dest_dir, exist_ok=True)
        with open(dest, "wb") as fh:
            fh.write(blob[off:off + size])
        off += size
        written.append(name)
    return written


def _gather_blob_to_host0(blob_bytes: bytes) -> Optional[List[bytes]]:
    """All-gather one variable-length byte blob per process; returns the
    per-process blob list on process 0, None elsewhere. Two-phase (fixed-size
    length exchange, then payloads padded to the max) because fragment sizes
    differ per shard. COLLECTIVE: every process must call."""
    import jax
    from jax.experimental import multihost_utils
    blob = np.frombuffer(blob_bytes, np.uint8)
    lens = multihost_utils.process_allgather(
        np.array([blob.size], np.int64))            # [P, 1]
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[:blob.size] = blob
    blobs = multihost_utils.process_allgather(padded)   # [P, maxlen]
    if jax.process_index() != 0:
        return None
    return [np.asarray(blobs[p, :int(lens[p, 0])]).tobytes()
            for p in range(jax.process_count())]


def gather_fragments_to_host0(out_path: str) -> None:
    """Ship every shard's merge inputs (VCF/score fragments + --graph GFA
    region dirs) to process 0 over the jax.distributed channel — the
    non-shared-filesystem finish (the reference's merger re-reads per-chrom
    files from one directory, output.py:601-612; here the directory exists
    only on host 0).

    COLLECTIVE: every process must call this after its run_shard. Fragment
    sizes differ per shard, so the gather is two-phase: fixed-size length
    exchange, then payloads padded to the max."""
    import jax
    if jax.process_count() <= 1:
        return
    blobs = _gather_blob_to_host0(_pack_fragments(out_path))
    if blobs is not None:
        for p in range(1, len(blobs)):
            names = _unpack_fragments(blobs[p], out_path)
            logging.info("gathered %d fragment files from shard %d",
                         len(names), p)


def gather_cohort_fragments_to_host0(out_path: str,
                                     samples: Sequence[str]) -> None:
    """Cohort-mode non-shared-filesystem finish (BASELINE config 5): ship
    every shard's per-sample predict_results fragments to process 0 over the
    jax.distributed channel. Fragment names are prefixed with the sample
    ("{sample}/predict_results/{chrom}.predict.sN.vcf"), so host 0's out dir
    ends up laid out exactly as a shared-filesystem run and
    merge_cohort_samples needs no changes. Retires the reference's
    filesystem-as-backend merge (output.py:601-612) for cohorts too.

    COLLECTIVE: every process must call this after run_cohort_shard."""
    import jax
    if jax.process_count() <= 1:
        return
    rels: List[str] = []
    for name in sorted(samples):
        pdir = os.path.join(out_path, name, "predict_results")
        if os.path.isdir(pdir):
            rels.extend(f"{name}/predict_results/{f}"
                        for f in sorted(os.listdir(pdir))
                        if f.endswith(".vcf") or f.endswith(".score.txt"))
    blobs = _gather_blob_to_host0(_pack_files(out_path, rels))
    if blobs is not None:
        for p in range(1, len(blobs)):
            names = _unpack_fragments(blobs[p], out_path)
            logging.info("gathered %d cohort fragment files from shard %d",
                         len(names), p)


def run_distributed(options) -> Optional[str]:
    """One-command multi-host run WITHOUT a shared filesystem: initialize
    jax.distributed from --coordinator, run this process's shard into its
    local out dir, all-gather the fragments, merge on process 0.

    Returns the merged VCF path on process 0, None on other processes."""
    init_distributed(options.coordinator, options.num_shards,
                     options.shard_id)
    run_shard(options, options.shard_id, options.num_shards)
    gather_fragments_to_host0(options.out_path)

    import jax
    if jax.process_count() > 1 and jax.process_index() != 0:
        return None
    from svision_tpu.cli import build_task_list
    from svision_tpu.io.bam import BamReader
    from svision_tpu.io.fasta import FastaFile
    chrom_order = list(build_task_list(BamReader(options.bam_path),
                                       FastaFile(options.genome), options))
    return merge_all(options, chrom_order)


def run_shard(options, shard_id: int, num_shards: int) -> List[str]:
    """Collection + prediction for this shard's chromosomes; returns the
    chrom list handled. Fragments land in the shared predict_results dir
    under the same names the merger expects."""
    from svision_tpu.cli import build_task_list
    from svision_tpu.collect.window import run_detect
    from svision_tpu.infer.engine import InferenceEngine, predict_chromosome
    from svision_tpu.io.bam import BamReader
    from svision_tpu.io.fasta import FastaFile
    from svision_tpu.models.checkpoint import load_params

    bam = BamReader(options.bam_path)
    ref = FastaFile(options.genome)
    tasks = build_task_list(bam, ref, options)
    my_chroms = assign_chroms(list(tasks.keys()), num_shards, shard_id)

    predict_dir = os.path.join(options.out_path, "predict_results")
    os.makedirs(predict_dir, exist_ok=True)
    if options.graph:
        os.makedirs(os.path.join(options.out_path, "graphs"), exist_ok=True)

    from svision_tpu.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache(getattr(options, 'jax_cache', None))
    params = load_params(options.model_path)
    from svision_tpu.parallel.mesh import resolve_mesh
    mesh = resolve_mesh(getattr(options, "mesh", "auto"))
    if mesh is not None:
        logging.info("shard %d inference mesh: %d devices (data-parallel)",
                     shard_id, mesh.devices.size)
    engine = InferenceEngine(params, batch_size=options.batch_size,
                             bf16=options.bf16, mesh=mesh)
    warmup_thread = engine.warmup_async()
    for chrom in my_chroms:
        cands = []
        for part, (s, e) in enumerate(tasks[chrom]):
            res = run_detect(options, options.bam_path, chrom, part, s, e,
                             bam=bam, ref=ref)
            if res.error:
                # same policy as the CLI (SURVEY.md §5.3): log + one retry
                # instead of silently losing the window's calls
                logging.warning("shard %d window %s part %s failed, "
                                "retrying: %s", shard_id, chrom, part,
                                res.error)
                res = run_detect(options, options.bam_path, chrom, part, s,
                                 e, bam=bam, ref=ref)
                if res.error:
                    logging.error("shard %d window %s part %s failed: %s",
                                  shard_id, chrom, part, res.error)
            cands.extend(res.candidates)
        if warmup_thread is not None:
            warmup_thread.join()
            warmup_thread = None
        out_prefix = os.path.join(predict_dir,
                                  f"{chrom}.predict.s{options.min_support}")
        predict_chromosome(cands, engine, out_prefix, bam, options)
    return my_chroms


def merge_all(options, chrom_order: Sequence[str]) -> str:
    """Host-0 merge across all shards' fragments (shared filesystem).

    Runs in ONE process only, so it must not enter any collective: the
    score min/max comes from the shared-dir scan, which covers every
    shard's fragments. Mirrors the reference's empty-score abort
    (SVision:330-334) instead of emitting a header-only VCF with exit 0."""
    from svision_tpu.call.vcfout import cal_scores_max_min, merge_split_vcfs
    from svision_tpu.io.fasta import FastaFile

    predict_dir = os.path.join(options.out_path, "predict_results")
    scores = cal_scores_max_min(predict_dir)
    if not len(scores):
        print("Empty output in the score file!!! Program exit")
        raise SystemExit(1)
    mn, mx = float(np.min(scores)), float(np.max(scores))
    merged = os.path.join(
        options.out_path,
        f"{options.sample}.svision.s{options.min_support}.vcf")
    merge_split_vcfs(predict_dir, merged, mx, mn, list(chrom_order),
                     FastaFile(options.genome), options)
    return merged
