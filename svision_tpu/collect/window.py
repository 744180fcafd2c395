"""Per-(chrom, window) collection worker.

Port of run_collection.run_detect (run_collection.py:15-47): fetch reads,
extract signatures, cluster, emit candidates. Returns the candidate table
in-memory (the reference's bed file IPC becomes an optional --debug dump);
errors are reported explicitly instead of silently swallowed
(SURVEY.md §5.3)."""

from __future__ import annotations

import logging
import os
import traceback

import numpy as np
from dataclasses import dataclass, field
from typing import List, Optional

from svision_tpu.collect.candidates import Candidate, clusters_to_candidates
from svision_tpu.collect.cluster import partition_and_cluster
from svision_tpu.collect.signatures import analyze_alignments
from svision_tpu.io.bam import BamReader
from svision_tpu.io.fasta import FastaFile


# Giant-window streaming (contig mode makes the window the whole contig,
# SVision:161-180; a 100 Mb+ contig at depth would otherwise decode into one
# multi-GB SoA batch). Windows wider than STREAM_WINDOW are collected in
# STREAM_CHUNK sub-fetches with bounded host memory. Env-overridable for
# tests and tuning.
STREAM_WINDOW = int(os.environ.get("SVISION_STREAM_WINDOW", 20_000_000))
STREAM_CHUNK = int(os.environ.get("SVISION_STREAM_CHUNK", 5_000_000))


def _stream_chunks(start: int, end: int, chunk: int):
    pos = start
    while pos < end:
        yield pos, min(pos + chunk, end)
        pos += chunk


def _stream_threads() -> int:
    """Inflate workers for giant-window streamed fetches: a whole-contig
    window owns the host (there is no per-window process-pool parallelism
    to leave cores for), so use them — the default decode_threads() stays
    serial on small boxes for exactly that pool's sake."""
    return min(4, os.cpu_count() or 1)


def _stream_window(bam, chrom: str, start: int, end: int, options):
    """Bounded-memory collection over a giant window: two chunked passes.

    Pass 1 (no sequence decode) accumulates every record's span (coverage
    counting counts all fetched records, classes.py:165-170), the global
    set of qname hashes whose group qualifies for the signature stack, and
    each record's BGZF virtual offset. Pass 2 then fetches ONLY the blocks
    containing qualifying-group records (fetch_batch_at) — at a realistic
    surviving fraction that skips re-inflating ~99% of the window, which
    halved contig-mode collection (docs/PERF.md round 3). A stale native
    lib without the voffset ABI falls back to the round-2 full re-fetch.

    Each pass-1 record is assigned to the chunk containing its pos (records
    overlapping a chunk boundary are fetched by both sub-fetches; the later
    one drops them), so the record stream is EXACTLY the single-fetch
    stream and every downstream decision is unchanged — byte-identical
    output is CI-gated (tests/test_contig_stream.py).

    Returns (aln_iterator, pos array, endpos array) or None when the native
    batch path is unavailable (the pure-Python fallback already streams)."""
    from svision_tpu.collect.prefilter import qname_hashes, record_masks
    from svision_tpu.io.bam import _batch_to_alns

    min_mapq = 0 if options.contig else options.min_mapq
    threads = _stream_threads()

    pos_parts: List[np.ndarray] = []
    end_parts: List[np.ndarray] = []
    qual_hash_parts: List[np.ndarray] = []
    hash_parts: List[np.ndarray] = []
    valid_parts: List[np.ndarray] = []
    voff_parts: List[np.ndarray] = []
    have_voffs = True
    for cs, ce in _stream_chunks(start, end, STREAM_CHUNK):
        batch = bam.fetch_batch(chrom, cs, ce, decode_seq=False,
                                threads=threads)
        if batch is None:
            return None
        dedup = (batch.pos >= cs) if cs != start \
            else np.ones(batch.n, bool)
        pos_parts.append(batch.pos[dedup].astype(np.int64))
        end_parts.append(np.maximum(batch.endpos[dedup],
                                    batch.pos[dedup] + 1).astype(np.int64))
        hashes = qname_hashes(batch)
        valid, qual = record_masks(batch, min_mapq, options.min_sv_size)
        qual &= dedup
        if qual.any():
            qual_hash_parts.append(np.unique(hashes[qual]))
        if getattr(batch, "voffset", None) is None:
            have_voffs = False
        elif have_voffs:
            voff_parts.append(batch.voffset[dedup].copy())
            hash_parts.append(hashes[dedup])
            valid_parts.append(valid[dedup])

    pos = np.concatenate(pos_parts) if pos_parts else np.zeros(0, np.int64)
    endpos = (np.concatenate(end_parts) if end_parts
              else np.zeros(0, np.int64))
    group_hashes = (np.unique(np.concatenate(qual_hash_parts))
                    if qual_hash_parts else np.zeros(0, np.uint64))

    def alns_targeted():
        if group_hashes.size == 0:
            return
        all_voffs = np.concatenate(voff_parts)
        all_hashes = np.concatenate(hash_parts)
        all_valid = np.concatenate(valid_parts)
        keep_voffs = all_voffs[all_valid
                               & np.isin(all_hashes, group_hashes)]
        # bounded memory even when (almost) every read survives — an
        # all-SV assembly contig is exactly that case: fetch the targets
        # in coordinate-ordered slices
        per_fetch = 200_000
        for i in range(0, keep_voffs.size, per_fetch):
            sl = keep_voffs[i:i + per_fetch]
            batch = bam.fetch_batch_at(chrom, sl, start, end,
                                       threads=threads)
            if batch is None:  # native lib vanished mid-run: impossible
                raise RuntimeError("native batch path lost during stream")
            # merged chunk ranges can sweep in records BETWEEN two kept
            # voffsets: select the exact target set back out
            sel = np.isin(batch.voffset, sl)
            yield from _batch_to_alns(batch, bam.references,
                                      indices=np.nonzero(sel)[0])

    def alns_refetch():
        if group_hashes.size == 0:
            return
        for cs, ce in _stream_chunks(start, end, STREAM_CHUNK):
            batch = bam.fetch_batch(chrom, cs, ce, threads=threads)
            if batch is None:     # native lib vanished mid-run: impossible
                raise RuntimeError("native batch path lost during stream")
            valid, _ = record_masks(batch, min_mapq, options.min_sv_size)
            keep = valid & np.isin(qname_hashes(batch), group_hashes)
            if cs != start:
                keep &= batch.pos >= cs
            # Aln construction copies out of the batch buffers, so each
            # chunk's native result is freed before the next is fetched
            yield from _batch_to_alns(batch, bam.references,
                                      indices=np.nonzero(keep)[0])

    return (alns_targeted() if have_voffs else alns_refetch()), pos, endpos


@dataclass
class WindowResult:
    chrom: str
    part: int
    candidates: List[Candidate] = field(default_factory=list)
    n_signatures: int = 0
    n_clusters: int = 0
    n_reads: int = 0
    error: Optional[str] = None


def run_detect(options, bam_path: str, chrom: str, part: int, start: int,
               end: int, bam: Optional[BamReader] = None,
               ref: Optional[FastaFile] = None) -> WindowResult:
    """Collect one window. Opens its own handles when none are passed
    (process-pool mode)."""
    result = WindowResult(chrom=chrom, part=part)
    try:
        own_bam = bam is None
        if bam is None:
            bam = BamReader(bam_path)
        if ref is None:
            ref = FastaFile(options.genome)

        # Window-resident coverage counting: any cluster span inside
        # [start, end] only overlaps reads the window fetch already returned,
        # so counting is a vectorized scan over the in-memory spans instead
        # of a fresh BAM fetch per cluster (classes.py:165-170 re-opens the
        # BAM each time). Spans sticking out of the window fall back to the
        # indexed count.
        streamed = (_stream_window(bam, chrom, start, end, options)
                    if end - start > STREAM_WINDOW else None)
        batch = None if streamed is not None \
            else bam.fetch_batch(chrom, start, end)
        if streamed is not None:
            aln_iter, pos, endpos = streamed
            sigs = analyze_alignments(aln_iter, options, ref)
        elif batch is not None:
            # Native SoA path: spans come straight from the batch arrays and
            # the vectorized prefilter drops clean qname groups before any
            # Aln object is built (collect/prefilter.py) — in a deep-coverage
            # window ~97% of reads never reach the Python signature stack.
            from svision_tpu.collect.prefilter import qualifying_read_mask
            from svision_tpu.io.bam import _batch_to_alns
            pos = batch.pos.astype(np.int64)
            endpos = np.maximum(batch.endpos, batch.pos + 1).astype(np.int64)
            min_mapq = 0 if options.contig else options.min_mapq
            keep = qualifying_read_mask(batch, min_mapq, options.min_sv_size)
            alns = _batch_to_alns(batch, bam.references,
                                  indices=np.nonzero(keep)[0])
            sigs = analyze_alignments(alns, options, ref)
        else:
            # pure-Python fallback: capture spans while STREAMING the fetch
            # through the signature stage (two ints/read, not whole records)
            pos_list: List[int] = []
            end_list: List[int] = []

            def _record_spans(it):
                for a in it:
                    pos_list.append(a.reference_start)
                    # fetch/count clamp zero-ref-span records to one base
                    # (end_pos(), svio.cc) — mirror that here
                    end_list.append(max(a.reference_end,
                                        a.reference_start + 1))
                    yield a

            sigs = analyze_alignments(
                _record_spans(bam.fetch(chrom, start, end)), options, ref)
            pos = np.asarray(pos_list, np.int64)
            endpos = np.asarray(end_list, np.int64)
        result.n_signatures = len(sigs)
        logging.info("Processing %s:%s-%s, %s signatures", chrom, start, end,
                     len(sigs))

        # Sorted span copies turn each cluster's coverage count into two
        # binary searches instead of a linear scan over every fetched
        # record (599 clusters x 54k spans in a 30x 10 Mb window was ~5% of
        # the whole window). count = #{pos < cend} - #{endpos <= cstart}:
        # valid because pos < endpos for every record, so any read ending
        # at-or-before cstart also starts before cend.
        pos_sorted = np.sort(pos)
        end_sorted = np.sort(endpos)

        def coverage_counter(contig: str, cstart: int, cend: int) -> int:
            if contig == chrom and cstart >= start and cend <= end:
                return int(np.searchsorted(pos_sorted, cend, side="left")
                           - np.searchsorted(end_sorted, cstart,
                                             side="right"))
            return bam.count_overlapping(contig, cstart, cend)

        clusters = partition_and_cluster(
            sigs, chrom, coverage_counter, options,
            logger=logging.getLogger())
        result.n_clusters = len(clusters)

        graph_writer = None
        if options.graph:
            graph_out = os.path.join(options.out_path, "graphs")

            def graph_writer(cluster):
                from svision_tpu.collect.graph import write_graph_to_file
                cluster_dir = os.path.join(
                    graph_out, "{0}-{1}-{2}".format(
                        cluster.contig, int(cluster.cstart), int(cluster.cend)))
                os.makedirs(cluster_dir, exist_ok=True)
                for sig in cluster.get_signatures():
                    if sig.graph is None:
                        continue
                    out_file = os.path.join(
                        cluster_dir,
                        "{}.gfa".format(sig.graph.qname.replace("/", "_")))
                    write_graph_to_file(sig.graph, out_file)

        result.candidates = clusters_to_candidates(clusters, options,
                                                   graph_writer=graph_writer)
        if own_bam:
            bam.close()
        return result
    except Exception as exc:  # explicit per-shard status (vs reference's
        # silent swallow, SVision:273-281)
        result.error = f"{exc!r} at {traceback.format_exc(limit=5)}"
        return result


_COLLECT_KEYS = ("min_support", "min_mapq", "min_sv_size", "max_sv_size",
                 "window_size", "patition_max_distance",
                 "cluster_max_distance", "hash", "contig", "graph", "chrom",
                 "k_size", "min_accept", "max_hash_len")


def _input_stamp(path: str):
    """(path, size, mtime_ns) identity of an input file; candidates cached
    from a different or modified BAM/reference must never be reused."""
    try:
        st = os.stat(path)
        return [path, st.st_size, st.st_mtime_ns]
    except OSError:
        return [path, -1, -1]


def collect_signature(options) -> str:
    """Canonical string of every option AND input that affects candidate
    emission — the --resume cache key. Includes the BAM and reference
    identities (path + size + mtime): same parameters over different
    inputs are different caches."""
    import json
    key = {k: getattr(options, k) for k in _COLLECT_KEYS}
    key["bam"] = _input_stamp(options.bam_path)
    key["genome"] = _input_stamp(options.genome)
    return json.dumps(key, sort_keys=True)


def cache_valid(out_dir: str, options) -> bool:
    """True when the cached beds under out_dir were produced with the same
    collection parameters."""
    sidecar = os.path.join(out_dir, ".collect_params.json")
    if not os.path.exists(sidecar):
        return False
    with open(sidecar) as fh:
        return fh.read() == collect_signature(options)


def write_cache_params(out_dir: str, options) -> None:
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, ".collect_params.json"), "w") as fh:
        fh.write(collect_signature(options))


def dump_bed(results: List[WindowResult], out_dir: str) -> None:
    """--debug/--resume: write per-part bed files byte-compatible with the
    reference's {chr}.segments.{part}.bed (output_clusters.py:83-89)."""
    os.makedirs(out_dir, exist_ok=True)
    for res in results:
        if res.error:
            # a failed window must never be cached as a valid empty result —
            # resume would silently drop every SV in it forever
            continue
        path = os.path.join(out_dir, f"{res.chrom}.segments.{res.part}.bed")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            for cand in res.candidates:
                fh.write(cand.to_bed_line())
        os.replace(tmp, path)   # atomic: resume never sees partial beds


def load_bed(out_dir: str, chrom: str, part: int) -> Optional[WindowResult]:
    """--resume: reload a window's cached candidates; None when absent."""
    path = os.path.join(out_dir, f"{chrom}.segments.{part}.bed")
    if not os.path.exists(path):
        return None
    result = WindowResult(chrom=chrom, part=part)
    with open(path) as fh:
        result.candidates = [Candidate.from_bed_line(l) for l in fh if l.strip()]
    return result
