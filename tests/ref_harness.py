"""Drive the actual reference implementation for golden-parity testing.

Installs a minimal fake `pysam` module (backed by svision_tpu's own FASTA
reader and simple record objects), puts /root/reference on sys.path, and
imports the reference's collection modules. Tests then feed identical
synthetic alignments to the reference and to svision_tpu and require
identical outputs. The reference code is only *executed*, never copied.
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

REFERENCE_ROOT = "/root/reference"

sys.dont_write_bytecode = True


class FakeAlignedSegment:
    """Settable-attribute stand-in for pysam.AlignedSegment, with the derived
    properties the reference reads (query_length, query_alignment_*,
    reference_end)."""

    def __init__(self):
        self.reference_id = -1
        self.reference_start = -1
        self.query_name = None
        self.is_supplementary = False
        self.is_reverse = False
        self.is_unmapped = False
        self.is_secondary = False
        self.query_sequence = None
        self.mapping_quality = 0
        self.cigarstring = None
        self.next_reference_id = -1
        self.next_reference_start = -1
        self.template_length = 0
        self.reference_name = None

    # -- derived --
    def _cigar(self):
        out = []
        num = 0
        for ch in self.cigarstring or "":
            if ch.isdigit():
                num = num * 10 + ord(ch) - 48
            else:
                out.append((ch, num))
                num = 0
        return out

    @property
    def mapq(self):
        return self.mapping_quality

    @property
    def qname(self):
        return self.query_name

    @property
    def query_length(self):
        # pysam: length of SEQ; 0 when absent
        if self.query_sequence is None:
            return 0
        return len(self.query_sequence)

    @property
    def query_alignment_start(self):
        lead = 0
        for op, ln in self._cigar():
            if op == "S":
                lead += ln
            elif op != "H":
                break
        return lead

    @property
    def query_alignment_end(self):
        cig = self._cigar()
        tail = 0
        for op, ln in reversed(cig):
            if op == "S":
                tail += ln
            elif op != "H":
                break
        qlen = sum(ln for op, ln in cig if op in "MIS=X")
        return qlen - tail

    @property
    def reference_end(self):
        return self.reference_start + sum(
            ln for op, ln in self._cigar() if op in "MDN=X")


class FakeAlignmentFile:
    """pysam.AlignmentFile stand-in.

    Two backends: per-path registered in-memory reads (unit parity tests), or
    — when the path is a real BAM on disk — svision_tpu's own BamReader, so
    the reference pipeline can be executed end-to-end against an actual file
    (its Aln records quack like pysam.AlignedSegment for every attribute the
    reference touches)."""

    registry = {}

    def __init__(self, path, mode="r"):
        import os
        self.path = path
        self._reader = None
        entry = FakeAlignmentFile.registry.get(path)
        if entry is None and os.path.exists(path):
            from svision_tpu.io.bam import BamReader
            self._reader = BamReader(path)
            self.refs = list(self._reader.references)
            self.reads = []
            self.lengths = dict(zip(self._reader.references,
                                    self._reader.lengths))
            return
        entry = entry or {}
        self.refs = entry.get("refs", ["chr1"])
        self.reads = entry.get("reads", [])
        self.lengths = entry.get("lengths", {})

    def getrname(self, tid):
        return self.refs[tid]

    def get_tid(self, name):
        return self.refs.index(name)

    def get_reference_length(self, name):
        return self.lengths.get(name, 10**9)

    def fetch(self, contig=None, start=None, stop=None, end=None):
        stop = stop if stop is not None else end
        if self._reader is not None:
            yield from self._reader.fetch(contig, start or 0, stop)
            return
        for r in self.reads:
            if contig is not None and r.reference_name != contig:
                continue
            if start is not None and r.reference_end <= start:
                continue
            if stop is not None and r.reference_start >= stop:
                continue
            yield r


class FakeVariantRecord:
    """pysam.VariantRecord stand-in for the attributes the reference graph
    step reads (graph.py:535-621): contig/start/stop, typed info dict,
    str(record) = the raw line."""

    _INT_FIELDS = ("END", "SVLEN", "SUPPORT")

    def __init__(self, line: str):
        self._line = line if line.endswith("\n") else line + "\n"
        parts = line.rstrip("\n").split("\t")
        self.contig = parts[0]
        self.pos = int(parts[1])
        self.start = self.pos - 1          # pysam: 0-based start
        self.id = parts[2]
        self.qual = parts[5]
        self.info = {}
        for field in parts[7].split(";"):
            if "=" not in field:
                self.info[field] = True
                continue
            k, v = field.split("=", 1)
            if k in self._INT_FIELDS:
                self.info[k] = int(v)
            elif k in ("READS", "BKPS"):
                self.info[k] = tuple(v.split(","))   # Number=. => tuple
            else:
                self.info[k] = v
        self.stop = self.info.get("END", self.pos)

    def __str__(self):
        return self._line


class FakeVariantFile:
    """pysam.VariantFile stand-in: text parse, header passthrough."""

    def __init__(self, path, mode="r"):
        self._header_text = ""
        self._records = []
        for line in open(path):
            if line.startswith("#"):
                self._header_text += line
            elif line.strip():
                self._records.append(FakeVariantRecord(line))

    @property
    def header(self):
        class _H(str):
            pass
        return _H(self._header_text)

    def __iter__(self):
        return iter(self._records)


def install_fake_pysam():
    from svision_tpu.io.fasta import FastaFile as _Fasta

    mod = types.ModuleType("pysam")
    mod.AlignedSegment = FakeAlignedSegment
    mod.AlignmentFile = FakeAlignmentFile
    mod.FastaFile = _Fasta
    mod.VariantFile = FakeVariantFile
    sys.modules["pysam"] = mod
    return mod


def load_reference_module(dotted: str):
    """Import one reference module (e.g. 'src.network.annotation') with the
    fake pysam installed."""
    install_fake_pysam()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import importlib
    return importlib.import_module(dotted)


def import_reference():
    """Import reference collection modules with the fake pysam installed."""
    install_fake_pysam()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import src.collection.analyze_reads as ref_analyze_reads
    import src.collection.collect_signatures as ref_collect
    import src.collection.cluster_signatures as ref_cluster
    import src.collection.output_clusters as ref_output_clusters
    import src.collection.classes as ref_classes
    return SimpleNamespace(
        analyze_reads=ref_analyze_reads,
        collect=ref_collect,
        cluster=ref_cluster,
        output_clusters=ref_output_clusters,
        classes=ref_classes,
    )


def ref_options(genome_path, **kw):
    """argparse-Namespace equivalent with reference defaults (SVision:27-106)."""
    defaults = dict(
        out_path="/tmp", bam_path="fake.bam", model_path="", genome=genome_path,
        sample="test", thread_num=1, min_support=5, chrom=None, hash=False,
        qname=False, graph=False, contig=False, debug=False, min_mapq=10,
        min_sv_size=50, max_sv_size=1000000, window_size=10000000,
        patition_max_distance=5000, cluster_max_distance=0.3, batch_size=128,
        min_gt_depth=4, homo_thresh=0.8, hete_thresh=0.2, k_size=10,
        min_accept=50, max_hash_len=1000,
    )
    defaults.update(kw)
    return SimpleNamespace(**defaults)


def sig_tuple(sig):
    """Comparable projection of a Signature (reference or svision_tpu)."""
    segs = tuple(
        tuple(sorted((k, v) for k, v in seg.items() if k in
                     ("q_start", "q_end", "ref_start", "ref_end", "is_reverse",
                      "qual", "ref_id", "read_name")))
        for seg in sig.sorted_aligns)
    return (sig.contig, sig.tstart, sig.tend, sig.type, sig.qname,
            tuple(tuple(b) for b in sig.bkps), sig.mechanism, segs)
