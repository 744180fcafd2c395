"""Synthetic genome/BAM simulator (typed SV events -> FASTA + BAM).

Shipped in the package (not tests/) because the training-set builder
(models/dataset.py) and the closed-loop bootstrap depend on it.

Generates reads that carry real SV signals (CIGAR deletions/insertions,
split-read inversions/duplications) over a random reference, so the full
pipeline produces deterministic calls.
"""

from __future__ import annotations

import random
from typing import Dict, List, Tuple

from svision_tpu.io.bamwrite import SamRecord
from svision_tpu.io.fasta import write_fasta


def make_genome(path: str, chroms: Dict[str, int], seed: int = 0,
                fast: bool = False) -> Dict[str, str]:
    """fast=True generates bases with numpy (~100x faster; needed for
    100 Mb+ WGS-scale fixtures). The two modes draw different sequences for
    the same seed, so seeded golden tests must keep the default."""
    if fast:
        import numpy as np
        nprng = np.random.RandomState(seed & 0x7FFFFFFF)
        lut = np.frombuffer(b"ACGT", np.uint8)
        seqs = {name: lut[nprng.randint(0, 4, ln)].tobytes().decode("ascii")
                for name, ln in chroms.items()}
    else:
        rng = random.Random(seed)
        seqs = {name: "".join(rng.choice("ACGT") for _ in range(ln))
                for name, ln in chroms.items()}
    write_fasta(path, seqs)
    return seqs


def del_read(qname: str, chrom: str, anchor: int, flank: int, dl: int,
             genome: str) -> List[SamRecord]:
    """Read spanning a deletion as one alignment with a D op."""
    seq = genome[anchor:anchor + flank] + genome[anchor + flank + dl:
                                                 anchor + flank + dl + flank]
    return [SamRecord(qname, 0, chrom, anchor, 60,
                      f"{flank}M{dl}D{flank}M", seq)]


def ins_read(qname: str, chrom: str, anchor: int, flank: int, il: int,
             genome: str, rng) -> List[SamRecord]:
    ins = "".join(rng.choice("ACGT") for _ in range(il))
    seq = genome[anchor:anchor + flank] + ins + \
        genome[anchor + flank:anchor + 2 * flank]
    return [SamRecord(qname, 0, chrom, anchor, 60,
                      f"{flank}M{il}I{flank}M", seq)]


def inv_read(qname: str, chrom: str, anchor: int, flank: int, il: int,
             genome: str) -> List[SamRecord]:
    """Split read: fwd flank + reversed middle + fwd flank (3 alignments)."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    mid = genome[anchor + flank:anchor + flank + il]
    mid_rc = "".join(comp[b] for b in reversed(mid))
    seq = genome[anchor:anchor + flank] + mid_rc + \
        genome[anchor + flank + il:anchor + 2 * flank + il]
    total = len(seq)
    return [
        SamRecord(qname, 0, chrom, anchor, 60,
                  f"{flank}M{total - flank}S", seq),
        SamRecord(qname, 2048 | 16, chrom, anchor + flank, 60,
                  f"{flank}H{il}M{flank}H", mid),
        SamRecord(qname, 2048, chrom, anchor + flank + il, 60,
                  f"{flank + il}H{flank}M", seq[flank + il:]),
    ]


def tdup_read(qname: str, chrom: str, anchor: int, flank: int, size: int,
              genome: str) -> List[SamRecord]:
    """Split read carrying a tandem duplication: the supplementary re-maps
    back inside the primary's ref span (ref-overlap => sigDup,
    analyze_reads.py:355-424)."""
    dup = genome[anchor:anchor + size]
    left = genome[anchor - flank:anchor + size]                 # flank+copy1
    right = dup + genome[anchor + size:anchor + size + flank]   # copy2+flank
    seq = left + right
    return [
        SamRecord(qname, 0, chrom, anchor - flank, 60,
                  f"{len(left)}M{len(right)}S", seq),
        SamRecord(qname, 2048, chrom, anchor, 60,
                  f"{len(left)}H{len(right)}M", right),
    ]


def dup_read(qname: str, chrom: str, anchor: int, flank: int, size: int,
             genome: str, dist: int = None) -> List[SamRecord]:
    """Dispersed (non-tandem) duplication: a copy of a nearby source locus
    (inside the left flank) inserted at `anchor`. The middle alignment's ref
    span is covered by the first flank's span, so the main/other labeling
    (analyze_reads.py:704-728, cal_overlap_ratio in REF coords) marks it
    'other' -> main-x-other candidate pairs (the DUP image class)."""
    if dist is None:
        dist = size + 300            # source upstream, still within the flank
    src = anchor - dist
    ins = genome[src:src + size]
    seq = genome[anchor - flank:anchor] + ins + genome[anchor:anchor + flank]
    return [
        SamRecord(qname, 0, chrom, anchor - flank, 60,
                  f"{flank}M{size + flank}S", seq),
        SamRecord(qname, 2048, chrom, src, 60,
                  f"{flank}H{size}M{flank}H", ins),
        SamRecord(qname, 2048, chrom, anchor, 60,
                  f"{flank + size}H{flank}M", seq[flank + size:]),
    ]


def delins_read(qname: str, chrom: str, anchor: int, flank: int, dl: int,
                il: int, genome: str, rng) -> List[SamRecord]:
    """Complex DEL+INS at one locus: `dl` reference bases replaced by `il`
    novel bases — one alignment with adjacent I and D ops, which
    analyze_inside_align splits into two typed gaps (-> <CSV> DEL+INS)."""
    ins = "".join(rng.choice("ACGT") for _ in range(il))
    seq = genome[anchor - flank:anchor] + ins + \
        genome[anchor + dl:anchor + dl + flank]
    return [SamRecord(qname, 0, chrom, anchor - flank, 60,
                      f"{flank}M{il}I{dl}D{flank}M", seq)]


def invdel_read(qname: str, chrom: str, anchor: int, flank: int, il: int,
                dl: int, genome: str) -> List[SamRecord]:
    """Complex INV+DEL: an inverted segment followed by a deleted stretch —
    split read whose last segment resumes `dl` bases downstream."""
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    mid = genome[anchor:anchor + il]
    mid_rc = "".join(comp[b] for b in reversed(mid))
    tail_start = anchor + il + dl
    seq = genome[anchor - flank:anchor] + mid_rc + \
        genome[tail_start:tail_start + flank]
    total = len(seq)
    return [
        SamRecord(qname, 0, chrom, anchor - flank, 60,
                  f"{flank}M{total - flank}S", seq),
        SamRecord(qname, 2048 | 16, chrom, anchor, 60,
                  f"{flank}H{il}M{flank}H", mid),
        SamRecord(qname, 2048, chrom, tail_start, 60,
                  f"{flank + il}H{flank}M", seq[flank + il:]),
    ]


def make_sv_bam(bam_path: str, genome_seq: Dict[str, str], seed: int = 0,
                support: int = 8,
                events: List[Tuple[str, str, int, int]] = None,
                noise: bool = False, coverage: int = 6,
                profile=None, genotypes: List[str] = None,
                stream: bool = False,
                compress_level: int = 6) -> List[Tuple]:
    """events: [(kind, chrom, anchor, size)]; returns the event list used.

    noise=True adds records every caller must FILTER (collect_signatures.py
    131-155 semantics): low-mapq SV reads, secondary alignments, unmapped
    records. coverage sets the background depth (5 kb reads every 2.5 kb,
    coverage/2 staggered copies; default 6x keeps the historical read set
    byte-stable for seeded tests).

    profile: a svision_tpu.noise.NoiseProfile or "hifi"/"ont" — realistic
    read noise: the sequenced (donor) genome differs from the reference
    FASTA by SNPs and sub-min_sv_size indels, every read carries
    per-instrument sequencing errors applied consistently across its
    alignment records, and mapping quality varies (a small fraction below
    the min_mapq filter).

    genotypes: optional per-event GT list ("1/1"/"0/1") — haplotype-aware
    read sets: a het event puts the SV on ~half the spanning reads and
    clean REFERENCE-allele reads on the other half; hom events on all.
    Background tiling reads then avoid event loci, so the genotyper's DR
    count comes only from the planted reference reads. With genotypes=None
    the historical read set is byte-identical (seeded golden tests).

    stream=True generates and writes ONE CHROMOSOME AT A TIME (events, then
    background, sorted in-chrom and fed to the lazy BAM writer) so
    whole-genome-scale fixtures (3 Gb / tens of millions of reads) stay
    bounded by the largest chromosome's read set instead of the genome's.
    For CLEAN fixtures with chrom-ordered events the output is
    byte-identical to stream=False (tests/test_bam_io.py); with a noise
    profile (or events out of chrom order) the seeded RNG draw order
    differs per record, so seeded golden tests must keep the default."""
    from svision_tpu import noise as _noise
    prof = _noise.get_profile(profile)
    rng = random.Random(seed)
    chrom = list(genome_seq)[0]
    if events is None:
        events = [("DEL", chrom, 20000, 300),
                  ("INS", chrom, 60000, 220),
                  ("DEL", chrom, 100000, 500)]
    if genotypes is not None and len(genotypes) != len(events):
        raise ValueError("genotypes must be parallel to events")
    bad = {ev[1] for ev in events} - set(genome_seq)
    if bad:
        # must fail in BOTH modes: the streaming path iterates genome
        # chromosomes and would otherwise silently drop events on unknown
        # chroms, writing a valid-looking BAM that benchmarks recall
        # against never-planted truth (review finding)
        raise ValueError(f"event chromosomes not in genome: {sorted(bad)}")
    if prof is not None:
        import numpy as np
        nprng = np.random.default_rng(seed)
        variants = _noise.donor_variants(
            {c: len(s) for c, s in genome_seq.items()}, seed, prof)
        genome_seq = _noise.apply_donor_snps(genome_seq, variants)
    records: List[SamRecord] = []

    def finish_group(group: List[SamRecord], ch: str,
                     sink: List[SamRecord]) -> None:
        """Noise one read's alignment-record group (no-op without profile)."""
        if prof is not None:
            read_len = len(group[0].seq)        # builders emit primary first
            edits = _noise.donor_edits_for_group(group, read_len,
                                                 variants[ch][2])
            edits += _noise.sequencing_edits(read_len, nprng, prof)
            _noise.apply_group_edits(group, edits)
            for rec in group:
                rec.mapq = _noise.sample_mapq(nprng, prof)
        sink.extend(group)

    flank = 2000
    # event loci background reads must not span in genotype mode (the
    # genotyper would count them as reference support regardless of GT)
    avoid_iv: Dict[str, List[Tuple[int, int]]] = {}
    if genotypes is not None:
        for ev in events:
            kind, ch, anchor, size = ev[0], ev[1], ev[2], ev[3]
            span = size + (ev[4] if len(ev) > 4 else max(60, size // 2)) \
                if "+" in kind else size
            avoid_iv.setdefault(ch, []).append(
                (anchor - 2 * flank - 200, anchor + span + 2 * flank + 200))
        for ch in avoid_iv:
            avoid_iv[ch].sort()
    def emit_event(ei, ev, sink):
        kind, ch, anchor, size = ev[0], ev[1], ev[2], ev[3]
        # optional 5th element: the second component's size for compound
        # events (INV+DEL's deletion / DEL+INS's deletion). The legacy
        # default dl = size//2 puts an INV+DEL's main-main pair EXACTLY on
        # the reference's linearOrNot 1.5 colinearity cutoff
        # (output_clusters.py:11-26): ratio (il+dl)/il == 1.5, so
        # noise-level jitter randomly deletes the pair before imaging.
        # Independent sizes avoid concentrating every simulated event on
        # that boundary (round-4 forensics, docs/PERF.md).
        aux = ev[4] if len(ev) > 4 else max(60, size // 2)
        glen = len(genome_seq[ch])
        # per-kind read extents (incl. the ±12 bp anchor jitter): DUP reads
        # a source locus size+300 bp upstream, INV+DEL's tail resumes `aux`
        # bp past the inverted segment — a generic 2*flank margin silently
        # yielded SEQ/CIGAR-inconsistent records for large events of those
        # kinds (review finding)
        jmax = 12
        lo = anchor - 2 * flank - jmax
        hi = anchor + size + 2 * flank + jmax
        if kind == "DUP":
            lo = min(lo, anchor - jmax - (size + 300))
        elif kind == "INV+DEL":
            hi = max(hi, anchor + jmax + size + aux + flank)
        if lo < 0 or hi > glen:
            raise ValueError(
                f"event {kind}@{ch}:{anchor} size {size} does not fit in the "
                f"{glen} bp genome (needs [{lo}, {hi}) with {flank} bp "
                "flanks) — reads would carry truncated sequence")
        gt = genotypes[ei] if genotypes is not None else None
        n_alt = support if gt in (None, "1/1") else (support + 1) // 2
        for s in range(n_alt):
            q = f"sv{ei}_{s}"
            jitter = rng.randint(-12, 12)
            a = anchor + jitter
            # del/ins/inv readers place the event one flank into the read, so
            # start them a flank early: every kind plants its SV at `anchor`
            if kind == "DEL":
                group = del_read(q, ch, a - flank, flank, size,
                                 genome_seq[ch])
            elif kind == "INS":
                group = ins_read(q, ch, a - flank, flank, size,
                                 genome_seq[ch], rng)
            elif kind == "INV":
                group = inv_read(q, ch, a - flank, flank, size,
                                 genome_seq[ch])
            elif kind == "tDUP":
                group = tdup_read(q, ch, a, flank, size, genome_seq[ch])
            elif kind == "DUP":
                group = dup_read(q, ch, a, flank, size, genome_seq[ch])
            elif kind == "DEL+INS":
                group = delins_read(q, ch, a, flank, size, aux,
                                    genome_seq[ch], rng)
            elif kind == "INV+DEL":
                group = invdel_read(q, ch, a, flank, size, aux,
                                    genome_seq[ch])
            else:
                raise ValueError(f"unknown event kind {kind!r}")
            finish_group(group, ch, sink)
        if gt == "0/1":
            # reference-allele haplotype: clean spanning reads (count as DR)
            ln = 2 * flank + (size + aux if "+" in kind else size)
            for s in range(support - n_alt):
                a = anchor + rng.randint(-12, 12)
                start0 = max(0, a - flank)
                finish_group([SamRecord(f"ref{ei}_{s}", 0, ch, start0, 60,
                                        f"{ln}M",
                                        genome_seq[ch][start0:start0 + ln])],
                             ch, sink)

    def emit_noise_extras(sink):
        kind, ch, anchor, size = events[0][0], events[0][1], \
            events[0][2], events[0][3]
        g0 = genome_seq[ch]
        # low-mapq split reads at the first event locus (mapq < default 10)
        for s in range(3):
            for rec in del_read(f"lowmq_{s}", ch, anchor - flank, flank,
                                size, g0):
                rec.mapq = 5
                sink.append(rec)
        # secondary alignment (flag 0x100) and unmapped record
        sec = del_read("secread", ch, anchor - flank, flank, size, g0)[0]
        sec.flag |= 0x100
        sink.append(sec)
        sink.append(SamRecord("unmapped0", 4, ch, anchor, 0, "*",
                              g0[anchor:anchor + 300]))

    # background coverage: clean reads across every chrom
    import bisect
    copies = max(1, coverage // 2)

    def emit_background(chrom, g, sink):
        iv = avoid_iv.get(chrom, [])
        starts = [x[0] for x in iv]
        # keep the historical bound for the default depth (seed-stable
        # tests); deeper settings shrink it so every staggered copy fits
        bound = (len(g) - 6000 if copies == 3
                 else len(g) - 5000 - 311 * copies)
        for i in range(0, bound, 2500):
            for k in range(copies):
                s0 = i + k * 311
                if iv:
                    j = bisect.bisect_right(starts, s0 + 5000) - 1
                    if j >= 0 and iv[j][1] > s0:
                        continue                 # overlaps an event locus
                finish_group([SamRecord(
                    f"bg_{chrom}_{i}_{k}", 0, chrom, s0, 60,
                    "5000M", g[s0:s0 + 5000])], chrom, sink)

    from svision_tpu.io.bamwrite import write_bam
    refs = [(c, len(s)) for c, s in genome_seq.items()]
    if not stream:
        # historical flow (events -> noise extras -> background) keeps the
        # seeded RNG draw order, hence byte-identical fixtures
        for ei, ev in enumerate(events):
            emit_event(ei, ev, records)
        if noise and events:
            emit_noise_extras(records)
        for c, g in genome_seq.items():
            emit_background(c, g, records)
        write_bam(bam_path, refs, records, compress_level=compress_level)
        return events

    def per_chrom():
        by_chrom: Dict[str, List] = {}
        for ei, ev in enumerate(events):
            by_chrom.setdefault(ev[1], []).append((ei, ev))
        for c, g in genome_seq.items():
            sink: List[SamRecord] = []
            for ei, ev in by_chrom.get(c, ()):
                emit_event(ei, ev, sink)
            if noise and events and c == events[0][1]:
                emit_noise_extras(sink)
            emit_background(c, g, sink)
            # in-chrom position sort + reference chrom order == the global
            # (tid, pos) coordinate sort of the non-streaming path
            sink.sort(key=lambda r: r.pos)
            yield from sink

    write_bam(bam_path, refs, per_chrom(), sort=False,
              compress_level=compress_level)
    return events
