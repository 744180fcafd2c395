"""Realistic read-noise model (svision_tpu/noise.py) — round-4 VERDICT #1.

Covers: the read-space editor's aligner invariant (every alignment record of
a read implies the same query length), donor-variant consistency across
reads and orientations, per-profile error rates, signature survival under
HiFi/ONT noise, specificity on event-free noisy genomes, and haplotype-aware
genotype truth (VERDICT #2)."""

import itertools
import os
import random
import re

import numpy as np
import pytest

from svision_tpu import noise as N
from svision_tpu import sim
from svision_tpu.io.bamwrite import SamRecord


def _group_ok(group):
    """The aligner invariant + SEQ/CIGAR agreement for one read group."""
    lens = set()
    for g in group:
        ops = N.parse_cigar(g.cigar)
        assert N.query_len(ops, with_hard=False) == len(g.seq or "")
        lens.add(N.query_len(ops))
    assert len(lens) == 1, f"inconsistent read lengths {lens}"
    return lens.pop()


def test_editor_basic_ops():
    rec = SamRecord("r", 0, "c", 100, 60, "20M", "ACGTACGTACGTACGTACGT")
    N.apply_group_edits([rec], [(5, "sub", "T"), (10, "ins", "GG"),
                                (15, "del", 2)])
    assert rec.cigar == "10M2I5M2D3M"
    assert rec.seq == "ACGTATGTACGGGTACGCGT"
    assert rec.pos == 100                       # ref span preserved
    ops = N.parse_cigar(rec.cigar)
    assert sum(n for n, op in ops if op in "MD") == 20


def test_editor_edge_deletions_trim_and_shift():
    # deletion error on the FIRST aligned base -> leading D trimmed, POS++
    rec = SamRecord("r", 0, "c", 100, 60, "10M", "ACGTACGTAC")
    N.apply_group_edits([rec], [(0, "del", 1)])
    assert rec.cigar == "9M" and rec.pos == 101
    # ... and on the LAST -> trailing D trimmed
    rec2 = SamRecord("r", 0, "c", 100, 60, "10M", "ACGTACGTAC")
    N.apply_group_edits([rec2], [(9, "del", 1)])
    assert rec2.cigar == "9M" and rec2.pos == 100


def test_editor_clip_junction_insert_joins_clip():
    """Insertion exactly at a clip junction extends the clip (never H-I-M)."""
    grp = [SamRecord("r", 0, "c", 0, 60, "10M10S", "A" * 20),
           SamRecord("r", 2048, "c", 50, 60, "10H10M", "A" * 10)]
    N.apply_group_edits(grp, [(10, "ins", "CC")])
    assert grp[0].cigar == "10M12S"
    assert grp[1].cigar == "12H10M"
    _group_ok(grp)


def test_split_read_group_survives_heavy_noise():
    rng = random.Random(1)
    genome = "".join(rng.choice("ACGT") for _ in range(20000))
    for builder, args in [
            (sim.inv_read, ("q", "c", 5000, 2000, 300, genome)),
            (sim.tdup_read, ("q", "c", 5000, 2000, 300, genome)),
            (sim.dup_read, ("q", "c", 5000, 2000, 300, genome))]:
        grp = builder(*args)
        clean_len = _group_ok(grp)
        nprng = np.random.default_rng(3)
        edits = N.sequencing_edits(clean_len, nprng, N.ONT)
        assert len(edits) > 50                  # ONT really is noisy
        N.apply_group_edits(grp, edits)
        _group_ok(grp)


def test_donor_indels_map_through_both_orientations():
    rng = random.Random(1)
    genome = "".join(rng.choice("ACGT") for _ in range(20000))
    # inverted ref segment is [7000, 7300); 7100 sits inside it
    grp = sim.inv_read("q", "c", 5000, 2000, 300, genome)
    L = _group_ok(grp)
    ed = N.donor_edits_for_group(grp, L, [(7100, "ins", 4, "TTTT")])
    N.apply_group_edits(grp, ed)
    assert _group_ok(grp) == L + 4
    sup = next(g for g in grp if g.flag & 16)
    # stored orientation is genome-forward: the donor bases appear verbatim
    # at ref offset 100, and the read carries their reverse complement
    assert sup.cigar == "2000H100M4I200M2000H"
    assert sup.seq[100:104] == "TTTT"
    grp2 = sim.inv_read("q", "c", 5000, 2000, 300, genome)
    ed2 = N.donor_edits_for_group(grp2, L, [(7100, "del", 6, "")])
    N.apply_group_edits(grp2, ed2)
    assert _group_ok(grp2) == L - 6
    assert next(g for g in grp2 if g.flag & 16).cigar == \
        "2000H100M6D194M2000H"
    # forward-covered position: same donor insertion through the flank
    grp3 = sim.inv_read("q", "c", 5000, 2000, 300, genome)
    ed3 = N.donor_edits_for_group(grp3, L, [(5100, "ins", 4, "TTTT")])
    N.apply_group_edits(grp3, ed3)
    assert _group_ok(grp3) == L + 4
    assert grp3[0].cigar.startswith("100M4I")


def test_donor_snps_consistent_and_reference_untouched(tmp_path):
    genome = str(tmp_path / "ref.fa")
    seqs = sim.make_genome(genome, {"chr1": 60000}, seed=3)
    ref_bytes = open(genome, "rb").read()
    variants = N.donor_variants({"chr1": 60000}, 3, N.HIFI)
    donor = N.apply_donor_snps(seqs, variants)
    snp_pos, snp_base, _ = variants["chr1"]
    assert snp_pos.size > 10
    diff = [i for i in range(60000) if seqs["chr1"][i] != donor["chr1"][i]]
    assert set(diff) <= set(snp_pos.tolist())   # SNPs only, nowhere else
    assert open(genome, "rb").read() == ref_bytes


def test_profile_error_rates_in_band(tmp_path):
    genome = str(tmp_path / "ref.fa")
    seqs = sim.make_genome(genome, {"chr1": 200000}, seed=5)
    from svision_tpu.io.bam import BamReader
    for prof, lo, hi in [("hifi", 0.004, 0.02), ("ont", 0.03, 0.07)]:
        bam = str(tmp_path / f"{prof}.bam")
        sim.make_sv_bam(bam, seqs, seed=6, events=[], profile=prof,
                        coverage=12)
        alns = list(itertools.islice(
            BamReader(bam).fetch("chr1", 0, 200000), 200))
        indel = aligned = 0
        for a in alns:
            ops = re.findall(r"(\d+)([MIDSH])", a.cigarstring)
            indel += sum(int(x) for x, o in ops if o in "ID")
            aligned += sum(int(x) for x, o in ops if o == "M")
        rate = indel / aligned
        assert lo < rate < hi, f"{prof}: indel-base rate {rate}"


def _collect_regions(wd, genome, bam, chrom_len, min_support=3):
    from svision_tpu.cli import parse_arguments
    from svision_tpu.collect.window import run_detect
    options = parse_arguments(
        ["-o", os.path.join(str(wd), "out"), "-b", bam, "-g", genome,
         "-m", "x.npz", "-n", "s", "-s", str(min_support)])
    os.makedirs(options.out_path, exist_ok=True)
    res = run_detect(options, bam, "chr1", 0, 0, chrom_len)
    assert res.error is None, res.error
    return res


_EVENTS5 = [("DEL", "chr1", 40000, 300), ("INS", "chr1", 90000, 220),
            ("INV", "chr1", 140000, 400), ("tDUP", "chr1", 190000, 250),
            ("DUP", "chr1", 240000, 300)]


@pytest.mark.parametrize("prof", ["hifi", "ont"])
def test_noisy_collection_finds_all_events(tmp_path, prof):
    genome = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "sim.bam")
    seqs = sim.make_genome(genome, {"chr1": 300000}, seed=5)
    sim.make_sv_bam(bam, seqs, seed=5, support=8, events=_EVENTS5,
                    profile=prof)
    res = _collect_regions(tmp_path, genome, bam, 300000)
    regions = sorted({c.region for c in res.candidates})
    assert len(regions) == 5
    mids = sorted((int(float(r.split("+")[1])) + int(float(r.split("+")[2])))
                  // 2 for r in regions)
    for got, (_, _, anchor, size) in zip(mids, _EVENTS5):
        assert abs(got - (anchor + size // 2)) < 1500


@pytest.mark.parametrize("prof", ["hifi", "ont"])
def test_noisy_event_free_genome_is_quiet(tmp_path, prof):
    """Specificity: donor SNPs/indels + sequencing noise alone must produce
    ZERO candidate regions (the min_sv_size / min_support gates working)."""
    genome = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "q.bam")
    seqs = sim.make_genome(genome, {"chr1": 300000}, seed=6)
    sim.make_sv_bam(bam, seqs, seed=7, events=[], profile=prof, coverage=12)
    res = _collect_regions(tmp_path, genome, bam, 300000)
    assert not res.candidates


def test_genotype_mode_concordance(tmp_path):
    """Haplotype-aware read sets: the real genotyper must recover every
    planted 0/1 and 1/1 (VERDICT r3 #2 — GT accuracy was never measured)."""
    from svision_tpu.call.genotype import genotyper
    from svision_tpu.io.bam import BamReader
    genome = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "sim.bam")
    seqs = sim.make_genome(genome, {"chr1": 300000}, seed=9)
    events = [("DEL", "chr1", 40000, 300), ("INS", "chr1", 90000, 220),
              ("DEL", "chr1", 140000, 400), ("INS", "chr1", 190000, 250),
              ("INV", "chr1", 240000, 300)]
    gts = ["1/1", "0/1", "0/1", "1/1", "0/1"]
    sim.make_sv_bam(bam, seqs, seed=9, support=8, events=events,
                    genotypes=gts, profile="hifi", coverage=12)
    res = _collect_regions(tmp_path, genome, bam, 300000)
    by_event = {}
    for c in res.candidates:
        _, cs, ce, _ = c.region.split("+")
        mid = (float(cs) + float(ce)) / 2
        ei = min(range(len(events)), key=lambda i: abs(events[i][2] - mid))
        by_event.setdefault(ei, set()).add(c.qname)
    bamr = BamReader(bam)
    from svision_tpu.cli import parse_arguments
    options = parse_arguments(["-o", str(tmp_path / "o"), "-b", bam,
                               "-g", genome, "-m", "x", "-n", "s"])
    for ei, ((kind, ch, anchor, size), want) in enumerate(zip(events, gts)):
        gt, dr, dv = genotyper((ch, anchor, anchor + size, [kind]),
                               sorted(by_event[ei]), bamr, options)
        assert gt == want, f"{kind}@{anchor}: want {want} got {gt} " \
                           f"(DR={dr} DV={dv})"


def test_legacy_path_unchanged_without_profile(tmp_path):
    """profile=None / genotypes=None must stay byte-identical (the seeded
    golden corpus depends on it)."""
    import hashlib
    genome = str(tmp_path / "ref.fa")
    seqs = sim.make_genome(genome, {"chr1": 150000}, seed=0)
    b1 = str(tmp_path / "a.bam")
    b2 = str(tmp_path / "b.bam")
    sim.make_sv_bam(b1, seqs, seed=0)
    sim.make_sv_bam(b2, seqs, seed=0)
    assert hashlib.sha256(open(b1, "rb").read()).hexdigest() == \
        hashlib.sha256(open(b2, "rb").read()).hexdigest()


def test_tdup_genotype_reference_quirk_and_fix(tmp_path):
    """The reference genotyper matches 'tDUP' against neither ref-read rule
    (genotype.py:45-54): DR stays 0 and het tDUPs are called 1/1. Default
    keeps that for parity; --tdup_gt opts into the INS/DUP-rule fix."""
    from svision_tpu.call.genotype import genotyper
    from svision_tpu.io.bam import BamReader
    from svision_tpu.cli import parse_arguments
    genome = str(tmp_path / "ref.fa")
    bam = str(tmp_path / "sim.bam")
    seqs = sim.make_genome(genome, {"chr1": 120000}, seed=11)
    events = [("tDUP", "chr1", 50000, 260)]
    sim.make_sv_bam(bam, seqs, seed=11, support=8, events=events,
                    genotypes=["0/1"], coverage=12)
    bamr = BamReader(bam)
    sup = [f"sv0_{s}" for s in range(4)]
    base = ["-o", str(tmp_path / "o"), "-b", bam, "-g", genome,
            "-m", "x", "-n", "s"]
    opt_ref = parse_arguments(base)
    gt, dr, dv = genotyper(("chr1", 50000, 50260, ["tDUP"]), sup, bamr,
                           opt_ref)
    assert (gt, dr, dv) == ("1/1", 0, 4)       # the pinned reference quirk
    opt_fix = parse_arguments(base + ["--tdup_gt"])
    gt2, dr2, dv2 = genotyper(("chr1", 50000, 50260, ["tDUP"]), sup, bamr,
                              opt_fix)
    assert gt2 == "0/1" and dr2 == 4 and dv2 == 4


def test_compound_curriculum_labels():
    """INV+DEL training events label mm pairs DEL and reverse pairs INV."""
    from svision_tpu.models.dataset import build_dataset, CLASS_IDS
    specs, labels, events = build_dataset(
        n_per_type=4, seed=21, kinds=("INV+DEL",), balance=False)
    assert len(labels) > 0
    assert set(labels.tolist()) <= {CLASS_IDS["DEL"], CLASS_IDS["INV"]}
    assert (labels == CLASS_IDS["DEL"]).sum() > 0
    assert (labels == CLASS_IDS["INV"]).sum() > 0


def _splice_apply_reference(rec, edits):
    """The pre-round-5 in-place splice editor, kept verbatim as the
    semantic oracle for the piece-stack _EditCursor (noise.py): bytearray
    insert/delete memmoves made it O(read_len) per edit, but its behavior
    IS the specification."""
    def find_read_op(ops, r):
        rpos = spos = 0
        for i, (n, op) in enumerate(ops):
            if op in N._READ_OPS:
                if rpos <= r < rpos + n:
                    off = r - rpos
                    return i, off, spos + off
                rpos += n
            if op in N._SEQ_OPS:
                spos += n
        raise IndexError(r)

    def apply_edit(ops, seq, r, kind, payload):
        if kind == "sub":
            try:
                i, off, si = find_read_op(ops, r)
            except IndexError:
                return
            if ops[i][1] != "H":
                seq[si] = ord(payload)
            return
        if kind == "ins":
            try:
                i, off, si = find_read_op(ops, r)
            except IndexError:
                return
            n, op = ops[i]
            k = len(payload)
            if op == "H":
                ops[i][0] += k
            elif op in "SI":
                ops[i][0] += k
                seq[si:si] = payload.encode()
            else:
                if off > 0:
                    ops[i:i + 1] = [[off, op], [k, "I"], [n - off, op]]
                    seq[si:si] = payload.encode()
                elif i > 0 and ops[i - 1][1] in "HS":
                    ops[i - 1][0] += k
                    if ops[i - 1][1] == "S":
                        seq[si:si] = payload.encode()
                else:
                    ops[i:i] = [[k, "I"]]
                    seq[si:si] = payload.encode()
            return
        if kind == "del":
            for _ in range(int(payload)):
                try:
                    i, off, si = find_read_op(ops, r)
                except IndexError:
                    return
                n, op = ops[i]
                if op == "H":
                    ops[i][0] -= 1
                elif op in "SI":
                    ops[i][0] -= 1
                    del seq[si]
                else:
                    ops[i:i + 1] = [[off, op], [1, "D"], [n - off - 1, op]]
                    del seq[si]
            return
        raise ValueError(kind)

    if rec.flag & 4 or rec.cigar == "*":
        return
    ops = N.parse_cigar(rec.cigar)
    rev = bool(rec.flag & 16)
    if rev:
        ops = ops[::-1]
        seq = bytearray(N.revcomp(rec.seq or ""), "ascii")
    else:
        seq = bytearray(rec.seq or "", "ascii")
    for r, kind, payload in edits:
        apply_edit(ops, seq, r, kind, payload)
    ops = N._merge_ops(ops)
    if rev:
        ops = ops[::-1]
        rec.seq = N.revcomp(seq.decode("ascii"))
    else:
        rec.seq = seq.decode("ascii")
    i = 0
    while i < len(ops) and ops[i][1] in "HS":
        i += 1
    while i < len(ops) and ops[i][1] == "D":
        rec.pos += ops[i][0]
        ops.pop(i)
    j = len(ops) - 1
    while j >= 0 and ops[j][1] in "HS":
        j -= 1
    while j >= 0 and ops[j][1] == "D":
        ops.pop(j)
        j -= 1
    rec.cigar = N.fmt_cigar(ops)


def test_edit_cursor_matches_splice_semantics():
    """Differential fuzz: the amortized piece-stack editor must match the
    in-place splice editor record-for-record, including same-position
    collisions (donor + sequencing lists dedupe separately) and deletion
    runs that eat upward into previously edited content — the two cases
    that actually diverged during development."""
    rng = random.Random(7)
    bases = "ACGT"
    for trial in range(1500):
        parts = []
        if rng.random() < 0.4:
            parts.append((rng.randint(1, 30), rng.choice("HS")))
        for _ in range(rng.randint(1, 6)):
            parts.append((rng.randint(1, 60), rng.choice("MMMMIDN")))
        if rng.random() < 0.4:
            parts.append((rng.randint(1, 30), rng.choice("HS")))
        if not any(op == "M" for _, op in parts):
            parts.append((20, "M"))
        cig = "".join(f"{n}{op}" for n, op in parts)
        ops = N.parse_cigar(cig)
        seqlen = sum(n for n, op in ops if op in "SMI=X")
        readlen = sum(n for n, op in ops if op in "HSMI=X")
        seq = "".join(rng.choice(bases) for _ in range(seqlen))
        flag = 16 if rng.random() < 0.3 else 0
        edits = []
        positions = sorted((rng.randrange(0, max(1, readlen))
                            for _ in range(rng.randint(1, 14))), reverse=True)
        for r in positions:
            k = rng.random()
            if k < 0.4:
                edits.append((r, "sub", rng.choice(bases)))
            elif k < 0.7:
                edits.append((r, "ins", "".join(
                    rng.choice(bases) for _ in range(rng.randint(1, 8)))))
            else:
                edits.append((r, "del", rng.randint(1, 25)))
        r1 = SamRecord("q", flag, "c", 100, 60, cig, seq)
        r2 = SamRecord("q", flag, "c", 100, 60, cig, seq)
        _splice_apply_reference(r1, edits)
        N.apply_edits_to_record(r2, edits)
        assert (r1.cigar, r1.seq, r1.pos) == (r2.cigar, r2.seq, r2.pos), \
            (trial, cig, flag, edits)
        assert r2.ops is not None and N.fmt_cigar(r2.ops) == r2.cigar
