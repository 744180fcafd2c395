"""Realistic long-read noise model for the simulator.

Round-3 verdict: every accuracy number was measured on noise-free,
effectively homozygous simulated reads — an upper bound, not an accuracy
story. This module converts clean simulated read groups into reads with the
error structure of real instruments, so the signature filters
(collect_signatures.py:131-155) and min_sv_size gates
(analyze_reads.py:828-895) — which the reference designed FOR noisy
reads — are actually exercised:

  * per-base sequencing errors: substitutions + small insertions/deletions
    with geometric length extension (HiFi ~0.5%, indel-dominated; ONT ~4.5%,
    mixed), applied consistently across every alignment record of a read
  * rare "segmental" error indels >= min_sv_size (chimeric/homopolymer
    artifacts) that produce singleton false signatures the min_support /
    clustering machinery must reject
  * donor-genome variation: SNPs (~1/1250 bp) and small indels (1-40 bp,
    below min_sv_size) present in ALL reads at the same loci — the
    background an SV caller must not call
  * mapping-quality variation, including a small fraction below the
    min_mapq filter

Design: reads are born clean (sim.py builders emit exact reference slices
with exact CIGARs), then transformed by READ-SPACE EDITS. An edit at read
position r patches every alignment record of the group — M runs gain I/D
ops or substituted bases, soft/hard clips grow or shrink — so the invariant
real aligners guarantee (all records of a read imply the same query length)
holds by construction. Reference POS/END never change (indel errors inside
an M run preserve its reference span), so index/binning stay valid.

Donor SNPs take a shortcut: they are substitutions, so they are applied to
the genome string the read builders slice (the "donor" genome) while the
reference FASTA keeps the original bases — every read, including
reverse-oriented inversion middles, inherits them for free. Donor indels
change coordinates and therefore go through the read-space editor via a
reference->read position mapping (both orientations supported).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_BASE_LUT = np.frombuffer(b"ACGT", np.uint8)

_COMP = str.maketrans("ACGTacgtNn", "TGCAtgcaNn")


def revcomp(s: str) -> str:
    return s.translate(_COMP)[::-1]


# ---------------------------------------------------------------------------
# profiles

@dataclass(frozen=True)
class NoiseProfile:
    """Error rates per read base (sequencing) and per genome base (donor)."""
    name: str
    p_sub: float            # substitution errors
    p_ins: float            # insertion errors (geometric length)
    p_del: float            # deletion errors (geometric length)
    ext: float              # P(extend indel by one more base)
    p_sv_err: float         # rare >=50 bp spurious indels (chimeric reads)
    sv_err_max: int         # max spurious indel length
    snp_rate: float         # donor SNP density
    indel_rate: float       # donor small-indel density
    indel_max: int          # donor indel length 1..indel_max (< min_sv_size)
    mapq_low: float         # fraction of reads with mapq in [0, 10)
    mapq_mid: float         # fraction with mapq in [20, 60)


# HiFi: ~0.55% total error, indel-dominated (CCS consensus leaves mostly
# homopolymer indels); ONT: ~4.5% mixed. Donor variation ~1 SNP / 1250 bp
# and ~1 small indel / 5 kb (human-like heterozygosity, applied haploid).
HIFI = NoiseProfile("hifi", p_sub=0.0015, p_ins=0.002, p_del=0.002,
                    ext=0.3, p_sv_err=2e-6, sv_err_max=120,
                    snp_rate=0.0008, indel_rate=0.0002, indel_max=40,
                    mapq_low=0.01, mapq_mid=0.03)
ONT = NoiseProfile("ont", p_sub=0.02, p_ins=0.011, p_del=0.014,
                   ext=0.4, p_sv_err=1e-5, sv_err_max=200,
                   snp_rate=0.0008, indel_rate=0.0002, indel_max=40,
                   mapq_low=0.02, mapq_mid=0.05)

PROFILES = {"hifi": HIFI, "ont": ONT}


def get_profile(name) -> Optional[NoiseProfile]:
    if name is None or isinstance(name, NoiseProfile):
        return name
    return PROFILES[str(name).lower()]


# ---------------------------------------------------------------------------
# CIGAR plumbing

_READ_OPS = frozenset("HSMI=X")     # consume read positions
_SEQ_OPS = frozenset("SMI=X")       # bases present in SEQ
_REF_OPS = frozenset("MDN=X")       # consume reference positions


def parse_cigar(cigar: str) -> List[List]:
    ops: List[List] = []
    n = 0
    for ch in cigar:
        if ch.isdigit():
            n = n * 10 + ord(ch) - 48
        else:
            ops.append([n, ch])
            n = 0
    return ops


def fmt_cigar(ops: Sequence[Sequence]) -> str:
    return "".join(f"{n}{op}" for n, op in ops)


def query_len(ops: Sequence[Sequence], with_hard: bool = True) -> int:
    """Read length implied by a CIGAR (incl. hard clips by default)."""
    keep = _READ_OPS if with_hard else _SEQ_OPS
    return sum(n for n, op in ops if op in keep)


def _merge_ops(ops: List[List]) -> List[List]:
    out: List[List] = []
    for n, op in ops:
        if n <= 0:
            continue
        if out and out[-1][1] == op:
            out[-1][0] += n
        else:
            out.append([n, op])
    return out


# ---------------------------------------------------------------------------
# the read-space editor

class _EditCursor:
    """Amortized read-position lookup for one record's edit stream.

    Edits arrive sorted DESCENDING by read position (apply_group_edits), so
    instead of re-scanning the op list from index 0 for every edit (the old
    _find_read_op: O(edits x ops) — the single largest cost of ONT
    whole-genome fixture generation), the cursor remembers (op index, read
    pos, seq pos at that op's start) and walks backward/forward locally.
    Behavior is op-for-op identical to the scan-from-zero version: read
    positions partition into disjoint [rpos, rpos+n) intervals, so the op
    containing r is unique and the walk direction cannot change which op is
    found. Edit application semantics are unchanged (see apply()):

    sub: payload = replacement base (str, len 1)
    ins: payload = inserted bases (str), inserted BEFORE read position r
    del: payload = int count of read positions removed starting at r

    SEQ changes go through a descending piece stack instead of in-place
    bytearray splices: an insert/delete into a bytearray memmoves the read
    tail (~half the read per edit; at ONT error rates that was ~30 GB of
    memmove per 100 MB of fixture — the other dominant generator cost).
    Because edits arrive in strictly descending read position, the virtual
    sequence splits at the current edit's seq index `bound`: everything
    BELOW bound is still untouched source bytes, everything at/above bound
    has been finalized onto `chunks` (stored newest-first, i.e. reversed
    virtual order). A sub/ins finalizes src[si:bound] plus its payload and
    lowers bound; a delete consumes the virtual byte AT si — src[si] when
    si < bound, else the front of the finalized region (exactly the byte
    that had slid into place in the old in-place version; differential
    fuzz vs the splice implementation covers this,
    tests/test_noise.py::test_edit_cursor_matches_splice_semantics).
    """

    __slots__ = ("ops", "src", "chunks", "bound", "i", "rpos", "spos")

    def __init__(self, ops: List[List], seq: bytes):
        self.ops = ops
        self.src = seq
        self.chunks: List[bytes] = []    # finalized pieces, newest-first
        self.bound = len(seq)
        self.i = 0
        self.rpos = 0
        self.spos = 0

    def _find(self, r: int) -> Tuple[int, int, int]:
        """(op index, offset within op, seq index of r) for read position r.
        seq index is meaningful only when the op carries SEQ bases."""
        ops = self.ops
        i, rpos, spos = self.i, self.rpos, self.spos
        while i > 0 and rpos > r:
            i -= 1
            n, op = ops[i]
            if op in _READ_OPS:
                rpos -= n
            if op in _SEQ_OPS:
                spos -= n
        n_ops = len(ops)
        while i < n_ops:
            n, op = ops[i]
            if op in _READ_OPS:
                if rpos <= r < rpos + n:
                    self.i, self.rpos, self.spos = i, rpos, spos
                    off = r - rpos
                    return i, off, spos + off
                rpos += n
            if op in _SEQ_OPS:
                spos += n
            i += 1
        self.i, self.rpos, self.spos = i, rpos, spos
        raise IndexError(f"read position {r} outside cigar {fmt_cigar(ops)}")

    def _put_sub(self, si: int, payload: bytes) -> None:
        """Replace the virtual byte at si. Usually si < bound (a src byte);
        si == bound happens when an earlier edit AT THE SAME read position
        (donor + sequencing edit lists are deduped separately and can
        collide) already finalized content there — then the evolved byte is
        the front of the finalized region, exactly as the in-place version
        overwrote it."""
        if si < self.bound:
            self.chunks.append(self.src[si + 1:self.bound])
            self.chunks.append(payload)
            self.bound = si
            return
        chunks = self.chunks
        while chunks and not chunks[-1]:
            chunks.pop()
        if chunks:
            chunks[-1] = payload + chunks[-1][1:]
        else:
            chunks.append(payload)

    def _put_ins(self, si: int, payload: bytes) -> None:
        self.chunks.append(self.src[si:self.bound])
        self.chunks.append(payload)
        self.bound = si

    def _del_one(self, si: int) -> None:
        """Drop the virtual byte at si: src[si] while si < bound; at
        si == bound (a deletion run eating upward) the byte that slid into
        place — the front of the finalized region."""
        if si < self.bound:
            if si + 1 < self.bound:
                self.chunks.append(self.src[si + 1:self.bound])
            self.bound = si
            return
        chunks = self.chunks
        while chunks and not chunks[-1]:
            chunks.pop()
        if chunks:
            chunks[-1] = chunks[-1][1:]

    def apply(self, r: int, kind: str, payload) -> None:
        ops = self.ops
        if kind == "sub":
            try:
                i, off, si = self._find(r)
            except IndexError:
                return                          # shrunk past r by earlier del
            if ops[i][1] != "H":
                self._put_sub(si, payload.encode())
            return
        if kind == "ins":
            try:
                i, off, si = self._find(r)
            except IndexError:
                return
            n, op = ops[i]
            k = len(payload)
            if op == "H":
                ops[i][0] += k
            elif op in "SI":
                ops[i][0] += k
                self._put_ins(si, payload.encode())
            else:                               # M/=/X
                if off > 0:
                    ops[i:i + 1] = [[off, op], [k, "I"], [n - off, op]]
                    self._put_ins(si, payload.encode())
                elif i > 0 and ops[i - 1][1] in "HS":
                    # bases inserted exactly at a clip junction join the clip
                    # (aligner behavior; keeps H/S adjacent to M, never H-I-M)
                    ops[i - 1][0] += k
                    # op i's start shifts right by the grown clip
                    self.rpos += k
                    if ops[i - 1][1] == "S":
                        self._put_ins(si, payload.encode())
                        self.spos += k
                else:
                    # previous op consumes no read positions (D/N) or is an
                    # I — the adjacent-indel layout aligners emit; merge
                    # cleans up. Cursor stays at index i = the new I op,
                    # which starts at the same (rpos, spos).
                    ops[i:i] = [[k, "I"]]
                    self._put_ins(si, payload.encode())
            return
        if kind == "del":
            for _ in range(int(payload)):
                try:
                    i, off, si = self._find(r)
                except IndexError:
                    return
                n, op = ops[i]
                if op == "H":
                    ops[i][0] -= 1
                elif op in "SI":
                    ops[i][0] -= 1
                    self._del_one(si)
                else:                           # M/=/X -> M D M, span kept
                    ops[i:i + 1] = [[off, op], [1, "D"], [n - off - 1, op]]
                    self._del_one(si)
            return
        raise ValueError(kind)

    def rebuild(self) -> bytes:
        """Untouched source prefix + finalized pieces in virtual order."""
        return self.src[:self.bound] + b"".join(reversed(self.chunks))


def apply_edits_to_record(rec, edits: Sequence[Tuple]) -> None:
    """Apply read-space edits (sorted DESCENDING by position) to one
    alignment record, in place. Reverse-strand records are converted to
    read orientation, edited, and converted back."""
    if rec.flag & 4 or rec.cigar == "*":
        return
    ops = parse_cigar(rec.cigar)
    rev = bool(rec.flag & 16)
    if rev:
        ops = ops[::-1]
        seq = revcomp(rec.seq or "").encode("ascii")
    else:
        seq = (rec.seq or "").encode("ascii")
    cursor = _EditCursor(ops, seq)
    for r, kind, payload in edits:
        cursor.apply(r, kind, payload)
    seq = cursor.rebuild()
    ops = _merge_ops(ops)
    if rev:
        ops = ops[::-1]
        rec.seq = revcomp(seq.decode("ascii"))
    else:
        rec.seq = seq.decode("ascii")
    # SAM hygiene in STORED orientation: no D adjacent to the alignment
    # edges/clips (possible when a deletion error lands on the first/last
    # aligned base); a leading D shifts POS
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
    rec.cigar = fmt_cigar(ops)
    rec.ops = ops      # structured copy for the encoder (bamwrite fast path)


def apply_group_edits(records: Sequence, edits: Sequence[Tuple]) -> None:
    """Apply one read's edits to every alignment record of its group —
    the aligner invariant (equal implied query length across records)
    is preserved because every record sees every edit."""
    if not edits:
        return
    edits = sorted(edits, key=lambda e: -e[0])
    for rec in records:
        apply_edits_to_record(rec, edits)


# ---------------------------------------------------------------------------
# sequencing-error generation

def sequencing_edits(L: int, nprng: np.random.Generator,
                     prof: NoiseProfile) -> List[Tuple]:
    """Random read-space edits for a read of length L (positions 1..L-2;
    edits at the very ends would model into-adapter territory and would
    need pos-shift/clip handling for no realism gain)."""
    if L < 8:
        return []
    p_tot = prof.p_sub + prof.p_ins + prof.p_del + prof.p_sv_err
    n = int(nprng.binomial(L - 2, p_tot))
    edits: List[Tuple] = []
    if n == 0:
        return edits
    pos = nprng.integers(1, L - 1, size=n)
    u = nprng.random(n) * p_tot
    bases = "ACGT"
    # batch the per-edit draws (identical distributions to the per-event
    # loop this replaces; only the seeded draw ORDER differs) — at WGS
    # fixture scale the per-edit Generator-call overhead dominated
    kind = np.searchsorted(
        np.array([prof.p_sub, prof.p_sub + prof.p_ins,
                  prof.p_sub + prof.p_ins + prof.p_del]), u, side="right")
    # tagged (pos, draw-index, ...) so the position-collision dedupe below
    # keeps the FIRST-DRAWN edit exactly like the per-event loop this
    # replaces (grouping by kind would otherwise bias collisions toward
    # substitutions — review finding)
    tagged: List[Tuple] = []
    which = np.nonzero(kind == 0)[0]
    if which.size:
        sb = nprng.integers(0, 4, which.size)
        tagged += [(pos[i], int(i), "sub", bases[b])
                   for i, b in zip(which.tolist(), sb.tolist())]
    which = np.nonzero(kind == 1)[0]
    if which.size:
        ks = nprng.geometric(1.0 - prof.ext, which.size)
        letters = _BASE_LUT[nprng.integers(0, 4, int(ks.sum()))]
        allseq = letters.tobytes().decode("ascii")
        off = np.concatenate([[0], np.cumsum(ks)]).tolist()
        tagged += [(pos[i], int(i), "ins", allseq[off[j]:off[j + 1]])
                   for j, i in enumerate(which.tolist())]
    which = np.nonzero(kind == 2)[0]
    if which.size:
        ks = nprng.geometric(1.0 - prof.ext, which.size)
        tagged += [(pos[i], int(i), "del",
                    min(k, max(1, L - 2 - pos[i])))
                   for i, k in zip(which.tolist(), ks.tolist())]
    for i in np.nonzero(kind == 3)[0].tolist():
        # segmental artifact: a >=50 bp spurious indel in ONE read —
        # produces a singleton signature that clustering must reject
        r = pos[i]
        k = int(nprng.integers(50, prof.sv_err_max + 1))
        if nprng.random() < 0.5:
            ins = _BASE_LUT[nprng.integers(0, 4, k)].tobytes().decode("ascii")
            tagged.append((r, int(i), "ins", ins))
        elif L - 2 - r > k:
            tagged.append((r, int(i), "del", k))
    edits += [(int(r), knd, payload)
              for r, _i, knd, payload in sorted(tagged,
                                                key=lambda e: (-e[0], e[1]))]
    # dedupe positions (two edits at one base would fight); keep the first
    seen = set()
    uniq = []
    for e in sorted(edits, key=lambda e: -e[0]):
        if e[0] not in seen:
            seen.add(e[0])
            uniq.append(e)
    return uniq


def sample_mapq(nprng: np.random.Generator, prof: NoiseProfile) -> int:
    x = float(nprng.random())
    if x < prof.mapq_low:
        return int(nprng.integers(0, 10))
    if x < prof.mapq_low + prof.mapq_mid:
        return int(nprng.integers(20, 60))
    return 60


# ---------------------------------------------------------------------------
# donor variation

def donor_variants(chrom_lens: Dict[str, int], seed: int,
                   prof: NoiseProfile):
    """Deterministic donor variant tables per chromosome:
    {chrom: (snp_pos int64[], snp_base U1[], indels [(pos, kind, len, seq)])}
    sorted by position; indels never closer than 100 bp to each other."""
    out = {}
    bases = "ACGT"
    import zlib
    for chrom, ln in sorted(chrom_lens.items()):
        nprng = np.random.default_rng((seed, zlib.crc32(chrom.encode())))
        n_snp = int(nprng.binomial(ln, prof.snp_rate))
        snp_pos = np.unique(nprng.integers(0, ln, n_snp))
        snp_base = nprng.integers(0, 4, snp_pos.size)
        n_ind = int(nprng.binomial(ln, prof.indel_rate))
        raw = np.unique(nprng.integers(200, max(201, ln - 200), n_ind))
        indels = []
        last = -10 ** 9
        for p in raw.tolist():
            if p - last < 100:
                continue
            last = p
            k = int(nprng.integers(1, prof.indel_max + 1))
            if nprng.random() < 0.5:
                seq = "".join(bases[int(b)] for b in nprng.integers(0, 4, k))
                indels.append((p, "ins", k, seq))
            else:
                indels.append((p, "del", k, ""))
        out[chrom] = (snp_pos, snp_base, indels)
    return out


def apply_donor_snps(seqs: Dict[str, str], variants) -> Dict[str, str]:
    """Substitute donor SNP bases into genome strings (vectorized). A drawn
    base equal to the reference base is kept — effective SNP rate is
    3/4 of snp_rate, which the docstring rates already account for."""
    bases = np.frombuffer(b"ACGT", np.uint8)
    out = {}
    for chrom, s in seqs.items():
        snp_pos, snp_base, _ = variants.get(chrom, (None, None, None))
        if snp_pos is None or snp_pos.size == 0:
            out[chrom] = s
            continue
        arr = np.frombuffer(s.encode("ascii"), np.uint8).copy()
        arr[snp_pos] = bases[snp_base]
        out[chrom] = arr.tobytes().decode("ascii")
    return out


def ref_to_read(records: Sequence, L: int, p: int):
    """Map reference position p to (read position, strand) through the
    first alignment record whose M run covers p. None when no record
    aligns across p (e.g. inside a planted deletion)."""
    for rec in records:
        if rec.flag & 4 or rec.cigar == "*":
            continue
        refpos = rec.pos
        rstored = 0
        for n, op in parse_cigar(rec.cigar):
            if op in "M=X":
                if refpos <= p < refpos + n:
                    rs = rstored + (p - refpos)
                    if rec.flag & 16:
                        return L - 1 - rs, "-"
                    return rs, "+"
            if op in _REF_OPS:
                refpos += n
            if op in _READ_OPS:
                rstored += n
    return None


def donor_edits_for_group(records: Sequence, L: int, indels: Sequence[Tuple]
                          ) -> List[Tuple]:
    """Read-space edits realizing donor small indels on one read group.
    Donor insertions insert before ref position p; donor deletions remove
    the read bases aligned to ref [p, p+k). `indels` must be sorted by
    position (donor_variants emits them sorted) — the group's overlap
    window is found by bisection, so WGS-scale tables (10^4-10^5 indels)
    cost O(log n) per read, not a full scan."""
    import bisect
    edits: List[Tuple] = []
    lo = min(r.pos for r in records if not (r.flag & 4))
    hi = max(r.end_pos() for r in records if not (r.flag & 4))
    i0 = bisect.bisect_left(indels, lo - 1, key=lambda v: v[0])
    for idx in range(i0, len(indels)):
        p, kind, k, seq = indels[idx]
        if p >= hi + 1:
            break
        if kind == "ins":
            hit = ref_to_read(records, L, p)
            if hit is None:
                continue
            r, strand = hit
            if strand == "+":
                if 1 <= r <= L - 1:
                    edits.append((r, "ins", seq))
            else:
                if 1 <= r + 1 <= L - 1:
                    edits.append((r + 1, "ins", revcomp(seq)))
        else:
            # clamp to the covered prefix/suffix of [p, p+k)
            hits = [ref_to_read(records, L, q) for q in range(p, p + k)]
            hits = [h for h in hits if h is not None]
            if not hits:
                continue
            rs = sorted(h[0] for h in hits)
            # the covered read positions are contiguous when one M run
            # spans them; oddities (SV breakpoint inside the variant) are
            # skipped rather than half-applied
            if rs[-1] - rs[0] != len(rs) - 1:
                continue
            if rs[0] < 1 or rs[-1] > L - 2:
                continue
            edits.append((rs[0], "del", len(rs)))
    return edits
