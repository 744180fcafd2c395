"""k-mer seed-and-extend realigner for unmapped/inserted sequence (--hash).

Behavioral port of segmentplot/hash_aligner.py + run_hash_lineplot.py: hash
all k-mers of the query (forward + reverse complement), learn repeat/self-diff
segments from a ref->ref self-alignment, extend seeds with zero mismatches to
>= min_accept, merge colinear segments, keep >=20bp ref-span and the longest
hit per direction.

Pure host-side logic (bounded: query < max_hash_len=1000, k=10). The dict
tables the reference rebuilds per call are kept, but seeding is accelerated
with a single pass per sequence.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from svision_tpu.collect.candidates import SegBox

# byte-level complement: A<->T, C<->G, every other byte -> 'N'
# (classes.py:21-39 maps any char not in ACGT, including N, to N)
_RC_BYTES = bytes(dict(zip(b"ATCG", b"TAGC")).get(b, ord("N"))
                  for b in range(256))

# fixed k-mer alphabet for the vectorized seeder: the BAM 16-symbol set plus
# lowercase + U/u. Each byte gets a unique code, so integer k-mer codes are
# bijective with the k-mer STRINGS the reference hashes; any byte outside
# the table disables the fast path (string seeding keeps exactness).
_ALPHA = sorted(set(b"=ACMGRSVTWYHKDBN" + b"acmgrsvtwyhkdbn" + b"Uu"))
_LUT = np.full(256, -1, np.int64)
for _i, _ch in enumerate(_ALPHA):
    _LUT[_ch] = _i
_KBASE = len(_ALPHA)


def revcomp(seq: str) -> str:
    """Reverse complement; non-ACGT -> N (classes.py:21-39 semantics)."""
    return seq.encode("latin1").translate(_RC_BYTES)[::-1].decode("latin1")


def _fast_ok(seq: str) -> bool:
    """Every byte inside the fast alphabet? (Cheap eligibility test — no
    k-mer codes computed.)"""
    b = np.frombuffer(seq.encode("latin1"), np.uint8)
    return not b.size or int(_LUT[b].min()) >= 0


def _kmer_codes(seq: str, k: int) -> Optional[np.ndarray]:
    """Integer codes of seq's k-mers over the reference's scan range
    (hash_aligner.py:156-165 iterates i in [0, len-(k+1)) — the last two
    k-mer starts are excluded, a reference quirk kept for parity).
    None when the sequence contains a byte outside the fast alphabet."""
    if _KBASE ** k >= 2 ** 62:
        # base-33 packing overflows int64 at k >= 13: distinct k-mers could
        # collide after wraparound, silently diverging from the string
        # oracle. --k_size is user-settable, so force the exact path.
        return None
    b = np.frombuffer(seq.encode("latin1"), np.uint8)
    codes = _LUT[b]
    if codes.size and codes.min() < 0:
        return None
    n = len(b) - (k + 1)
    if n <= 0:
        return np.zeros(0, np.int64)
    win = np.lib.stride_tricks.sliding_window_view(codes, k)[:n]
    pows = _KBASE ** np.arange(k - 1, -1, -1, dtype=np.int64)
    return win @ pows


class _Seg:
    """Mutable match segment with the reference Segment's end-point algebra
    (segmentplot/classes.py:42-107)."""

    __slots__ = ("x_start", "y_start", "length", "fwd", "x_end", "y_end")

    def __init__(self, x_start, y_start, length, fwd):
        self.x_start = x_start
        self.y_start = y_start
        self.length = length
        self.fwd = fwd
        self.x_end = x_start + (length - 1) if fwd else x_start - (length - 1)
        self.y_end = y_start + (length - 1)

    # accessor API shared with candidates.SegBox consumers
    def xStart(self):
        return self.x_start

    def xEnd(self):
        return self.x_end

    def yStart(self):
        return self.y_start

    def yEnd(self):
        return self.y_end

    def forward(self):
        return self.fwd

    def seg_length(self):
        return abs(self.x_end - self.x_start)


class HashAligner:
    def __init__(self, k: int, window_size: int, mismatch_num: int,
                 repeat_thresh: int):
        self.k = k
        self.window_size = window_size
        self.mismatch_num = mismatch_num
        self.repeat_thresh = repeat_thresh
        self.segments: List[_Seg] = []
        self.self_diff_segs: List[_Seg] = []
        self.compare_diff_segs: Optional[List[_Seg]] = None
        self.avoid_kmers: List[str] = []
        self.hashvalues: List[str] = []

    # -- seed extension (hash_aligner.py:37-120) --------------------------
    def _extend_forward(self, x_bases, y_bases, xpos, i):
        match_len = self.k
        mismatch = 0
        while mismatch <= self.mismatch_num:
            if xpos + match_len >= len(x_bases) - 1:
                break
            if i + match_len >= len(y_bases) - 1:
                break
            xb = x_bases[xpos + match_len]
            yb = y_bases[i + match_len]
            if xb == "N" or yb == "N":
                break
            if xb != yb:
                mismatch += 1
            match_len += 1
        if match_len >= self.window_size:
            self._accept(_Seg(xpos, i, match_len, True))

    def _extend_reverse(self, rev_x_bases, y_bases, xpos, i):
        match_len = self.k
        mismatch = 0
        while mismatch <= self.mismatch_num:
            if xpos + match_len >= len(rev_x_bases) - 1:
                break
            if i + match_len >= len(y_bases) - 1:
                break
            xb = rev_x_bases[xpos + match_len]
            yb = y_bases[i + match_len]
            if xb == "N" or yb == "N":
                break
            if xb != yb:
                mismatch += 1
            match_len += 1
        if match_len >= self.window_size:
            self._accept(_Seg(len(rev_x_bases) - 1 - xpos, i, match_len, False))

    def _extend_np(self, bx, by, xpos, i, rev_len: Optional[int]):
        """Vectorized twin of _extend_forward/_extend_reverse: zero or more
        allowed mismatches as a common-prefix scan over byte arrays.
        rev_len=None -> forward accept; else the reverse accept with
        len(rev_x) = rev_len. Replicates the scalar loop exactly: bounds
        stop at len-1 (the last char is never read), an N stops before
        counting, the (mismatch_num+1)-th mismatch stops after counting."""
        k = self.k
        max_steps = min(len(bx) - 1 - (xpos + k), len(by) - 1 - (i + k))
        if max_steps <= 0:
            match_len = k
        else:
            xs = bx[xpos + k:xpos + k + max_steps]
            ys = by[i + k:i + k + max_steps]
            is_n = (xs == 78) | (ys == 78)          # ord('N')
            n_idx = np.flatnonzero(is_n)
            first_n = int(n_idx[0]) if n_idx.size else max_steps
            dd = np.flatnonzero(xs != ys)
            dd = dd[dd < first_n]
            if dd.size > self.mismatch_num:
                match_len = k + int(dd[self.mismatch_num]) + 1
            else:
                match_len = k + first_n
        if match_len >= self.window_size:
            if rev_len is None:
                self._accept(_Seg(xpos, i, match_len, True))
            else:
                self._accept(_Seg(rev_len - 1 - xpos, i, match_len, False))

    def _accept(self, seg: _Seg):
        if self.compare_diff_segs is None:
            self.segments.append(seg)
            if self._is_self_diff(seg):
                self.self_diff_segs.append(seg)
        elif not self._covered_by_diff(seg):
            self.segments.append(seg)

    def _is_self_diff(self, seg: _Seg) -> bool:
        """Off-diagonal self-match (hash_aligner.py:351-363)."""
        diff2 = float(seg.x_end) / float(seg.y_end) if seg.y_end else 0.0
        cx = (seg.x_start + seg.x_end) / 2.0
        cy = (seg.y_start + seg.y_end) / 2.0
        diff3 = cx / cy if cy else 0.0
        return diff2 != 1 or diff3 != 1

    def _covered_by_diff(self, seg: _Seg) -> bool:
        """Drop query segments already explained by ref self-similarity
        (hash_aligner.py:331-349)."""
        for tmp in self.compare_diff_segs:
            if (abs(seg.y_start - tmp.y_start) <= 5 and seg.y_end <= tmp.y_end) \
                    or (abs(seg.y_end - tmp.y_end) <= 5
                        and seg.y_start >= tmp.y_start):
                return True
        return False

    # -- alignment driver (hash_aligner.py:145-238) -----------------------
    def run(self, x_seq: str, y_seq: str,
            compare_diff_segs: Optional[List[_Seg]] = None,
            y_hashvalues=None, avoid_kmers=None,
            force_strings: bool = False):
        """Seed + extend x against y.

        Seeding is vectorized (numpy k-mer codes + sorted join) when every
        byte is in the fast alphabet; the original string path is kept both
        as the exactness fallback for exotic bytes and as the differential
        oracle (tests/test_hashplot.py). y_hashvalues/avoid_kmers are
        np.int64 code arrays from a previous fast run (or k-mer string
        lists from a previous string run) — hashplot_unmapped decides the
        mode once for both passes."""
        self.compare_diff_segs = compare_diff_segs
        x_bases = x_seq
        rev_x = revcomp(x_seq)
        k = self.k

        kx = krx = ky = None
        if not force_strings and not isinstance(y_hashvalues, list):
            kx = _kmer_codes(x_bases, k)
            krx = _kmer_codes(rev_x, k)
            if y_hashvalues is not None:
                ky = y_hashvalues
            elif y_seq is x_seq:           # self-alignment: reuse x's codes
                ky = kx
            else:
                ky = _kmer_codes(y_seq, k)
        if kx is not None and krx is not None and ky is not None:
            self._run_fast(kx, krx, ky, x_bases, rev_x, y_seq,
                           y_hashvalues is not None, avoid_kmers)
            return
        assert not isinstance(y_hashvalues, np.ndarray), \
            "fast-mode y hash codes with a string-mode x sequence — the " \
            "caller must pick one mode for both passes (hashplot_unmapped)"

        hashed: Dict[str, List[int]] = {}
        for i in range(0, len(x_bases) - (k + 1)):
            hashed.setdefault(x_bases[i:i + k], []).append(i)
        for i in range(0, len(rev_x) - (k + 1)):
            hashed.setdefault(rev_x[i:i + k], []).append(-1 - i)

        y_bases = y_seq
        avoid_set = set(avoid_kmers) if avoid_kmers is not None else None

        if y_hashvalues is None:
            self.hashvalues = []
            for i in range(0, len(y_bases) - (k + 1)):
                kmer = y_bases[i:i + k]
                self.hashvalues.append(kmer)
                positions = hashed.get(kmer)
                if positions is None:
                    continue
                if len(positions) >= self.repeat_thresh:
                    self.avoid_kmers.append(kmer)
                    continue
                self._seed(positions, x_bases, rev_x, y_bases, i)
        else:
            for i, kmer in enumerate(y_hashvalues):
                positions = hashed.get(kmer)
                if positions is None or kmer in avoid_set:
                    continue
                self._seed(positions, x_bases, rev_x, y_bases, i)

    def _run_fast(self, kx, krx, ky, x_bases, rev_x, y_bases,
                  have_y_hashes: bool, avoid_kmers):
        """Vectorized seeding: one sorted join replaces the per-y dict scan.

        Exactly reproduces the string path's seed ORDER: y positions
        ascending; per k-mer, x positions in table-insertion order (forward
        occurrences ascending, then reverse-strand entries -1-i with i
        ascending) — guaranteed by the stable argsort over the forward-then-
        reverse concatenation."""
        codes = np.concatenate([kx, krx])
        pos = np.concatenate([np.arange(len(kx), dtype=np.int64),
                              -1 - np.arange(len(krx), dtype=np.int64)])
        order = np.argsort(codes, kind="stable")
        sc = codes[order]
        sp = pos[order]
        lo = np.searchsorted(sc, ky, "left")
        hi = np.searchsorted(sc, ky, "right")
        cnt = hi - lo

        if not have_y_hashes:
            self.hashvalues = ky            # every scanned y k-mer, in order
            repeat = cnt >= self.repeat_thresh
            self.avoid_kmers = ky[repeat]   # incl. duplicates, scan order
            seed_at = np.flatnonzero((cnt > 0) & ~repeat)
        else:
            avoid = (np.asarray(avoid_kmers, np.int64)
                     if avoid_kmers is not None else np.zeros(0, np.int64))
            hit = cnt > 0
            if avoid.size:
                hit &= ~np.isin(ky, avoid)
            seed_at = np.flatnonzero(hit)
        if not seed_at.size:
            return

        # expand every (y_i, x_pos) seed pair, then apply _seed's
        # previous-char prune ("seed already covered by the prior k-mer",
        # hash_aligner.py:178-190) in one vectorized pass — the prune
        # rejects ~99% of pairs, so only real extension starts reach Python
        reps = (hi - lo)[seed_at]
        total = int(reps.sum())
        ii = np.repeat(seed_at, reps)
        base = np.repeat(np.cumsum(reps) - reps, reps)
        off = np.repeat(lo[seed_at], reps) + (np.arange(total) - base)
        pp = sp[off]

        bx = np.frombuffer(x_bases.encode("latin1"), np.uint8)
        brx = np.frombuffer(rev_x.encode("latin1"), np.uint8)
        by = np.frombuffer(y_bases.encode("latin1"), np.uint8)
        fwd = pp >= 0
        xpos = np.where(fwd, pp, -1 - pp)
        can_prune = (xpos > 0) & (ii > 0)
        xprev = np.where(fwd, bx[np.maximum(xpos - 1, 0) * fwd],
                         brx[np.maximum(xpos - 1, 0) * ~fwd])
        skip = can_prune & (xprev == by[np.maximum(ii - 1, 0)])
        keep = np.flatnonzero(~skip)

        rev_len = len(rev_x)
        for j in keep.tolist():
            if fwd[j]:
                self._extend_np(bx, by, int(xpos[j]), int(ii[j]), None)
            else:
                self._extend_np(brx, by, int(xpos[j]), int(ii[j]), rev_len)

    def _seed(self, positions, x_bases, rev_x, y_bases, i):
        for p in positions:
            if p >= 0:
                # skip seeds already covered by the previous k-mer
                if p > 0 and i > 0 and x_bases[p - 1] == y_bases[i - 1]:
                    continue
                self._extend_forward(x_bases, y_bases, p, i)
            else:
                xpos = -1 - p
                if xpos > 0 and i > 0 and rev_x[xpos - 1] == y_bases[i - 1]:
                    continue
                self._extend_reverse(rev_x, y_bases, xpos, i)

    # -- merge + filter (hash_aligner.py:241-328) --------------------------
    def _linear(self, a: _Seg, b: _Seg) -> bool:
        if a.fwd != b.fwd:
            return False
        dy = abs(float(a.y_start - b.y_start))
        diff = 5 if dy == 0 else abs(float(a.x_start - b.x_start)) / dy
        if diff > 1.2 or diff < 0.8:
            return False
        dis_x = abs(a.x_end - b.x_start)
        dis_y = abs(a.y_end - b.y_start)
        max_dis = (a.seg_length() + b.seg_length()) * 1.5
        if dis_x > max_dis and dis_y > max_dis:
            return False
        tmp = float(b.x_end - a.x_start)
        if tmp == 0:
            tmp = 0.0001
        slope = float(b.y_end - a.y_start) / tmp
        if abs(abs(slope) - 1) > 0.2:
            return False
        return True

    def merged_segments(self) -> List[_Seg]:
        cur = 1
        segs = self.segments
        while cur < len(segs):
            merged = False
            cur_seg = segs[cur]
            for i in range(cur):
                cand = segs[i]
                if self._linear(cand, cur_seg):
                    if cur_seg.fwd:
                        cand.x_end = max(cur_seg.x_end, cand.x_end)
                    else:
                        cand.x_end = min(cur_seg.x_end, cand.x_end)
                    cand.y_end = max(cur_seg.y_end, cand.y_end)
                    cand.length = abs(cand.seg_length()) + \
                        abs(cur_seg.x_end - cand.x_end)
                    segs.remove(cur_seg)
                    merged = True
                    break
            if not merged:
                cur += 1
        return [s for s in segs if (s.y_end - s.y_start) >= 20]


def select_longest(segments: List[_Seg]) -> List[_Seg]:
    """Longest hit per strand, keeping ties (run_hash_lineplot.py:8-33)."""
    longest_true: List[_Seg] = []
    longest_false: List[_Seg] = []
    for seg in segments:
        bucket = longest_true if seg.fwd else longest_false
        if not bucket:
            bucket.append(seg)
            continue
        cur = abs(seg.x_end - seg.x_start)
        best = abs(bucket[0].x_end - bucket[0].x_start)
        if cur > best:
            bucket.clear()
            bucket.append(seg)
        elif cur == best:
            bucket.append(seg)
    return longest_true + longest_false


def hashplot_unmapped(ref_seq: str, read_seq: str, k: int, min_accept: int
                      ) -> Tuple[None, List[_Seg]]:
    """Realign an unmapped/inserted read fragment against the local reference
    (run_hash_lineplot.py:52-85)."""
    repeat_thresh = 2
    # one mode for BOTH passes: the learned hashvalues/avoid tables are
    # int code arrays in fast mode and k-mer strings in fallback mode
    force = not (_fast_ok(ref_seq) and _fast_ok(read_seq))
    aligner_ref = HashAligner(k, min_accept, 0, repeat_thresh)
    aligner_ref.run(ref_seq, ref_seq, force_strings=force)
    diff_segs = aligner_ref.self_diff_segs
    y_hashvalues = aligner_ref.hashvalues
    avoid = aligner_ref.avoid_kmers

    aligner = HashAligner(k, min_accept, 0, repeat_thresh)
    aligner.run(read_seq, ref_seq, diff_segs, y_hashvalues, avoid,
                force_strings=force)
    segs = aligner.merged_segments()
    if len(segs) >= 2:
        segs = select_longest(segs)
    return None, segs
