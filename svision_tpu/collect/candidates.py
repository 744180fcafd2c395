"""Candidate segment-pair emission from clusters.

Port of output_clusters.py: for every cluster passing size/support gates, emit
one candidate record per non-colinear segment pair of each signature. The
reference writes 23-column bed lines consumed by the predictor through a
string round-trip (output_clusters.py:180-209 / create_batch.py:40-49); here
candidates are a structured in-memory table — `Candidate` rows carrying the
12-int image spec plus metadata — and the bed text is still emitted for
--debug diffing against the reference.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class SegBox:
    """A drawable segment (segmentplot/classes.py:42-107 Segment equivalent)."""
    x_start: int
    y_start: int
    length: int
    forward: bool

    def __post_init__(self):
        if self.forward:
            self.x_end = self.x_start + (self.length - 1)
        else:
            self.x_end = self.x_start - (self.length - 1)
        self.y_end = self.y_start + (self.length - 1)

    def to_fields(self) -> Tuple:
        return (self.x_start, self.x_end, self.y_start, self.y_end, self.forward)

    def to_string(self) -> str:
        return "\t".join(str(v) for v in self.to_fields())


def cord_to_segments(cords) -> List[SegBox]:
    """Box cords -> SegBox list (run_hash_lineplot.py:35-49)."""
    out = []
    for cord in cords:
        forward = cord[2] == 0
        x_start = cord[0][0]
        y_start = cord[1][0]
        y_end = cord[1][1]
        out.append(SegBox(x_start, y_start, int(y_end) - int(y_start) + 1, forward))
    return out


def linear_or_not(i: SegBox, j: SegBox) -> bool:
    """Colinearity test (output_clusters.py:11-26)."""
    distance_on_ref = j.y_start - i.y_end
    distance_on_read = j.x_start - i.x_end
    if distance_on_read == 0:
        distance_on_read = 1
    diff = distance_on_ref / distance_on_read
    if i.forward != j.forward:
        return False
    if diff >= 1.5 or diff <= 0.7:
        return False
    return True


def cal_non_linear(all_segs: List[SegBox]) -> int:
    """Non-linearity score (output_clusters.py:218-250); -1 for zero ref span."""
    ref_cords = []
    total = 0
    for seg in all_segs:
        ref_cords.append(seg.y_start)
        ref_cords.append(seg.y_end)
        ref_mid = (seg.x_start + seg.x_end) / 2
        read_mid = (seg.y_start + seg.y_end) / 2
        total += abs(ref_mid - read_mid) * abs(seg.x_end - seg.x_start)
    ref_span = max(ref_cords) - min(ref_cords)
    if ref_span == 0:
        return -1
    return int(total / ref_span)


@dataclass
class Candidate:
    """One predictor input row = one segment pair + its label metadata.

    Field layout mirrors the 23-column bed record (SURVEY.md §3.2):
    spec = the 12 image-spec ints (bed cols 1-12)."""
    region: str                  # "chr+cstart+cend+coverage" (col 0)
    spec: Tuple[int, ...]        # cols 1-12
    sig_id: str                  # col 13: str(sig_cnt) [+ 'm' for main-main]
    sub_id: int                  # col 14
    qname: str                   # col 15
    sig_type: str                # col 16
    bkp_start: int               # col 17
    bkp_end: int                 # col 18
    score: int                   # col 19 non-linear score
    pair_forward: str            # col 20 'True'/'False'
    mechanism: str               # col 21
    bkp_len: int                 # col 22

    def to_bed_line(self) -> str:
        def fields(block):
            vals = [str(v) for v in block[:4]]
            vals.append("True" if block[4] else "False")
            return "\t".join(vals)
        seg1 = fields(self.spec[0:5])
        seg2 = fields(self.spec[5:10])
        return (f"{self.region}\t{seg1}\t{seg2}\t{self.spec[10]}\t{self.spec[11]}"
                f"\t{self.sig_id}\t{self.sub_id}\t{self.qname}\t{self.sig_type}"
                f"\t{self.bkp_start}\t{self.bkp_end}\t{self.score}"
                f"\t{self.pair_forward}\t{self.mechanism}\t{self.bkp_len}\n")

    @classmethod
    def from_bed_line(cls, line: str) -> "Candidate":
        """Inverse of to_bed_line — the 23-column record the reference's
        BatchGenerator parses (create_batch.py:40-49); used for --resume."""
        p = line.rstrip("\n").split("\t")
        spec = tuple(
            int(p[k]) if k not in (5, 10) else int(p[k] == "True")
            for k in range(1, 13))
        return cls(region=p[0], spec=spec, sig_id=p[13], sub_id=int(p[14]),
                   qname=p[15], sig_type=p[16], bkp_start=int(p[17]),
                   bkp_end=int(p[18]), score=int(p[19]), pair_forward=p[20],
                   mechanism=p[21], bkp_len=int(p[22]))


def _pair_spec(a: SegBox, b: SegBox, read_len: int, ref_len: int) -> Tuple[int, ...]:
    return a.to_fields()[:4] + (int(a.forward),) + b.to_fields()[:4] \
        + (int(b.forward),) + (read_len, ref_len)


def proc_one_sig(cluster_region: str, sig, sig_cnt: int) -> Optional[List[Candidate]]:
    """Candidate pairs of one signature (output_clusters.py:125-216)."""
    ref_len, read_len, main_cords, other_cords = sig.get_segs_cords()
    if main_cords == -1:
        return None
    main_segs = cord_to_segments(main_cords)
    other_segs = cord_to_segments(other_cords)

    all_segs = main_segs + other_segs
    score = cal_non_linear(all_segs)
    if score == -1:
        return None

    out: List[Candidate] = []
    sub_cnt = 0
    # adjacent main-main pairs, tagged 'm' (output_clusters.py:176-182)
    for i in range(len(main_segs) - 1):
        sub_cnt += 1
        if linear_or_not(main_segs[i], main_segs[i + 1]):
            continue
        out.append(Candidate(
            region=cluster_region,
            spec=_pair_spec(main_segs[i], main_segs[i + 1], read_len, ref_len),
            sig_id=f"{sig_cnt}m", sub_id=sub_cnt, qname=sig.qname,
            sig_type=sig.type, bkp_start=sig.bkps[0][0], bkp_end=sig.bkps[0][1],
            score=score, pair_forward="True", mechanism=sig.mechanism,
            bkp_len=sig.bkps[0][2]))

    # main x other pairs (output_clusters.py:188-209)
    for seg1 in main_segs:
        for i, seg2 in enumerate(other_segs):
            sub_cnt += 1
            # identity (not value) membership, like the reference's Segment
            # objects without __eq__ (output_clusters.py:194)
            if any(seg2 is m for m in main_segs) and any(seg1 is m for m in main_segs):
                continue
            if linear_or_not(seg1, seg2):
                continue
            forward = "False" if (not seg1.forward or not seg2.forward) else "True"
            out.append(Candidate(
                region=cluster_region,
                spec=_pair_spec(seg1, seg2, read_len, ref_len),
                sig_id=str(sig_cnt), sub_id=sub_cnt, qname=sig.qname,
                sig_type=sig.type, bkp_start=sig.bkps[i + 1][0],
                bkp_end=sig.bkps[i + 1][1], score=score, pair_forward=forward,
                mechanism=sig.mechanism, bkp_len=sig.bkps[i + 1][2]))
    return out


def clusters_to_candidates(clusters, options, graph_writer=None) -> List[Candidate]:
    """All candidates of a window's clusters (writer_cluster_to_file semantics,
    output_clusters.py:30-89, minus the file IPC).

    graph_writer: optional callable(cluster) invoked for clusters passing the
    gates when --graph is on (GFA dump, output_clusters.py:57-68)."""
    out: List[Candidate] = []
    for cluster in clusters:
        if int(cluster.cend) - int(cluster.cstart) > options.max_sv_size:
            continue
        if cluster.read_num < options.min_support:
            continue
        if graph_writer is not None:
            graph_writer(cluster)
        region = (f"{cluster.contig}+{int(cluster.cstart)}+{int(cluster.cend)}"
                  f"+{cluster.coverage}")
        for sig_cnt, sig in enumerate(cluster.get_signatures(), start=1):
            cands = proc_one_sig(region, sig, sig_cnt)
            if cands is None:
                continue
            out.extend(cands)
    return out


def candidates_to_specs(cands: List[Candidate]) -> np.ndarray:
    """[N,12] int64 image-spec matrix for the device encoder."""
    if not cands:
        return np.zeros((0, 12), dtype=np.int64)
    return np.array([c.spec for c in cands], dtype=np.int64)
