"""Signature and Cluster models (reference: src/collection/classes.py).

Differences from the reference by design:
  * Cluster coverage counting takes an injected counter callable instead of
    re-opening the BAM per cluster (classes.py:165-170) — same count, no
    per-cluster file churn.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence


class Signature:
    """One abnormal-alignment observation (classes.py:7-49)."""

    __slots__ = ("contig", "tstart", "tend", "qname", "type", "bkps",
                 "sorted_aligns", "mechanism", "graph")

    def __init__(self, contig, tstart, tend, type, qname, sorted_aligns,
                 all_bkps, mechanism):
        self.contig = contig
        self.tstart = tstart
        self.tend = tend
        self.qname = qname
        self.type = type
        self.bkps = all_bkps
        self.sorted_aligns = sorted_aligns
        self.mechanism = mechanism
        self.graph = None
        if self.tend < self.tstart:
            print("[WARNING]: Signature with invalid coordinates (end < start): "
                  + self.to_string())

    def get_source(self):
        return (self.contig, self.tstart, self.tend)

    def get_key(self):
        return (self.contig, (self.tstart + self.tend) // 2)

    def position_distance_to(self, other: "Signature"):
        c1, s1, e1 = self.get_source()
        c2, s2, e2 = other.get_source()
        if c1 != c2:
            return float("inf")
        return min(abs(s1 - s2), abs(e1 - e2),
                   abs((s1 + e1) // 2 - (s2 + e2) // 2))

    def set_graph(self, graph):
        self.graph = graph

    def to_string(self):
        return "\t".join(["{0}", "{1}", "{2}", "{3}"]).format(
            self.contig, self.tstart, self.tend,
            "{0};{1}".format(self.type, self.qname))

    def get_segs_cords(self):
        """Re-zero-base segment boxes; split into main (first+last) and other
        boxes (classes.py:72-117). Mutates the shared segment dicts exactly
        like the reference does."""
        aligns = self.sorted_aligns
        read_start = aligns[0]["q_start"]
        ref_start = aligns[0]["ref_start"]

        main_segs_cord = []
        other_segs_cord = []
        for i, seg in enumerate(aligns):
            seg["ref_start"] -= ref_start
            seg["ref_end"] -= ref_start
            seg["q_start"] -= read_start
            seg["q_end"] -= read_start

            if i == 0 or i == len(aligns) - 1:
                main_segs_cord.append([[seg["q_start"], seg["q_end"]],
                                       [seg["ref_start"], seg["ref_end"]], 0])
            elif seg["is_reverse"]:
                other_segs_cord.append([[seg["q_end"], seg["q_start"]],
                                        [seg["ref_start"], seg["ref_end"]], 1])
            else:
                other_segs_cord.append([[seg["q_start"], seg["q_end"]],
                                        [seg["ref_start"], seg["ref_end"]], 0])

        read_len = aligns[-1]["q_end"]
        ref_len = aligns[-1]["ref_end"]
        return ref_len, read_len, main_segs_cord, other_segs_cord


CoverageCounter = Callable[[str, int, int], int]


class Cluster:
    """A group of signatures at one locus (classes.py:122-177)."""

    def __init__(self, sigs: Sequence[Signature],
                 coverage_counter: Optional[CoverageCounter] = None,
                 cstart_end=None):
        self.sigs = list(sigs)
        self.contig = self.sigs[0].contig
        self.read_num = len(self.sigs)
        self.signatures = self.sigs
        self.coverage = 0
        self.query_info = ""

        starts: List[float] = []
        ends: List[float] = []
        for sig in self.sigs:
            starts.append(sig.tstart)
            ends.append(sig.tend)
            self.query_info += "{0},{1}:{2},{3};".format(
                str(sig.bkps), sig.tstart, sig.tend, sig.type)

        if cstart_end is None:
            self.cstart = sum(starts) / len(self.sigs)
            self.cend = sum(ends) / len(self.sigs)
        else:
            self.cstart, self.cend = cstart_end

        # invalid-coordinate rejection (classes.py:153-159)
        self.abandon = 0
        if self.cstart < 0 or self.cend < 0 or self.cstart > self.cend:
            self.abandon = 1

        if self.abandon == 0 and coverage_counter is not None:
            # all alignments overlapping [cstart, cend), incl. supplementaries
            # (classes.py:165-170)
            self.coverage = coverage_counter(self.contig, int(self.cstart),
                                             int(self.cend))

    def get_signatures(self):
        return self.signatures

    def to_string(self):
        return "{0}\t{1}\t{2}\t{3}\t{4}\t{5}\t{6}".format(
            self.contig, int(self.cstart), int(self.cend),
            int(self.cend) - int(self.cstart), "None", self.read_num,
            self.query_info)
