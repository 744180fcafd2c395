"""Clustering parity vs scipy (SURVEY.md §7: exact average-linkage replication).

The in-house NN-chain linkage + distance fcluster must reproduce
scipy.cluster.hierarchy exactly — including tie handling — because cluster
membership perturbs every downstream SV call.
"""
import numpy as np
import pytest

scipy_h = pytest.importorskip("scipy.cluster.hierarchy")
from scipy.spatial.distance import pdist

from svision_tpu.collect import cluster as C
from svision_tpu.collect.classes import Signature
from svision_tpu.config import default_options


def _random_data(rng, n):
    start = rng.randint(0, 100000, size=n)
    span = rng.randint(40, 5000, size=n)
    # duplicates create distance ties
    dup = rng.randint(0, n, size=max(1, n // 3))
    start[dup[: len(dup) // 2]] = start[0]
    span[dup[len(dup) // 2:]] = span[0]
    return np.stack([start, start + span, np.full(n, 1000)], axis=1)


def test_pdist_matches_scipy():
    rng = np.random.RandomState(0)
    for n in (2, 3, 7, 30):
        data = _random_data(rng, n).astype(np.float64)
        got = C.span_position_pdist(data)
        want = pdist(data, C.span_position_distance)
        np.testing.assert_array_equal(got, want)


def test_linkage_matches_scipy():
    rng = np.random.RandomState(1)
    for n in (2, 3, 5, 10, 40, 120):
        for trial in range(4):
            data = _random_data(rng, n).astype(np.float64)
            d = C.span_position_pdist(data)
            got = C.linkage_average(d, n)
            want = scipy_h.linkage(data, method="average",
                                   metric=C.span_position_distance)
            np.testing.assert_allclose(got, want, rtol=0, atol=0,
                                       err_msg=f"n={n} trial={trial}")


def test_fcluster_matches_scipy():
    rng = np.random.RandomState(2)
    for n in (2, 3, 5, 10, 40, 120):
        for trial in range(4):
            data = _random_data(rng, n).astype(np.float64)
            z = scipy_h.linkage(data, method="average",
                                metric=C.span_position_distance)
            for t in (0.3, 0.05, 1.5):
                got = C.fcluster_distance(z, t, n)
                want = scipy_h.fcluster(z, t, criterion="distance")
                np.testing.assert_array_equal(got, want,
                                              err_msg=f"n={n} t={t}")


def _mk_sig(contig, s, e):
    return Signature(contig, s, e, "sigGap", "r", [
        {"q_start": 0, "q_end": e - s, "ref_start": s, "ref_end": e,
         "is_reverse": False}], [[s, e, e - s]], "None")


def test_signature_partition_reference_semantics():
    opts = default_options(min_support=2, patition_max_distance=5000)
    sigs = ([_mk_sig("chr1", 1000 + i, 1200 + i) for i in range(3)] +
            [_mk_sig("chr1", 50000 + i, 50100 + i) for i in range(3)] +
            [_mk_sig("chr1", 99000, 99100)])
    parts = C.signature_partition(sigs, opts)
    # strict '>' semantics (cluster_signatures.py:57,63): a partition is kept
    # only when larger than min_support
    assert [len(p) for p in parts] == [3, 3]
    # trailing partition of size 1 is dropped
    assert all(len(p) > opts.min_support for p in parts)


def test_partition_and_cluster_end_to_end():
    opts = default_options(min_support=1)
    sigs = ([_mk_sig("chr1", 1000, 1500) for _ in range(5)] +
            [_mk_sig("chr1", 1002, 1498) for _ in range(3)] +
            [_mk_sig("chr1", 30000, 30400) for _ in range(4)])
    cov = lambda c, s, e: 42
    clusters = C.partition_and_cluster(sigs, "chr1", cov, opts)
    assert len(clusters) == 2
    assert clusters[0].read_num == 8
    assert clusters[1].read_num == 4
    assert clusters[0].coverage == 42
    assert clusters[0].cstart < clusters[1].cstart


def test_window_resident_coverage_counter(tmp_path):
    """run_detect's in-memory overlap count must equal a fresh indexed BAM
    count for spans inside the window (and both must match fetch semantics:
    pos < end and end_pos > start)."""
    import numpy as np
    from tests import synth
    from svision_tpu.io.bam import BamReader

    genome = str(tmp_path / "ref.fa")
    seqs = synth.make_genome(genome, {"chr1": 120000}, seed=3)
    bam_path = str(tmp_path / "s.bam")
    synth.make_sv_bam(bam_path, seqs, seed=3, support=6,
                      events=[("DEL", "chr1", 30000, 250),
                              ("INS", "chr1", 80000, 200)])
    bam = BamReader(bam_path)
    aligns = list(bam.fetch("chr1", 0, 120000))
    pos = np.fromiter((a.reference_start for a in aligns), np.int64,
                      len(aligns))
    endpos = np.fromiter((a.reference_end for a in aligns), np.int64,
                         len(aligns))
    rng = np.random.RandomState(0)
    for _ in range(50):
        s = int(rng.randint(0, 115000))
        e = s + int(rng.randint(1, 8000))
        mem = int(np.count_nonzero((pos < e) & (endpos > s)))
        assert mem == bam.count_overlapping("chr1", s, e), (s, e)
