"""Vectorized clean-read prefilter (collect/prefilter.py): the native-batch
collection path must behave exactly like the unfiltered iterator path."""
import os

import numpy as np
import pytest

from svision_tpu.collect.prefilter import qname_hashes, qualifying_read_mask
from svision_tpu.collect.window import run_detect
from svision_tpu.config import default_options
from svision_tpu.io.bam import BamReader
from svision_tpu.io import native_io
from svision_tpu.sim import make_genome, make_sv_bam


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("prefilter")
    fa = str(root / "g.fa")
    genome = make_genome(fa, {"chr1": 200000}, seed=9)
    bam = str(root / "s.bam")
    events = [("DEL", "chr1", 30000, 300), ("INV", "chr1", 90000, 400),
              ("tDUP", "chr1", 150000, 350)]
    make_sv_bam(bam, genome, seed=9, support=5, events=events, noise=True)
    return dict(fa=fa, bam=bam, root=str(root))


def _batch(ws):
    if not native_io.ensure_built():
        pytest.skip("native IO unavailable")
    with BamReader(ws["bam"]) as bam:
        return bam.fetch_batch("chr1", 0, 200000)


def test_hashes_group_consistent(ws):
    b = _batch(ws)
    h = qname_hashes(b)
    names = [b.qname(i) for i in range(b.n)]
    by_name = {}
    for i, n in enumerate(names):
        by_name.setdefault(n, set()).add(int(h[i]))
    # one hash per qname (grouping never splits a group)
    assert all(len(v) == 1 for v in by_name.values())
    # and essentially no collisions on this corpus
    distinct = {list(v)[0] for v in by_name.values()}
    assert len(distinct) == len(by_name)


def test_mask_semantics(ws):
    b = _batch(ws)
    keep = qualifying_read_mask(b, min_mapq=10, min_sv_size=50)
    names = [b.qname(i) for i in range(b.n)]
    kept = {names[i] for i in np.nonzero(keep)[0]}
    # every SV support read's group kept, whole
    sv_names = {n for n in names if n.startswith("sv")}
    assert sv_names <= kept
    for i, n in enumerate(names):
        if n in kept and not (int(b.flag[i]) & 0x104) and b.mapq[i] >= 10:
            assert keep[i], (n, i)
    # background + noise dropped
    assert not any(n.startswith("bg_") for n in kept)
    assert not any(n.startswith("lowmq") for n in kept)    # mapq 5 < 10
    assert "secread" not in kept and "unmapped0" not in kept


def test_run_detect_parity_with_fallback(ws, monkeypatch):
    opt = default_options(out_path=ws["root"], bam_path=ws["bam"],
                          genome=ws["fa"], model_path="x", sample="S")
    fast = run_detect(opt, ws["bam"], "chr1", 0, 0, 200000)
    assert fast.error is None and fast.candidates

    monkeypatch.setattr(BamReader, "fetch_batch",
                        lambda self, *a, **k: None)
    slow = run_detect(opt, ws["bam"], "chr1", 0, 0, 200000)
    assert slow.error is None

    assert fast.n_signatures == slow.n_signatures
    assert [c.to_bed_line() for c in fast.candidates] == \
        [c.to_bed_line() for c in slow.candidates]


def test_empty_window_native_path(ws, tmp_path):
    """A coverage-gap window (index present, no overlapping chunks) must
    return an empty result, not crash on the stub batch."""
    from svision_tpu.io.bamwrite import SamRecord, write_bam
    if not native_io.ensure_built():
        pytest.skip("native IO unavailable")
    bam_path = str(tmp_path / "sparse.bam")
    recs = [SamRecord(f"r{i}", 0, "chr1", 100 + i, 60, "2000M", "A" * 2000)
            for i in range(3)]
    write_bam(bam_path, [("chr1", 200000)], recs)
    opt = default_options(out_path=str(tmp_path), bam_path=bam_path,
                          genome=ws["fa"], model_path="x", sample="S")
    with BamReader(bam_path) as bam:
        batch = bam.fetch_batch("chr1", 150000, 199999)
        assert batch is not None and batch.n == 0
        assert batch.pos.size == 0          # fully-populated stub
    res = run_detect(opt, bam_path, "chr1", 9, 150000, 199999)
    assert res.error is None, res.error
    assert res.n_signatures == 0 and res.candidates == []


def test_mask_contig_mode_mapq(ws):
    """Contig mode drops the mapq gate (collect_signatures.py:125)."""
    b = _batch(ws)
    keep0 = qualifying_read_mask(b, min_mapq=0, min_sv_size=50)
    names = [b.qname(i) for i in range(b.n)]
    kept = {names[i] for i in np.nonzero(keep0)[0]}
    assert any(n.startswith("lowmq") for n in kept)


def test_hash_empty_trailing_qname():
    """An empty trailing qname must not corrupt the PREVIOUS record's hash
    (review finding: the old buf.size-1 clamp truncated its last byte,
    splitting the qname group)."""
    import numpy as np

    class FakeBatch:
        n = 3
        qname_buf = b"ABAB"
        qname_off = np.array([0, 2, 4, 4], np.int64)  # "AB", "AB", ""

    h = qname_hashes(FakeBatch())
    assert h[0] == h[1], "identical qnames must hash identically"
    assert h[2] == np.uint64(0)


def test_coverage_searchsorted_equals_linear_scan():
    """The binary-search coverage count (collect/window.py) must equal the
    linear overlap scan for arbitrary span sets — it feeds the cluster
    coverage column in the candidate bed."""
    import numpy as np
    rng = np.random.default_rng(3)
    for _ in range(50):
        n = int(rng.integers(1, 400))
        pos = rng.integers(0, 100_000, n).astype(np.int64)
        endpos = pos + rng.integers(1, 20_000, n).astype(np.int64)
        ps, es = np.sort(pos), np.sort(endpos)
        for _ in range(20):
            cstart = int(rng.integers(0, 100_000))
            cend = cstart + int(rng.integers(1, 30_000))
            linear = int(np.count_nonzero((pos < cend) & (endpos > cstart)))
            fast = int(np.searchsorted(ps, cend, side="left")
                       - np.searchsorted(es, cstart, side="right"))
            assert fast == linear, (cstart, cend, fast, linear)


def test_aln_from_ops_equals_dataclass_path():
    """records.aln_from_ops must produce byte-equal Aln state to the
    decode-loop + hard_to_soft + __post_init__ path for arbitrary CIGARs."""
    import numpy as np
    from svision_tpu.collect.records import (Aln, aln_from_ops,
                                             hard_to_soft, CIGAR_CHARS)
    rng = np.random.default_rng(5)
    for _ in range(200):
        nops = int(rng.integers(1, 30))
        kinds = rng.integers(0, 9, nops)
        lens = rng.integers(1, 500, nops)
        raw = (lens.astype(np.uint32) << np.uint32(4)) | kinds.astype(np.uint32)
        cigar = [(CIGAR_CHARS[int(k)], int(l)) for k, l in zip(kinds, lens)]
        ref = Aln(query_name="q", reference_name="chr1", reference_id=0,
                  reference_start=1234, flag=0, mapping_quality=60,
                  cigar=hard_to_soft(cigar), query_sequence="ACGT")
        fast = aln_from_ops("q", "chr1", 0, 1234, 0, 60, raw, "ACGT")
        assert fast.cigar == ref.cigar
        for f in ("reference_end", "query_alignment_start",
                  "query_alignment_end", "query_length"):
            assert getattr(fast, f) == getattr(ref, f), f


def test_batch_derived_equals_per_record_loop():
    """records.batch_derived (one vectorized pass over a selection's CIGAR
    ops) must agree field-for-field with aln_from_ops' scalar loop for
    arbitrary op mixes, including all-clip records and scattered
    selections."""
    import numpy as np
    from svision_tpu.collect.records import aln_from_ops, batch_derived
    rng = np.random.default_rng(11)
    for trial in range(60):
        n_rec = int(rng.integers(1, 40))
        bufs = []
        off = [0]
        for _ in range(n_rec):
            nops = int(rng.integers(1, 25))
            if rng.random() < 0.1:
                # all-clip record: lead collects everything, tail empty
                kinds = rng.choice([4, 5], nops)
            else:
                kinds = rng.integers(0, 9, nops)
            lens = rng.integers(1, 400, nops)
            bufs.append((lens.astype(np.uint32) << np.uint32(4))
                        | kinds.astype(np.uint32))
            off.append(off[-1] + nops)
        cigar_buf = np.concatenate(bufs)
        cigar_off = np.asarray(off, np.int64)
        k = int(rng.integers(1, n_rec + 1))
        idx = np.sort(rng.choice(n_rec, size=k, replace=False))
        ops_list, ref_len, q_len, lead, tail = batch_derived(
            cigar_buf, cigar_off, idx)
        for j, i in enumerate(idx.tolist()):
            ref = aln_from_ops("q", "c", 0, 1000, 0, 60,
                               cigar_buf[cigar_off[i]:cigar_off[i + 1]], None)
            assert ops_list[j] == ref.raw_ops
            assert 1000 + int(ref_len[j]) == ref.reference_end
            assert int(q_len[j]) == ref.query_length
            assert int(lead[j]) == ref.query_alignment_start
            assert int(q_len[j]) - int(tail[j]) == ref.query_alignment_end
