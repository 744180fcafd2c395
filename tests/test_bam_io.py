"""BAM/BGZF/BAI round-trip and fetch-semantics tests (SURVEY.md §4(3))."""
import random

import numpy as np
import pytest

from svision_tpu.io.bam import BamReader, reg2bins
from svision_tpu.io.bamwrite import SamRecord, write_bam
from svision_tpu.io.bgzf import BgzfReader, BgzfWriter


def test_bgzf_roundtrip(tmp_path):
    payload = bytes(random.Random(0).randrange(256) for _ in range(300000))
    p = tmp_path / "x.bgzf"
    with open(p, "wb") as fh:
        w = BgzfWriter(fh)
        for i in range(0, len(payload), 7777):
            w.write(payload[i:i + 7777])
        w.close()
    with open(p, "rb") as fh:
        r = BgzfReader(fh)
        assert r.read(len(payload) + 100) == payload


def _mk_reads(rng, n, ref_len=1000000):
    recs = []
    for i in range(n):
        pos = rng.randrange(0, ref_len - 5000)
        m = rng.randrange(100, 2000)
        seq = "".join(rng.choice("ACGT") for _ in range(m))
        flag = rng.choice([0, 16, 2048, 0, 0])
        recs.append(SamRecord(f"r{i}", flag, "chr1", pos, 60, f"{m}M", seq))
    return recs


def test_bam_roundtrip_and_fetch(tmp_path):
    rng = random.Random(1)
    recs = _mk_reads(rng, 300)
    p = str(tmp_path / "t.bam")
    write_bam(p, [("chr1", 1000000), ("chr2", 500)], recs)

    with BamReader(p) as bam:
        assert bam.references == ["chr1", "chr2"]
        assert bam.lengths == [1000000, 500]
        assert bam.header["HD"]["SO"] == "coordinate"
        assert bam.has_index()

        allrecs = list(bam.fetch("chr1", 0, 1000000))
        assert len(allrecs) == 300
        # coordinate sorted
        poss = [a.reference_start for a in allrecs]
        assert poss == sorted(poss)
        # sequences survive round trip
        byname = {a.query_name: a for a in allrecs}
        for rec in recs:
            a = byname[rec.qname]
            assert a.query_sequence == rec.seq
            assert a.mapping_quality == 60
            assert a.reference_start == rec.pos

        # indexed fetch == brute force overlap filter
        for _ in range(25):
            s = rng.randrange(0, 999000)
            e = s + rng.randrange(100, 30000)
            got = sorted(a.query_name for a in bam.fetch("chr1", s, e))
            want = sorted(r.qname for r in recs
                          if r.pos < e and r.end_pos() > s)
            assert got == want, (s, e)
            assert bam.count_overlapping("chr1", s, e) == len(want)


def test_index_statistics(tmp_path):
    recs = [SamRecord("a", 0, "chr1", 100, 60, "100M", "A" * 100),
            SamRecord("b", 4, "chr1", 200, 0, "*", "A" * 50),
            SamRecord("c", 0, "chr2", 10, 60, "20M", "A" * 20)]
    p = str(tmp_path / "s.bam")
    write_bam(p, [("chr1", 10000), ("chr2", 10000)], recs)
    with BamReader(p) as bam:
        stats = {name: (m, u) for name, m, u in bam.get_index_statistics()}
    assert stats["chr1"] == (1, 1)
    assert stats["chr2"] == (1, 0)


def test_hard_clip_rewrite(tmp_path):
    recs = [SamRecord("a", 2048, "chr1", 100, 60, "50H100M20H", "A" * 100)]
    p = str(tmp_path / "h.bam")
    write_bam(p, [("chr1", 10000)], recs)
    with BamReader(p) as bam:
        a = next(bam.fetch("chr1", 0, 10000))
    # H -> S rewrite (create_align parity)
    assert a.cigarstring == "50S100M20S"
    assert a.query_alignment_start == 50
    assert a.query_alignment_end == 150
    assert a.query_length == 170


def test_fetch_without_index(tmp_path):
    recs = _mk_reads(random.Random(2), 50)
    p = str(tmp_path / "n.bam")
    write_bam(p, [("chr1", 1000000)], recs, write_index=False)
    with BamReader(p) as bam:
        assert not bam.has_index()
        got = sorted(a.query_name for a in bam.fetch("chr1", 100000, 200000))
        want = sorted(r.qname for r in recs
                      if r.pos < 200000 and r.end_pos() > 100000)
        assert got == want


def test_reg2bins_covers_reg2bin(tmp_path):
    from svision_tpu.io.bamwrite import _reg2bin
    rng = random.Random(3)
    for _ in range(300):
        beg = rng.randrange(0, 1 << 28)
        end = beg + rng.randrange(1, 1 << 18)
        qbeg = max(0, beg - rng.randrange(0, 1000))
        qend = end + rng.randrange(0, 1000)
        # a record's bin must appear in the query bin list when overlapping
        assert _reg2bin(beg, end) in reg2bins(qbeg, qend)


def test_native_matches_python(tmp_path):
    """Native libsvio fetch/count must agree with the pure-Python decoder."""
    from svision_tpu.io import native_io
    if not native_io.ensure_built():
        pytest.skip("native toolchain unavailable")
    rng = random.Random(7)
    recs = _mk_reads(rng, 400)
    # add split/hard-clip/unmapped exotics
    recs.append(SamRecord("hc", 2048, "chr1", 777, 13, "30H70M10H", "G" * 70))
    recs.append(SamRecord("um", 4, "chr1", 900, 0, "*", "T" * 40))
    p = str(tmp_path / "n.bam")
    write_bam(p, [("chr1", 1000000), ("chr2", 1000)], recs)

    bam = BamReader(p)
    assert bam.fetch_batch("chr1", 0, 10) is not None, "native path inactive"
    for _ in range(20):
        s = rng.randrange(0, 990000)
        e = s + rng.randrange(50, 50000)
        native = [(a.query_name, a.reference_start, a.flag, a.cigarstring,
                   a.query_sequence) for a in bam.fetch("chr1", s, e)]
        # force python path via fetch_raw
        python = []
        for rec in bam.fetch_raw("chr1", s, e):
            a = rec.to_aln("chr1")
            python.append((a.query_name, a.reference_start, a.flag,
                           a.cigarstring, a.query_sequence))
        assert native == python, (s, e)
        assert bam.count_overlapping("chr1", s, e) == len(python)


def test_native_no_index_scan(tmp_path):
    from svision_tpu.io import native_io
    if not native_io.ensure_built():
        pytest.skip("native toolchain unavailable")
    rng = random.Random(8)
    recs = _mk_reads(rng, 80)
    p = str(tmp_path / "ni.bam")
    write_bam(p, [("chr0", 500), ("chr1", 1000000)], recs, write_index=False)
    bam = BamReader(p)
    got = sorted(a.query_name for a in bam.fetch("chr1", 100000, 300000))
    want = sorted(r.qname for r in recs
                  if r.pos < 300000 and r.end_pos() > 100000)
    assert got == want


def test_native_mt_decode_matches_serial(tmp_path, monkeypatch):
    """Block-parallel inflate (SVIO_THREADS>1) must be byte-identical to
    serial decode: indexed fetch, multi-chunk regions, records spanning BGZF
    block boundaries (long seqs), count_only, and the no-index full scan."""
    from svision_tpu.io import native_io
    if not native_io.ensure_built():
        pytest.skip("native toolchain unavailable")
    rng = random.Random(9)
    recs = _mk_reads(rng, 200)
    # records larger than one 64K BGZF block payload -> span blocks
    for i in range(6):
        m = 70000 + i * 9000
        seq = "".join(rng.choice("ACGT") for _ in range(m))
        recs.append(SamRecord(f"big{i}", 0, "chr1", 1000 + i * 140000, 60,
                              f"{m}M", seq))
    p = str(tmp_path / "mt.bam")
    write_bam(p, [("chr1", 1000000)], recs)
    p2 = str(tmp_path / "mtni.bam")
    write_bam(p2, [("chr1", 1000000)], recs, write_index=False)

    def snap(b):
        return (b.n, b.pos.tobytes(), b.endpos.tobytes(), b.flag.tobytes(),
                b.mapq.tobytes(), bytes(b.qname_buf), b.cigar_buf.tobytes(),
                b.qname_off.tobytes(), b.cigar_off.tobytes(),
                bytes(b.seq_buf), b.seq_off.tobytes())

    regions = [(0, 1000000), (0, 1), (999999, 1000000)]
    for _ in range(12):
        s = rng.randrange(0, 990000)
        regions.append((s, s + rng.randrange(50, 80000)))

    outs = {}
    for nt in ("1", "3"):
        monkeypatch.setenv("SVIO_THREADS", nt)
        bam = BamReader(p)
        rows = []
        for s, e in regions:
            rows.append(snap(bam.fetch_batch("chr1", s, e)))
            rows.append(bam.count_overlapping("chr1", s, e))
        bam2 = BamReader(p2)   # no-index full-scan path
        rows.append(snap(bam2.fetch_batch("chr1", 100000, 700000)))
        outs[nt] = rows
        bam.close()
        bam2.close()
    assert outs["1"] == outs["3"]


def test_csi_index_matches_bai(tmp_path):
    """CSI (samtools index -c) fetch/stats must agree with BAI exactly,
    on both the pure-Python and native fetch paths."""
    rng = random.Random(11)
    recs = _mk_reads(rng, 350)
    pb = str(tmp_path / "bai.bam")
    pc = str(tmp_path / "csi.bam")
    write_bam(pb, [("chr1", 1000000), ("chr2", 500)], recs)
    write_bam(pc, [("chr1", 1000000), ("chr2", 500)], recs,
              index_format="csi")
    import os
    assert os.path.exists(pc + ".csi") and not os.path.exists(pc + ".bai")

    with BamReader(pb) as bb, BamReader(pc) as bc:
        assert type(bb._load_index()).__name__ == "_BaiIndex"
        assert type(bc._load_index()).__name__ == "_CsiIndex"
        assert bb.get_index_statistics() == bc.get_index_statistics()
        for _ in range(30):
            s = rng.randrange(0, 999000)
            e = s + rng.randrange(1, 40000)
            want = sorted(a.query_name for a in bb.fetch("chr1", s, e))
            got = sorted(a.query_name for a in bc.fetch("chr1", s, e))
            assert got == want, (s, e)
            assert bc.count_overlapping("chr1", s, e) == len(want)


def test_csi_deep_binning(tmp_path):
    """Non-default (min_shift, depth) CSI binning — the layout samtools
    uses for >512Mb contigs — fetches correctly."""
    rng = random.Random(12)
    recs = _mk_reads(rng, 120)
    p = str(tmp_path / "deep.bam")
    write_bam(p, [("chr1", 1000000)], recs, index_format="csi",
              min_shift=12, depth=6)
    with BamReader(p) as bam:
        idx = bam._load_index()
        assert (idx.min_shift, idx.depth) == (12, 6)
        for _ in range(20):
            s = rng.randrange(0, 990000)
            e = s + rng.randrange(1, 50000)
            got = sorted(a.query_name for a in bam.fetch("chr1", s, e))
            want = sorted(r.qname for r in recs
                          if r.pos < e and r.end_pos() > s)
            assert got == want, (s, e)


def test_reg2bins_csi_matches_bai_params():
    from svision_tpu.io.bam import reg2bins_csi
    rng = random.Random(13)
    for _ in range(200):
        beg = rng.randrange(0, 1 << 28)
        end = beg + rng.randrange(1, 1 << 20)
        assert reg2bins_csi(beg, end, 14, 5) == sorted(reg2bins(beg, end))


def test_bgzip_fasta_fetch(tmp_path):
    """bgzip-compressed reference (.fa.gz + .gzi) fetches identically to
    the plain-text FASTA."""
    from svision_tpu.io.fasta import FastaFile, write_fasta
    rng = random.Random(14)
    seqs = {"chr1": "".join(rng.choice("ACGTacgtN") for _ in range(300000)),
            "chr2": "".join(rng.choice("ACGT") for _ in range(531))}
    plain = str(tmp_path / "ref.fa")
    gz = str(tmp_path / "ref.fa.gz")
    write_fasta(plain, seqs)
    write_fasta(gz, seqs)
    import os
    assert os.path.exists(gz + ".gzi") and os.path.exists(gz + ".fai")
    fp = FastaFile(plain)
    fg = FastaFile(gz)
    assert fg.references == ["chr1", "chr2"]
    assert fg.get_reference_length("chr1") == 300000
    assert fg.fetch("chr2") == seqs["chr2"]
    for _ in range(40):
        s = rng.randrange(0, 300000)
        e = s + rng.randrange(1, 90000)
        assert fg.fetch("chr1", s, e) == fp.fetch("chr1", s, e), (s, e)
    fp.close()
    fg.close()


def test_fai_autobuild(tmp_path):
    """Missing .fai (and .gzi) are built on open, like pysam/htslib faidx."""
    import os
    from svision_tpu.io.fasta import FastaFile, write_fasta
    rng = random.Random(15)
    seqs = {"c1": "".join(rng.choice("ACGT") for _ in range(7001)),
            "c2": "ACGTN" * 33}
    for suffix in ("plain.fa", "comp.fa.gz"):
        p = str(tmp_path / suffix)
        write_fasta(p, seqs)
        golden_fai = open(p + ".fai").read()
        os.remove(p + ".fai")
        if suffix.endswith(".gz"):
            os.remove(p + ".gzi")
        fa = FastaFile(p)
        assert open(p + ".fai").read() == golden_fai
        assert fa.fetch("c1", 100, 500) == seqs["c1"][100:500]
        assert fa.fetch("c2") == seqs["c2"]
        fa.close()


def test_fai_autobuild_ragged_rejected(tmp_path):
    from svision_tpu.io.fasta import FastaFile
    p = str(tmp_path / "bad.fa")
    with open(p, "w") as fh:
        fh.write(">c1\nACGTACGT\nACG\nACGTACGT\n")
    with pytest.raises(ValueError):
        FastaFile(p)


def test_fai_autobuild_blank_line_rules(tmp_path):
    """Blank line mid-contig corrupts .fai offset arithmetic -> rejected;
    blank lines between records are tolerated (review finding)."""
    from svision_tpu.io.fasta import FastaFile
    bad = str(tmp_path / "bad2.fa")
    with open(bad, "w") as fh:
        fh.write(">c1\nACGT\n\nTTTT\n")
    with pytest.raises(ValueError):
        FastaFile(bad)
    ok = str(tmp_path / "ok.fa")
    with open(ok, "w") as fh:
        fh.write(">c1\nACGT\n\n>c2\nGGGG\n")
    fa = FastaFile(ok)
    assert fa.fetch("c1") == "ACGT"
    assert fa.fetch("c2") == "GGGG"
    fa.close()


def test_truncated_bam_raises(tmp_path):
    """A BAM cut short must raise, not silently pass as complete
    (review finding: truncation looked like clean EOF)."""
    rng = random.Random(17)
    recs = _mk_reads(rng, 150)
    p = str(tmp_path / "t.bam")
    write_bam(p, [("chr1", 1000000)], recs, write_index=False)
    data = open(p, "rb").read()
    cut = str(tmp_path / "cut.bam")
    with open(cut, "wb") as fh:
        fh.write(data[:len(data) // 2 + 7])  # mid-block cut
    with BamReader(cut) as bam:
        with pytest.raises((ValueError, OSError)):
            for _ in bam.fetch("chr1", 0, 1000000):
                pass


def test_corrupt_block_crc_raises(tmp_path):
    """A bit-flip inside a block's DEFLATE payload that still inflates to
    the right size is caught by the CRC gate."""
    import zlib as _zlib
    rng = random.Random(18)
    recs = _mk_reads(rng, 150)
    p = str(tmp_path / "c.bam")
    write_bam(p, [("chr1", 1000000)], recs, write_index=False)
    data = bytearray(open(p, "rb").read())
    # flip one byte inside the stored CRC of a mid-file block: the payload
    # inflates cleanly but the checksum can no longer match
    from svision_tpu.io.bgzf import read_block
    import io as _io
    fh = _io.BytesIO(bytes(data))
    offs = []
    while True:
        off = fh.tell()
        blk, csize = read_block(fh)
        if csize == 0:
            break
        offs.append((off, csize, len(blk)))
    off, csize, isize = offs[len(offs) // 2]
    assert isize > 0
    crc_pos = off + csize - 8  # trailer: crc32 then isize
    data[crc_pos] ^= 0xFF
    bad = str(tmp_path / "bad.bam")
    open(bad, "wb").write(bytes(data))
    with BamReader(bad) as bam:
        with pytest.raises((ValueError, OSError)):
            for _ in bam.fetch("chr1", 0, 1000000):
                pass


def test_fetch_batch_at_voffset_subsets(tmp_path):
    """fetch_batch_at must return exactly the records whose virtual offsets
    are requested (after the isin re-selection), in file order, for
    arbitrary subsets — the giant-window streaming second pass depends on
    this (collect/window.py:_stream_window)."""
    import numpy as np
    from svision_tpu.io import native_io
    if not native_io.ensure_built():
        pytest.skip("native toolchain unavailable")
    rng = random.Random(23)
    recs = _mk_reads(rng, 600)
    p = str(tmp_path / "v.bam")
    write_bam(p, [("chr1", 1000000), ("chr2", 1000)], recs)

    bam = BamReader(p)
    full = bam.fetch_batch("chr1", 0, 1000000)
    assert full is not None and full.voffset is not None
    assert len(full.voffset) == full.n
    # voffsets are strictly increasing (file order == coordinate order)
    assert (np.diff(full.voffset.astype(np.int64)) > 0).all()

    for frac in (0.02, 0.3, 1.0):
        idx = sorted(rng.sample(range(full.n),
                                max(1, int(full.n * frac))))
        want_voffs = full.voffset[idx]
        got = bam.fetch_batch_at("chr1", want_voffs, 0, 1000000)
        sel = np.isin(got.voffset, want_voffs)
        got_voffs = got.voffset[sel]
        assert np.array_equal(np.sort(want_voffs), got_voffs), frac
        # record identity, not just offsets: qnames match the full fetch
        want_names = [full.qname(i) for i in idx]
        got_names = [got.qname(int(j)) for j in np.nonzero(sel)[0]]
        assert want_names == got_names

def test_native_abi_version_checked():
    """ADVICE r3: the loader must verify the compiled ABI, not just mtimes —
    a prebuilt .so newer than the sources would otherwise bind silently."""
    from svision_tpu.io import native_io
    if not native_io.available():
        import pytest
        pytest.skip("native lib not built")
    lib = native_io._load()
    assert native_io._abi_of(lib) == native_io._EXPECTED_ABI
    # a lib lacking the version export reads as ABI 1 (refused by _load)
    class NoVersion:
        def __getattr__(self, name):
            raise AttributeError(name)
    assert native_io._abi_of(NoVersion()) == 1


def test_streamed_fixture_matches_inmemory(tmp_path):
    """sim.make_sv_bam(stream=True) — the WGS-scale per-chromosome
    generator — must write a BAM byte-identical to the in-memory path for
    clean chrom-ordered fixtures (same RNG draw order by construction),
    and produce a sorted, index-consistent file under a noise profile
    (draw order differs there by design; see the sim.py docstring)."""
    from svision_tpu.sim import make_genome, make_sv_bam
    chroms = {"chr1": 120_000, "chr2": 100_000}
    genome = make_genome(str(tmp_path / "ref.fa"), chroms, seed=3)
    events = [("DEL", "chr1", 30_000, 200), ("INS", "chr1", 70_000, 150),
              ("INV", "chr2", 40_000, 300)]
    a, b = str(tmp_path / "a.bam"), str(tmp_path / "b.bam")
    make_sv_bam(a, genome, seed=9, events=events, coverage=6)
    make_sv_bam(b, genome, seed=9, events=events, coverage=6, stream=True)
    assert open(a, "rb").read() == open(b, "rb").read()
    assert open(a + ".bai", "rb").read() == open(b + ".bai", "rb").read()

    c = str(tmp_path / "c.bam")
    make_sv_bam(c, genome, seed=9, events=events, coverage=6, stream=True,
                profile="hifi", genotypes=["0/1", "1/1", "0/1"])
    br = BamReader(c)
    for contig in chroms:
        last = -1
        for rec in br.fetch_raw(contig):
            assert rec.pos >= last          # coordinate-sorted
            last = rec.pos
    assert sum(m for _, m, _ in br.get_index_statistics()) > 100
    br.close()


def test_index_cache_shared_and_invalidated(tmp_path):
    """Parsed BAI/CSI indexes are shared across BamReader opens in one
    process (a collection worker opens the same BAM once per window; a
    whole-genome index parse is ~0.7 s) and invalidated when the index
    file changes."""
    from svision_tpu.sim import make_genome, make_sv_bam
    from svision_tpu.io import bam as bam_mod
    genome = make_genome(str(tmp_path / "r.fa"), {"chr1": 60_000}, seed=1)
    p = str(tmp_path / "s.bam")
    make_sv_bam(p, genome, seed=2, events=[("DEL", "chr1", 30_000, 200)])
    a = BamReader(p)
    idx_a = a._load_index()
    b = BamReader(p)
    assert b._load_index() is idx_a           # cache hit, same object
    # rewriting the BAM+index must invalidate — the key is the index
    # CONTENT (crc32), so even a same-size same-mtime rewrite misses
    make_sv_bam(p, genome, seed=3, events=[("DEL", "chr1", 30_000, 250)])
    c = BamReader(p)
    assert c._load_index() is not idx_a
    assert sum(m for _, m, _ in c.get_index_statistics()) > 0
