"""Long-CIGAR (>65535 ops) round trip via the CG:B,I aux tag (SAM spec
4.2.2) through both the pure-Python and native readers."""

import os

import numpy as np
import pytest

from svision_tpu.io.bam import BamReader
from svision_tpu.io.bamwrite import SamRecord, write_bam


@pytest.fixture(scope="module")
def long_bam(tmp_path_factory):
    root = tmp_path_factory.mktemp("longcigar")
    path = str(root / "long.bam")
    n_pairs = 40000           # 80k ops > 65535 -> CG tag
    cigar = "1M1I" * n_pairs + "5M"
    seq = "A" * (n_pairs * 2 + 5)
    rec = SamRecord("ultralong", 0, "chr1", 100, 60, cigar, seq)
    short = SamRecord("short", 0, "chr1", 50, 60, "10M", "C" * 10)
    write_bam(path, [("chr1", 1000000)], [short, rec])
    return path, n_pairs


def test_python_reader_cg(long_bam):
    path, n_pairs = long_bam
    reader = BamReader(path)
    recs = list(reader.fetch_raw("chr1", 0, 1000))
    by_name = {r.qname: r for r in recs}
    long_rec = by_name["ultralong"]
    cig = long_rec.cigar_raw()
    assert len(cig) == 2 * n_pairs + 1
    assert cig[0] == (0, 1) and cig[1] == (1, 1)     # 1M 1I
    assert cig[-1] == (0, 5)
    assert long_rec.ref_span() == n_pairs + 5
    # short record unaffected
    assert by_name["short"].cigar_raw() == [(0, 10)]


def test_native_reader_cg(long_bam):
    path, n_pairs = long_bam
    from svision_tpu.io import native_io
    if not native_io.ensure_built():
        pytest.skip("native lib unavailable")
    reader = BamReader(path)
    batch = reader.fetch_batch("chr1", 0, 1000)
    assert batch is not None and batch.n == 2
    idx = [i for i in range(batch.n) if batch.qname(i) == "ultralong"][0]
    ops = batch.cigar_ops(idx)
    assert len(ops) == 2 * n_pairs + 1
    assert int(ops[0]) >> 4 == 1 and int(ops[0]) & 0xF == 0
    assert int(batch.endpos[idx]) == 100 + n_pairs + 5


def test_aln_path_cg(long_bam):
    path, n_pairs = long_bam
    reader = BamReader(path)
    alns = {a.query_name: a for a in reader.fetch("chr1", 0, 1000)}
    cigar = alns["ultralong"].cigar
    assert len(cigar) == 2 * n_pairs + 1
    assert cigar[0] == ("M", 1) and cigar[1] == ("I", 1)
