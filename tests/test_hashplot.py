"""--hash realigner parity vs the reference hash aligner (pure Python)."""
import random
import sys

import pytest

from tests import ref_harness
from svision_tpu.collect.hashplot import hashplot_unmapped, revcomp

if ref_harness.REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, ref_harness.REFERENCE_ROOT)

from src.segmentplot.run_hash_lineplot import hashplot_unmapped as ref_hashplot
from src.segmentplot.classes import Sequence as RefSequence


def _seg_tuple(seg):
    return (seg.xStart(), seg.xEnd(), seg.yStart(), seg.yEnd(), seg.forward())


def _rand_seq(rng, n):
    return "".join(rng.choice("ACGT") for _ in range(n))


def test_revcomp_matches_reference():
    rng = random.Random(0)
    for _ in range(20):
        s = _rand_seq(rng, rng.randint(1, 200)) + "NX"[:rng.randint(0, 1)]
        assert revcomp(s) == RefSequence(s).getReverseComplementBases()


@pytest.mark.parametrize("seed", range(6))
def test_hashplot_parity(seed):
    rng = random.Random(seed)
    ref = _rand_seq(rng, 600)
    kind = ["dup", "inv", "novel", "mix"][seed % 4]
    if kind == "dup":
        read = ref[100:300]                      # copy of local ref
    elif kind == "inv":
        read = revcomp(ref[200:420])             # inverted copy
    elif kind == "novel":
        read = _rand_seq(rng, 250)               # unrelated insertion
    else:
        read = ref[50:150] + _rand_seq(rng, 80) + revcomp(ref[300:400])

    _, got = hashplot_unmapped(ref, read, 10, 50)
    _, want = ref_hashplot(ref, read, 10, 50)
    assert [_seg_tuple(s) for s in got] == [_seg_tuple(s) for s in want], kind


def test_hashplot_repeat_ref():
    # repetitive reference exercises avoid-kmer logic
    rng = random.Random(42)
    unit = _rand_seq(rng, 40)
    ref = unit * 12
    read = unit * 3
    _, got = hashplot_unmapped(ref, read, 10, 50)
    _, want = ref_hashplot(ref, read, 10, 50)
    assert [_seg_tuple(s) for s in got] == [_seg_tuple(s) for s in want]
