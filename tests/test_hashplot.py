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


def test_fast_seeding_matches_string_oracle():
    """The vectorized seeder (numpy k-mer codes + sorted join) must produce
    IDENTICAL segments, in identical order, to the original string path —
    across repeats, reverse-complement hits, and N runs."""
    import random
    from svision_tpu.collect.hashplot import HashAligner, revcomp

    rng = random.Random(7)
    for trial in range(12):
        ref = "".join(rng.choice("ACGT") for _ in range(rng.randint(80, 600)))
        # plant structure: a repeat, a revcomp copy, an N run
        if trial % 3 == 0:
            ref = ref + ref[10:70] + ref
        if trial % 3 == 1:
            ref = ref + revcomp(ref[20:120]) + ref[:50]
        if trial % 4 == 0:
            ref = ref[:40] + "N" * rng.randint(1, 15) + ref[40:]
        read = ref[rng.randint(0, 20):rng.randint(60, len(ref))]
        if trial % 2:
            read = revcomp(read)

        def segs(force):
            a = HashAligner(10, 50, 0, 2)
            a.run(ref, ref, force_strings=force)
            b = HashAligner(10, 50, 0, 2)
            b.run(read, ref, a.self_diff_segs, a.hashvalues, a.avoid_kmers,
                  force_strings=force)
            return [(s.x_start, s.x_end, s.y_start, s.y_end, s.fwd)
                    for s in b.segments], \
                   [(s.x_start, s.y_start) for s in a.segments]

        fast, fast_self = segs(False)
        slow, slow_self = segs(True)
        assert fast_self == slow_self, f"trial {trial} self-align differs"
        assert fast == slow, f"trial {trial} differs"


def test_fast_and_string_hashvalue_tables_equivalent():
    """Learned avoid/hashvalue tables must gate the same y positions."""
    import numpy as np
    from svision_tpu.collect.hashplot import HashAligner, _kmer_codes
    ref = ("ACGTACGTTTGACCA" * 9)[:120]   # repeat-heavy
    a_f = HashAligner(10, 50, 0, 2)
    a_f.run(ref, ref)
    a_s = HashAligner(10, 50, 0, 2)
    a_s.run(ref, ref, force_strings=True)
    assert isinstance(a_f.hashvalues, np.ndarray)
    assert len(a_f.hashvalues) == len(a_s.hashvalues)
    assert len(a_f.avoid_kmers) == len(a_s.avoid_kmers)
    # codes of the string tables equal the int tables
    codes = _kmer_codes(ref, 10)
    assert (a_f.hashvalues == codes).all()


def test_exotic_bytes_fall_back_to_string_path():
    from svision_tpu.collect.hashplot import hashplot_unmapped
    ref = "ACGT" * 40
    read = ("ACGT" * 10) + "@" + ("ACGT" * 10)   # '@' outside the alphabet
    _, segs = hashplot_unmapped(ref, read, 10, 50)   # must not crash
    assert isinstance(segs, list)

def test_large_k_forces_exact_string_path():
    """ADVICE r3: base-33 packing overflows int64 at k >= 13 — distinct
    k-mers could collide after wraparound. The fast seeder must refuse and
    both passes must run the exact string path consistently."""
    import random
    import numpy as np
    from svision_tpu.collect.hashplot import (HashAligner, _kmer_codes,
                                              hashplot_unmapped)
    assert _kmer_codes("ACGT" * 10, 12) is not None    # 33**12 < 2**62: fast
    assert _kmer_codes("ACGT" * 10, 13) is None        # 33**13 wraps: exact
    rng = random.Random(7)
    ref = "".join(rng.choice("ACGT") for _ in range(260))
    read = ref[40:200]
    # k=13 end-to-end: string tables on both passes, no ndarray leakage
    a = HashAligner(13, 50, 0, 2)
    a.run(ref, ref)
    assert not isinstance(a.hashvalues, np.ndarray)
    _, segs = hashplot_unmapped(ref, read, 13, 50)
    assert segs and all(s.length >= 20 for s in segs)
