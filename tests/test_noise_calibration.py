"""Noise-profile calibration vs published instrument characterizations
(VERDICT r4 #7).

The closed-loop accuracy story rests on noise.py's hand-set rate constants
(noise.py HIFI/ONT profiles). These tests measure the REALIZED per-base
error composition of the generated edits — substitution, insertion, and
deletion bases per read base, after the position-collision dedupe — and
assert they sit inside bands taken from public instrument
characterizations (sources quoted in docs/EVALUATION.md §4):

  * PacBio HiFi (CCS): ~99.2-99.9% read accuracy (total error 0.1-0.8%),
    residual errors dominated by short homopolymer indels
    [Wenger et al., Nat Biotechnol 2019, doi:10.1038/s41587-019-0217-9].
    The SVision paper's HG00733/HG002 HiFi data is early-generation CCS,
    at the high end of that error band.
  * ONT (R9.4-era chemistry, what the SVision paper's HG002 ONT data
    used): 4-6% total error, mixed substitutions and indels with
    deletions >= insertions [Delahaye & Nicolas, PLoS ONE 2021,
    doi:10.1371/journal.pone.0257521; Jain et al., Nat Biotechnol 2018].

Measured on the edit stream itself (sequencing_edits), not CIGARs, so the
numbers are exact realized rates, independent of alignment bookkeeping.
A complementary CIGAR-level band check lives in
tests/test_noise.py::test_profile_error_rates_in_band.
"""

import numpy as np
import pytest

from svision_tpu import noise as N

READ_LEN = 6000
N_READS = 400


def _realized(profile):
    nprng = np.random.default_rng(42)
    sub_b = ins_b = del_b = 0
    total = READ_LEN * N_READS
    for _ in range(N_READS):
        for _pos, kind, payload in N.sequencing_edits(READ_LEN, nprng,
                                                      profile):
            if kind == "sub":
                sub_b += 1
            elif kind == "ins":
                ins_b += len(payload)
            else:
                del_b += int(payload)
    return sub_b / total, ins_b / total, del_b / total


def test_hifi_realized_rates_in_published_band():
    sub, ins, dele = _realized(N.HIFI)
    total = sub + ins + dele
    # CCS: total error 0.1-0.8% (Wenger 2019); indel-dominated
    assert 0.003 < total < 0.009, total
    assert (ins + dele) > 2 * sub, (ins, dele, sub)


def test_ont_realized_rates_in_published_band():
    sub, ins, dele = _realized(N.ONT)
    total = sub + ins + dele
    # R9.4-era ONT: 4-6% total, mixed; deletions >= insertions
    assert 0.035 < total < 0.065, total
    assert dele >= ins * 0.9, (dele, ins)
    # substitutions a substantial share (mixed profile, not indel-only)
    assert sub > 0.25 * total, (sub, total)


def test_profiles_disjoint():
    """The two instrument profiles must be separated by >3x total error —
    the property that makes cross-profile generalization claims
    (HIFI-trained checkpoint on ONT reads) meaningful."""
    h = sum(_realized(N.HIFI))
    o = sum(_realized(N.ONT))
    assert o > 3 * h, (h, o)
