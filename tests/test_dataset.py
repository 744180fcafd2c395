"""Training-set builder + evaluation scorer (closed-loop components)."""
import numpy as np

from svision_tpu.evaluate import score_calls, _COMPATIBLE
from svision_tpu.models.dataset import (CLASS_IDS, build_dataset,
                                        simulate_events)


def test_simulate_events_deterministic():
    ev1, ln1 = simulate_events(4, seed=3)
    ev2, ln2 = simulate_events(4, seed=3)
    assert ev1 == ev2 and ln1 == ln2
    assert len(ev1) == 20
    kinds = {e[0] for e in ev1}
    assert kinds == set(CLASS_IDS)
    anchors = [e[2] for e in ev1]
    assert all(b - a >= 20000 for a, b in zip(anchors, anchors[1:]))


def test_build_dataset_all_classes_balanced(tmp_path):
    specs, labels, events = build_dataset(n_per_type=4, seed=0, support=6,
                                          workdir=str(tmp_path))
    assert specs.shape[1] == 12
    counts = np.bincount(labels, minlength=5)
    assert (counts > 0).all(), counts
    # balanced: every class downsampled to the smallest
    assert counts.max() == counts.min(), counts


def test_dup_classes_live_on_overlapping_other_pairs(tmp_path):
    """tDUP and DUP are learned from the main-x-other pair whose segments
    overlap on the reference axis (the dup-channel discriminator); the
    signatures' main-main pairs are INS-identical images and get labeled
    INS (refine_type folds the {INS, dup} combo back into the dup call)."""
    from svision_tpu.models.dataset import collect_candidates, \
        label_candidates
    events = [("tDUP", "chr1", 40000, 300), ("DUP", "chr1", 90000, 250)]
    cands, _, _ = collect_candidates(events, 140000, str(tmp_path), seed=2,
                                     support=6)
    specs, labels = label_candidates(cands, events)
    assert CLASS_IDS["tDUP"] in labels and CLASS_IDS["DUP"] in labels
    # every dup-labeled spec overlaps on the ref (y) axis; every INS-labeled
    # spec (the backbone pairs of these dup events) does not
    for s, l in zip(specs, labels):
        y_overlap = min(s[3], s[8]) - max(s[2], s[7])
        if l in (CLASS_IDS["DUP"], CLASS_IDS["tDUP"]):
            assert y_overlap > 0, (s, l)
        if l == CLASS_IDS["INS"]:
            assert y_overlap <= 0, (s, l)
    assert CLASS_IDS["INS"] in labels, "backbone pairs must be labeled INS"


def test_score_calls_matching():
    truth = [("DEL", "chr1", 1000, 100), ("INS", "chr1", 5000, 60),
             ("DUP", "chr1", 9000, 200)]
    calls = [
        dict(chrom="chr1", pos=1010, end=1100, types={"DEL"}),
        dict(chrom="chr1", pos=5100, end=5100, types={"INS"}),
        # tDUP call matches a DUP truth (refine_type reclassification)
        dict(chrom="chr1", pos=8990, end=9200, types={"tDUP"}),
        # false positive: wrong locus
        dict(chrom="chr1", pos=50000, end=50100, types={"DEL"}),
    ]
    s = score_calls(calls, truth, tol=500)
    assert s["tp"] == 3 and s["fp"] == 1 and s["fn"] == 0
    assert s["per_type"]["DUP"]["tp"] == 1
    assert s["recall"] == 1.0 and s["precision"] == 0.75


def test_score_calls_type_mismatch_is_fn():
    truth = [("INV", "chr1", 2000, 300)]
    calls = [dict(chrom="chr1", pos=2000, end=2300, types={"DEL"})]
    s = score_calls(calls, truth, tol=500)
    assert s["tp"] == 0 and s["fn"] == 1 and s["fp"] == 1


def test_compatibility_table_covers_all_classes():
    assert set(_COMPATIBLE) == set(CLASS_IDS)


def test_score_calls_compound_csv_record():
    """One <CSV> record carrying both component types matches a compound
    truth event."""
    truth = [("INV+DEL", "chr1", 3000, 350)]
    calls = [dict(chrom="chr1", pos=3005, end=3500, types={"INV", "DEL"})]
    s = score_calls(calls, truth, tol=500)
    assert s["tp"] == 1 and s["fp"] == 0 and s["fn"] == 0
    assert s["per_type"]["INV+DEL"]["tp"] == 1


def test_score_calls_compound_adjacent_records():
    """Two adjacent simple records can jointly satisfy a compound event."""
    truth = [("DEL+INS", "chr1", 7000, 400)]
    calls = [dict(chrom="chr1", pos=7002, end=7400, types={"DEL"}),
             dict(chrom="chr1", pos=6998, end=7000, types={"INS"})]
    s = score_calls(calls, truth, tol=500)
    assert s["tp"] == 1 and s["fp"] == 0 and s["fn"] == 0


def test_score_calls_compound_missing_component():
    truth = [("DEL+INS", "chr1", 7000, 400)]
    calls = [dict(chrom="chr1", pos=7002, end=7400, types={"DEL"})]
    s = score_calls(calls, truth, tol=500)
    assert s["tp"] == 0 and s["fn"] == 1 and s["fp"] == 1
