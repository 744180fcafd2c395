"""Differential test for evaluate.score_calls: the bisect-indexed matcher
(round 4, needed at whole-genome scale — the full scan was ~10^9 steps at
25k truth x 28k calls) must agree with a brute-force reimplementation of
the original greedy semantics on randomized call sets."""
import random

from svision_tpu.evaluate import _COMPATIBLE, score_calls


def _brute_force(calls, truth, tol):
    """The pre-round-4 O(truth x calls) matcher, kept as the oracle."""
    calls = list(calls)
    used = [False] * len(calls)
    tp = 0
    for kind, chrom, anchor, size, *_ in truth:
        event_calls = set()
        ok = True
        for comp in kind.split("+"):
            best = None
            for i, c in enumerate(calls):
                if used[i] or c["chrom"] != chrom:
                    continue
                if not (c["types"] & _COMPATIBLE.get(comp, {comp})):
                    continue
                d = min(abs(c["pos"] - anchor), abs(c["end"] - anchor))
                if d <= tol and (best is None or d < best[0]):
                    best = (d, i)
            if best is None:
                ok = False
                break
            event_calls.add(best[1])
        if ok:
            for i in event_calls:
                used[i] = True
            tp += 1
    return tp, [i for i, u in enumerate(used) if u]


def test_score_calls_matches_brute_force_fuzzed():
    rng = random.Random(99)
    kinds = ["DEL", "INS", "INV", "DUP", "tDUP", "DEL+INS", "INV+DEL"]
    for trial in range(30):
        truth = []
        calls = []
        for t in range(rng.randint(1, 25)):
            kind = rng.choice(kinds)
            chrom = f"chr{rng.randint(1, 3)}"
            anchor = rng.randint(1000, 200_000)
            truth.append((kind, chrom, anchor, rng.randint(50, 500)))
            # 0-3 calls around each event, some offset past tol, mixed types
            for _ in range(rng.randint(0, 3)):
                pos = anchor + rng.randint(-2500, 2500)
                comp = rng.choice(kind.split("+") + [rng.choice(
                    ["DEL", "INS", "INV", "DUP", "tDUP"])])
                calls.append(dict(chrom=chrom, pos=pos,
                                  end=pos + rng.randint(0, 400),
                                  types={comp}, gt="0/1"))
        rng.shuffle(calls)
        res = score_calls(calls, truth, tol=1000)
        want_tp, want_used = _brute_force(calls, truth, 1000)
        assert res["tp"] == want_tp, (trial, res["tp"], want_tp)
        assert res["tp_calls"] == len(want_used), trial


def test_score_calls_gt_concordance():
    truth = [("DEL", "chr1", 10_000, 200), ("INS", "chr1", 50_000, 150)]
    calls = [dict(chrom="chr1", pos=10_010, end=10_210, types={"DEL"},
                  gt="0/1"),
             dict(chrom="chr1", pos=50_005, end=50_005, types={"INS"},
                  gt="1/1")]
    res = score_calls(calls, truth, tol=1000, truth_gt=["0/1", "0/1"])
    assert res["tp"] == 2
    assert res["gt_eval"] == 2 and res["gt_correct"] == 1
    assert res["gt_concordance"] == 0.5
