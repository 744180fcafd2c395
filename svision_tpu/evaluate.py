"""Accuracy evaluation: calls vs planted truth.

Scores a VCF produced by the pipeline against a list of simulated events
(kind, chrom, anchor, size) — the closed-loop counterpart of the reference's
external truvari/PAV evaluations (SURVEY.md §6). Matching is by breakpoint
proximity and type compatibility; DUP/tDUP are accepted for each other since
the reference's refine_type freely reclassifies between them
(output.py:352-467)."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

_COMPATIBLE = {
    "DEL": {"DEL"},
    "INS": {"INS"},
    "INV": {"INV"},
    "DUP": {"DUP", "tDUP"},
    "tDUP": {"tDUP", "DUP"},
}


def parse_vcf_calls(vcf_path: str) -> List[Dict]:
    """[{chrom, pos, end, types:set, qual, filter, gt}] from a pipeline
    VCF. gt is the sample GT field ("./." when absent)."""
    calls = []
    for line in open(vcf_path):
        if line.startswith("#") or not line.strip():
            continue
        f = line.rstrip("\n").split("\t")
        info = dict(kv.split("=", 1) for kv in f[7].split(";") if "=" in kv)
        types = set()
        svtype = info.get("SVTYPE", "")
        for t in svtype.split("+"):
            if t:
                types.add(t)
        for part in info.get("BKPS", "").split(","):
            if ":" in part:
                types.add(part.split(":", 1)[0])
        gt = "./."
        if len(f) > 9 and "GT" in f[8].split(":"):
            gt = f[9].split(":")[f[8].split(":").index("GT")]
        calls.append(dict(chrom=f[0], pos=int(f[1]),
                          end=int(info.get("END", f[1])), types=types,
                          qual=f[5], filter=f[6], gt=gt))
    return calls


def score_calls(calls: Sequence[Dict],
                truth: Sequence[Tuple[str, str, int, int]],
                tol: int = 1000,
                truth_gt: Sequence[str] = None):
    """Greedy 1:1 matching of calls to truth events.

    Returns {per_type: {kind: {tp, fn, support...}}, precision, recall, f1,
    tp, fp, fn}. A call matches an event when it is within `tol` of the
    anchor and carries a compatible type.

    truth_gt: optional per-event genotype truth ("0/1"/"1/1") — adds
    gt_concordance (fraction of MATCHED events whose call GT equals the
    truth, unordered alleles) plus gt_eval/gt_correct counts. Only simple
    (single-component) events are scored: the reference genotyper leaves
    CSVs at ./. by design (genotype.py:55-62)."""
    calls = list(calls)
    used = [False] * len(calls)
    per_type: Dict[str, Dict[str, int]] = {}
    tp = 0
    gt_eval = gt_correct = 0
    # per-chrom sorted (pos, idx)/(end, idx) tables: candidates within tol
    # of an anchor come from two bisections instead of a full scan — the
    # O(truth x calls) loop was ~10^9 steps at whole-genome scale
    # (25k events x 28k records); greedy semantics are unchanged because
    # candidates are visited in ascending call index, matching the original
    # first-lowest-index tie behavior of the strict `d < best` test
    import bisect
    by_chrom: Dict[str, Dict[str, list]] = {}
    for i, c in enumerate(calls):
        t = by_chrom.setdefault(c["chrom"], {"pos": [], "end": []})
        t["pos"].append((c["pos"], i))
        t["end"].append((c["end"], i))
    for t in by_chrom.values():
        t["pos"].sort()
        t["end"].sort()

    def _near(chrom: str, anchor: int) -> list:
        t = by_chrom.get(chrom)
        if t is None:
            return []
        out = set()
        for key in ("pos", "end"):
            arr = t[key]
            lo = bisect.bisect_left(arr, (anchor - tol, -1))
            hi = bisect.bisect_right(arr, (anchor + tol, len(calls)))
            out.update(i for _, i in arr[lo:hi])
        return sorted(out)

    for ti, (kind, chrom, anchor, size, *_aux) in enumerate(truth):
        stats = per_type.setdefault(kind, {"tp": 0, "fn": 0})
        # compound events ("DEL+INS", "INV+DEL"): every component must be
        # carried by a nearby call — either one <CSV> record with multiple
        # BKPS types or adjacent simple records (both are faithful shapes,
        # depending on whether the component signatures co-cluster)
        components = kind.split("+")
        event_calls: set = set()
        ok = True
        near = _near(chrom, anchor)     # same anchor for every component
        for comp in components:
            best = None
            for i in near:
                c = calls[i]
                if used[i]:
                    continue
                if not (c["types"] & _COMPATIBLE.get(comp, {comp})):
                    continue
                # either breakpoint may sit at the planted anchor: DUP calls
                # report the duplicated SOURCE span, whose END is the
                # insertion point (refine_type semantics)
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
            stats["tp"] += 1
            tp += 1
            if truth_gt is not None and len(components) == 1:
                want = truth_gt[ti]
                got = calls[next(iter(event_calls))].get("gt", "./.")
                gt_eval += 1
                norm = lambda g: frozenset(g.replace("|", "/").split("/"))
                gt_correct += norm(got) == norm(want)
        else:
            stats["fn"] += 1
    fp = sum(1 for u in used if not u)
    fn = len(truth) - tp
    # units must not mix: recall is event-level (matched truth events /
    # truth events); precision is call-level (truth-supporting calls /
    # calls) — a compound event matched by two adjacent simple records
    # contributes two supporting calls, not one event against two units
    tp_calls = sum(1 for u in used if u)
    precision = tp_calls / len(calls) if calls else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall else 0.0)
    out = dict(per_type=per_type, tp=tp, fp=fp, fn=fn, tp_calls=tp_calls,
               n_calls=len(calls), precision=round(precision, 4),
               recall=round(recall, 4), f1=round(f1, 4))
    if truth_gt is not None:
        out["gt_eval"] = gt_eval
        out["gt_correct"] = gt_correct
        out["gt_concordance"] = (round(gt_correct / gt_eval, 4)
                                 if gt_eval else 0.0)
    return out


def score_vcf(vcf_path: str, truth, tol: int = 1000, truth_gt=None):
    return score_calls(parse_vcf_calls(vcf_path), truth, tol=tol,
                       truth_gt=truth_gt)
