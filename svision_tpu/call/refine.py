"""SV-type refinement: INS vs DUP/tDUP reconciliation.

Port of refine_type (output.py:352-467). The three branches of the reference
differ only in which dup spellings participate; folded into one parameterized
path with identical outcomes (the reference's in-place DUP->tDUP relabeling of
original_type is preserved).
"""

from __future__ import annotations

from typing import List, Tuple


def refine_type(original_type: List[str], original_bkps: List[List[int]],
                options) -> Tuple[List[str], List[List[int]]]:
    has_ins = "INS" in original_type
    has_tdup = "tDUP" in original_type
    has_dup = "DUP" in original_type
    if not (has_ins and (has_tdup or has_dup)):
        return original_type, original_bkps

    ins_len = 0
    dup_len = 0
    ins_pos = -1
    for i in range(len(original_type)):
        t = original_type[i]
        if t == "INS":
            ins_pos = int(original_bkps[i][0])
            ins_len += int(original_bkps[i][2])
        elif t in ("DUP", "tDUP"):
            dup_len += int(original_bkps[i][2])
            # DUP whose end sits at the INS position is a tandem dup
            # (output.py:404-408,442-445); only when a DUP spelling exists
            if has_dup and t == "DUP" and ins_pos != -1:
                dup_end = int(original_bkps[i][1])
                if abs(ins_pos - dup_end) < 10:
                    original_type[i] = "tDUP"

    if ins_len - dup_len > options.min_sv_size:
        # genuine novel insertion remains: shrink its length by the dup part
        refined_type = original_type
        refined_bkps = original_bkps
        new_ins_len = ins_len - dup_len
        for i in range(len(refined_type)):
            if refined_type[i] == "INS":
                refined_bkps[i][2] = new_ins_len
                break
    else:
        refined_type = [t for t in original_type if t != "INS"]
        refined_bkps = [original_bkps[i] for i in range(len(original_type))
                        if original_type[i] != "INS"]
    return refined_type, refined_bkps
