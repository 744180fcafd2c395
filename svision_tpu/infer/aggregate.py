"""Region-level aggregation of per-candidate CNN predictions.

Port of Predict.get_region_potential_svtypes (predict.py:85-145): collapse the
per-read {type_id: bkp} maps of one region into candidate type-combos with
running-average breakpoints, ordered by support.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

TYPE_NAMES = {"0": "DEL", "1": "INS", "2": "INV", "3": "DUP", "4": "tDUP"}


def get_region_potential_svtypes(reads_dict: Dict[str, Dict[int, List[int]]]
                                 ) -> List[Tuple[str, List[str], List[List[int]]]]:
    """reads_dict: {read_id: {type_id: [bkp_start, bkp_end, bkp_len]}}.

    Returns [(svtype_str 'DEL+INS', support_read_ids, avg_bkps)] sorted by
    support descending (stable)."""
    stats: Dict[str, List] = {}
    for read_id, sv_type_infos in reads_dict.items():
        sv_type_str = "".join(str(i) for i in sorted(sv_type_infos.keys()))
        new_bkps = [sv_type_infos[int(c)] for c in sv_type_str]
        if sv_type_str not in stats:
            stats[sv_type_str] = [[read_id], new_bkps]
        else:
            old_bkps = stats[sv_type_str][1]
            old_n = len(stats[sv_type_str][0])
            avg_bkps = []
            for i in range(len(new_bkps)):
                avg_bkps.append([
                    int((new_bkps[i][0] + old_bkps[i][0] * old_n) / (old_n + 1)),
                    int((new_bkps[i][1] + old_bkps[i][1] * old_n) / (old_n + 1)),
                    int((new_bkps[i][2] + old_bkps[i][2] * old_n) / (old_n + 1)),
                ])
            stats[sv_type_str][0].append(read_id)
            stats[sv_type_str][1] = avg_bkps

    ordered = sorted(stats.items(), key=lambda x: len(x[1][0]), reverse=True)
    sv_stats = []
    for type_ids, (read_ids, bkps) in ordered:
        name = "+".join(TYPE_NAMES[c] for c in type_ids)
        sv_stats.append((name, read_ids, bkps))
    return sv_stats
