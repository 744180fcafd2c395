"""Indexed FASTA reader (.fai), replacing pysam.FastaFile.

One mmap-backed handle serves all fetches; the reference reopens the FASTA on
every event (analyze_reads.py:42-46) which SURVEY.md flags as a hot-loop sin.
Fetch semantics match pysam: 0-based half-open, case preserved, newlines
stripped via the .fai linebases/linewidth arithmetic.
"""

from __future__ import annotations

import mmap
import os
from typing import Dict, List, Tuple


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        fai = path + ".fai"
        if not os.path.exists(fai):
            raise FileNotFoundError(f"FASTA index not found: {fai} "
                                    "(generate with 'samtools faidx')")
        # name -> (length, offset, linebases, linewidth)
        self._index: Dict[str, Tuple[int, int, int, int]] = {}
        self._order: List[str] = []
        with open(fai) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 5:
                    continue
                name = parts[0]
                self._index[name] = (int(parts[1]), int(parts[2]),
                                     int(parts[3]), int(parts[4]))
                self._order.append(name)
        self._fh = open(path, "rb")
        self._mm = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)

    @property
    def references(self) -> List[str]:
        return list(self._order)

    def get_reference_length(self, name: str) -> int:
        return self._index[name][0]

    def fetch(self, name: str, start: int = 0, end: int = None) -> str:
        length, offset, linebases, linewidth = self._index[name]
        if end is None:
            end = length
        start = max(0, int(start))
        end = min(int(end), length)
        if end <= start:
            return ""
        byte_start = offset + (start // linebases) * linewidth + start % linebases
        byte_end = offset + ((end - 1) // linebases) * linewidth \
            + (end - 1) % linebases + 1
        raw = self._mm[byte_start:byte_end]
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode("ascii")

    def close(self):
        self._mm.close()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_fasta(path: str, sequences: Dict[str, str], line_width: int = 60) -> None:
    """Write a FASTA plus its .fai (test/synthetic-data helper)."""
    with open(path, "w") as fh, open(path + ".fai", "w") as fai:
        for name, seq in sequences.items():
            fh.write(f">{name}\n")
            offset = fh.tell()
            for i in range(0, len(seq), line_width):
                fh.write(seq[i:i + line_width] + "\n")
            fai.write(f"{name}\t{len(seq)}\t{offset}\t{line_width}\t{line_width + 1}\n")
