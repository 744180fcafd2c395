"""Indexed FASTA reader (.fai), replacing pysam.FastaFile.

One handle serves all fetches; the reference reopens the FASTA on every event
(analyze_reads.py:42-46) which SURVEY.md flags as a hot-loop sin. Fetch
semantics match pysam: 0-based half-open, case preserved, newlines stripped
via the .fai linebases/linewidth arithmetic.

Both plain FASTA (mmap-backed) and bgzip-compressed FASTA (.fa.gz + .gzi
block index, as produced by `bgzip` + `samtools faidx`) are supported — the
.fai coordinates always refer to the uncompressed stream.
"""

from __future__ import annotations

import bisect
import mmap
import os
import struct
from typing import Dict, List, Tuple

from svision_tpu.io.bgzf import BgzfReader, compress_block


def _read_gzi(path: str) -> Tuple[List[int], List[int]]:
    """Parse a bgzip .gzi block index -> (compressed_offs, uncompressed_offs)
    including the implicit leading (0, 0) entry."""
    with open(path, "rb") as fh:
        data = fh.read()
    n = struct.unpack_from("<Q", data, 0)[0]
    coffs = [0]
    uoffs = [0]
    for i in range(n):
        c, u = struct.unpack_from("<QQ", data, 8 + 16 * i)
        coffs.append(c)
        uoffs.append(u)
    return coffs, uoffs


class _BgzfBytes:
    """Random-access byte reads from a bgzip file via its .gzi index."""

    def __init__(self, fh, gzi_path: str):
        self._reader = BgzfReader(fh)
        self._coffs, self._uoffs = _read_gzi(gzi_path)

    def read(self, start: int, end: int) -> bytes:
        if end <= start:
            return b""
        i = bisect.bisect_right(self._uoffs, start) - 1
        within = start - self._uoffs[i]
        self._reader.seek_virtual((self._coffs[i] << 16) | within)
        return self._reader.read(end - start)

    def close(self):
        pass


class _MmapBytes:
    def __init__(self, fh):
        self._mm = mmap.mmap(fh.fileno(), 0, access=mmap.ACCESS_READ)

    def read(self, start: int, end: int) -> bytes:
        return self._mm[start:end]

    def close(self):
        self._mm.close()


class FastaFile:
    def __init__(self, path: str):
        self.path = path
        fai = path + ".fai"
        if not os.path.exists(fai):
            # pysam/htslib auto-build the index when missing (faidx_build);
            # match that instead of demanding a pre-made .fai
            build_fai(path)
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
        magic = self._fh.read(2)
        self._fh.seek(0)
        if magic == b"\x1f\x8b":  # bgzip-compressed reference
            gzi = path + ".gzi"
            if not os.path.exists(gzi):
                build_gzi(path)  # htslib builds this on demand too
            self._bytes = _BgzfBytes(self._fh, gzi)
        else:
            self._bytes = _MmapBytes(self._fh)

    @property
    def references(self) -> List[str]:
        return list(self._order)

    def _entry(self, name: str) -> Tuple[int, int, int, int]:
        try:
            return self._index[name]
        except KeyError:
            raise ValueError(
                f"{self.path}: reference {name!r} not in .fai index") \
                from None

    def get_reference_length(self, name: str) -> int:
        return self._entry(name)[0]

    def fetch(self, name: str, start: int = 0, end: int = None) -> str:
        length, offset, linebases, linewidth = self._entry(name)
        if end is None:
            end = length
        start = max(0, int(start))
        end = min(int(end), length)
        if end <= start:
            return ""
        if linebases <= 0 or linewidth <= 0:
            raise ValueError(f"{self.path}: corrupt .fai line geometry")
        byte_start = offset + (start // linebases) * linewidth + start % linebases
        byte_end = offset + ((end - 1) // linebases) * linewidth \
            + (end - 1) % linebases + 1
        raw = self._bytes.read(byte_start, byte_end)
        seq = raw.replace(b"\n", b"").replace(b"\r", b"").decode("ascii")
        if len(seq) != end - start:
            # short mmap read past EOF or an offset table pointing into the
            # wrong place: a truncated/corrupt reference must not silently
            # return a wrong-length sequence
            raise ValueError(
                f"{self.path}: fetched {len(seq)} bases for "
                f"{name}:{start}-{end} (want {end - start}) — truncated or "
                "corrupt FASTA/.fai")
        return seq

    def close(self):
        self._bytes.close()
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def build_gzi(path: str) -> None:
    """Build the .gzi block index for a bgzip file by walking its blocks
    (what `bgzip -r` does)."""
    from svision_tpu.io.bgzf import read_block
    entries = []
    coff = 0
    uoff = 0
    with open(path, "rb") as fh:
        while True:
            data, csize = read_block(fh)
            if csize == 0:
                break
            if coff and data:
                entries.append((coff, uoff))
            coff += csize
            uoff += len(data)
    with open(path + ".gzi", "wb") as fh:
        fh.write(struct.pack("<Q", len(entries)))
        for c, u in entries:
            fh.write(struct.pack("<QQ", c, u))


def build_fai(path: str) -> None:
    """Build the .fai index by scanning the FASTA (samtools faidx semantics:
    per contig, all sequence lines except the last must share one width)."""
    with open(path, "rb") as raw:
        if raw.read(2) == b"\x1f\x8b":
            raw.seek(0)
            if not os.path.exists(path + ".gzi"):
                build_gzi(path)
            reader = BgzfReader(raw)

            def lines():
                buf = b""
                while True:
                    chunk = reader.read(1 << 20)
                    if not chunk:
                        break
                    buf += chunk
                    parts = buf.split(b"\n")
                    buf = parts.pop()
                    for p in parts:
                        yield p + b"\n"
                if buf:
                    yield buf

            _scan_fai(lines(), path)
        else:
            raw.seek(0)
            _scan_fai(iter(raw.readline, b""), path)


def _scan_fai(lines, path: str) -> None:
    rows = []   # (name, length, offset, linebases, linewidth)
    name = None
    length = seq_off = linebases = linewidth = 0
    last_short = False
    pos = 0
    for line in lines:
        stripped = line.rstrip(b"\r\n")
        if line.startswith(b">"):
            if name is not None:
                rows.append((name, length, seq_off, linebases, linewidth))
            name = stripped[1:].split()[0].decode("ascii") if len(stripped) > 1 else ""
            if not name:
                raise ValueError(f"{path}: malformed FASTA header")
            pos += len(line)
            seq_off = pos
            length = linebases = linewidth = 0
            last_short = False
            continue
        if name is None:
            if stripped:
                raise ValueError(f"{path}: sequence data before first header")
            pos += len(line)
            continue
        if stripped:
            if last_short:
                raise ValueError(f"{path}: ragged line widths in {name} "
                                 "(cannot faidx-index)")
            if linebases == 0:
                linebases = len(stripped)
                linewidth = len(line)
            elif len(stripped) != linebases:
                if len(stripped) > linebases:
                    raise ValueError(f"{path}: ragged line widths in {name}")
                last_short = True  # short line only valid as the final one
            length += len(stripped)
        else:
            # blank line inside a contig breaks the offset arithmetic the
            # .fai encodes; a short or blank line may only end the contig
            last_short = True
        pos += len(line)
    if name is not None:
        rows.append((name, length, seq_off, linebases, linewidth))
    with open(path + ".fai", "w") as fh:
        for name, length, off, lb, lw in rows:
            fh.write(f"{name}\t{length}\t{off}\t{lb or length}\t{lw or length + 1}\n")


def write_fasta(path: str, sequences: Dict[str, str], line_width: int = 60,
                bgzip: bool = None) -> None:
    """Write a FASTA plus its .fai (test/synthetic-data helper).

    bgzip=True (default when `path` ends in .gz) writes a bgzip-compressed
    FASTA with its .gzi block index; the .fai is identical either way
    (offsets refer to the uncompressed stream)."""
    if bgzip is None:
        bgzip = path.endswith(".gz")

    def wrap(seq: str) -> bytes:
        """Sequence with a newline every line_width bases (numpy — the
        per-line Python loop was minutes at 3 Gb genome scale)."""
        import numpy as np
        b = np.frombuffer(seq.encode("ascii"), np.uint8)
        n_full = len(b) // line_width
        out = np.empty((n_full, line_width + 1), np.uint8)
        out[:, :line_width] = b[:n_full * line_width].reshape(n_full,
                                                              line_width)
        out[:, line_width] = 10
        tail = b[n_full * line_width:].tobytes()
        return out.tobytes() + (tail + b"\n" if tail else b"")

    if not bgzip:
        # stream per chromosome: peak memory is one wrapped chromosome,
        # not the genome (whole-genome fixtures); bytes identical to the
        # joined form below
        pos = 0
        with open(path, "wb") as fh, open(path + ".fai", "w") as fai:
            for name, seq in sequences.items():
                header = f">{name}\n".encode("ascii")
                fh.write(header)
                pos += len(header)
                fai.write(f"{name}\t{len(seq)}\t{pos}\t{line_width}\t"
                          f"{line_width + 1}\n")
                data = wrap(seq)
                fh.write(data)
                pos += len(data)
        return
    text = []
    fai_lines = []
    pos = 0
    for name, seq in sequences.items():
        header = f">{name}\n"
        text.append(header)
        pos += len(header)
        fai_lines.append(
            f"{name}\t{len(seq)}\t{pos}\t{line_width}\t{line_width + 1}\n")
        text.append(wrap(seq).decode("ascii"))
        pos += len(seq) + -(-len(seq) // line_width)
    payload = "".join(text).encode("ascii")
    with open(path + ".fai", "w") as fai:
        fai.writelines(fai_lines)
    # bgzip: fixed-size blocks, record (compressed, uncompressed) offsets of
    # every block after the first into the .gzi
    entries = []
    coff = 0
    with open(path, "wb") as fh:
        for uoff in range(0, len(payload), 0xFF00):
            if uoff:
                entries.append((coff, uoff))
            block = compress_block(payload[uoff:uoff + 0xFF00])
            fh.write(block)
            coff += len(block)
        from svision_tpu.io.bgzf import BGZF_EOF
        fh.write(BGZF_EOF)
    with open(path + ".gzi", "wb") as fh:
        fh.write(struct.pack("<Q", len(entries)))
        for c, u in entries:
            fh.write(struct.pack("<QQ", c, u))
