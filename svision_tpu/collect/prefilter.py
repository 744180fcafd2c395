"""Vectorized clean-read prefilter over the native structure-of-arrays batch.

In a deep-coverage window almost every read is a clean single alignment with
no CIGAR event; the reference still walks each one through the whole
signature stack only for it to emit nothing (a 1-segment read can never
yield a signature: collect_signatures.py:241-242 requires >=2 sorted
segments, and segments only multiply via supplementary alignments or
I/D CIGAR ops >= min_sv_size, analyze_reads.py:828-895).

This module decides eligibility in numpy over the SoA fetch batch BEFORE
any per-read Python object is built:

  * a RECORD qualifies when it is a supplementary alignment or carries an
    I or D op >= min_sv_size;
  * a GROUP (qname) qualifies when any member record qualifies — the whole
    group is then kept intact, because the reference's analysis is
    group-order-sensitive (pm_align = last primary, collect_signatures.py
    160-171), so partial groups would change behavior.

Group membership is resolved with a vectorized polynomial hash over the
qname buffer; hash collisions can only ADD clean groups to the keep set
(same-hash groups are kept or dropped together), never split one, so the
filter is behavior-exact. Skipped reads still contribute their spans to the
window-resident coverage counter (all fetched records count,
classes.py:165-170 semantics) — that comes straight from the batch's
pos/endpos arrays.
"""

from __future__ import annotations

import numpy as np

_FNV_PRIME = np.uint64(1099511628211)


def qname_hashes(batch) -> np.ndarray:
    """[n] uint64 polynomial hash per record's qname.

    The native scan (svio.cc ABI >= 3) computes the identical hash per
    record while the qname bytes are hot in cache; the vectorized numpy
    fallback below covers stale prebuilt libraries."""
    native = getattr(batch, "sig_hash", None)
    if native is not None:
        return native
    buf = np.frombuffer(batch.qname_buf, np.uint8).astype(np.uint64)
    off = batch.qname_off
    if buf.size == 0:
        return np.zeros(batch.n, np.uint64)
    lens = np.diff(off)
    starts = off[:-1]
    # position of each byte inside its qname
    pos = np.arange(buf.size, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), lens)
    with np.errstate(over="ignore"):
        terms = buf * np.power(_FNV_PRIME, pos)          # wraps mod 2^64
        # reduceat needs every index < len(terms); an empty trailing qname
        # has start == buf.size, and clamping it would silently truncate the
        # PREVIOUS record's hash (splitting its qname group). A zero sentinel
        # keeps every boundary valid without perturbing any sum; empty-qname
        # records (invalid BAM, reduceat returns the element at the boundary
        # for an empty segment) are zeroed explicitly.
        sums = np.add.reduceat(np.append(terms, np.uint64(0)), starts)
        sums[lens == 0] = 0
        return sums ^ lens.astype(np.uint64)


def record_masks(batch, min_mapq: int, min_sv_size: int):
    """Per-record (valid, qualifying) masks, no group resolution.

    valid = the reference's record filters (unmapped/secondary/mapq/empty
    CIGAR, collect_signatures.py:131-155); qualifying = valid AND
    (supplementary or a >= min_sv_size I/D op). Group resolution happens in
    qualifying_read_mask (whole-window batch) or across chunk batches in the
    streamed giant-window path (collect/window.py)."""
    n = batch.n
    if n == 0:
        z = np.zeros(0, bool)
        return z, z
    flag = batch.flag.astype(np.uint32)
    valid = ((flag & 0x4) == 0) & ((flag & 0x100) == 0)
    valid &= batch.mapq >= min_mapq
    valid &= np.diff(batch.cigar_off) > 0

    native = getattr(batch, "max_indel", None)
    if native is not None:         # scan-time feature (svio.cc ABI >= 3)
        has_big = native >= min_sv_size
    elif batch.cigar_buf.size:
        ops = batch.cigar_buf & np.uint32(0xF)
        lens = batch.cigar_buf >> np.uint32(4)
        big = ((ops == 1) | (ops == 2)) & (lens >= min_sv_size)  # I=1, D=2
        rec_of = np.searchsorted(batch.cigar_off[1:],
                                 np.arange(batch.cigar_buf.size),
                                 side="right")
        has_big = np.bincount(rec_of[big], minlength=n).astype(bool)
    else:
        has_big = np.zeros(n, bool)
    qual = valid & (has_big | ((flag & 0x800) != 0))
    return valid, qual


def qualifying_read_mask(batch, min_mapq: int, min_sv_size: int) -> np.ndarray:
    """[n] bool: records worth building Aln objects for — the record filters
    plus whole-group keep (any member qualifying keeps the qname group)."""
    valid, qual = record_masks(batch, min_mapq, min_sv_size)
    if not qual.any():
        return qual
    hashes = qname_hashes(batch)
    keep = valid & np.isin(hashes, hashes[qual])
    return keep
