"""Full-read debug dotplots (the reference's PlotSingleImg2).

Port of `PlotSingleImg2` (plot_segment.py:77-136) and its only caller, the
dead `debug_plot` (collect_signatures.py:103-111, call sites commented at
collect_signatures.py:230,247): a grayscale read-vs-reference dotplot of a
read's segment list, white canvas with black cv.line strokes, downscaled by a
power-of-ten ratio keyed off the SHORTER axis (<= 1000 px; the reference's
rule, which leaves the longer axis unbounded — see MAX_CANVAS). Exposed here
as the `--dotplots` debug aid.

No cv2 / PNG library: lines come from the cv.line-exact Bresenham in
ops/bresenham.py (direction-independent after leftToRight normalization, so
the reference's reverse-segment end->start draw order paints the same
pixels), and PNGs are emitted by a minimal stdlib zlib writer.
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Dict, List, Optional

import numpy as np

from svision_tpu.ops.bresenham import line_pixels


# Hard canvas bound (pixels per axis). The reference's ratio rule keys off
# the SHORTER axis only (plot_segment.py:83-98), so a short read with a
# supplementary alignment mapping far away (or on another chromosome after
# coordinate mixing) would allocate an arbitrarily wide canvas — a 900 bp
# read with a segment 100 Mb distant means a ~90 GB array. Reads whose plot
# would exceed this bound are skipped (debug aid, not pipeline output).
MAX_CANVAS = 20000


def dotplot_ratio(ref_length: int, read_length: int) -> int:
    """Power-of-ten downscale keeping the SHORTER axis <= 1000 px
    (plot_segment.py:83-98 picks the smaller of the two lengths)."""
    shorter = ref_length if ref_length < read_length else read_length
    if shorter < 1000:
        return 1
    ratio = 10
    while shorter / ratio > 1000:
        ratio *= 10
    return ratio


def read_dotplot(segments: List[Dict]) -> Optional[np.ndarray]:
    """[read_len/ratio, ref_len/ratio] uint8 dotplot of one read's segments
    (plot_segment.py:118-136). x = reference axis, y = read axis; reference
    coordinates are shifted to the leftmost segment, read coordinates are
    used raw (as the reference does — off-canvas rows are clipped).
    Returns None when the canvas would exceed MAX_CANVAS on either axis."""
    ref_left = min(s["ref_start"] for s in segments)
    ref_len = max(s["ref_end"] for s in segments) - ref_left
    read_len = (max(s["q_end"] for s in segments)
                - min(s["q_start"] for s in segments))
    ratio = dotplot_ratio(ref_len, read_len)
    height = max(int(read_len / ratio), 1)
    width = max(int(ref_len / ratio), 1)
    if height > MAX_CANVAS or width > MAX_CANVAS:
        return None

    img = np.full((height, width), 255, dtype=np.uint8)
    for seg in segments:
        x1 = int((seg["ref_start"] - ref_left) / ratio)
        x2 = int((seg["ref_end"] - ref_left) / ratio)
        y1 = int(seg["q_start"] / ratio)
        y2 = int(seg["q_end"] / ratio)
        # reverse segments are drawn end->start (plot_segment.py:131-134);
        # pixel-identical either way after leftToRight normalization
        for x, y in line_pixels(x1, y1, x2, y2, width=width, height=height):
            img[y, x] = 0
    return img


def write_png(img: np.ndarray, path: str) -> None:
    """Minimal 8-bit grayscale PNG writer (stdlib only)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    height, width = img.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(height))
    with open(path, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n")
        fh.write(chunk(b"IHDR", struct.pack(">IIBBBBB", width, height,
                                            8, 0, 0, 0, 0)))
        fh.write(chunk(b"IDAT", zlib.compress(raw)))
        fh.write(chunk(b"IEND", b""))


def dump_read_dotplot(segments: List[Dict], qname: str,
                      out_dir: str) -> Optional[str]:
    """debug_plot (collect_signatures.py:103-111): one PNG per read under
    <out>/dotplots, qname truncated to 100 chars with '/' sanitized.
    Oversized plots (distant supplementary segments) are skipped: None."""
    img = read_dotplot(segments)
    if img is None:
        return None
    os.makedirs(out_dir, exist_ok=True)
    name = str(qname[: min(100, len(qname))]).replace("/", "_")
    path = os.path.join(out_dir, name + ".png")
    write_png(img, path)
    return path
