"""Exact replica of OpenCV's thickness-1 LINE_8 rasterization model.

The reference encodes candidate segment pairs into images with cv.line
(plot_segment.py:43-52); channel 1 (duplication) amplifies single-pixel
differences (plot_segment.py:57-67), so the rebuild must light exactly the
same pixels (SURVEY.md §7 "hard parts").

OpenCV's Line() = clipLine (integer Cohen-Sutherland, trunc-toward-zero
division) + LineIterator(connectivity=8, leftToRight=True). Left-to-right
normalization makes the pixel set independent of draw direction. The iterator
is a classic Bresenham with err0 = dx - 2dy: minor axis steps at iteration i
exactly when the running error is negative; the closed form of the number of
minor steps after i major steps is

    k(i) = max(0, ceil((2*m*i - M) / (2*M)))        (M = major span, m = minor)

which this module uses to generate all pixels of a batch of lines with pure
array ops (no data-dependent loops) — the form consumed by the MXU one-hot
rasterizer in ops/rasterize.py. Scalar `line_pixels` is the golden reference
and is parity-tested against cv2 directly.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

CANVAS = 227


def _trunc_div(a: int, b: int) -> int:
    """C-style integer division (truncate toward zero)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def clip_line(x1: int, y1: int, x2: int, y2: int,
              width: int = CANVAS, height: int = CANVAS
              ) -> Optional[Tuple[int, int, int, int]]:
    """Exact cv::clipLine: clip to [0,width-1]x[0,height-1].

    OpenCV's clip is a fixed two-phase sequence (not an iterated
    Cohen-Sutherland): fix the y overflow of endpoint 1 then endpoint 2
    (each using the partially-updated coordinates), then fix x for both.
    Division is int64 truncation toward zero. Returns clipped endpoints or
    None when the segment is entirely outside.
    """
    right, bottom = width - 1, height - 1

    def code(x, y):
        return (x < 0) + (x > right) * 2 + (y < 0) * 4 + (y > bottom) * 8

    c1, c2 = code(x1, y1), code(x2, y2)
    if (c1 & c2) == 0 and (c1 | c2) != 0:
        if c1 & 12:
            a = 0 if c1 < 8 else bottom
            x1 += _trunc_div((a - y1) * (x2 - x1), (y2 - y1))
            y1 = a
            c1 = (x1 < 0) + (x1 > right) * 2
        if c2 & 12:
            a = 0 if c2 < 8 else bottom
            x2 += _trunc_div((a - y2) * (x2 - x1), (y2 - y1))
            y2 = a
            c2 = (x2 < 0) + (x2 > right) * 2
        if (c1 & c2) == 0 and (c1 | c2) != 0:
            if c1:
                a = 0 if c1 == 1 else right
                y1 += _trunc_div((a - x1) * (y2 - y1), (x2 - x1))
                x1 = a
                c1 = 0
            if c2:
                a = 0 if c2 == 1 else right
                y2 += _trunc_div((a - x2) * (y2 - y1), (x2 - x1))
                x2 = a
                c2 = 0
    if (c1 | c2) != 0:
        return None
    return x1, y1, x2, y2


def line_pixels(x1: int, y1: int, x2: int, y2: int,
                width: int = CANVAS, height: int = CANVAS
                ) -> List[Tuple[int, int]]:
    """All (x, y) pixels cv.line(img, p1, p2, color, 1) would paint.

    Scalar golden path: clip, normalize left-to-right, run the err-based
    8-connected Bresenham (LineIterator semantics).
    """
    clipped = clip_line(x1, y1, x2, y2, width, height)
    if clipped is None:
        return []
    x1, y1, x2, y2 = clipped
    if x2 < x1:  # leftToRight normalization
        x1, y1, x2, y2 = x2, y2, x1, y1
    dx = x2 - x1
    dy = y2 - y1
    sy = 1 if dy >= 0 else -1
    ady = abs(dy)

    pixels = []
    if dx >= ady:  # x-major
        err = dx - 2 * ady
        y = y1
        for i in range(dx + 1):
            pixels.append((x1 + i, y))
            if i == dx:
                break
            if err < 0:
                y += sy
                err += 2 * dx
            err -= 2 * ady
    else:  # y-major
        err = ady - 2 * dx
        x = x1
        for i in range(ady + 1):
            pixels.append((x, y1 + sy * i))
            if i == ady:
                break
            if err < 0:
                x += 1
                err += 2 * ady
            err -= 2 * dx
    return pixels


def minor_steps(major: np.ndarray, minor: np.ndarray, i: np.ndarray) -> np.ndarray:
    """Closed-form minor-axis displacement k(i) of the Bresenham walk above.

    major/minor are non-negative spans (major >= minor); i is the major-axis
    step index. All int64 arrays, broadcastable.
    """
    m2 = 2 * np.asarray(major, dtype=np.int64)
    num = 2 * np.asarray(minor, dtype=np.int64) * np.asarray(i, dtype=np.int64) \
        - np.asarray(major, dtype=np.int64)
    # ceil(num / m2) with m2 > 0; guard m2 == 0 (single-point line)
    safe = np.maximum(m2, 1)
    k = -((-num) // safe)
    return np.where(m2 == 0, 0, np.maximum(k, 0))


def clip_lines_batch(pts: np.ndarray, width: int = CANVAS, height: int = CANVAS
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized exact cv::clipLine over [..., 4] (x1,y1,x2,y2) int arrays.

    Returns (clipped [...,4] int32, visible mask [...]). Follows the same
    fixed two-phase update sequence as `clip_line`.
    """
    p = np.asarray(pts, dtype=np.int64).copy()
    x1, y1, x2, y2 = (p[..., i].copy() for i in range(4))
    right, bottom = width - 1, height - 1

    def code(x, y):
        return ((x < 0).astype(np.int64) + (x > right) * 2
                + (y < 0) * 4 + (y > bottom) * 8)

    def tdiv(a, b):
        bs = np.where(b == 0, 1, b)
        q = np.abs(a) // np.abs(bs)
        return np.where((a >= 0) == (bs > 0), q, -q)

    c1, c2 = code(x1, y1), code(x2, y2)
    work = ((c1 & c2) == 0) & ((c1 | c2) != 0)

    fix = work & ((c1 & 12) != 0)
    a = np.where(c1 < 8, 0, bottom)
    x1 = np.where(fix, x1 + tdiv((a - y1) * (x2 - x1), y2 - y1), x1)
    y1 = np.where(fix, a, y1)
    c1 = np.where(work, code(x1, y1) & 3, c1)

    fix = work & ((c2 & 12) != 0)
    a = np.where(c2 < 8, 0, bottom)
    x2 = np.where(fix, x2 + tdiv((a - y2) * (x2 - x1), y2 - y1), x2)
    y2 = np.where(fix, a, y2)
    c2 = np.where(work, code(x2, y2) & 3, c2)

    work2 = work & ((c1 & c2) == 0) & ((c1 | c2) != 0)
    fix = work2 & (c1 != 0)
    a = np.where(c1 == 1, 0, right)
    y1 = np.where(fix, y1 + tdiv((a - x1) * (y2 - y1), x2 - x1), y1)
    x1 = np.where(fix, a, x1)
    c1 = np.where(fix, 0, c1)
    fix = work2 & (c2 != 0)
    a = np.where(c2 == 1, 0, right)
    y2 = np.where(fix, y2 + tdiv((a - x2) * (y2 - y1), x2 - x1), y2)
    x2 = np.where(fix, a, x2)
    c2 = np.where(fix, 0, c2)

    alive = (c1 | c2) == 0
    out = np.stack([x1, y1, x2, y2], axis=-1).astype(np.int32)
    return out, alive
