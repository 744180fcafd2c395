"""Similarity-image encoder: segment pairs -> [N,227,227,3] batches, TPU-native.

This is the redesign of the reference's per-candidate OpenCV rasterization
(create_batch.py:101-152 + plot_segment.py:33-73). The reference draws one
image at a time on the host with cv.line; here rasterization is reformulated
as **one-hot outer products contracted on the MXU**:

    pixel set of a line  =  {(row_t, col_t)}_t     (Bresenham closed form)
    canvas[n]            =  OR_t onehot(row_t) x onehot(col_t)
                         =  einsum('nkr,nkc->nrc', R, C) > 0

so a whole batch of images is produced by two batched matmuls plus elementwise
ops — no scatter, no host loop, fully fusable with the CNN that follows.

Semantics replicated bit-for-bit from the reference:
  * segment rebuild from bed fields: length = yEnd - yStart, xEnd/yEnd
    recomputed from length (create_batch.py:106-132; classes.Segment:44-54)
  * ratio = max(readLen, refLen)/227 clamped >= 1; endpoint = int(coord/ratio)
    (plot_segment.py:12-21,43-52) — computed in float64 on host
  * image row = read coordinate (x), column = ref coordinate (y); reverse
    segments draw end->start, which is pixel-identical under cv's
    left-to-right normalization (plot_segment.py:46-52)
  * channel 0 = all segments; channel 2 = reverse segments only; channel 1 =
    columns of ch0 with >=2 lit rows keep those rows (plot_segment.py:55-68)
  * values {0,255}, then float32 minus mean [104,117,124]
    (create_batch.py:146-150); cv2.resize is an identity here because the
    canvas is already 227x227 (SURVEY.md §7)
"""

from __future__ import annotations

import functools
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from svision_tpu.ops import bresenham
from svision_tpu.models.alexnet import IMAGE_MEAN

CANVAS = 227
SEGS = 2          # candidate records carry exactly two segments
MAX_STEPS = 227   # a clipped line has at most CANVAS pixels
_S2D_F = 4        # space-to-depth factor (== alexnet._S2D)


def specs_to_endpoints(specs: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host preprocessing: candidate specs -> clipped pixel endpoints.

    specs: int64/float [N, 12] with columns
        xs1, xe1, ys1, ye1, fwd1, xs2, xe2, ys2, ye2, fwd2, read_len, ref_len
    (bed columns 1-12; x = read axis, y = ref axis; see SURVEY.md §3.2).

    Returns (endpoints int32 [N, SEGS, 4] as (col0,row0,col1,row1) clipped to
    the canvas, visible bool [N, SEGS], reverse bool [N, SEGS]).
    """
    s = np.asarray(specs, dtype=np.int64).reshape(-1, 12)
    n = s.shape[0]

    xs = np.stack([s[:, 0], s[:, 5]], axis=1)
    ys = np.stack([s[:, 2], s[:, 7]], axis=1)
    ye_orig = np.stack([s[:, 3], s[:, 8]], axis=1)
    fwd = np.stack([s[:, 4], s[:, 9]], axis=1) != 0

    # Segment rebuild (create_batch.py:118,132): length = ye - ys;
    # xe = xs +/- (length-1); ye = ys + (length-1).
    length = ye_orig - ys
    xe = np.where(fwd, xs + (length - 1), xs - (length - 1))
    ye = ys + (length - 1)

    # ratio clamp (plot_segment.py:12-15); float64 division + trunc toward 0
    # to match Python's int() exactly.
    ratio = np.maximum(s[:, 10], s[:, 11]).astype(np.float64) / 227.0
    ratio = np.maximum(ratio, 1.0)[:, None]

    col0 = np.trunc(ys / ratio).astype(np.int64)   # cv point x = ref axis
    row0 = np.trunc(xs / ratio).astype(np.int64)   # cv point y = read axis
    col1 = np.trunc(ye / ratio).astype(np.int64)
    row1 = np.trunc(xe / ratio).astype(np.int64)

    pts = np.stack([col0, row0, col1, row1], axis=-1)
    clipped, visible = bresenham.clip_lines_batch(pts, CANVAS, CANVAS)
    return clipped.astype(np.int32), visible, ~fwd


def _line_walk(endpoints: jnp.ndarray):
    """Per-line pixel walk, closed form. endpoints int32 [..., 4] (c0,r0,c1,r1).

    Returns (cols, rows, valid) each [..., MAX_STEPS] int32/bool.
    """
    c0, r0, c1, r1 = (endpoints[..., i] for i in range(4))
    # left-to-right normalization on the column axis (cv LineIterator)
    swap = c1 < c0
    c0n = jnp.where(swap, c1, c0)
    c1n = jnp.where(swap, c0, c1)
    r0n = jnp.where(swap, r1, r0)
    r1n = jnp.where(swap, r0, r1)

    dx = c1n - c0n                       # >= 0
    dy = r1n - r0n
    sy = jnp.where(dy >= 0, 1, -1)
    ady = jnp.abs(dy)

    xmajor = dx >= ady
    major = jnp.maximum(dx, ady)
    minor = jnp.minimum(dx, ady)

    i = jnp.arange(MAX_STEPS, dtype=jnp.int32)
    i = i.reshape((1,) * c0.ndim + (MAX_STEPS,))
    majorb = major[..., None]
    minorb = minor[..., None]
    valid = i <= majorb

    # k(i) = max(0, ceil((2*minor*i - major) / (2*major)))
    num = 2 * minorb * i - majorb
    den = jnp.maximum(2 * majorb, 1)
    k = jnp.maximum(-((-num) // den), 0)
    k = jnp.where(majorb == 0, 0, k)

    cols = jnp.where(xmajor[..., None], c0n[..., None] + i,
                     c0n[..., None] + k)
    rows = jnp.where(xmajor[..., None], r0n[..., None] + sy[..., None] * k,
                     r0n[..., None] + sy[..., None] * i)
    return cols, rows, valid


def render_raster(endpoints: jnp.ndarray, visible: jnp.ndarray,
                  reverse: jnp.ndarray, *, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[N,SEGS,4] clipped endpoints -> {0,1} raster [N,227,227,3].

    Comparison formulation (the fast default): for a Bresenham line the step
    index IS the major-axis coordinate, so pixel (r,c) membership is a pure
    elementwise predicate — no contraction, no scatter:

      x-major:  lit(r,c) = c in [c0,c0+major]  and  r == r0 + sy*k(c-c0)
      y-major:  lit(r,c) = sy*(r-r0) in [0,major] and c == c0 + k(sy*(r-r0))

    with k(i) = max(0, ceil((2*minor*i - major)/(2*major))) — identical to
    the closed-form walk in _line_walk, hence pixel-exact vs cv.line. This
    replaced the one-hot einsum (render_raster_einsum): ~94 MFLOP/image of
    MXU scatter-as-matmul became ~0.6 M elementwise VPU ops/image.

    The un-normalized form consumed by alexnet.forward_raster (the *255 and
    mean-subtract are folded into conv1 there); see render_images for the
    reference-normalized tensor."""
    c0, r0, c1, r1 = (endpoints[..., i] for i in range(4))     # [N,S]
    swap = c1 < c0
    c0n = jnp.where(swap, c1, c0)
    r0n = jnp.where(swap, r1, r0)
    r1n = jnp.where(swap, r0, r1)
    dx = jnp.where(swap, c0, c1) - c0n                         # >= 0
    dy = r1n - r0n
    sy = jnp.where(dy >= 0, 1, -1)
    ady = jnp.abs(dy)
    xmajor = dx >= ady
    major = jnp.maximum(dx, ady)
    minor = jnp.minimum(dx, ady)

    t = jnp.arange(CANVAS, dtype=jnp.int32)
    t = t.reshape((1,) * c0.ndim + (CANVAS,))                  # [1,1,T]

    def k_of(i, minorb, majorb):
        num = 2 * minorb * i - majorb
        den = jnp.maximum(2 * majorb, 1)
        return jnp.maximum(-((-num) // den), 0)

    majorb = major[..., None]
    minorb = minor[..., None]
    seg_on = visible[..., None]

    # x-major: index along columns
    ix = t - c0n[..., None]                                    # [N,S,C]
    row_at_c = r0n[..., None] + sy[..., None] * k_of(ix, minorb, majorb)
    valid_x = (xmajor[..., None] & (ix >= 0) & (ix <= majorb) & seg_on)
    # y-major: index along rows
    iy = sy[..., None] * (t - r0n[..., None])                  # [N,S,R]
    col_at_r = c0n[..., None] + k_of(iy, minorb, majorb)
    valid_y = (~xmajor[..., None] & (iy >= 0) & (iy <= majorb) & seg_on)

    # plane[n,s,r,c] = lit pixel of segment s
    plane = ((valid_x[..., None, :] & (t[..., None] == row_at_c[..., None, :]))
             | (valid_y[..., None] & (t[..., None, :] == col_at_r[..., None])))

    ch0 = jnp.any(plane, axis=1)                               # [N,R,C]
    ch2 = jnp.any(plane & reverse[..., None, None], axis=1)
    # duplication channel: columns (ref axis) with >=2 lit rows
    # (plot_segment.py:59-65)
    col_rows = jnp.sum(ch0.astype(jnp.int32), axis=1, keepdims=True)
    ch1 = ch0 & (col_rows >= 2)
    return jnp.stack([ch0, ch1, ch2], axis=-1).astype(dtype)


def _k_of(i, minorb, majorb):
    """Bresenham minor-axis offset k(i) (closed form, _line_walk)."""
    num = 2 * minorb * i - majorb
    k = jnp.maximum(-((-num) // jnp.maximum(2 * majorb, 1)), 0)
    return jnp.where(majorb == 0, 0, k)


def _k_runs(j, majorb, minorb):
    """Inverse Bresenham: the run [ilo, ihi] of major-axis indices i with
    k(i) == j. From k(i) = max(0, ceil((2*minor*i - major)/(2*major))):
    ceil(x) == j  <=>  major*(2j-1) < 2*minor*i <= major*(2j+1), and the
    j==0 case folds in via the max(0, .) clamp on ilo. minor == 0 means
    the whole line is one run."""
    ilo = jnp.maximum(0, (majorb * (2 * j - 1)) // jnp.maximum(2 * minorb, 1)
                      + 1)
    ihi = jnp.minimum(majorb,
                      (majorb * (2 * j + 1)) // jnp.maximum(2 * minorb, 1))
    ilo = jnp.where(minorb == 0, 0, ilo)
    ihi = jnp.where(minorb == 0, majorb, ihi)
    return ilo, ihi


def render_raster_s2d(endpoints: jnp.ndarray, visible: jnp.ndarray,
                      reverse: jnp.ndarray, *, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Comparison raster emitted DIRECTLY in conv1's space-to-depth layout:
    [N,57,57,48] with channel = ch*16 + p*4 + q for pixel (4R+p, 4C+q).

    Bitwise-identical to alexnet._space_to_depth(render_raster(...)) but
    never materializes the [N,227,227,3] image and never runs the 4x4
    block transpose: the broadcasting axes are ordered [N,R,C,ch,p,q] from
    the start, so the final reshape is free. Rows/cols 227 (the s2d pad
    line) stay dark automatically: clipped endpoints are <= 226, so no
    membership predicate can fire there.

    Round-3 formulation ("runs", +4.5% fused images/s on v5e): instead of
    testing equality against both orientation branches, every line's row r
    holds a column RUN [clo(r), chi(r)] obtained by inverting Bresenham
    (_k_runs for x-major, the single k(j) column for y-major), so the big
    [N,S,R,C,p,q] tensor needs only two compares; and the duplication
    channel's per-column lit-row counts are computed ANALYTICALLY as the
    union size of the two segments' per-column row runs
    (inclusion-exclusion) on [N,S,C,q]-sized tensors — no int32 cast +
    row reduction over the big plane. Pixel parity vs cv2 and the other
    formulations is CI-gated (tests/test_rasterize.py)."""
    c0, r0, c1, r1 = (endpoints[..., i] for i in range(4))     # [N,S]
    swap = c1 < c0
    c0n = jnp.where(swap, c1, c0)
    r0n = jnp.where(swap, r1, r0)
    r1n = jnp.where(swap, r0, r1)
    dx = jnp.where(swap, c0, c1) - c0n
    dy = r1n - r0n
    sy = jnp.where(dy >= 0, 1, -1)
    ady = jnp.abs(dy)
    xmajor = dx >= ady
    major = jnp.maximum(dx, ady)
    minor = jnp.minimum(dx, ady)

    blocks = (CANVAS + _S2D_F - 1) // _S2D_F                   # 57
    bc = jnp.arange(blocks, dtype=jnp.int32)
    sub = jnp.arange(_S2D_F, dtype=jnp.int32)
    grid = _S2D_F * bc[:, None] + sub[None, :]                 # [57,4] coords

    e = (..., None, None)          # [N,S] -> [N,S,1,1]
    majorb = major[e]
    minorb = minor[e]

    # per-row column bounds [N,S,R,p]: x-major rows map to column runs of
    # the inverse Bresenham; y-major rows map to the single column k(j)
    j = sy[e] * (grid[None, None] - r0n[e])
    ilo, ihi = _k_runs(j, majorb, minorb)
    kj = _k_of(j, minorb, majorb)
    ok = (jnp.where(xmajor[e], (j >= 0) & (j <= minorb),
                    (j >= 0) & (j <= majorb)) & visible[e])
    clo = jnp.where(ok, c0n[e] + jnp.where(xmajor[e], ilo, kj), CANVAS + 1)
    chi = jnp.where(ok, c0n[e] + jnp.where(xmajor[e], ihi, kj), -1)

    # lit plane [N,S,R,C,p,q]: two compares against the per-row bounds
    cc = grid.reshape(1, 1, 1, blocks, 1, _S2D_F)              # 4C+q
    b_ = (slice(None), slice(None), slice(None), None, slice(None), None)
    plane = (cc >= clo[b_]) & (cc <= chi[b_])
    ch0 = plane[:, 0] | plane[:, 1]
    ch2 = ((plane[:, 0] & reverse[:, 0, None, None, None, None])
           | (plane[:, 1] & reverse[:, 1, None, None, None, None]))

    # duplication channel: per-column lit-row counts as the union size of
    # the two segments' row runs (x-major columns hold one row, y-major
    # columns hold the inverse-Bresenham row run) — [N,S,C,q] arithmetic
    i_c = grid[None, None] - c0n[e]
    kx = _k_of(i_c, minorb, majorb)
    jlo, jhi = _k_runs(i_c, majorb, minorb)
    okc = (jnp.where(xmajor[e], (i_c >= 0) & (i_c <= majorb),
                     (i_c >= 0) & (i_c <= minorb)) & visible[e])
    lo_j = jnp.where(xmajor[e], kx, jlo)
    hi_j = jnp.where(xmajor[e], kx, jhi)
    ra = r0n[e] + sy[e] * lo_j
    rb = r0n[e] + sy[e] * hi_j
    rlo = jnp.where(okc, jnp.minimum(ra, rb), 1)               # empty run
    rhi = jnp.where(okc, jnp.maximum(ra, rb), 0)
    cnt = jnp.maximum(rhi - rlo + 1, 0)                        # [N,S,C,q]
    inter = jnp.maximum(jnp.minimum(rhi[:, 0], rhi[:, 1])
                        - jnp.maximum(rlo[:, 0], rlo[:, 1]) + 1, 0)
    col_rows = cnt[:, 0] + cnt[:, 1] - inter                   # [N,C,q]
    ch1 = ch0 & (col_rows[:, None, :, None, :] >= 2)

    n = ch0.shape[0]
    # (ch, p, q) channel interleave — matches fold_conv1_params; stacking
    # BEFORE the sub-pixel axes avoids the relayout copy XLA inserted for
    # the (p, q, ch) order (+2.4% fused images/s on v5e)
    out = jnp.stack([ch0, ch1, ch2], axis=3)                   # [N,R,C,3,p,q]
    return out.reshape(n, blocks, blocks, 3 * _S2D_F * _S2D_F).astype(dtype)


def render_raster_einsum(endpoints: jnp.ndarray, visible: jnp.ndarray,
                         reverse: jnp.ndarray, *, dtype=jnp.bfloat16) -> jnp.ndarray:
    """One-hot-contraction raster (the original MXU formulation); kept as a
    cross-check and for hardware where the matmul path wins."""
    n = endpoints.shape[0]
    cols, rows, valid = _line_walk(endpoints)          # [N,S,T]
    valid = valid & visible[..., None]

    t = jnp.arange(CANVAS, dtype=jnp.int32)
    onehot_r = (rows[..., None] == t).astype(jnp.bfloat16)   # [N,S,T,227]
    onehot_c = (cols[..., None] == t).astype(jnp.bfloat16)
    onehot_r = onehot_r * valid[..., None].astype(jnp.bfloat16)

    k = SEGS * MAX_STEPS
    r_all = onehot_r.reshape(n, k, CANVAS)
    c_all = onehot_c.reshape(n, k, CANVAS)
    count0 = jnp.einsum("nkr,nkc->nrc", r_all, c_all,
                        preferred_element_type=jnp.float32)
    ch0 = count0 > 0                                          # [N,row,col]

    rev = reverse.astype(jnp.bfloat16)[..., None, None]       # [N,S,1,1]
    r_rev = (onehot_r * rev).reshape(n, k, CANVAS)
    count2 = jnp.einsum("nkr,nkc->nrc", r_rev, c_all,
                        preferred_element_type=jnp.float32)
    ch2 = count2 > 0

    # duplication channel: columns (ref axis) with >=2 lit rows
    # (plot_segment.py:59-65)
    col_rows = jnp.sum(ch0, axis=1, keepdims=True)            # [N,1,col]
    ch1 = ch0 & (col_rows >= 2)

    return jnp.stack([ch0, ch1, ch2], axis=-1).astype(dtype)


def render_images(endpoints: jnp.ndarray, visible: jnp.ndarray,
                  reverse: jnp.ndarray, *, dtype=jnp.float32) -> jnp.ndarray:
    """[N,SEGS,4] clipped endpoints -> [N,227,227,3] mean-subtracted images
    (the reference's normalized tensor, create_batch.py:146-150)."""
    raster = render_raster(endpoints, visible, reverse, dtype=dtype)
    mean = jnp.asarray(IMAGE_MEAN, dtype)
    return raster * jnp.asarray(255.0, dtype) - mean


@jax.jit
def render_images_jit(endpoints, visible, reverse):
    return render_images(endpoints, visible, reverse)


def encode_batch(specs: np.ndarray) -> np.ndarray:
    """Convenience host->device path: specs [N,12] -> images [N,227,227,3]."""
    ep, vis, rev = specs_to_endpoints(specs)
    return np.asarray(render_images_jit(jnp.asarray(ep), jnp.asarray(vis),
                                        jnp.asarray(rev)))


# ---------------------------------------------------------------------------
# numpy reference encoder (golden path for tests; mirrors the reference's
# cv-based pipeline without cv2)
# ---------------------------------------------------------------------------

def encode_one_numpy(spec) -> np.ndarray:
    """Scalar golden encoder using the scalar Bresenham. [227,227,3] float32."""
    ep, vis, rev = specs_to_endpoints(np.asarray(spec).reshape(1, 12))
    first = np.zeros((CANVAS, CANVAS), np.float64)
    third = np.zeros((CANVAS, CANVAS), np.float64)
    for s in range(SEGS):
        if not vis[0, s]:
            continue
        c0, r0, c1, r1 = (int(v) for v in ep[0, s])
        for (cx, cy) in bresenham.line_pixels(c0, r0, c1, r1):
            first[cy, cx] = 255.0
            if rev[0, s]:
                third[cy, cx] = 255.0
    second = np.zeros_like(first)
    for i in range(CANVAS):
        pos = np.where(first[:, i] != 0)[0]
        if len(pos) >= 2:
            second[pos, i] = 255.0
    img = np.stack([first, second, third], axis=-1).astype(np.float32)
    return img - np.asarray(IMAGE_MEAN, np.float32)
