"""Pallas TPU kernel for the similarity-image encoder.

Alternative to the einsum rasterizer (ops/rasterize.py): instead of
contracting one-hot matrices on the MXU, each pixel evaluates a closed-form
line-membership predicate on the VPU. For OpenCV's 8-connected Bresenham
walk (which plot_segment.py:46-52 relies on), a pixel (r, c) lies on the
left-to-right-normalized line iff

  x-major:  c0 <= c <= c1  and  r == r0 + sy * k(c - c0)
  y-major:  0 <= sy*(r - r0) <= ady  and  c == c0 + k(sy*(r - r0))

with k(i) = max(0, ceil((2*minor*i - major) / (2*major))) — the same step
function ops/bresenham.py derives. That turns rasterization into ~20
elementwise ops over the 227x227 canvas per segment: no scatter, no one-hot
materialization, and the per-column duplication channel is a row-sum.

Layout: the kernel emits [N, 3, 227, 227] (channel-major, so the canvas'
last dim sits on the 128-lane axis instead of the 3-wide channel dim);
`render_raster_pallas` transposes to the NHWC contract of the CNN, which XLA
folds into the consumer.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CANVAS = 227
SEGS = 2


def _membership(ep, rows, cols):
    """Lit-pixel mask for one batch of lines.

    ep: int32 [B, 4] (c0, r0, c1, r1) clipped endpoints.
    rows/cols: int32 [B, 227, 227] broadcasted pixel coordinates.
    Returns bool [B, 227, 227].
    """
    c0, r0, c1, r1 = ep[:, 0], ep[:, 1], ep[:, 2], ep[:, 3]
    # left-to-right normalization on the column axis (cv LineIterator)
    swap = c1 < c0
    c0n = jnp.where(swap, c1, c0)[:, None, None]
    c1n = jnp.where(swap, c0, c1)[:, None, None]
    r0n = jnp.where(swap, r1, r0)[:, None, None]
    r1n = jnp.where(swap, r0, r1)[:, None, None]

    dx = c1n - c0n                        # >= 0
    dy = r1n - r0n
    sy = jnp.where(dy >= 0, 1, -1)
    ady = jnp.abs(dy)
    xmajor = dx >= ady
    major = jnp.maximum(dx, ady)
    minor = jnp.minimum(dx, ady)
    den = jnp.maximum(2 * major, 1)

    def k_of(i):
        num = 2 * minor * i - major
        k = jnp.maximum(-((-num) // den), 0)
        return jnp.where(major == 0, 0, k)

    # x-major: one row per column
    ix = cols - c0n
    mx = (ix >= 0) & (cols <= c1n) & (rows == r0n + sy * k_of(ix))
    # y-major: one column per row
    iy = sy * (rows - r0n)
    my = (iy >= 0) & (iy <= ady) & (cols == c0n + k_of(iy))
    # logical blend instead of select_n: Mosaic can't truncate i8->i1 vectors
    return (mx & xmajor) | (my & ~xmajor)


def _raster_kernel(ep_ref, out_ref):
    """One grid step rasterizes a block of B images.

    ep_ref:  int32 [B, SEGS, 8] — (c0, r0, c1, r1, visible, reverse, 0, 0);
             visibility/reverse ride in the endpoint tensor so every input
             block satisfies Mosaic's (8,128)-divisible-or-full tiling rule.
    out_ref: [B, 3, 227, 227]
    """
    b = ep_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (b, CANVAS, CANVAS), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (b, CANVAS, CANVAS), 2)

    ch0 = jnp.zeros((b, CANVAS, CANVAS), jnp.bool_)
    ch2 = jnp.zeros((b, CANVAS, CANVAS), jnp.bool_)
    for s in range(SEGS):
        lit = _membership(ep_ref[:, s, :4], rows, cols)
        lit = lit & (ep_ref[:, s, 4] != 0)[:, None, None]
        ch0 = ch0 | lit
        ch2 = ch2 | (lit & (ep_ref[:, s, 5] != 0)[:, None, None])

    # duplication channel: image columns (ref axis) with >=2 lit rows keep
    # those rows (plot_segment.py:57-67)
    col_rows = jnp.sum(ch0.astype(jnp.int32), axis=1, keepdims=True)
    ch1 = ch0 & (col_rows >= 2)

    dt = out_ref.dtype
    out_ref[:, 0, :, :] = ch0.astype(dt)
    out_ref[:, 1, :, :] = ch1.astype(dt)
    out_ref[:, 2, :, :] = ch2.astype(dt)


@functools.partial(jax.jit,
                   static_argnames=("block", "dtype", "interpret"))
def render_raster_pallas(endpoints, visible, reverse, *, block: int = 4,
                         dtype=jnp.bfloat16, interpret=None):
    """[N,SEGS,4] clipped endpoints -> {0,1} raster [N,227,227,3] (NHWC).

    Drop-in replacement for rasterize.render_raster; N must be a multiple of
    `block` (the engine pads batches anyway). interpret=True runs the kernel
    in the Pallas interpreter; default auto-interprets on CPU backends.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = endpoints.shape[0]
    assert n % block == 0, (n, block)
    grid = (n // block,)
    packed = jnp.concatenate([
        endpoints.astype(jnp.int32),
        visible.astype(jnp.int32)[..., None],
        reverse.astype(jnp.int32)[..., None],
        jnp.zeros((n, SEGS, 2), jnp.int32),
    ], axis=-1)                                   # [N, SEGS, 8]
    out = pl.pallas_call(
        _raster_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block, SEGS, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 3, CANVAS, CANVAS),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 3, CANVAS, CANVAS), dtype),
        interpret=interpret,
    )(packed)
    return jnp.transpose(out, (0, 2, 3, 1))


def render_images_pallas(endpoints, visible, reverse, *, block: int = 4,
                         dtype=jnp.float32, interpret: bool = False):
    """Mean-subtracted [N,227,227,3] images via the Pallas kernel (the
    reference-normalized tensor, create_batch.py:146-150)."""
    from svision_tpu.models.alexnet import IMAGE_MEAN
    raster = render_raster_pallas(endpoints, visible, reverse,
                                  block=block, dtype=dtype,
                                  interpret=interpret)
    return raster * jnp.asarray(255.0, dtype) - jnp.asarray(IMAGE_MEAN, dtype)
