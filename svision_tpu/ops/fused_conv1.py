"""Pallas attempt: fuse the s2d raster predicate into conv1 (round-4 #4).

Round 3 left one addressable block in the 57.6%-MFU single-chip program:
`render_raster_s2d` materializes its [N,57,57,48] predicate tensor to HBM
and the folded conv1 reads it straight back (~20 ms per 65k-image call at
the HBM roofline, docs/PERF.md 4j). This kernel computes the predicate in
VMEM per block and feeds the folded 3x3x48->96 conv (as an im2col matmul
on the MXU) without the round trip:

    endpoints [N,S,4] -> (VPU) predicate block [B,57,57,48]
                      -> (VMEM) im2col patches [B,3025,432]
                      -> (MXU)  dot with w_s2d [432,96] -> conv1 out

All raster math is the exact "runs" formulation of render_raster_s2d —
including the analytic duplication channel, recomputed elementwise per
output element so the whole predicate is branch-free VPU code. Parity vs
(render_raster_s2d -> XLA conv) is CI-gated in interpret mode.

Measured verdict on real hardware lives in docs/PERF.md 4k — this file is
kept either as the production conv1 path or as the pinned negative.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CANVAS = 227
SEGS = 2
_F = 4                      # space-to-depth factor
_B57 = 57                   # ceil(227/4)
_OUT = 55                   # 57 - 3 + 1 (3x3 VALID, stride 1)


def _k_of(i, minor, major, den):
    num = 2 * minor * i - major
    k = jnp.maximum(-((-num) // den), 0)
    return jnp.where(major == 0, 0, k)


def _k_runs(j, major, minor):
    ilo = jnp.maximum(0, (major * (2 * j - 1)) // jnp.maximum(2 * minor, 1)
                      + 1)
    ihi = jnp.minimum(major,
                      (major * (2 * j + 1)) // jnp.maximum(2 * minor, 1))
    ilo = jnp.where(minor == 0, 0, ilo)
    ihi = jnp.where(minor == 0, major, ihi)
    return ilo, ihi


def _predicate_s2d(ep_ref, dtype):
    """{0,1} predicate [57,57,48] in the (c,p,q) interleave, elementwise.

    ep_ref: int32 [1, SEGS, 8] in SMEM (c0, r0, c1, r1, vis, rev, 0, 0) —
    per-segment values are SCALAR reads, so every broadcast into the big
    tensor is a splat (Mosaic rejects vector broadcasts that span both
    sublanes and lanes, which per-image (b,1,1,1) operands would need).
    """
    shape = (_B57, _B57, 3 * _F * _F)
    kch = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    cch = kch // (_F * _F)                      # image channel 0/1/2
    p = (kch % (_F * _F)) // _F                 # sub-row
    q = kch % _F                                # sub-col
    rows = _F * jax.lax.broadcasted_iota(jnp.int32, shape, 0) + p
    cols = _F * jax.lax.broadcasted_iota(jnp.int32, shape, 1) + q

    ch0 = jnp.zeros(shape, jnp.bool_)
    ch2 = jnp.zeros(shape, jnp.bool_)
    col_rows = jnp.zeros(shape, jnp.int32)
    rlo_prev = rhi_prev = None
    for s in range(SEGS):
        e = lambda k: ep_ref[0, s, k]
        c0, r0, c1, r1 = e(0), e(1), e(2), e(3)
        vis = e(4) != 0
        rev = e(5) != 0
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
        den = jnp.maximum(2 * major, 1)

        # membership: per-row column run (runs formulation). Boolean
        # selects are LOGICAL BLENDS throughout — Mosaic cannot truncate
        # i8 select results to i1 vectors (same workaround as
        # pallas_raster._membership)
        j = sy * (rows - r0n)
        ilo, ihi = _k_runs(j, major, minor)
        kj = _k_of(j, minor, major, den)
        ok = ((j >= 0) & (((j <= minor) & xmajor)
                          | ((j <= major) & ~xmajor)) & vis)
        clo = jnp.where(ok, c0n + jnp.where(xmajor, ilo, kj), CANVAS + 1)
        chi = jnp.where(ok, c0n + jnp.where(xmajor, ihi, kj), -1)
        lit = (cols >= clo) & (cols <= chi)
        ch0 = ch0 | lit
        ch2 = ch2 | (lit & rev)

        # analytic per-column lit-row run for the duplication channel
        i_c = cols - c0n
        kx = _k_of(i_c, minor, major, den)
        jlo, jhi = _k_runs(i_c, major, minor)
        okc = ((i_c >= 0) & (((i_c <= major) & xmajor)
                             | ((i_c <= minor) & ~xmajor)) & vis)
        lo_j = jnp.where(xmajor, kx, jlo)
        hi_j = jnp.where(xmajor, kx, jhi)
        ra = r0n + sy * lo_j
        rb = r0n + sy * hi_j
        rlo = jnp.where(okc, jnp.minimum(ra, rb), 1)
        rhi = jnp.where(okc, jnp.maximum(ra, rb), 0)
        cnt = jnp.maximum(rhi - rlo + 1, 0)
        if rlo_prev is None:
            col_rows = cnt
            rlo_prev, rhi_prev = rlo, rhi
        else:
            inter = jnp.maximum(jnp.minimum(rhi_prev, rhi)
                                - jnp.maximum(rlo_prev, rlo) + 1, 0)
            col_rows = col_rows + cnt - inter
    ch1 = ch0 & (col_rows >= 2)
    chv = ((ch0 & (cch == 0)) | (ch1 & (cch == 1)) | (ch2 & (cch == 2)))
    return chv.astype(dtype)


def _fused_kernel(ep_ref, w_ref, out_ref, pred_ref, patch_ref):
    """ep [1,SEGS,8] (SMEM) + w_s2d [9*48, 96] -> conv1 out [1,3025,96].

    im2col goes through VMEM scratch (pred_ref [57,57,48],
    patch_ref [3025, 432]): vector-level lane concatenation of the 9
    window slices is a Mosaic "offset mismatch on non-concat dimension"
    refusal, but slice loads + lane-offset stores are plain memory ops.
    Scratches stay f32 regardless of the compute dtype — the
    (55,55,48)->(3025,48) sublane collapse is legal under f32's (8,128)
    tiling but not bf16's (16,128); the dot operand is cast at use."""
    pred_ref[:] = _predicate_s2d(ep_ref, jnp.float32)          # [57,57,48]
    for dr in range(3):
        for dc in range(3):
            sl = pred_ref[dr:dr + _OUT, dc:dc + _OUT, :]
            k0 = (dr * 3 + dc) * 48
            patch_ref[:, k0:k0 + 48] = sl.reshape(_OUT * _OUT, 48)
    acc = jnp.dot(patch_ref[:].astype(w_ref.dtype), w_ref[:],
                  preferred_element_type=jnp.float32)          # [3025,96]
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dtype", "interpret"))
def conv1_fused_raster(endpoints, visible, reverse, w_s2d, *,
                       dtype=jnp.float32, interpret=None):
    """[N,SEGS,4] endpoints + folded conv1 weights [3,3,48,96] ->
    conv1 pre-activation [N,55,55,96] (add b_fold + relu outside).

    One image per grid program (per-segment endpoint values must be SMEM
    scalars — see _predicate_s2d). interpret=None auto-interprets on CPU.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n = endpoints.shape[0]
    packed = jnp.concatenate([
        endpoints.astype(jnp.int32),
        visible.astype(jnp.int32)[..., None],
        reverse.astype(jnp.int32)[..., None],
        jnp.zeros((n, SEGS, 2), jnp.int32),
    ], axis=-1)                                                # [N,SEGS,8]
    w2d = w_s2d.reshape(9 * 48, 96)
    out = pl.pallas_call(
        _fused_kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, SEGS, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((9 * 48, 96), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _OUT * _OUT, 96),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, _OUT * _OUT, 96), dtype),
        scratch_shapes=[
            pltpu.VMEM((_B57, _B57, 48), jnp.float32),
            pltpu.VMEM((_OUT * _OUT, 9 * 48), jnp.float32),
        ],
        interpret=interpret,
    )(packed, w2d)
    return out.reshape(n, _OUT, _OUT, 96)
