"""Fused bias+ReLU+maxpool(3x3,s2)+LRN as one Pallas VPU pass.

STATUS: measured NEGATIVE on v5e — kept as a pinned experiment, not wired
into the model. Hypothesis was that the AlexNet conv1/conv2 tail blocks
(reference alexnet.py:26-40: conv -> relu -> 3x3/2 maxpool -> LRN) are
HBM-bound and a single VMEM pass would win. Measured (batch 1024, resident
inputs, v5e): the block is VPU-bound, not HBM-bound — XLA's unfused chain
runs [1024,55,55,96] in 4.3 ms (vs ~0.9 ms HBM-roofline), and this kernel
is SLOWER: 6.3 ms with f32 internals, 11.8 ms with bf16 internals (bf16
sublane transposes for the column pool dominate; strided slices that would
avoid the transpose lower to >2D gathers Mosaic rejects). The win the
roofline suggested was already being captured by XLA fusing bias/relu into
the conv epilogue. See docs/PERF.md "negative results".

Pooling avoids strided slices via pair-reshapes on contiguous slices:
max(y[2i], y[2i+1], y[2i+2]) is built from y[0:2P].reshape(P,2,..) and
y[2:2P+2].reshape(P,2,..)[:,0] after padding one trailing -inf row. The
column pool reuses the row trick after a (row, col) swap, keeping every
reshape on the leading (untiled) axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_RADIUS = 2
_ALPHA = 2e-5
_BIAS_K = 1.0
_NEG = -3.0e38  # ~ -f32 max; safe "never the max" filler for pooling

# tests flip this to run the kernel under the Pallas interpreter on CPU
_INTERPRET = False


def _pool_rows(y: jax.Array) -> jax.Array:
    """[H, W, C] -> [(H-3)//2+1, W, C]: max over rows (2i, 2i+1, 2i+2)."""
    h, w, c = y.shape
    ho = (h - 3) // 2 + 1
    pad_rows = 2 * ho + 2 - h  # 1 when h is odd (55, 27), 2 when even
    fill = jnp.full((pad_rows, w, c), _NEG, dtype=y.dtype)
    yp = jnp.concatenate([y, fill], axis=0)
    a = yp[0:2 * ho].reshape(ho, 2, w, c)
    s = yp[2:2 * ho + 2].reshape(ho, 2, w, c)
    return jnp.maximum(jnp.maximum(a[:, 0], a[:, 1]), s[:, 0])


def _lrn_f32(p: jax.Array) -> jax.Array:
    """LRN across the channel (lane) axis; input/output f32 [.., C]."""
    c = p.shape[-1]
    sq = p * p
    win = sq
    for k in range(1, _RADIUS + 1):
        z = jnp.zeros(p.shape[:-1] + (k,), p.dtype)
        win = win + jnp.concatenate([sq[..., k:], z], axis=-1)
        win = win + jnp.concatenate([z, sq[..., :c - k]], axis=-1)
    v = _BIAS_K + _ALPHA * win
    r = jax.lax.rsqrt(v)
    return p * (r * jnp.sqrt(r))  # v^-0.75


def _kernel(x_ref, b_ref, o_ref):
    x = x_ref[0].astype(jnp.float32)                 # [H, W, C]
    y = jnp.maximum(x + b_ref[0].astype(jnp.float32), 0.0)
    r = _pool_rows(y)                                # [Ho, W, C]
    r = jnp.swapaxes(r, 0, 1)                        # [W, Ho, C]
    p = jnp.swapaxes(_pool_rows(r), 0, 1)            # [Ho, Wo, C]
    o_ref[0] = _lrn_f32(p).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("use_pallas",))
def bias_relu_pool_lrn(x: jax.Array, bias: jax.Array,
                       use_pallas: bool = None) -> jax.Array:
    """relu(x + bias) -> 3x3 stride-2 VALID maxpool -> LRN(2, 2e-5, 0.75).

    x [N,H,W,C] (bf16 or f32), bias [C]. Math runs in f32 internally and
    rounds once at the output (at least as accurate as the unfused bf16
    chain). use_pallas defaults to True only on a TPU backend (unless the
    test hook _INTERPRET forces the interpreter); use_pallas=False takes an
    equivalent jnp path so tests/CPU meshes need no kernel support.
    """
    if use_pallas is None:
        use_pallas = _INTERPRET or jax.default_backend() == "tpu"
    if not use_pallas:
        return _reference(x, bias)
    n, h, w, c = x.shape
    ho = (h - 3) // 2 + 1
    wo = (w - 3) // 2 + 1
    return pl.pallas_call(
        _kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, c), x.dtype),
        interpret=_INTERPRET,
    )(x, bias.reshape(1, c))


def _reference(x: jax.Array, bias: jax.Array) -> jax.Array:
    """jnp fallback with identical f32-internal math."""
    y = jnp.maximum(x.astype(jnp.float32) + bias.astype(jnp.float32), 0.0)
    p = jax.lax.reduce_window(y, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    return _lrn_f32(p).astype(x.dtype)
