"""AlexNet classifier for similarity images, as a pure-JAX pytree model.

Architecture parity with the reference TF1 graph (reference: src/network/alexnet.py:26-58):
  conv1 11x11x96 s4 VALID + ReLU -> maxpool 3x3 s2 VALID -> LRN(r=2, a=2e-5, b=0.75)
  conv2 5x5x256 s1 SAME groups=2 + ReLU -> maxpool -> LRN
  conv3 3x3x384 SAME + ReLU
  conv4 3x3x384 SAME groups=2 + ReLU
  conv5 3x3x256 SAME groups=2 + ReLU -> maxpool
  flatten(6*6*256) -> fc6 4096 + ReLU -> fc7 4096 + ReLU -> fc8 num_classes (logits)

The reference's `groups=2` convolutions are a structural (Caffe-era) grouping, not
device parallelism; XLA expresses them natively via `feature_group_count`, which maps
onto the MXU without the reference's split/concat dance (alexnet.py:118-129).

Parameters are a flat dict keyed exactly like the TF1 variable scopes
({layer}/weights, {layer}/biases — alexnet.py:115-116,144-145) so that converted
checkpoints drop in with zero renaming.

Class ids follow the reference label order: 0=DEL 1=INS 2=INV 3=DUP 4=tDUP
(predict.py:133-142).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

NUM_CLASSES = 5
INPUT_SIZE = 227
# Per-channel mean subtracted from images before the CNN (create_batch.py:13,150).
IMAGE_MEAN = (104.0, 117.0, 124.0)

# (name, kh, kw, out_ch, stride, padding, groups)
_CONV_SPECS = (
    ("conv1", 11, 11, 96, 4, "VALID", 1),
    ("conv2", 5, 5, 256, 1, "SAME", 2),
    ("conv3", 3, 3, 384, 1, "SAME", 1),
    ("conv4", 3, 3, 384, 1, "SAME", 2),
    ("conv5", 3, 3, 256, 1, "SAME", 2),
)
_FC_SPECS = (
    ("fc6", 6 * 6 * 256, 4096),
    ("fc7", 4096, 4096),
    ("fc8", 4096, NUM_CLASSES),
)

Params = Dict[str, jax.Array]


def init_params(rng: jax.Array, num_classes: int = NUM_CLASSES,
                dtype=jnp.float32) -> Params:
    """He-init parameters with TF1-compatible names/shapes."""
    params: Params = {}
    in_ch = 3
    keys = jax.random.split(rng, len(_CONV_SPECS) + len(_FC_SPECS))
    ki = 0
    for name, kh, kw, out_ch, _, _, groups in _CONV_SPECS:
        fan_in = kh * kw * (in_ch // groups)
        w = jax.random.normal(keys[ki], (kh, kw, in_ch // groups, out_ch), dtype)
        params[f"{name}/weights"] = w * np.sqrt(2.0 / fan_in).astype(np.float32)
        params[f"{name}/biases"] = jnp.zeros((out_ch,), dtype)
        in_ch = out_ch
        ki += 1
    for name, n_in, n_out in _FC_SPECS:
        if name == "fc8":
            n_out = num_classes
        w = jax.random.normal(keys[ki], (n_in, n_out), dtype)
        params[f"{name}/weights"] = w * np.sqrt(2.0 / n_in).astype(np.float32)
        params[f"{name}/biases"] = jnp.zeros((n_out,), dtype)
        ki += 1
    return params


def lrn(x: jax.Array, radius: int = 2, alpha: float = 2e-5, beta: float = 0.75,
        bias: float = 1.0) -> jax.Array:
    """Local response normalization across channels (TF semantics).

    out = x / (bias + alpha * sum_{c-r..c+r} x_c^2)^beta  — matches
    tf.nn.local_response_normalization used at alexnet.py:164-166.

    Implemented as 2*radius+1 shifted adds over the channel axis: pure
    elementwise VPU work that XLA fuses into the surrounding ops. (A
    cumsum+gather formulation measured ~1.3x slower on v5e — channel-axis
    gathers don't vectorize.)
    """
    sq = jnp.square(x)
    # windowed sum over the channel (last) axis with window 2*radius+1
    c = x.shape[-1]
    padded = jnp.pad(sq, [(0, 0)] * (x.ndim - 1) + [(radius, radius)])
    win = padded[..., 0:c]
    for k in range(1, 2 * radius + 1):
        win = win + padded[..., k:k + c]
    v = bias + alpha * win
    if beta == 0.75:
        # v^-0.75 = rsqrt(v) * sqrt(rsqrt(v)) — rsqrt/sqrt have fast VPU
        # paths, generic pow lowers to exp/log
        r = jax.lax.rsqrt(v)
        return x * (r * jnp.sqrt(r))
    return x * jax.lax.pow(v, -beta)


def _maxpool(x: jax.Array) -> jax.Array:
    """3x3 stride-2 VALID max pool (alexnet.py:158-161)."""
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.finfo(jnp.float32).min,
        jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _backbone(params: Params, h: jax.Array, compute_dtype,
              conv1_s2d: bool = False) -> jax.Array:
    """Shared conv+fc stack. conv1_s2d=True consumes the space-to-depth
    input form (conv1 becomes 3x3 stride-1; see fold_conv1_params).

    Intermediate-precision policy: with compute_dtype=f32 every value stays
    f32 (exact TF1 parity). With bf16, conv/fc OUTPUTS and the bias/ReLU/
    pool/LRN sections also run bf16 — the MXU still accumulates each
    contraction in f32 and rounds once at the output, and halving the HBM
    traffic of the inter-conv elementwise sections measured +18% images/s on
    v5e (46.6k -> 55.2k fused). Logits are always f32.
    """
    inter_dtype = (jnp.float32 if compute_dtype == jnp.float32
                   else compute_dtype)
    for name, _, _, _, stride, padding, groups in _CONV_SPECS:
        w = params[f"{name}/weights"].astype(compute_dtype)
        b = params[f"{name}/biases"].astype(inter_dtype)
        if conv1_s2d and name == "conv1":
            stride, padding = 1, "VALID"
        h = jax.lax.conv_general_dilated(
            h, w,
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=inter_dtype,
        )
        h = jax.nn.relu(h + b)
        if name in ("conv1", "conv2"):
            h = _maxpool(h)
            h = lrn(h)
        elif name == "conv5":
            h = _maxpool(h)
        h = h.astype(compute_dtype)

    h = h.reshape(h.shape[0], -1)  # NHWC flatten: matches tf.reshape (alexnet.py:49)
    for name, _, _ in _FC_SPECS:
        w = params[f"{name}/weights"].astype(compute_dtype)
        if name == "fc8":
            b = params[f"{name}/biases"].astype(jnp.float32)
            h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        else:
            b = params[f"{name}/biases"].astype(inter_dtype)
            h = jnp.dot(h, w, preferred_element_type=inter_dtype) + b
            h = jax.nn.relu(h).astype(compute_dtype)
    return h  # f32 logits


def forward(params: Params, x: jax.Array, *, compute_dtype=jnp.float32) -> jax.Array:
    """Logits for a batch of NHWC [N,227,227,3] mean-subtracted images.

    compute_dtype=jnp.bfloat16 runs convs/matmuls on the MXU in bf16 with f32
    accumulation; logits are returned in f32 either way.
    """
    return _backbone(params, x.astype(compute_dtype), compute_dtype)


# ---------------------------------------------------------------------------
# Fast inference path: space-to-depth conv1 + input-normalization folding
# ---------------------------------------------------------------------------
#
# AlexNet's first conv (11x11 stride 4 on 3 channels) runs at ~3/128 MXU lane
# utilization: the contraction axis is only 11*3 wide. A 4x4 space-to-depth
# transform re-expresses it exactly as a 3x3 stride-1 conv over 48 channels,
# quadrupling the contraction width. On top of that, the image pipeline's
# elementwise normalization (raster {0,1} -> *255 -> minus IMAGE_MEAN,
# create_batch.py:146-150) is affine, so it folds into conv1's weights and
# bias: conv(255*b - mean, W) = conv(b, 255*W) + (bias - sum(W*mean)).
# The CNN then consumes the boolean raster directly — the f32 image tensor
# (158 MB per 256-batch) is never materialized in HBM.

_S2D = 4          # space-to-depth factor == conv1 stride
_K1_PAD = 12      # conv1 kernel 11 padded to a multiple of the factor


def fold_conv1_math(w, b, xp=np):
    """The conv1 fold, module-generic: xp=numpy for the host pre-transfer
    fold (fold_conv1_params) and xp=jax.numpy for the DIFFERENTIABLE
    in-graph fold (models/train.forward_train_s2d). One implementation so
    a layout change (e.g. the (c,p,q) interleave) cannot drift between the
    inference and training paths.

    [11,11,3,96] -> [3,3,48,96] with the x255 scale folded in; bias
    absorbs the IMAGE_MEAN shift (VALID conv: every tap sees a
    mean-subtracted pixel). Channel interleave is (c,p,q) — the raster
    stacks its three channels on the axis BEFORE the (p,q) sub-pixels
    (render_raster_s2d / _space_to_depth), which XLA lays out without the
    relayout copy the (p,q,c) order forced (+2.4% fused images/s on v5e).
    """
    mean = xp.asarray(IMAGE_MEAN).astype(w.dtype)
    b_fold = b - xp.einsum("hwco,c->o", w, mean)
    pad = _K1_PAD - w.shape[0]
    w_pad = xp.pad(w * np.float32(255.0),
                   ((0, pad), (0, pad), (0, 0), (0, 0)))
    kh = _K1_PAD // _S2D
    # [12,12,3,96] -> [a,p,b,q,c,o] -> [a,b,(c,p,q),o] = [3,3,48,96]
    w_s2d = (w_pad.reshape(kh, _S2D, kh, _S2D, 3, w.shape[3])
             .transpose(0, 2, 4, 1, 3, 5)
             .reshape(kh, kh, _S2D * _S2D * 3, w.shape[3]))
    return w_s2d, b_fold


def fold_conv1_params(params: Params) -> Params:
    """Return a params dict whose conv1 is the folded space-to-depth form.

    conv1/weights: [11,11,3,96] -> [3,3,48,96] with the x255 scale folded in;
    conv1/biases absorbs the IMAGE_MEAN shift. All other entries unchanged.
    Exact in f32 arithmetic (bf16 rounding differs only in quantization order).

    Computed in host numpy (only conv1's ~140 KB are touched): callers can
    fold BEFORE the host->device transfer and ship bf16 params directly —
    on a tunneled link the f32 transfer of the 227 MB pytree costs ~27 s.
    """
    w = np.asarray(params["conv1/weights"], np.float32)        # [11,11,3,96]
    b = np.asarray(params["conv1/biases"], np.float32)
    w_s2d, b_fold = fold_conv1_math(w, b, np)
    out = dict(params)
    out["conv1/weights"] = w_s2d
    out["conv1/biases"] = b_fold
    return out


def fold_params_bf16(params: Params) -> Params:
    """Host-side param preparation for the fast inference path: fold conv1
    (space-to-depth + normalization) then pre-cast every leaf to the dtype
    the bf16 program reads it in — bf16 everywhere except fc8's bias, which
    `_backbone` keeps f32 for the logits. Pre-casting is the same
    round-to-nearest the program would apply, so results are
    bitwise-identical while the host->device transfer halves. Shared by
    InferenceEngine and ShardedInference so their numerics cannot drift."""
    import ml_dtypes
    folded = fold_conv1_params({k: np.asarray(v) for k, v in params.items()})
    return {k: (np.asarray(v) if k == "fc8/biases"
                else np.asarray(v).astype(ml_dtypes.bfloat16))
            for k, v in folded.items()}


def _space_to_depth(x: jax.Array) -> jax.Array:
    """[N,227,227,3] -> [N,57,57,48]: pad to 228 and fold 4x4 blocks into
    channels, ordered (c,p,q) to match fold_conv1_params."""
    n, h, w, c = x.shape
    hp = -h % _S2D
    x = jnp.pad(x, ((0, 0), (0, hp), (0, hp), (0, 0)))
    hh = (h + hp) // _S2D
    return (x.reshape(n, hh, _S2D, hh, _S2D, c)
            .transpose(0, 1, 3, 5, 2, 4)
            .reshape(n, hh, hh, _S2D * _S2D * c))


def forward_raster(folded_params: Params, raster: jax.Array, *,
                   compute_dtype=jnp.bfloat16) -> jax.Array:
    """Logits from a {0,1} raster [N,227,227,3] using folded params
    (fold_conv1_params). Numerically equivalent to
    forward(params, raster*255 - IMAGE_MEAN)."""
    h = _space_to_depth(raster.astype(compute_dtype))
    return _backbone(folded_params, h, compute_dtype, conv1_s2d=True)


def forward_s2d(folded_params: Params, h: jax.Array, *,
                compute_dtype=jnp.bfloat16) -> jax.Array:
    """Logits from a raster already in space-to-depth layout [N,57,57,48]
    (rasterize.render_raster_s2d) — skips the 4x4 block transpose."""
    return _backbone(folded_params, h.astype(compute_dtype), compute_dtype,
                     conv1_s2d=True)


# ---------------------------------------------------------------------------
# int8 turbo path: per-channel int8 weights + dynamic per-tensor activations
# ---------------------------------------------------------------------------
#
# v5e's MXU runs int8 x int8 -> int32 at ~2x the bf16 rate (measured 151 vs
# 78 TOPS on conv2). All convs and fc6/fc7 quantize symmetrically: weights
# per-output-channel (static, folded on the host — also 4x less transfer),
# activations per-tensor with a dynamic max computed on device per batch
# (calibration-free; AlexNet's LRN keeps inter-layer ranges tame). Bias,
# ReLU, pools and LRN stay bf16; the raster input is {0,1} so conv1's input
# is exact int8 with scale 1. fc8 (5 outputs) stays bf16. Accuracy is gated
# by argmax-concordance tests against the f32 path, not bit parity — use
# --exact for reference-faithful numerics.

_Q_LAYERS = ("conv1", "conv2", "conv3", "conv4", "conv5", "fc6", "fc7")


def quantize_params_int8(folded_params: Params) -> Params:
    """Host-side: fold_conv1_params output -> int8 weights + f32 per-channel
    scales. Non-quantized entries (biases, fc8) pass through as f32."""
    out: Params = {}
    for name in _Q_LAYERS:
        w = np.asarray(folded_params[f"{name}/weights"], np.float32)
        axes = tuple(range(w.ndim - 1))          # all but the out-channel
        scale = np.maximum(np.abs(w).max(axis=axes), 1e-12) / 127.0
        w8 = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
        out[f"{name}/weights"] = w8
        out[f"{name}/wscale"] = scale.astype(np.float32)
        out[f"{name}/biases"] = np.asarray(folded_params[f"{name}/biases"],
                                           np.float32)
    out["fc8/weights"] = np.asarray(folded_params["fc8/weights"], np.float32)
    out["fc8/biases"] = np.asarray(folded_params["fc8/biases"], np.float32)
    return out


def _quantize_act(x: jax.Array):
    """Dynamic symmetric per-tensor int8: (x8, scale)."""
    m = jnp.max(jnp.abs(x.astype(jnp.float32)))
    s = jnp.maximum(m, 1e-6) / 127.0
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return x8.astype(jnp.int8), s


def forward_raster_int8(qparams: Params, raster: jax.Array) -> jax.Array:
    """Logits from a {0,1} raster via the int8 MXU path. qparams from
    quantize_params_int8(fold_conv1_params(params))."""
    cd = jnp.bfloat16
    h8 = _space_to_depth(raster.astype(jnp.int8))    # exact: values {0,1}
    a_scale = jnp.float32(1.0)
    h = None
    def _conv8(x8, w8, stride, padding, groups):
        # XLA miscompiles feature_group_count>1 with int8 operands (measured
        # 64% error on CPU vs 1% ungrouped) — split the groups manually;
        # two half-width int8 convs still ride the MXU at the 2x int8 rate
        def one(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
        if groups == 1:
            return one(x8, w8)
        cin = x8.shape[-1] // groups
        cout = w8.shape[-1] // groups
        return jnp.concatenate(
            [one(x8[..., g * cin:(g + 1) * cin],
                 w8[..., g * cout:(g + 1) * cout]) for g in range(groups)],
            axis=-1)

    for name, _, _, _, stride, padding, groups in _CONV_SPECS:
        if name == "conv1":
            stride, padding = 1, "VALID"
        else:
            h8, a_scale = _quantize_act(h)
        w8 = qparams[f"{name}/weights"]
        y = _conv8(h8, w8, stride, padding, groups)
        scale = (qparams[f"{name}/wscale"] * a_scale).astype(jnp.float32)
        b = qparams[f"{name}/biases"]
        h = jax.nn.relu(y.astype(jnp.float32) * scale + b).astype(cd)
        if name in ("conv1", "conv2"):
            h = _maxpool(h)
            h = lrn(h)
        elif name == "conv5":
            h = _maxpool(h)

    h = h.reshape(h.shape[0], -1)
    for name, _, _ in _FC_SPECS:
        if name == "fc8":
            w = qparams["fc8/weights"].astype(cd)
            b = qparams["fc8/biases"]
            return jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        h8, a_scale = _quantize_act(h)
        w8 = qparams[f"{name}/weights"]
        y = jnp.dot(h8, w8, preferred_element_type=jnp.int32)
        scale = (qparams[f"{name}/wscale"] * a_scale).astype(jnp.float32)
        h = jax.nn.relu(y.astype(jnp.float32) * scale
                        + qparams[f"{name}/biases"]).astype(cd)


@functools.partial(jax.jit, static_argnames=("compute_dtype",))
def predict(params: Params, x: jax.Array, compute_dtype=jnp.float32):
    """(logits, argmax, softmax) — the triple the reference session computes
    per batch (predict.py:209-210)."""
    logits = forward(params, x, compute_dtype=compute_dtype)
    return logits, jnp.argmax(logits, axis=1), jax.nn.softmax(logits, axis=1)


class AlexNet:
    """Thin OO wrapper holding params; mirrors reference AlexNet's role."""

    def __init__(self, params: Params, compute_dtype=jnp.float32):
        self.params = params
        self.compute_dtype = compute_dtype

    @classmethod
    def initialized(cls, seed: int = 0, **kw) -> "AlexNet":
        return cls(init_params(jax.random.PRNGKey(seed)), **kw)

    def __call__(self, x: jax.Array) -> jax.Array:
        return forward(self.params, x, compute_dtype=self.compute_dtype)

    def predict(self, x: jax.Array):
        return predict(self.params, x, compute_dtype=self.compute_dtype)
