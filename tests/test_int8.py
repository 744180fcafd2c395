"""int8 turbo path: quantization correctness + decision concordance.

Also pins the XLA workaround: feature_group_count>1 with int8 operands
miscompiles (observed 64% error vs 1% ungrouped), so forward_raster_int8
splits grouped convs manually.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from svision_tpu.models import alexnet


def _trained_like_params(seed=0):
    """Random params scaled so logits are spread but not saturated."""
    p = alexnet.init_params(jax.random.PRNGKey(seed))
    rng = np.random.RandomState(seed)
    out = {}
    for k, v in p.items():
        v = np.asarray(v)
        if k.endswith("weights"):
            v = v * 0.12
        else:
            v = v + rng.normal(0, 0.05, v.shape).astype(np.float32)
        out[k] = v
    return out


def _random_raster(n, seed=1):
    rng = np.random.RandomState(seed)
    return (rng.uniform(size=(n, 227, 227, 3)) < 0.02).astype(np.float32)


def test_quantize_params_shapes():
    params = _trained_like_params()
    q = alexnet.quantize_params_int8(alexnet.fold_conv1_params(params))
    assert q["conv2/weights"].dtype == np.int8
    assert q["conv2/wscale"].shape == (256,)
    assert q["fc6/weights"].dtype == np.int8
    assert q["fc8/weights"].dtype == np.float32       # fc8 not quantized
    # per-channel scaling reaches the full int8 range
    assert np.abs(q["conv3/weights"]).max(axis=(0, 1, 2)).min() >= 120


def test_int8_grouped_conv_workaround():
    """The manual group split must agree with the f32 grouped conv."""
    rng = np.random.RandomState(0)
    x = rng.uniform(0, 80, (2, 27, 27, 96)).astype(np.float32)
    w = rng.normal(0, 0.05, (5, 5, 48, 256)).astype(np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
        preferred_element_type=jnp.float32)
    sx = np.abs(x).max() / 127.0
    x8 = np.clip(np.round(x / sx), -127, 127).astype(np.int8)
    sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0
    w8 = np.clip(np.round(w / sw), -127, 127).astype(np.int8)

    def one(x, w):
        return jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
    y = jnp.concatenate([one(x8[..., :48], w8[..., :128]),
                         one(x8[..., 48:], w8[..., 128:])], axis=-1)
    got = np.asarray(y, np.float32) * (sw * sx)
    rel = np.abs(got - np.asarray(ref)).max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.03, rel


def test_int8_forward_concordance():
    params = _trained_like_params()
    folded = alexnet.fold_conv1_params(params)
    q = {k: jnp.asarray(v)
         for k, v in alexnet.quantize_params_int8(folded).items()}
    f = {k: jnp.asarray(v) for k, v in folded.items()}
    raster = jnp.asarray(_random_raster(16))
    exact = np.asarray(alexnet.forward_raster(f, raster,
                                              compute_dtype=jnp.float32))
    turbo = np.asarray(alexnet.forward_raster_int8(q, raster))
    assert turbo.shape == exact.shape
    # decisions agree; logits within quantization noise of the spread
    spread = exact.max(1) - exact.min(1)
    assert (turbo.argmax(1) == exact.argmax(1)).mean() >= 0.9
    assert np.abs(turbo - exact).max() <= 0.25 * max(spread.max(), 1.0)


def test_engine_int8_mode():
    from svision_tpu.infer.engine import InferenceEngine
    from svision_tpu.ops import rasterize  # noqa: F401
    params = _trained_like_params()
    e8 = InferenceEngine(params, batch_size=8, int8=True, chunk=2)
    eb = InferenceEngine(params, batch_size=8, chunk=2)
    assert e8.int8 and e8.compute_dtype == jnp.int8
    assert e8.folded_params["conv2/weights"].dtype == jnp.int8
    specs = np.repeat(e8._SENTINEL, 12, 0)
    specs[:, 3] += np.arange(12) * 9
    specs[:, 8] += np.arange(12) * 17
    p8, s8 = e8.predict_specs(specs)
    pb, sb = eb.predict_specs(specs)
    assert p8.shape == (12,)
    assert (p8 == pb).mean() >= 0.9
