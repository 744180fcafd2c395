"""AlexNet forward parity vs the reference TF graph (SURVEY.md §4(2)).

Builds the reference TF1-style graph (TF2 compat mode) with fixed random
weights, runs both models on the same batch, and requires logits agreement to
1e-4 and exact argmax.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from svision_tpu.models import alexnet


def _rand_params(seed=0, num_classes=5):
    rng = np.random.RandomState(seed)
    params = {}
    in_ch = 3
    for name, kh, kw, out_ch, _, _, groups in alexnet._CONV_SPECS:
        params[f"{name}/weights"] = rng.randn(kh, kw, in_ch // groups, out_ch).astype(np.float32) * 0.01
        params[f"{name}/biases"] = rng.randn(out_ch).astype(np.float32) * 0.01
        in_ch = out_ch
    for name, n_in, n_out in alexnet._FC_SPECS:
        params[f"{name}/weights"] = rng.randn(n_in, n_out).astype(np.float32) * 0.001
        params[f"{name}/biases"] = rng.randn(n_out).astype(np.float32) * 0.01
    return params


def _tf_reference_forward(params, x):
    """Reference network rebuilt with TF ops (mirrors src/network/alexnet.py:26-58)."""
    import tensorflow as tf

    def conv(h, name, stride, padding, groups):
        w = tf.constant(params[f"{name}/weights"])
        b = tf.constant(params[f"{name}/biases"])
        if groups == 1:
            out = tf.nn.conv2d(h, w, strides=[1, stride, stride, 1], padding=padding)
        else:
            hs = tf.split(h, groups, axis=3)
            ws = tf.split(w, groups, axis=3)
            out = tf.concat([tf.nn.conv2d(i, k, strides=[1, stride, stride, 1], padding=padding)
                             for i, k in zip(hs, ws)], axis=3)
        return tf.nn.relu(tf.nn.bias_add(out, b))

    def pool(h):
        return tf.nn.max_pool2d(h, ksize=3, strides=2, padding="VALID")

    def lrn(h):
        return tf.nn.local_response_normalization(h, depth_radius=2, alpha=2e-5,
                                                  beta=0.75, bias=1.0)

    h = tf.constant(x)
    h = lrn(pool(conv(h, "conv1", 4, "VALID", 1)))
    h = lrn(pool(conv(h, "conv2", 1, "SAME", 2)))
    h = conv(h, "conv3", 1, "SAME", 1)
    h = conv(h, "conv4", 1, "SAME", 2)
    h = pool(conv(h, "conv5", 1, "SAME", 2))
    h = tf.reshape(h, [-1, 6 * 6 * 256])
    for name in ("fc6", "fc7", "fc8"):
        w = tf.constant(params[f"{name}/weights"])
        b = tf.constant(params[f"{name}/biases"])
        h = tf.matmul(h, w) + b
        if name != "fc8":
            h = tf.nn.relu(h)
    return h.numpy()


@pytest.fixture(scope="module")
def batch():
    rng = np.random.RandomState(1)
    img = rng.choice([0.0, 255.0], size=(4, 227, 227, 3), p=[0.97, 0.03]).astype(np.float32)
    img -= np.array(alexnet.IMAGE_MEAN, dtype=np.float32)
    return img


def test_forward_matches_tf(batch):
    params = _rand_params()
    got = np.asarray(alexnet.forward(params, jnp.asarray(batch)))
    want = _tf_reference_forward(params, batch)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    assert (got.argmax(1) == want.argmax(1)).all()


def test_predict_triple(batch):
    params = _rand_params()
    logits, argmax, softmax = alexnet.predict(params, jnp.asarray(batch))
    assert logits.shape == (4, 5)
    np.testing.assert_array_equal(np.asarray(argmax), np.asarray(logits).argmax(1))
    np.testing.assert_allclose(np.asarray(softmax).sum(1), 1.0, atol=1e-5)


def test_lrn_matches_tf():
    import tensorflow as tf
    x = np.random.RandomState(2).randn(2, 5, 5, 96).astype(np.float32)
    got = np.asarray(alexnet.lrn(jnp.asarray(x)))
    want = tf.nn.local_response_normalization(
        tf.constant(x), depth_radius=2, alpha=2e-5, beta=0.75, bias=1.0).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bf16_forward_argmax_stable(batch):
    params = _rand_params()
    f32 = np.asarray(alexnet.forward(params, jnp.asarray(batch)))
    bf16 = np.asarray(alexnet.forward(params, jnp.asarray(batch),
                                      compute_dtype=jnp.bfloat16))
    assert bf16.dtype == np.float32
    # bf16 path must agree on decisions for well-separated logits
    assert (f32.argmax(1) == bf16.argmax(1)).all()


def test_fast_path_parity(batch):
    """Space-to-depth conv1 + normalization folding (fold_conv1_params /
    forward_raster) vs the exact path: f32 logits within cancellation noise,
    argmax identical."""
    params = _rand_params(seed=4)
    folded = alexnet.fold_conv1_params(params)
    raster = (batch + np.array(alexnet.IMAGE_MEAN, np.float32)) / 255.0
    exact = np.asarray(alexnet.forward(params, jnp.asarray(batch),
                                       compute_dtype=jnp.float32))
    fast = np.asarray(alexnet.forward_raster(folded, jnp.asarray(raster),
                                             compute_dtype=jnp.float32))
    np.testing.assert_allclose(fast, exact, rtol=1e-3, atol=1e-3)
    assert (fast.argmax(1) == exact.argmax(1)).all()


def test_fold_conv1_exact_on_conv():
    """The folded conv1 itself reproduces conv(255*b - mean) to f32 accuracy."""
    params = _rand_params(seed=5)
    folded = alexnet.fold_conv1_params(params)
    rng = np.random.RandomState(6)
    raster = rng.choice([0.0, 1.0], size=(2, 227, 227, 3), p=[0.97, 0.03]).astype(np.float32)
    img = raster * 255.0 - np.array(alexnet.IMAGE_MEAN, np.float32)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(img), jnp.asarray(params["conv1/weights"]), (4, 4), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["conv1/biases"]
    got = jax.lax.conv_general_dilated(
        alexnet._space_to_depth(jnp.asarray(raster)),
        jnp.asarray(folded["conv1/weights"]), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + folded["conv1/biases"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_checkpoint_roundtrip(tmp_path):
    from svision_tpu.models import checkpoint
    params = _rand_params(seed=3)
    p = tmp_path / "w.npz"
    checkpoint.save_params(params, str(p))
    back = checkpoint.load_params(str(p))
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(back[k], params[k])
