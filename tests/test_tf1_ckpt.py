"""TF1 checkpoint conversion: create a real TF1 `Saver` checkpoint with the
reference's variable naming (alexnet.py:115-116,144-145) and load it through
svision_tpu's converter."""

import os
import subprocess
import sys

import numpy as np
import pytest

_GEN = r"""
import sys
import numpy as np
import tensorflow.compat.v1 as tf
tf.disable_eager_execution()

out_prefix = sys.argv[1]
rng = np.random.RandomState(7)
shapes = {
    "conv1": [(11, 11, 3, 96), (96,)],
    "conv2": [(5, 5, 48, 256), (256,)],
    "conv3": [(3, 3, 256, 384), (384,)],
    "conv4": [(3, 3, 192, 384), (384,)],
    "conv5": [(3, 3, 192, 256), (256,)],
    "fc6": [(9216, 4096), (4096,)],
    "fc7": [(4096, 4096), (4096,)],
    "fc8": [(4096, 5), (5,)],
}
g = tf.Graph()
with g.as_default():
    for layer, (ws, bs) in shapes.items():
        with tf.variable_scope(layer):
            tf.get_variable("weights", initializer=rng.randn(*ws).astype(np.float32))
            tf.get_variable("biases", initializer=rng.randn(*bs).astype(np.float32))
    saver = tf.train.Saver()
    with tf.Session() as sess:
        sess.run(tf.global_variables_initializer())
        saver.save(sess, out_prefix)
print("saved")
"""


@pytest.mark.slow
def test_convert_tf1_checkpoint(tmp_path):
    prefix = str(tmp_path / "model.ckpt")
    gen = tmp_path / "gen_ckpt.py"
    gen.write_text(_GEN)
    try:
        proc = subprocess.run([sys.executable, str(gen), prefix],
                              capture_output=True, text=True, timeout=900)
    except subprocess.TimeoutExpired:
        pytest.skip("TF checkpoint generation too slow on this host")
    assert "saved" in proc.stdout, proc.stderr[-2000:]
    assert os.path.exists(prefix + ".index")

    from svision_tpu.models.checkpoint import load_params
    params = load_params(prefix)
    assert params["conv1/weights"].shape == (11, 11, 3, 96)
    assert params["conv2/weights"].shape == (5, 5, 48, 256)
    assert params["fc8/biases"].shape == (5,)
    # conversion is cached as .npz and the cache loads identically
    assert os.path.exists(prefix + ".npz")
    cached = load_params(prefix + ".npz")
    for k in params:
        np.testing.assert_array_equal(params[k], cached[k])

    # the converted pytree drives the JAX model
    import jax.numpy as jnp
    from svision_tpu.models import alexnet
    logits = alexnet.forward(
        {k: jnp.asarray(v) for k, v in params.items()},
        jnp.zeros((1, 227, 227, 3), jnp.float32))
    assert logits.shape == (1, 5)
