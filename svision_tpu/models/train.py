"""Training step for the similarity-image CNN.

The reference repo ships inference only (the published checkpoint was trained
offline); a complete framework needs the training path too: softmax
cross-entropy over the 5 SV classes with the reference's dropout placement
(alexnet.py:51-55, keep_prob fed at predict time as 1.0, predict.py:22).

The step is mesh-shardable: batch on 'data', fc6/fc7 tensor-parallel on
'model' (see parallel.mesh.shard_params_tp); under `jax.jit` the GSPMD
partitioner inserts the gradient psums and the fc7 row-parallel reduction.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from svision_tpu.models import alexnet

Params = Dict[str, jax.Array]


def forward_train(params: Params, x: jax.Array, rng: jax.Array,
                  keep_prob: float = 0.5, compute_dtype=jnp.float32):
    """AlexNet forward with dropout after fc6/fc7 (alexnet.py:48-58)."""
    h = x.astype(compute_dtype)
    for name, _, _, _, stride, padding, groups in alexnet._CONV_SPECS:
        w = params[f"{name}/weights"].astype(compute_dtype)
        b = params[f"{name}/biases"].astype(jnp.float32)
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups, preferred_element_type=jnp.float32)
        h = jax.nn.relu(h + b)
        if name in ("conv1", "conv2"):
            h = alexnet._maxpool(h)
            h = alexnet.lrn(h)
        elif name == "conv5":
            h = alexnet._maxpool(h)
        h = h.astype(compute_dtype)
    h = h.reshape(h.shape[0], -1)
    rngs = jax.random.split(rng, 2)
    for i, (name, _, _) in enumerate(alexnet._FC_SPECS):
        w = params[f"{name}/weights"].astype(compute_dtype)
        b = params[f"{name}/biases"].astype(jnp.float32)
        h = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        if name != "fc8":
            h = jax.nn.relu(h)
            keep = jax.random.bernoulli(rngs[i], keep_prob, h.shape)
            h = jnp.where(keep, h / keep_prob, 0.0).astype(compute_dtype)
    return h


def loss_fn(params: Params, images: jax.Array, labels: jax.Array,
            rng: jax.Array, keep_prob: float = 0.5,
            compute_dtype=jnp.float32) -> jax.Array:
    logits = forward_train(params, images, rng, keep_prob, compute_dtype)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(ce)


def make_train_step(optimizer=None, keep_prob: float = 0.5,
                    compute_dtype=jnp.float32):
    """Returns (init_state, train_step). train_step is jit-ready and
    shardable: jit it with mesh shardings for multi-chip DP/TP."""
    if optimizer is None:
        optimizer = optax.sgd(1e-3, momentum=0.9)

    def init_state(params: Params):
        return optimizer.init(params)

    def train_step(params: Params, opt_state, images, labels, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, labels, rng, keep_prob, compute_dtype)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_state, train_step
