"""Model weight loading: TF1 checkpoint conversion + native .npz format.

The reference restores a TF1 3-file checkpoint inside every predict worker
(predict.py:183-184). Here conversion happens once: `convert_tf1_checkpoint`
reads the .ckpt with TensorFlow's checkpoint reader (only needed for conversion,
never at inference) and emits a flat .npz pytree whose keys match
svision_tpu.models.alexnet parameter names ({layer}/weights, {layer}/biases).

`load_params` accepts either format transparently so `-m` keeps working with
the published svision-cnn-model.ckpt.
"""

from __future__ import annotations

import glob
import logging
import os
from typing import Dict

import numpy as np

_PARAM_KEYS = [
    f"{layer}/{kind}"
    for layer in ("conv1", "conv2", "conv3", "conv4", "conv5", "fc6", "fc7", "fc8")
    for kind in ("weights", "biases")
]


def convert_tf1_checkpoint(ckpt_prefix: str) -> Dict[str, np.ndarray]:
    """Read a TF1 `Saver` checkpoint (the published svision-cnn-model.ckpt
    layout) into a flat numpy pytree. Requires tensorflow at call time only."""
    import tensorflow as tf  # local import: conversion-only dependency

    reader = tf.train.load_checkpoint(ckpt_prefix)
    shapes = reader.get_variable_to_shape_map()
    params: Dict[str, np.ndarray] = {}
    for key in _PARAM_KEYS:
        if key in shapes:
            params[key] = np.asarray(reader.get_tensor(key), dtype=np.float32)
        else:
            raise KeyError(
                f"variable '{key}' not found in checkpoint {ckpt_prefix}; "
                f"available: {sorted(shapes)[:20]}...")
    return params


def save_params(params: Dict[str, np.ndarray], path: str) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_params(path: str) -> Dict[str, np.ndarray]:
    """Load weights from .npz (native) or TF1 ckpt prefix (converted on the fly,
    then cached as <prefix>.npz next to it when the directory is writable)."""
    if path.endswith(".npz"):
        if not os.path.exists(path):
            raise FileNotFoundError(f"model weights not found: {path}")
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    npz_cache = path + ".npz"
    if os.path.exists(npz_cache):
        # freshness gate: a ckpt retrained in place must not silently serve
        # the stale converted cache
        cache_mtime = os.path.getmtime(npz_cache)
        ckpt_mtime = max((os.path.getmtime(f) for f in
                          glob.glob(path + ".*") if not f.endswith(".npz")),
                         default=0.0)
        if ckpt_mtime <= cache_mtime:
            with np.load(npz_cache) as z:
                return {k: z[k] for k in z.files}
        logging.getLogger(__name__).info(
            "checkpoint %s is newer than cached %s; reconverting",
            path, npz_cache)
    params = convert_tf1_checkpoint(path)
    try:
        save_params(params, npz_cache)
    except OSError:
        pass
    return params
