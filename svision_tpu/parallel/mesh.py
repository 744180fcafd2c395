"""Device mesh + sharded inference/reduction.

The reference's only parallelism is process pools joined through files
(SVision:261-323, §2.3 of SURVEY.md). Here:
  * inference is data-parallel over a `jax.sharding.Mesh`: CNN params
    replicated, candidate batches sharded on the 'data' axis; XLA inserts the
    collectives (none needed for pure DP forward)
  * the pipeline's single global reduction — QUAL score min/max across shards
    (SVision:330-334) — is a jnp min/max over a mesh-sharded score vector,
    replacing the reference's score-file scan
  * fc6/fc7 of the CNN can be tensor-parallel over a 'model' axis (used by the
    training step in parallel/train.py); inference keeps them replicated
    since AlexNet fits trivially per chip
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    """1- or 2-axis mesh over local devices: ('data',) or ('data','model').

    LOCAL devices only: under a multi-process jax.distributed runtime each
    process runs its own engine over its own chips (genome-axis sharding is
    the cross-process parallelism); a global mesh would make host batches
    non-addressable."""
    devs = jax.local_devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if model_axis > 1:
        assert n % model_axis == 0, (n, model_axis)
        arr = np.array(devs).reshape(n // model_axis, model_axis)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.array(devs), ("data",))


def resolve_mesh(spec: str = "auto") -> Optional[Mesh]:
    """CLI --mesh flag -> Mesh or None (single-device).

    'auto' = all local devices when more than one is attached; 'none'/'1'
    force the single-device engine; an integer uses that many devices."""
    if spec is None or str(spec).lower() in ("none", "0", "1"):
        return None
    avail = len(jax.local_devices())
    n = avail if str(spec) == "auto" else int(spec)
    if n <= 1:
        return None
    if n > avail:
        raise ValueError(f"--mesh {spec}: only {avail} local devices attached")
    return make_mesh(n)


def replicate_params(params, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), params)


def shard_params_tp(params, mesh: Mesh):
    """Tensor-parallel placement: fc6 column-sharded, fc7 row-sharded over
    'model'; everything else replicated. XLA inserts the fc7 psum."""
    placed = {}
    for k, v in params.items():
        if k == "fc6/weights":
            spec = P(None, "model")
        elif k == "fc6/biases":
            spec = P("model")
        elif k == "fc7/weights":
            spec = P("model", None)
        else:
            spec = P()
        placed[k] = jax.device_put(jnp.asarray(v), NamedSharding(mesh, spec))
    return placed


def ShardedInference(params, mesh: Mesh, batch_size: int = 128,
                     bf16: bool = True, fast: bool = True, chunk: int = 8):
    """Data-parallel encoder+CNN forward over a mesh: the mesh-aware
    InferenceEngine (batch rows sharded on 'data', params replicated — the
    engine owns all tail/chunk/warmup logic, so the single- and multi-device
    paths cannot drift)."""
    from svision_tpu.infer.engine import InferenceEngine
    return InferenceEngine(params, batch_size=batch_size, bf16=bf16,
                           fast=fast, chunk=chunk, mesh=mesh)


def global_score_minmax(local_scores: np.ndarray, mesh: Mesh
                        ) -> Tuple[float, float]:
    """Global min/max of per-shard QUAL scores via an on-device reduction —
    the all-gather replacing cal_scores_max_min's file scan (SVision:330-334).

    Under a multi-host runtime each process passes its own shard; with a
    single process this degenerates to a device-local reduce."""
    if local_scores.size == 0:
        return float("inf"), float("-inf")

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
    def reduce(x):
        return jnp.stack([jnp.min(x), jnp.max(x)])

    lo, hi = np.asarray(reduce(jnp.asarray(local_scores, jnp.float32)))
    return float(lo), float(hi)
