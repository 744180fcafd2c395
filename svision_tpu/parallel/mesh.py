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

from svision_tpu.models import alexnet
from svision_tpu.ops import rasterize


def make_mesh(n_devices: Optional[int] = None, model_axis: int = 1) -> Mesh:
    """1- or 2-axis mesh over local devices: ('data',) or ('data','model')."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if model_axis > 1:
        assert n % model_axis == 0, (n, model_axis)
        arr = np.array(devs).reshape(n // model_axis, model_axis)
        return Mesh(arr, ("data", "model"))
    return Mesh(np.array(devs), ("data",))


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


class ShardedInference:
    """Data-parallel encoder+CNN forward over a mesh.

    Batch rows are sharded on 'data'; params replicated. One jit program,
    reused across all batches of a run.
    """

    def __init__(self, params, mesh: Mesh, batch_size: int = 128,
                 bf16: bool = True, fast: bool = True, chunk: int = 8):
        self.mesh = mesh
        self.batch_size = batch_size
        self.chunk = chunk
        self.compute_dtype = jnp.bfloat16 if bf16 else jnp.float32
        self.fast = fast and bf16
        if self.fast:
            # same host fold + bf16 pre-cast as InferenceEngine (shared
            # helper: numerics cannot drift between the two paths)
            params = alexnet.fold_params_bf16(params)
        self.params = replicate_params(params, mesh)
        # batch rows sharded over 'data' within each scanned chunk
        data_sharding = NamedSharding(mesh, P(None, "data"))
        repl = NamedSharding(mesh, P())

        def step(params, endpoints, visible, reverse):
            if self.fast:
                raster = rasterize.render_raster(endpoints, visible, reverse,
                                                 dtype=self.compute_dtype)
                logits = alexnet.forward_raster(params, raster,
                                                compute_dtype=self.compute_dtype)
            else:
                images = rasterize.render_images(endpoints, visible, reverse,
                                                 dtype=jnp.float32)
                logits = alexnet.forward(params, images,
                                         compute_dtype=self.compute_dtype)
            pred = jnp.argmax(logits, axis=1)
            soft = jax.nn.softmax(logits, axis=1)
            return pred, jnp.max(soft, axis=1)  # == soft[argmax], no gather

        def step_many(params, endpoints, visible, reverse):
            # [C,B,...] -> ([C*B], [C*B]); one dispatch per super-chunk
            def body(_, inp):
                p, s = step(params, *inp)
                return None, (p, s)
            _, (preds, softs) = jax.lax.scan(
                body, None, (endpoints, visible, reverse))
            return preds.reshape(-1), softs.reshape(-1)

        self._step = jax.jit(
            step_many,
            in_shardings=(jax.tree_util.tree_map(lambda _: repl, self.params),
                          data_sharding, data_sharding, data_sharding),
            out_shardings=(NamedSharding(mesh, P("data")),) * 2)

    def predict_specs(self, specs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        n = specs.shape[0]
        if n == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.float32)
        data_axis = self.mesh.shape["data"]
        bs = max(self.batch_size, data_axis)
        super_bs = bs * self.chunk
        pad = (-n) % super_bs
        if pad:
            sentinel = np.array([[0, 1, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2]],
                                dtype=np.int64)
            specs = np.concatenate([specs, np.repeat(sentinel, pad, 0)], 0)
        ep, vis, rev = rasterize.specs_to_endpoints(specs)
        outs = []
        for i in range(0, specs.shape[0], super_bs):
            c = self.chunk
            outs.append(self._step(
                self.params,
                jnp.asarray(ep[i:i + super_bs].reshape(c, bs, *ep.shape[1:])),
                jnp.asarray(vis[i:i + super_bs].reshape(c, bs, *vis.shape[1:])),
                jnp.asarray(rev[i:i + super_bs].reshape(c, bs, *rev.shape[1:]))))
        preds = np.concatenate([np.asarray(p) for p, _ in outs])
        softs = np.concatenate([np.asarray(s) for _, s in outs])
        return preds[:n], softs[:n]


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
