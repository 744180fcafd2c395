"""Roofline breakdown of the fused encoder+CNN program on the real device.

Times cumulative prefixes of the fast-path program (raster -> conv sections
-> fc head) with inputs resident on device, so section costs = successive
differences (fusion across a cut is lost, so sums slightly exceed the full
program). Also reports XLA's FLOP estimate per prefix and the implied
MXU utilization against the chip's bf16 peak.

Usage: python scripts/roofline.py [--batch 1024] [--reps 20]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import random_specs
from svision_tpu.models import alexnet
from svision_tpu.models.alexnet import (_backbone, _maxpool, _space_to_depth,
                                        lrn, _CONV_SPECS, _FC_SPECS)
from svision_tpu.ops import rasterize
from svision_tpu.utils.jaxcache import enable_persistent_cache

V5E_BF16_PEAK = 197e12  # FLOP/s, one v5e chip
V5E_HBM_BW = 819e9      # B/s


def build_prefix(folded, n_convs, with_fc, dtype=jnp.bfloat16):
    """Program: raster -> s2d -> first n_convs conv sections [-> fc head]."""

    def run(ep, vis, rev):
        raster = rasterize.render_raster(ep, vis, rev, dtype=dtype)
        if n_convs == 0 and not with_fc:
            return raster.sum(dtype=jnp.float32)
        h = _space_to_depth(raster)
        for i, (name, _, _, _, stride, padding, groups) in enumerate(
                _CONV_SPECS):
            if i >= n_convs:
                break
            w = folded[f"{name}/weights"].astype(dtype)
            b = folded[f"{name}/biases"].astype(dtype)
            if name == "conv1":
                stride, padding = 1, "VALID"
            h = jax.lax.conv_general_dilated(
                h, w, window_strides=(stride, stride), padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=groups, preferred_element_type=dtype)
            h = jax.nn.relu(h + b)
            if name in ("conv1", "conv2"):
                h = _maxpool(h)
                h = lrn(h)
            elif name == "conv5":
                h = _maxpool(h)
        if not with_fc:
            return h.sum(dtype=jnp.float32)
        h = h.reshape(h.shape[0], -1)
        for name, _, _ in _FC_SPECS:
            w = folded[f"{name}/weights"].astype(dtype)
            b = folded[f"{name}/biases"].astype(
                jnp.float32 if name == "fc8" else dtype)
            acc = jnp.float32 if name == "fc8" else dtype
            h = jnp.dot(h, w, preferred_element_type=acc) + b
            if name != "fc8":
                h = jax.nn.relu(h)
        pred = jnp.argmax(h, axis=1)
        soft = jax.nn.softmax(h, axis=1)
        return pred.sum() + jnp.max(soft, axis=1).sum()

    return jax.jit(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    enable_persistent_cache()
    params = alexnet.init_params(jax.random.PRNGKey(0))
    host = {k: np.asarray(v) for k, v in params.items()}
    folded = {k: jnp.asarray(v)
              for k, v in alexnet.fold_params_bf16(host).items()}

    specs = random_specs(args.batch, seed=0)
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    ep = jnp.asarray(ep)
    vis = jnp.asarray(vis)
    rev = jnp.asarray(rev)
    jax.block_until_ready((ep, vis, rev))

    stages = [("raster", 0, False), ("+conv1blk", 1, False),
              ("+conv2blk", 2, False), ("+conv3", 3, False),
              ("+conv4", 4, False), ("+conv5+pool", 5, False),
              ("+fc/head (full)", 5, True)]

    prev_t = 0.0
    print(f"batch={args.batch} reps={args.reps} "
          f"device={jax.devices()[0].device_kind}")
    for label, n_convs, with_fc in stages:
        fn = build_prefix(folded, n_convs, with_fc)
        lowered = fn.lower(ep, vis, rev)
        compiled = lowered.compile()
        try:
            flops = compiled.cost_analysis()["flops"]
        except Exception:
            flops = float("nan")
        out = fn(ep, vis, rev)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                out = fn(ep, vis, rev)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.reps)
        sec_ms = (best - prev_t) * 1e3
        util = flops / best / V5E_BF16_PEAK * 100
        print(f"{label:18s} cum {best*1e3:8.2f} ms  sec {sec_ms:8.2f} ms  "
              f"imgs/s {args.batch/best:9.0f}  xla_flops {flops/1e9:7.2f}G  "
              f"MXU-util {util:5.1f}%")
        prev_t = best


if __name__ == "__main__":
    main()
