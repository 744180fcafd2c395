"""One-process shootout of raster formulations at engine shapes.

Measures, inputs resident on device, the scan-chunked fused program
(raster -> folded CNN -> argmax/softmax) for each raster kind and batch
size, plus the raster alone. Single process so the tunnel is attached once.

Usage: python scripts/raster_variants.py [--chunk 32] [--reps 5]
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
from svision_tpu.ops import rasterize
from svision_tpu.utils.jaxcache import enable_persistent_cache


def fused(kind, folded, ep, vis, rev, dtype=jnp.bfloat16):
    if kind == "s2d":
        h = rasterize.render_raster_s2d(ep, vis, rev, dtype=dtype)
        logits = alexnet.forward_s2d(folded, h, compute_dtype=dtype)
    else:
        fn = (rasterize.render_raster if kind == "compare"
              else rasterize.render_raster_einsum)
        raster = fn(ep, vis, rev, dtype=dtype)
        logits = alexnet.forward_raster(folded, raster, compute_dtype=dtype)
    pred = jnp.argmax(logits, axis=1)
    soft = jax.nn.softmax(logits, axis=1)
    return pred, jnp.max(soft, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=32)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--batches", default="128,256")
    args = ap.parse_args()
    enable_persistent_cache()

    params = alexnet.init_params(jax.random.PRNGKey(0))
    folded = {k: jnp.asarray(v)
              for k, v in alexnet.fold_params_bf16(
                  {k: np.asarray(v) for k, v in params.items()}).items()}

    print("device:", jax.devices()[0].device_kind)
    for bs in [int(b) for b in args.batches.split(",")]:
        n = bs * args.chunk
        specs = random_specs(n, seed=0)
        ep, vis, rev = rasterize.specs_to_endpoints(specs)
        ep = jnp.asarray(ep.reshape(args.chunk, bs, 2, 4))
        vis = jnp.asarray(vis.reshape(args.chunk, bs, 2))
        rev = jnp.asarray(rev.reshape(args.chunk, bs, 2))
        jax.block_until_ready(ep)

        for kind in ("einsum", "compare", "s2d"):
            def prog(ep, vis, rev, _kind=kind):
                def body(_, inp):
                    p, s = fused(_kind, folded, *inp)
                    return None, (p, s)
                _, (p, s) = jax.lax.scan(body, None, (ep, vis, rev))
                return p.reshape(-1), s.reshape(-1)
            jprog = jax.jit(prog)
            out = jprog(ep, vis, rev)
            jax.block_until_ready(out)
            best = 0.0
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(jprog(ep, vis, rev))
                best = max(best, n / (time.perf_counter() - t0))
            # raster alone (sum to force; same scan shape)
            def rprog(ep, vis, rev, _kind=kind):
                def body(c, inp):
                    e, v, r = inp
                    if _kind == "s2d":
                        x = rasterize.render_raster_s2d(e, v, r)
                    elif _kind == "compare":
                        x = rasterize.render_raster(e, v, r)
                    else:
                        x = rasterize.render_raster_einsum(e, v, r)
                    return c + x.sum(dtype=jnp.float32), None
                c, _ = jax.lax.scan(body, jnp.float32(0), (ep, vis, rev))
                return c
            jr = jax.jit(rprog)
            jax.block_until_ready(jr(ep, vis, rev))
            rbest = 0.0
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(jr(ep, vis, rev))
                rbest = max(rbest, n / (time.perf_counter() - t0))
            print(f"bs={bs:4d} {kind:8s} fused {best:9.0f} imgs/s   "
                  f"raster-only {rbest:9.0f} imgs/s")


if __name__ == "__main__":
    main()
