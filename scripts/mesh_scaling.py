"""Batch-throughput scaling curve of data-parallel inference over a device
mesh (VERDICT r1 item 1). Run on real multi-chip hardware as-is; defaults to
the virtual 8-device CPU mesh when only one real device is attached:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/mesh_scaling.py

Prints one JSON line per mesh size: images/s and efficiency vs 1 device.
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64,
                    help="per-device batch size (global batch scales with "
                    "the mesh, weak-scaling style)")
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--n", type=int, default=4096,
                    help="specs per measured repetition")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--exact", action="store_true",
                    help="f32 path (CPU meshes have no bf16 units)")
    args = ap.parse_args()

    import jax
    from svision_tpu.infer.engine import InferenceEngine
    from svision_tpu.models import alexnet
    from svision_tpu.parallel.mesh import make_mesh

    sys.path.insert(0, ROOT)
    from bench import random_specs

    n_dev = len(jax.devices())
    params = alexnet.init_params(jax.random.PRNGKey(0))
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base = None
    for d in sizes:
        mesh = make_mesh(d) if d > 1 else None
        engine = InferenceEngine(params, batch_size=args.batch * d,
                                 bf16=not args.exact, chunk=args.chunk,
                                 mesh=mesh)
        specs = random_specs(args.n, seed=0)
        engine.predict_specs(specs)          # compile + warm
        best = 0.0
        for _ in range(args.reps):
            t0 = time.perf_counter()
            engine.predict_specs(specs)
            best = max(best, args.n / (time.perf_counter() - t0))
        if base is None:
            base = best
        print(json.dumps({
            "devices": d, "images_per_s": round(best, 1),
            "speedup": round(best / base, 3),
            "efficiency": round(best / base / d, 3),
            "platform": jax.devices()[0].platform,
        }))


if __name__ == "__main__":
    main()
