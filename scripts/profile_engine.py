"""Break down where encoder+CNN inference time goes on the real chip.

Measures, at the bench batch size (256, already in the compile cache):
  1. host preprocessing (specs_to_endpoints)
  2. device step with per-batch host sync (current engine behavior)
  3. device step fully pipelined (block once at the end)
  4. rasterizer alone / CNN alone
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import random_specs
from svision_tpu.models import alexnet
from svision_tpu.ops import rasterize
from svision_tpu.infer.engine import _device_step

BS = 256
N_BATCH = 16

params = alexnet.init_params(jax.random.PRNGKey(0))
params = jax.tree_util.tree_map(jnp.asarray, params)
specs = random_specs(BS * N_BATCH, seed=0)

t0 = time.perf_counter()
ep, vis, rev = rasterize.specs_to_endpoints(specs)
t_host = time.perf_counter() - t0
print(f"host specs_to_endpoints: {BS*N_BATCH/t_host:.0f} specs/s "
      f"({t_host*1e3:.1f} ms total)")

ep_d = jnp.asarray(ep); vis_d = jnp.asarray(vis); rev_d = jnp.asarray(rev)

# warm up (batch shape BS)
out = _device_step(params, ep_d[:BS], vis_d[:BS], rev_d[:BS])
jax.block_until_ready(out)

# 2. per-batch sync
t0 = time.perf_counter()
for i in range(0, BS * N_BATCH, BS):
    p, s = _device_step(params, ep_d[i:i+BS], vis_d[i:i+BS], rev_d[i:i+BS])
    np.asarray(p); np.asarray(s)
dt = time.perf_counter() - t0
print(f"per-batch sync:   {BS*N_BATCH/dt:.0f} images/s")

# 3. pipelined
t0 = time.perf_counter()
outs = []
for i in range(0, BS * N_BATCH, BS):
    outs.append(_device_step(params, ep_d[i:i+BS], vis_d[i:i+BS], rev_d[i:i+BS]))
jax.block_until_ready(outs)
dt = time.perf_counter() - t0
print(f"pipelined:        {BS*N_BATCH/dt:.0f} images/s")

# 4a. rasterizer alone
rast = jax.jit(lambda e, v, r: rasterize.render_images(e, v, r, dtype=jnp.float32))
img = rast(ep_d[:BS], vis_d[:BS], rev_d[:BS]); jax.block_until_ready(img)
t0 = time.perf_counter()
outs = [rast(ep_d[i:i+BS], vis_d[i:i+BS], rev_d[i:i+BS])
        for i in range(0, BS * N_BATCH, BS)]
jax.block_until_ready(outs)
dt = time.perf_counter() - t0
print(f"rasterizer alone: {BS*N_BATCH/dt:.0f} images/s")

# 4b. CNN alone (bf16)
fwd = jax.jit(lambda p, x: alexnet.forward(p, x, compute_dtype=jnp.bfloat16))
imgs = rast(ep_d[:BS], vis_d[:BS], rev_d[:BS])
o = fwd(params, imgs); jax.block_until_ready(o)
t0 = time.perf_counter()
outs = [fwd(params, imgs) for _ in range(N_BATCH)]
jax.block_until_ready(outs)
dt = time.perf_counter() - t0
print(f"CNN alone:        {BS*N_BATCH/dt:.0f} images/s")
