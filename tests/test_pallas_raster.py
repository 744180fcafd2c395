"""Pallas rasterizer kernel parity vs the einsum encoder (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np
import jax.numpy as jnp
import pytest

from svision_tpu.ops import pallas_raster, rasterize
from bench import random_specs


def _inputs(n, seed):
    specs = random_specs(n, seed=seed)
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    return jnp.asarray(ep), jnp.asarray(vis), jnp.asarray(rev)


def test_pallas_matches_einsum_raster():
    ep, vis, rev = _inputs(16, seed=9)
    ref = np.asarray(rasterize.render_raster(ep, vis, rev, dtype=jnp.float32))
    got = np.asarray(pallas_raster.render_raster_pallas(
        ep, vis, rev, dtype=jnp.float32, interpret=True))
    assert np.array_equal(ref, got)


def test_pallas_matches_golden_scalar():
    """Against the scalar Bresenham golden encoder (which is itself verified
    pixel-exact vs cv2 in test_rasterize)."""
    specs = random_specs(8, seed=17)
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    got = np.asarray(pallas_raster.render_images_pallas(
        jnp.asarray(ep), jnp.asarray(vis), jnp.asarray(rev),
        dtype=jnp.float32, interpret=True))
    for i in range(specs.shape[0]):
        gold = rasterize.encode_one_numpy(specs[i])
        assert np.array_equal(got[i], gold), f"image {i} differs"


def test_pallas_degenerate_lines():
    """Points, horizontal/vertical lines, full-diagonal, off-canvas clip."""
    specs = np.array([
        # xs1 xe1 ys1 ye1 f1  xs2 xe2 ys2 ye2 f2  rl   fl
        [0, 0, 5, 6, 1, 10, 10, 10, 11, 1, 227, 227],     # two points
        [3, 3, 0, 227, 1, 0, 200, 7, 8, 1, 227, 227],     # vert + horiz
        [0, 226, 0, 227, 1, 226, 0, 0, 227, 0, 227, 227], # diagonals fwd/rev
        [0, 300, 200, 500, 1, 0, 5, 0, 6, 1, 300, 500],   # clipped
    ], dtype=np.int64)
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    ref = np.asarray(rasterize.render_raster(
        jnp.asarray(ep), jnp.asarray(vis), jnp.asarray(rev),
        dtype=jnp.float32))
    got = np.asarray(pallas_raster.render_raster_pallas(
        jnp.asarray(ep), jnp.asarray(vis), jnp.asarray(rev),
        dtype=jnp.float32, interpret=True, block=4))
    assert np.array_equal(ref, got)


def test_fused_conv1_matches_xla_path():
    """ops/fused_conv1: endpoints -> conv1 output must equal
    render_raster_s2d -> XLA conv (interpret mode on CPU; the on-device
    twin ran exact in round 4, docs/PERF.md 4k)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from svision_tpu.ops import rasterize
    from svision_tpu.ops.fused_conv1 import conv1_fused_raster
    from svision_tpu.models import alexnet

    rng = np.random.RandomState(3)
    n = 3
    specs = np.zeros((n, 12), np.int64)
    for i in range(n):
        l1 = rng.randint(50, 900)
        l2 = rng.randint(50, 900)
        xs1, ys1 = rng.randint(0, 200), rng.randint(0, 200)
        xs2, ys2 = rng.randint(200, 600), rng.randint(200, 600)
        specs[i] = [xs1, xs1 + l1, ys1, ys1 + l1, 1,
                    xs2, xs2 - l2, ys2, ys2 + l2, 0, 1200, 1100]
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    ep, vis, rev = jnp.asarray(ep), jnp.asarray(vis), jnp.asarray(rev)
    params = alexnet.init_params(jax.random.PRNGKey(0))
    w_s2d, _ = alexnet.fold_conv1_math(params["conv1/weights"],
                                       params["conv1/biases"], jnp)
    raster = rasterize.render_raster_s2d(ep, vis, rev, dtype=jnp.float32)
    ref = jax.lax.conv_general_dilated(
        raster, w_s2d.astype(jnp.float32), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = conv1_fused_raster(ep, vis, rev, w_s2d.astype(jnp.float32),
                             interpret=True)
    assert np.abs(np.asarray(ref) - np.asarray(got)).max() < 1e-4
