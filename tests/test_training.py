"""Training pipeline: loss decreases and the model learns a separable
synthetic task (forward vs reverse segment pairs)."""

import numpy as np
import pytest

import jax

from svision_tpu.models import alexnet
from svision_tpu.models.train import evaluate, fit


def _labeled_specs(n, seed=0):
    """Class 0: two forward colinear-ish segments. Class 2 (INV-like): second
    segment reversed — distinguishable via the inversion channel."""
    rng = np.random.RandomState(seed)
    specs = np.zeros((n, 12), dtype=np.int64)
    labels = np.zeros(n, dtype=np.int32)
    for i in range(n):
        inv = i % 2 == 1
        L1 = rng.randint(60, 100)
        L2 = rng.randint(60, 100)
        specs[i] = [0, 0, 0, L1, 1,
                    L1 + 5, 0, L1 + 20, L1 + 20 + L2, 0 if inv else 1,
                    227, 227]
        labels[i] = 2 if inv else 0
    return specs, labels


@pytest.mark.slow
def test_fit_learns_separable_task():
    specs, labels = _labeled_specs(48, seed=1)
    params = alexnet.init_params(jax.random.PRNGKey(0))
    acc0 = evaluate(params, specs, labels, batch_size=16)
    params, history = fit(params, specs, labels, epochs=6, batch_size=16,
                          seed=1, learning_rate=0.02, keep_prob=1.0,
                          augment=False)
    acc1 = evaluate(params, specs, labels, batch_size=16)
    assert history[-1] < history[0], history
    assert acc1 >= max(acc0, 0.9), (acc0, acc1, history)


def test_train_cli_roundtrip(tmp_path):
    from svision_tpu.models.train import main as train_main
    from svision_tpu.models.checkpoint import load_params
    specs, labels = _labeled_specs(16, seed=2)
    data = tmp_path / "data.npz"
    np.savez(data, specs=specs, labels=labels)
    out = tmp_path / "w.npz"
    train_main(["--data", str(data), "-o", str(out), "--epochs", "1",
                "--batch-size", "8"])
    params = load_params(str(out))
    assert params["fc8/weights"].shape == (4096, 5)


def test_jitter_endpoints_np_and_jax_stay_on_canvas():
    from svision_tpu.models.train import (jitter_endpoints_jax,
                                          jitter_endpoints_np)
    from svision_tpu.ops import rasterize
    specs, _ = _labeled_specs(8, seed=3)
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    out_np = jitter_endpoints_np(ep, np.random.RandomState(0))
    out_jx = np.asarray(jitter_endpoints_jax(
        __import__("jax.numpy", fromlist=["asarray"]).asarray(ep),
        jax.random.PRNGKey(0)))
    for out in (out_np, out_jx):
        assert out.shape == ep.shape and out.dtype == ep.dtype
        assert out.min() >= 0 and out.max() <= rasterize.CANVAS - 1
        # bounded perturbation: translation <=10 + jitter <=2
        assert np.abs(out.astype(int) - ep.astype(int)).max() <= 12
    # augmented images still render
    import jax.numpy as jnp
    imgs = rasterize.render_images_jit(jnp.asarray(out_np),
                                       jnp.asarray(vis), jnp.asarray(rev))
    assert imgs.shape == (8, 227, 227, 3)


@pytest.mark.slow
def test_fit_device_augmented_runs():
    """fit_device with augment=True (the on-device jitter+flip path inside
    the scanned step) compiles and trains on CPU."""
    from svision_tpu.models.train import fit_device
    specs, labels = _labeled_specs(16, seed=2)
    params = alexnet.init_params(jax.random.PRNGKey(0))
    params, history = fit_device(params, specs, labels, epochs=2,
                                 batch_size=8, seed=1, learning_rate=0.01,
                                 keep_prob=1.0, augment=True)
    assert len(history) == 2 and np.isfinite(history).all()


def test_forward_train_s2d_matches_image_path():
    """forward_train_s2d (differentiable fold, s2d raster) must match
    forward_train (normalized images) in f32 — logits and conv1 grads."""
    import jax
    import jax.numpy as jnp
    from svision_tpu.models.train import forward_train, forward_train_s2d
    from svision_tpu.ops import rasterize

    specs, labels = _labeled_specs(8, seed=5)
    params = alexnet.init_params(jax.random.PRNGKey(0))
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    images = rasterize.render_images_jit(jnp.asarray(ep), jnp.asarray(vis),
                                         jnp.asarray(rev))
    raster = rasterize.render_raster_s2d(jnp.asarray(ep), jnp.asarray(vis),
                                         jnp.asarray(rev), dtype=jnp.float32)
    rng = jax.random.PRNGKey(3)
    la = forward_train(params, images, rng, keep_prob=1.0)
    lb = forward_train_s2d(params, raster, rng, keep_prob=1.0)
    assert np.allclose(np.asarray(la), np.asarray(lb), atol=2e-3), \
        np.abs(np.asarray(la) - np.asarray(lb)).max()

    def loss_img(p):
        lo = forward_train(p, images, rng, keep_prob=1.0)
        return jnp.mean((lo - 1.0) ** 2)

    def loss_s2d(p):
        lo = forward_train_s2d(p, raster, rng, keep_prob=1.0)
        return jnp.mean((lo - 1.0) ** 2)

    ga = jax.grad(loss_img)(params)["conv1/weights"]
    gb = jax.grad(loss_s2d)(params)["conv1/weights"]
    # the fold is linear, so gradients map back exactly (up to f32 assoc)
    denom = max(float(jnp.abs(ga).max()), 1e-9)
    rel = float(jnp.abs(ga - gb).max()) / denom
    assert rel < 5e-3, rel


@pytest.mark.slow
def test_fit_device_s2d_equals_image_path():
    """The s2d device trainer (differentiable fold) follows the SAME
    optimization trajectory as the image-space path: per-epoch losses
    match closely under identical seeds/config — the fold is exact up to
    f32 reassociation, so the two are the same training run."""
    from svision_tpu.models.train import fit_device
    specs, labels = _labeled_specs(32, seed=1)
    histories = []
    for s2d in (False, True):
        params = alexnet.init_params(jax.random.PRNGKey(0))
        _, history = fit_device(params, specs, labels, epochs=3,
                                batch_size=16, seed=1, learning_rate=0.01,
                                keep_prob=1.0, augment=False, s2d=s2d)
        histories.append(np.asarray(history))
    a, b = histories
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.allclose(a, b, rtol=0.15), (a, b)


def test_fragment_endpoints_preserves_line_and_gap():
    """Split sub-segments stay on the parent line with a visible gap, and
    unsplit rows pass through with an invisible padding slot."""
    import jax
    import jax.numpy as jnp
    from svision_tpu.models.train import fragment_endpoints_jax
    ep = jnp.array([[[10, 10, 210, 210],       # long diagonal: splittable
                     [5, 100, 9, 104]]],       # major=4 < 12: never split
                   jnp.int32)
    vis = jnp.ones((1, 2), bool)
    rev = jnp.zeros((1, 2), bool)
    ep2, vis2, rev2 = fragment_endpoints_jax(ep, vis, rev,
                                             jax.random.PRNGKey(0),
                                             split_prob=1.0)
    assert ep2.shape == (1, 4, 4) and vis2.shape == (1, 4)
    assert bool(vis2[0, 0]) and bool(vis2[0, 1])
    assert not bool(vis2[0, 3])                # short segment: no split
    assert bool(vis2[0, 2])                    # long segment: split
    c0, r0, c1, r1 = (int(x) for x in ep2[0, 0])
    c2, r2, c3, r3 = (int(x) for x in ep2[0, 2])
    assert (c0, r0) == (10, 10) and (c3, r3) == (210, 210)
    assert c2 - c1 >= 2                        # the gap
    for c, r in [(c1, r1), (c2, r2)]:          # midpoints on the diagonal
        assert abs((r - 10) - (c - 10)) <= 1


def test_fit_device_noise_aug_runs():
    """fit_device with the raster-noise augmentation (fragmentation +
    pixel dropout) compiles and trains."""
    from svision_tpu.models.train import fit_device
    specs, labels = _labeled_specs(16, seed=2)
    params = alexnet.init_params(jax.random.PRNGKey(0))
    params, history = fit_device(params, specs, labels, epochs=2,
                                 batch_size=8, seed=1, learning_rate=0.01,
                                 keep_prob=1.0, augment=True,
                                 noise_aug=True)
    assert len(history) == 2 and np.isfinite(history).all()
