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
