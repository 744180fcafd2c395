"""Training step for the similarity-image CNN.

The reference repo ships inference only (the published checkpoint was trained
offline); a complete framework needs the training path too: softmax
cross-entropy over the 5 SV classes with the reference's dropout placement
(alexnet.py:51-55, keep_prob fed at predict time as 1.0, predict.py:22).

The step is mesh-shardable: batch on 'data', fc6/fc7 tensor-parallel on
'model' (see parallel.mesh.shard_params_tp); under `jax.jit` the GSPMD
partitioner inserts the gradient psums and the fc7 row-parallel reduction.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from svision_tpu.models import alexnet

Params = Dict[str, jax.Array]


def forward_train(params: Params, x: jax.Array, rng: jax.Array,
                  keep_prob: float = 0.5, compute_dtype=jnp.float32):
    """AlexNet forward with dropout after fc6/fc7 (alexnet.py:48-58).

    Intermediate dtype follows compute_dtype (same policy as
    alexnet._backbone): a bf16 input conv with a forced-f32 output breaks
    under grad — the conv transpose rule requires the f32 cotangent and the
    bf16 operand to share a dtype. fc8 keeps f32 logits for the loss."""
    inter = jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
    h = x.astype(compute_dtype)
    for name, _, _, _, stride, padding, groups in alexnet._CONV_SPECS:
        w = params[f"{name}/weights"].astype(compute_dtype)
        b = params[f"{name}/biases"].astype(inter)
        h = jax.lax.conv_general_dilated(
            h, w, window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups, preferred_element_type=inter)
        h = jax.nn.relu(h + b)
        if name in ("conv1", "conv2"):
            h = alexnet._maxpool(h)
            h = alexnet.lrn(h)
        elif name == "conv5":
            h = alexnet._maxpool(h)
        h = h.astype(compute_dtype)
    h = h.reshape(h.shape[0], -1)
    rngs = jax.random.split(rng, 2)
    for i, (name, _, _) in enumerate(alexnet._FC_SPECS):
        w = params[f"{name}/weights"].astype(compute_dtype)
        if name == "fc8":
            b = params[f"{name}/biases"].astype(jnp.float32)
            h = jnp.dot(h.astype(jnp.float32), w.astype(jnp.float32)) + b
        else:
            b = params[f"{name}/biases"].astype(inter)
            h = jnp.dot(h, w, preferred_element_type=inter) + b
            h = jax.nn.relu(h)
            keep = jax.random.bernoulli(rngs[i], keep_prob, h.shape)
            h = jnp.where(keep, h / keep_prob,
                          jnp.zeros((), inter)).astype(compute_dtype)
    return h


def forward_train_s2d(params: Params, raster_s2d: jax.Array, rng: jax.Array,
                      keep_prob: float = 0.5, compute_dtype=jnp.float32):
    """AlexNet training forward fed a {0,1} raster in conv1's space-to-depth
    layout [N,57,57,48] (rasterize.render_raster_s2d).

    conv1 is folded ON THE FLY inside the differentiable graph — the fold
    (alexnet.fold_conv1_params: x255 scale into the weights, IMAGE_MEAN
    into the bias, 11x11 s4 -> 3x3 s1 over 48 channels, (c,p,q) interleave)
    is linear in the parameters, so gradients flow straight back to the
    REFERENCE-space conv1/weights [11,11,3,96] and checkpoints stay
    TF1-compatible. Replaces the MXU-hostile 11x11 s4 conv over 3 channels
    (3/128 contraction lanes) and the f32 [N,227,227,3] image tensor."""
    inter = jnp.float32 if compute_dtype == jnp.float32 else compute_dtype
    w = params["conv1/weights"]                                # [11,11,3,96]
    b = params["conv1/biases"]
    # shared fold math (alexnet.fold_conv1_math) run with jnp: linear in
    # (w, b), so grad flows straight back to the reference-space params
    w_s2d, b_fold = alexnet.fold_conv1_math(w, b, jnp)

    h = raster_s2d.astype(compute_dtype)
    h = jax.lax.conv_general_dilated(
        h, w_s2d.astype(compute_dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=inter)
    h = jax.nn.relu(h + b_fold.astype(inter))
    h = alexnet._maxpool(h)
    h = alexnet.lrn(h)
    h = h.astype(compute_dtype)
    for name, _, _, _, stride, padding, groups in alexnet._CONV_SPECS[1:]:
        wl = params[f"{name}/weights"].astype(compute_dtype)
        bl = params[f"{name}/biases"].astype(inter)
        h = jax.lax.conv_general_dilated(
            h, wl, window_strides=(stride, stride), padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups, preferred_element_type=inter)
        h = jax.nn.relu(h + bl)
        if name == "conv2":
            h = alexnet._maxpool(h)
            h = alexnet.lrn(h)
        elif name == "conv5":
            h = alexnet._maxpool(h)
        h = h.astype(compute_dtype)
    h = h.reshape(h.shape[0], -1)
    rngs = jax.random.split(rng, 2)
    for i, (name, _, _) in enumerate(alexnet._FC_SPECS):
        wl = params[f"{name}/weights"].astype(compute_dtype)
        if name == "fc8":
            bl = params[f"{name}/biases"].astype(jnp.float32)
            h = jnp.dot(h.astype(jnp.float32), wl.astype(jnp.float32)) + bl
        else:
            bl = params[f"{name}/biases"].astype(inter)
            h = jnp.dot(h, wl, preferred_element_type=inter) + bl
            h = jax.nn.relu(h)
            keep = jax.random.bernoulli(rngs[i], keep_prob, h.shape)
            h = jnp.where(keep, h / keep_prob,
                          jnp.zeros((), inter)).astype(compute_dtype)
    return h


def loss_fn(params: Params, images: jax.Array, labels: jax.Array,
            rng: jax.Array, keep_prob: float = 0.5,
            compute_dtype=jnp.float32, s2d: bool = False) -> jax.Array:
    fwd = forward_train_s2d if s2d else forward_train
    logits = fwd(params, images, rng, keep_prob, compute_dtype)
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    return jnp.mean(ce)


def make_train_step(optimizer=None, keep_prob: float = 0.5,
                    compute_dtype=jnp.float32, s2d: bool = False):
    """Returns (init_state, train_step). train_step is jit-ready and
    shardable: jit it with mesh shardings for multi-chip DP/TP.
    s2d=True: the images argument is the {0,1} s2d raster [N,57,57,48]
    (forward_train_s2d); params stay reference-space either way."""
    if optimizer is None:
        optimizer = optax.sgd(1e-3, momentum=0.9)

    def init_state(params: Params):
        return optimizer.init(params)

    def train_step(params: Params, opt_state, images, labels, rng):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, images, labels, rng, keep_prob, compute_dtype, s2d)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_state, train_step


# ---------------------------------------------------------------------------
# Training pipeline: labeled candidate specs -> trained checkpoint
# ---------------------------------------------------------------------------

def specs_to_images(specs, flip: bool = False, jitter_rng=None,
                    max_shift: int = 10, max_jitter: int = 2):
    """Host+device: [N,12] specs -> [N,227,227,3] normalized images.

    flip=True mirrors the image left-right — the reference training recipe's
    cv2.flip augmentation (create_batch.py imports cv2.flip for this; a
    horizontal flip of the ref axis preserves the SV class).

    jitter_rng (np.random.RandomState) enables endpoint-space augmentation:
    a per-image translation of up to ±max_shift px (locus position inside
    the trimmed window varies with the supporting read's extent) plus
    per-endpoint jitter of up to ±max_jitter px (breakpoint/rounding noise
    across reads). Both preserve the SV class; they decouple the model from
    the exact canvas position the simulator produces."""
    import jax.numpy as jnp
    from svision_tpu.ops import rasterize
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    if jitter_rng is not None:
        ep = jitter_endpoints_np(ep, jitter_rng, max_shift, max_jitter)
    imgs = rasterize.render_images_jit(jnp.asarray(ep), jnp.asarray(vis),
                                       jnp.asarray(rev))
    if flip:
        imgs = imgs[:, :, ::-1, :]
    return imgs


def jitter_endpoints_np(ep, rng, max_shift: int = 10, max_jitter: int = 2):
    """Host endpoint augmentation: per-image (dc, dr) translation +
    per-endpoint jitter, clamped to the canvas. ep int32 [N, S, 4]
    (col0,row0,col1,row1)."""
    import numpy as np
    from svision_tpu.ops.rasterize import CANVAS
    n, s, _ = ep.shape
    shift = rng.randint(-max_shift, max_shift + 1, (n, 1, 2))
    jit = rng.randint(-max_jitter, max_jitter + 1, (n, s, 4))
    out = ep.astype(np.int64)
    out[..., 0::2] += shift[..., 0:1] + jit[..., 0::2]   # cols
    out[..., 1::2] += shift[..., 1:2] + jit[..., 1::2]   # rows
    return np.clip(out, 0, CANVAS - 1).astype(ep.dtype)


def jitter_endpoints_jax(ep, key, max_shift: int = 10, max_jitter: int = 2):
    """Device twin of jitter_endpoints_np (used inside fit_device's scan)."""
    from svision_tpu.ops.rasterize import CANVAS
    n, s, _ = ep.shape
    kshift, kjit = jax.random.split(key)
    shift = jax.random.randint(kshift, (n, 1, 2), -max_shift, max_shift + 1)
    jit = jax.random.randint(kjit, (n, s, 4), -max_jitter, max_jitter + 1)
    shift4 = jnp.concatenate([shift[..., 0:1], shift[..., 1:2]] * 2, -1)
    return jnp.clip(ep + shift4 + jit, 0, CANVAS - 1).astype(ep.dtype)


def fragment_endpoints_jax(ep, vis, rev, key, split_prob: float = 0.3,
                           gap_max: int = 3):
    """Raster-noise augmentation: split segments into two colinear
    sub-segments with a small pixel gap — the fragmented-diagonal look of
    hashplot-realigned noisy sequence (run_hash_lineplot.py output on real
    reads), which box-drawn rasters never show on clean simulations.

    ep [N,S,4] -> [N,2S,4] (vis/rev widen to match); un-split segments keep
    their original line with an invisible padding slot. The renderers
    reduce over the segment axis, so the wider S is free."""
    c0, r0, c1, r1 = (ep[..., i] for i in range(4))
    dc = c1 - c0
    dr = r1 - r0
    major = jnp.maximum(jnp.abs(dc), jnp.abs(dr))
    ksplit, kfrac, kgap = jax.random.split(key, 3)
    f = jax.random.uniform(kfrac, major.shape, minval=0.35, maxval=0.65)
    g = jax.random.randint(kgap, major.shape, 1, gap_max + 1)
    gfrac = g / jnp.maximum(major, 1)
    f1 = f - gfrac
    f2 = f + gfrac
    m1 = jnp.stack([c0 + jnp.round(dc * f1), r0 + jnp.round(dr * f1)],
                   -1).astype(ep.dtype)
    m2 = jnp.stack([c0 + jnp.round(dc * f2), r0 + jnp.round(dr * f2)],
                   -1).astype(ep.dtype)
    do = (jax.random.bernoulli(ksplit, split_prob, major.shape)
          & (major >= 4 * gap_max) & vis)
    sub1 = jnp.where(do[..., None],
                     jnp.concatenate([ep[..., :2], m1], -1), ep)
    sub2 = jnp.concatenate([m2, ep[..., 2:]], -1)
    ep_out = jnp.concatenate([sub1, sub2], axis=1)
    vis_out = jnp.concatenate([vis, do], axis=1)
    rev_out = jnp.concatenate([rev, rev], axis=1)
    return ep_out, vis_out, rev_out


def fit(params: Params, specs, labels, *, epochs: int = 3,
        batch_size: int = 32, seed: int = 0, learning_rate: float = 1e-3,
        keep_prob: float = 0.5, compute_dtype=jnp.float32, augment: bool = True,
        mesh=None, log=None):
    """Train the CNN on labeled candidate specs; returns (params, history).

    With `mesh`, params/batches are sharded (data-parallel + fc6/fc7 TP when
    the mesh has a 'model' axis); single-device otherwise.
    """
    import numpy as np
    import optax as _optax

    # raw reference-scale images (±151 after mean-subtract) produce large
    # initial logits; clip gradients so SGD survives the first epochs
    optimizer = _optax.chain(_optax.clip_by_global_norm(1.0),
                             _optax.sgd(learning_rate, momentum=0.9))
    init_state, train_step = make_train_step(
        optimizer, keep_prob=keep_prob, compute_dtype=compute_dtype)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        from svision_tpu.parallel.mesh import shard_params_tp, replicate_params
        if "model" in mesh.axis_names and mesh.shape.get("model", 1) > 1:
            params = shard_params_tp(params, mesh)
        else:
            params = replicate_params(params, mesh)
        data_sh = NamedSharding(mesh, P("data"))
    else:
        data_sh = None

    opt_state = init_state(params)
    step = jax.jit(train_step)
    rng = jax.random.PRNGKey(seed)
    nprng = np.random.RandomState(seed)

    n = len(labels)
    if n < batch_size:
        raise ValueError(f"need at least batch_size={batch_size} examples, "
                         f"got {n} — zero steps would silently return the "
                         "initial params")
    specs = np.asarray(specs)
    labels = np.asarray(labels, np.int32)
    history = []
    for epoch in range(epochs):
        order = nprng.permutation(n)
        epoch_loss, batches = 0.0, 0
        for i in range(0, n - batch_size + 1, batch_size):
            idx = order[i:i + batch_size]
            flip = augment and bool(nprng.randint(2))
            images = specs_to_images(specs[idx], flip=flip,
                                     jitter_rng=nprng if augment else None)
            lab = jnp.asarray(labels[idx])
            if data_sh is not None:
                images = jax.device_put(images, data_sh)
                lab = jax.device_put(lab, data_sh)
            rng, sub = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, images, lab, sub)
            epoch_loss += float(loss)
            batches += 1
        history.append(epoch_loss / max(batches, 1))
        if log:
            log(f"epoch {epoch}: mean loss {history[-1]:.4f}")
    return params, history


def fit_device(params: Params, specs, labels, *, epochs: int = 16,
               batch_size: int = 32, seed: int = 0,
               learning_rate: float = 5e-3, keep_prob: float = 0.5,
               compute_dtype=jnp.float32, augment: bool = True,
               s2d: bool = True, noise_aug: bool = False,
               pixel_drop: float = 0.02, split_prob: float = 0.3,
               log=None):
    """Device-resident training: the WHOLE run is one jitted program.

    `fit()` dispatches one program per batch (host shuffle, host->device
    image transfer, step); on a tunneled link that costs ~1.3 s/step of pure
    dispatch latency. Here the endpoint table + labels are put on device
    once and a lax.scan over epochs of a lax.scan over steps does shuffle
    (jax.random.permutation), rasterization, augmentation, and the update
    entirely on-chip — a single dispatch for the full run.

    s2d=True (default) renders the {0,1} raster straight into conv1's
    space-to-depth layout and trains through the differentiable fold
    (forward_train_s2d) — same reference-space parameters, no f32 image
    tensor and no 11x11 s4 conv. The cv2.flip augmentation becomes an
    ENDPOINT mirror (columns c -> 226-c) before rasterizing; it can differ
    from the image flip on Bresenham tie pixels, which is immaterial for
    augmentation (s2d=False keeps the round-2 image-space path).

    Returns (params, history) like fit(); history = per-epoch mean loss.
    """
    import numpy as np
    import optax as _optax
    from svision_tpu.ops import rasterize

    optimizer = _optax.chain(_optax.clip_by_global_norm(1.0),
                             _optax.sgd(learning_rate, momentum=0.9))
    _, train_step = make_train_step(optimizer, keep_prob=keep_prob,
                                    compute_dtype=compute_dtype, s2d=s2d)

    specs = np.asarray(specs)
    labels_np = np.asarray(labels, np.int32)
    n = len(labels_np)
    steps = n // batch_size
    if steps == 0:
        raise ValueError(f"need >= {batch_size} examples, have {n}")
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    ep_d, vis_d, rev_d = jnp.asarray(ep), jnp.asarray(vis), jnp.asarray(rev)
    labels_d = jnp.asarray(labels_np)

    def epoch_fn(carry, epoch_key):
        params, opt_state = carry
        kperm, kflip, kstep = jax.random.split(epoch_key, 3)
        perm = jax.random.permutation(kperm, n)[:steps * batch_size]
        idxs = perm.reshape(steps, batch_size)
        flips = jax.random.bernoulli(kflip, 0.5, (steps,)) if augment else \
            jnp.zeros((steps,), bool)
        step_keys = jax.random.split(kstep, steps)

        def body(c, inp):
            params, opt_state = c
            idx, flip, key = inp
            kaug, kfrag, kdrop, kstep = jax.random.split(key, 4)
            ep_b = ep_d[idx]
            vis_b = vis_d[idx]
            rev_b = rev_d[idx]
            if augment:
                # translation + breakpoint jitter in endpoint space (see
                # jitter_endpoints_np) — on-device, per step
                ep_b = jitter_endpoints_jax(ep_b, kaug)
            if noise_aug:
                # raster-noise augmentation: fragmented diagonals (hashplot
                # on noisy sequence) + dropped pixels (below, s2d path)
                ep_b, vis_b, rev_b = fragment_endpoints_jax(
                    ep_b, vis_b, rev_b, kfrag, split_prob=split_prob)
            if s2d:
                # cv2.flip-equivalent augmentation as an endpoint mirror
                # of the ref (column) axis
                flipped = ep_b.at[..., 0::2].set(
                    rasterize.CANVAS - 1 - ep_b[..., 0::2])
                ep_b = jnp.where(flip, flipped, ep_b)
                images = rasterize.render_raster_s2d(
                    ep_b, vis_b, rev_b,
                    dtype=jnp.bfloat16 if compute_dtype == jnp.bfloat16
                    else jnp.float32)
                if noise_aug and pixel_drop > 0:
                    keep = jax.random.bernoulli(kdrop, 1.0 - pixel_drop,
                                                images.shape)
                    images = images * keep.astype(images.dtype)
            else:
                images = rasterize.render_images(ep_b, vis_b, rev_b)
                # cv2.flip-equivalent augmentation: mirror the ref axis
                images = jnp.where(flip, images[:, :, ::-1, :], images)
            params, opt_state, loss = train_step(params, opt_state, images,
                                                 labels_d[idx], kstep)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (idxs, flips, step_keys))
        return (params, opt_state), jnp.mean(losses)

    @jax.jit
    def run(params, opt_state, root_key):
        epoch_keys = jax.random.split(root_key, epochs)
        return jax.lax.scan(epoch_fn, (params, opt_state), epoch_keys)

    params = jax.tree_util.tree_map(jnp.asarray, params)
    opt_state = optimizer.init(params)
    (params, _), history = run(params, opt_state, jax.random.PRNGKey(seed))
    history = [float(h) for h in np.asarray(history)]
    if log:
        for e, h in enumerate(history):
            log(f"epoch {e}: mean loss {h:.4f}")
    return params, history


def evaluate(params: Params, specs, labels, batch_size: int = 64) -> float:
    """Argmax accuracy on labeled specs."""
    import numpy as np
    correct = 0
    labels = np.asarray(labels)
    n = len(labels)
    for i in range(0, n, batch_size):
        images = specs_to_images(np.asarray(specs[i:i + batch_size]))
        logits = alexnet.forward(params, images)
        correct += int((np.argmax(np.asarray(logits), 1)
                        == labels[i:i + batch_size]).sum())
    return correct / n


def main(argv=None):
    """CLI: train from an .npz with `specs` [N,12] and `labels` [N]
    (class ids 0=DEL 1=INS 2=INV 3=DUP 4=tDUP, predict.py:133-142)."""
    import argparse
    import numpy as np
    from svision_tpu.models.checkpoint import load_params, save_params

    ap = argparse.ArgumentParser(description="svision-tpu CNN trainer")
    ap.add_argument("--data", required=True, help=".npz with specs + labels")
    ap.add_argument("-o", dest="out", required=True, help="output .npz weights")
    ap.add_argument("--init", default=None, help="warm-start weights")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--bf16", action="store_true",
                    help="bf16 compute (1.8x step throughput on v5e; "
                    "f32 logits/loss either way)")
    ns = ap.parse_args(argv)

    with np.load(ns.data) as z:
        specs, labels = z["specs"], z["labels"]
    if ns.init:
        params = {k: jnp.asarray(v) for k, v in load_params(ns.init).items()}
    else:
        params = alexnet.init_params(jax.random.PRNGKey(ns.seed))
    params, history = fit(params, specs, labels, epochs=ns.epochs,
                          batch_size=ns.batch_size, seed=ns.seed,
                          learning_rate=ns.lr, log=print,
                          compute_dtype=jnp.bfloat16 if ns.bf16
                          else jnp.float32)
    save_params({k: __import__("numpy").asarray(v) for k, v in params.items()},
                ns.out)
    print(f"saved {ns.out}; final loss {history[-1]:.4f}")


if __name__ == "__main__":
    main()
