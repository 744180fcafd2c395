"""Pixel-parity tests for the MXU rasterizer vs OpenCV (SURVEY.md §4(2)).

cv2 is available in the dev environment, so the gate is the real thing: the
scalar Bresenham, the vectorized closed form, and the full batched JAX encoder
must reproduce cv.line / the reference PlotSingleImg pipeline exactly.
"""
import numpy as np
import pytest

import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from svision_tpu.ops import bresenham, rasterize


def _cv_pixels(x1, y1, x2, y2, size=227):
    img = np.zeros((size, size), np.uint8)
    cv2.line(img, (x1, y1), (x2, y2), 255, 1)
    ys, xs = np.nonzero(img)
    return set(zip(xs.tolist(), ys.tolist()))


def _rand_endpoints(rng, n, lo, hi):
    return rng.randint(lo, hi, size=(n, 4))


def test_line_pixels_matches_cv_inside():
    rng = np.random.RandomState(0)
    for x1, y1, x2, y2 in _rand_endpoints(rng, 400, 0, 227):
        got = set(bresenham.line_pixels(x1, y1, x2, y2))
        want = _cv_pixels(x1, y1, x2, y2)
        assert got == want, (x1, y1, x2, y2)


def test_line_pixels_matches_cv_with_clipping():
    rng = np.random.RandomState(1)
    for x1, y1, x2, y2 in _rand_endpoints(rng, 400, -80, 320):
        got = set(bresenham.line_pixels(x1, y1, x2, y2))
        want = _cv_pixels(x1, y1, x2, y2)
        assert got == want, (x1, y1, x2, y2)


def test_line_pixels_exhaustive_small_grid():
    # exhaustive on a 13x13 canvas: every endpoint pair
    size = 13
    for x1 in range(size):
        for y1 in range(size):
            for x2 in range(size):
                for y2 in range(size):
                    got = set(bresenham.line_pixels(x1, y1, x2, y2, size, size))
                    want = _cv_pixels(x1, y1, x2, y2, size)
                    assert got == want, (x1, y1, x2, y2)


def test_clip_batch_matches_scalar():
    rng = np.random.RandomState(2)
    pts = _rand_endpoints(rng, 3000, -300, 500)
    clipped, alive = bresenham.clip_lines_batch(pts)
    for i, (x1, y1, x2, y2) in enumerate(pts):
        want = bresenham.clip_line(x1, y1, x2, y2)
        if want is None:
            assert not alive[i], (i, pts[i])
        else:
            assert alive[i], (i, pts[i])
            assert tuple(clipped[i]) == want, (i, pts[i], tuple(clipped[i]), want)


def test_minor_steps_closed_form():
    # closed form k(i) must match the iterative error accumulator for all spans
    for major in range(0, 230, 7):
        for minor in range(0, major + 1, 3):
            ks = []
            err, k = major - 2 * minor, 0
            for i in range(major + 1):
                ks.append(k)
                if err < 0:
                    k += 1
                    err += 2 * major
                err -= 2 * minor
            got = bresenham.minor_steps(np.full(major + 1, major),
                                        np.full(major + 1, minor),
                                        np.arange(major + 1))
            np.testing.assert_array_equal(got, np.array(ks), err_msg=f"{major},{minor}")


# ---------------------------------------------------------------------------
# full image parity: reference pipeline (cv2) vs numpy golden vs JAX batched
# ---------------------------------------------------------------------------

def _reference_image(spec):
    """The reference encoder verbatim-semantics: create_batch.py:101-152 +
    plot_segment.py:33-73, using real cv2."""
    (xs1, xe1, ys1, ye1, f1, xs2, xe2, ys2, ye2, f2, read_len, ref_len) = spec

    def rebuild(xs, ys, ye, fwd):
        length = ye - ys
        xe = xs + (length - 1) if fwd else xs - (length - 1)
        ye2 = ys + (length - 1)
        return xs, xe, ys, ye2, fwd

    segs = [rebuild(xs1, ys1, ye1, bool(f1)), rebuild(xs2, ys2, ye2, bool(f2))]
    ratio = float(max(read_len, ref_len) / 227.0)
    if ratio < 1:
        ratio = 1
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
    img -= np.array([104., 117., 124.], np.float32)
    return img


def _random_specs(rng, n):
    specs = []
    for _ in range(n):
        scale = int(rng.choice([1, 2, 5, 40]))
        read_len = int(rng.randint(100, 227 * scale + 1))
        ref_len = int(rng.randint(100, 227 * scale + 1))
        out = []
        for _s in range(2):
            ys = int(rng.randint(0, max(ref_len - 1, 1)))
            ye = int(rng.randint(ys, ref_len + 1))
            xs = int(rng.randint(0, max(read_len - 1, 1)))
            xe = 0  # ignored by the rebuild, like the reference
            fwd = int(rng.randint(0, 2))
            out += [xs, xe, ys, ye, fwd]
        specs.append(out + [read_len, ref_len])
    return np.array(specs, dtype=np.int64)


def test_numpy_golden_matches_cv_reference():
    rng = np.random.RandomState(3)
    specs = _random_specs(rng, 60)
    for spec in specs:
        got = rasterize.encode_one_numpy(spec)
        want = _reference_image([int(v) for v in spec])
        np.testing.assert_array_equal(got, want)


def test_jax_encoder_matches_cv_reference():
    rng = np.random.RandomState(4)
    specs = _random_specs(rng, 64)
    imgs = rasterize.encode_batch(specs)
    for i, spec in enumerate(specs):
        want = _reference_image([int(v) for v in spec])
        np.testing.assert_array_equal(imgs[i], want, err_msg=str(spec))


def test_sentinel_pad_row():
    # the reference pads batches with '0_1_0_1_True_1_1_1_1_True_2_2'
    # (create_batch.py:55); it must encode without error
    spec = np.array([[0, 1, 0, 1, 1, 1, 1, 1, 1, 1, 2, 2]], dtype=np.int64)
    img = rasterize.encode_batch(spec)
    want = _reference_image([int(v) for v in spec[0]])
    np.testing.assert_array_equal(img[0], want)


def test_raster_formulations_agree():
    """compare (elementwise), einsum (MXU one-hot) and s2d-direct must be
    bitwise-identical views of the same pixel set."""
    from svision_tpu.models.alexnet import _space_to_depth
    rng = np.random.RandomState(11)
    specs = _random_specs(rng, 128)
    ep, vis, rev = rasterize.specs_to_endpoints(specs)
    ep, vis, rev = jnp.asarray(ep), jnp.asarray(vis), jnp.asarray(rev)
    a = np.asarray(rasterize.render_raster(ep, vis, rev, dtype=jnp.float32))
    b = np.asarray(rasterize.render_raster_einsum(ep, vis, rev,
                                                  dtype=jnp.float32))
    np.testing.assert_array_equal(a, b)
    want = np.asarray(_space_to_depth(jnp.asarray(a)))
    got = np.asarray(rasterize.render_raster_s2d(ep, vis, rev,
                                                 dtype=jnp.float32))
    np.testing.assert_array_equal(want, got)
