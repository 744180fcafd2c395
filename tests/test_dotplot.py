"""Debug dotplots (--dotplots) vs the reference's PlotSingleImg2
(plot_segment.py:77-136): pixel parity via cv2."""
import os
import random

import numpy as np
import pytest

from svision_tpu.ops.dotplot import (dotplot_ratio, dump_read_dotplot,
                                     read_dotplot, write_png)

cv2 = pytest.importorskip("cv2")


def _random_segments(rng, n, ref_span, read_span):
    segs = []
    for _ in range(n):
        rs = rng.randint(0, max(ref_span - 100, 1))
        re = rs + rng.randint(20, ref_span // 2)
        qs = rng.randint(0, max(read_span - 100, 1))
        qe = qs + rng.randint(20, read_span // 2)
        segs.append({"ref_start": rs, "ref_end": re, "q_start": qs,
                     "q_end": qe, "is_reverse": bool(rng.randint(0, 1))})
    return segs


def _reference_plot(segments, tmp_path, name):
    from tests.ref_harness import load_reference_module
    mod = load_reference_module("src.segmentplot.plot_segment")
    # PlotSingleImg2.plot mutates its input dicts — hand it copies
    ploter = mod.PlotSingleImg2([dict(s) for s in segments], name,
                                str(tmp_path))
    ploter.plot()
    img = cv2.imread(os.path.join(str(tmp_path), name + ".png"),
                     cv2.IMREAD_GRAYSCALE)
    assert img is not None
    return img


@pytest.mark.parametrize("ref_span,read_span,n", [
    (800, 700, 3),          # ratio 1
    (5000, 4600, 4),        # ratio 10
    (60000, 55000, 5),      # ratio 100
    (900, 30000, 3),        # shorter axis (ref) picks the ratio
])
def test_pixel_parity_vs_reference(tmp_path, ref_span, read_span, n):
    rng = random.Random(ref_span + read_span + n)
    segments = _random_segments(rng, n, ref_span, read_span)
    ref_img = _reference_plot(segments, tmp_path, f"r{ref_span}")
    ours = read_dotplot(segments)
    assert ours.shape == ref_img.shape, (ours.shape, ref_img.shape)
    assert np.array_equal(ours, ref_img)


def test_ratio_rule():
    # plot_segment.py:83-98: shorter axis < 1000 -> 1, else 10^k
    assert dotplot_ratio(999, 5_000_000) == 1
    assert dotplot_ratio(5_000_000, 999) == 1
    assert dotplot_ratio(1000, 2000) == 10
    assert dotplot_ratio(9999, 20000) == 10
    assert dotplot_ratio(10001, 20000) == 100


def test_png_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(37, 53), dtype=np.uint8)
    path = str(tmp_path / "x.png")
    write_png(img, path)
    back = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
    assert np.array_equal(back, img)


def test_dump_sanitizes_qname(tmp_path):
    segs = _random_segments(random.Random(1), 2, 500, 500)
    path = dump_read_dotplot(segs, "read/1/" + "x" * 200, str(tmp_path))
    assert os.path.exists(path)
    assert "/" not in os.path.basename(path)
    assert len(os.path.basename(path)) == 100 + len(".png")


def test_pipeline_flag(tmp_path):
    """--dotplots end-to-end: collection dumps one PNG per split read."""
    from svision_tpu.sim import make_genome, make_sv_bam
    from svision_tpu.config import default_options
    from svision_tpu.collect.window import run_detect

    fa = str(tmp_path / "g.fa")
    bam = str(tmp_path / "s.bam")
    genome = make_genome(fa, {"chr1": 200000}, seed=5)
    make_sv_bam(bam, genome, seed=5, support=4,
                events=[("INV", "chr1", 100000, 400)])
    opt = default_options(out_path=str(tmp_path), bam_path=bam, genome=fa,
                          model_path="x", sample="S", dotplots=True)
    res = run_detect(opt, bam, "chr1", 0, 0, 200000)
    assert res.error is None
    dumped = os.listdir(str(tmp_path / "dotplots"))
    assert len(dumped) >= 4          # every INV split read
    assert all(f.endswith(".png") for f in dumped)
