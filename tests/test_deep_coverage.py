"""Deep-coverage stress: a 1,500-read pileup at one locus must flow through
prefilter -> signatures -> one 1,500-wide partition -> the vectorized
average-linkage -> a single high-support call, in seconds."""
import time

import numpy as np
import pytest

from svision_tpu.collect.window import run_detect
from svision_tpu.config import default_options
from svision_tpu.sim import make_genome, make_sv_bam


@pytest.mark.slow
def test_deep_pileup_single_call(tmp_path):
    fa = str(tmp_path / "g.fa")
    genome = make_genome(fa, {"chr1": 120000}, seed=13)
    bam = str(tmp_path / "s.bam")
    # 1,500 supporting deletion reads at one anchor (+-12 bp jitter)
    make_sv_bam(bam, genome, seed=13, support=1500,
                events=[("DEL", "chr1", 60000, 400)])
    opt = default_options(out_path=str(tmp_path), bam_path=bam, genome=fa,
                          model_path="x", sample="S")
    t0 = time.time()
    res = run_detect(opt, bam, "chr1", 0, 0, 120000)
    dt = time.time() - t0
    assert res.error is None
    assert res.n_signatures == 1500
    assert res.n_clusters == 1          # one locus, one cluster
    assert len(res.candidates) == 1500  # one main-main pair per signature
    # support is carried on every candidate record (col 13, sig_cnt)
    assert res.candidates[0].sig_id.endswith("m")
    region = res.candidates[0].region
    assert int(region.split("+")[3]) >= 1500       # coverage counter
    assert dt < 60, f"deep pileup took {dt:.1f}s"   # linkage must stay fast


def test_partition_hard_limit_drops(monkeypatch):
    """Partitions over the reference's 100k guard are dropped with a warning
    (cluster_signatures.py:80-85)."""
    import logging
    from svision_tpu.collect import cluster as cl
    from svision_tpu.collect.classes import Signature

    monkeypatch.setattr(cl, "PARTITION_HARD_LIMIT", 50)
    sigs = []
    for i in range(60):
        sigs.append(Signature("chr1", 1000 + i, 1400 + i, "sigGap", f"r{i}",
                              [], [[1000 + i, 1400 + i, 400]], "None"))
    records = []

    class Cap(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("test_partition_cap")
    logger.addHandler(Cap())
    logger.setLevel(logging.WARNING)
    clusters = cl.partition_and_cluster(
        sigs, "chr1", lambda *a: 60,
        default_options(out_path=".", bam_path="x", genome="x",
                        model_path="x", sample="S"),
        logger=logger)
    assert clusters == []
    assert any("100,000" in m or "large" in m for m in records)
