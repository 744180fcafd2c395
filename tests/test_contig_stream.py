"""Giant-window streaming (VERDICT r1 item 5): chunked two-pass collection
must be byte-identical to the whole-window batch path, and must bound host
memory on a >=100 Mb contig."""

import os
import subprocess
import sys

import numpy as np
import pytest

from svision_tpu.collect import window as W
from svision_tpu.config import default_options
from svision_tpu.io.bam import BamReader
from tests import synth


@pytest.fixture(scope="module")
def ws(tmp_path_factory):
    root = tmp_path_factory.mktemp("stream")
    genome = str(root / "ref.fa")
    seqs = synth.make_genome(genome, {"chr1": 150000}, seed=77)
    bam = str(root / "s.bam")
    # events placed so one read group straddles each 30 kb chunk boundary
    # used by the streamed run below
    synth.make_sv_bam(bam, seqs, seed=77, support=6,
                      events=[("DEL", "chr1", 29500, 300),
                              ("INS", "chr1", 60100, 220),
                              ("INV", "chr1", 89900, 400),
                              ("tDUP", "chr1", 120000, 350)],
                      noise=True)
    return dict(genome=genome, bam=bam)


def _bed(result):
    return "".join(c.to_bed_line() for c in result.candidates)


def test_streamed_equals_batch(ws, monkeypatch):
    if BamReader(ws["bam"]).fetch_batch("chr1", 0, 1) is None:
        pytest.skip("native IO lib unavailable")
    opts = default_options(genome=ws["genome"], min_support=3)

    plain = W.run_detect(opts, ws["bam"], "chr1", 0, 0, 150000)
    assert plain.error is None and plain.candidates

    monkeypatch.setattr(W, "STREAM_WINDOW", 40000)
    monkeypatch.setattr(W, "STREAM_CHUNK", 30000)
    streamed = W.run_detect(opts, ws["bam"], "chr1", 0, 0, 150000)
    assert streamed.error is None

    assert streamed.n_signatures == plain.n_signatures
    assert streamed.n_clusters == plain.n_clusters
    assert _bed(streamed) == _bed(plain)


def test_streamed_equals_batch_region_offset(ws, monkeypatch):
    """Window not starting at 0: chunk-boundary dedup must key off the
    window start, keeping pos<start overlappers exactly once."""
    if BamReader(ws["bam"]).fetch_batch("chr1", 0, 1) is None:
        pytest.skip("native IO lib unavailable")
    opts = default_options(genome=ws["genome"], min_support=3)
    plain = W.run_detect(opts, ws["bam"], "chr1", 0, 25000, 140000)
    monkeypatch.setattr(W, "STREAM_WINDOW", 40000)
    monkeypatch.setattr(W, "STREAM_CHUNK", 30000)
    streamed = W.run_detect(opts, ws["bam"], "chr1", 0, 25000, 140000)
    assert _bed(streamed) == _bed(plain)
    assert streamed.n_signatures == plain.n_signatures


_RSS_CHILD = r"""
import os, sys, json
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.getcwd())
bam, genome, mode = sys.argv[1:4]
from svision_tpu.collect import window as W
from svision_tpu.config import default_options
if mode == "batch":
    W.STREAM_WINDOW = 1 << 60          # force whole-window batch
else:
    W.STREAM_WINDOW = 20_000_000
    W.STREAM_CHUNK = 5_000_000
opts = default_options(genome=genome, min_support=1, contig=True)
res = W.run_detect(opts, bam, "chr1", 0, 0, 120_000_000)
assert res.error is None, res.error

def peak_mb():
    # VmHWM (per-mm peak, reset at exec) — NOT ru_maxrss, which Linux
    # carries over from the forking parent and would report the fat pytest
    # process's peak here
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmHWM"):
                return int(line.split()[1]) // 1024
    return -1

print(json.dumps({"rss_mb": peak_mb(), "n_sigs": res.n_signatures,
                  "bed": "".join(c.to_bed_line() for c in res.candidates)}))
"""


@pytest.mark.slow
def test_120mb_contig_capped_rss(tmp_path):
    """A 120 Mb contig window (contig mode = window is the whole contig):
    the streamed path must produce byte-identical candidates to the batch
    path at a fraction of its peak RSS."""
    genome = str(tmp_path / "big.fa")
    seqs = synth.make_genome(genome, {"chr1": 120_000_000}, seed=5)
    bam = str(tmp_path / "big.bam")
    events = [(k, "chr1", p, 300) for p, k in
              zip(range(10_000_000, 115_000_000, 7_000_000),
                  ["DEL", "INS", "INV", "tDUP"] * 4)]
    synth.make_sv_bam(bam, seqs, seed=5, support=4, events=events,
                      coverage=4)
    if BamReader(bam).fetch_batch("chr1", 0, 1) is None:
        pytest.skip("native IO lib unavailable")

    child = tmp_path / "child.py"
    child.write_text(_RSS_CHILD)
    import json
    out = {}
    # collection is pure host work: strip the device-discovery env vars so
    # the children's RSS measures the collection path, not a site hook's
    # 8-virtual-device jax bring-up (~1 GB, identical in both modes)
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS")}
    env["JAX_PLATFORMS"] = "cpu"
    for mode in ("stream", "batch"):
        r = subprocess.run([sys.executable, str(child), bam, genome, mode],
                           capture_output=True, text=True, timeout=1800,
                           cwd=os.getcwd(), env=env)
        assert r.returncode == 0, r.stderr[-3000:]
        out[mode] = json.loads(r.stdout.splitlines()[-1])
        out[mode]["boot"] = r.stderr.strip().splitlines()[:2]

    assert out["stream"]["bed"] == out["batch"]["bed"]
    assert out["stream"]["n_sigs"] == out["batch"]["n_sigs"] > 0
    # the whole-window batch holds every record's seq/cigar at once; the
    # streamed path only a 5 Mb chunk's worth
    assert out["stream"]["rss_mb"] < out["batch"]["rss_mb"] * 0.6, out
    assert out["stream"]["rss_mb"] < 1500, out
