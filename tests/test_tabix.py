"""bgzip + tabix (.tbi) round trip (io/tabix.py): write, index, region-fetch.

No htslib available in this environment, so the gate is self-consistency
(fetch == brute-force overlap filter on the same records, tabix VCF
overlap rule END=/len(REF)) plus structural checks of the .tbi layout.
"""
import os
import random
import struct

import pytest

from svision_tpu.io.bgzf import BgzfReader
from svision_tpu.io.tabix import TabixFile, bgzip_vcf, _vcf_span


def _make_vcf(path, rng, n=400, contigs=("chr1", "chr2")):
    recs = []
    for c in contigs:
        poss = sorted(rng.randrange(1, 5_000_000) for _ in range(n))
        for i, pos in enumerate(poss):
            if i % 3 == 0:
                end = pos + rng.randrange(50, 100000)
                info = f"END={end};SVTYPE=DEL"
                ref = "N"
            else:
                ref = "ACGT"[: rng.randrange(1, 5)]
                info = "SVTYPE=INS"
            recs.append((c, pos, ref, info))
    with open(path, "w") as fh:
        fh.write("##fileformat=VCFv4.3\n")
        for c in contigs:
            fh.write(f"##contig=<ID={c},length=6000000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for i, (c, pos, ref, info) in enumerate(recs):
            fh.write(f"{c}\t{pos}\t{i}\t{ref}\t<SV>\t60\tPASS\t{info}\n")
    return recs


def test_bgzip_tabix_roundtrip(tmp_path):
    rng = random.Random(31)
    vcf = str(tmp_path / "x.vcf")
    recs = _make_vcf(vcf, rng)
    plain = [l for l in open(vcf) if not l.startswith("#")]

    gz, tbi = bgzip_vcf(vcf)
    assert gz.endswith(".vcf.gz") and os.path.exists(tbi)
    assert not os.path.exists(vcf)  # bgzip semantics: original replaced

    # the .gz is plain BGZF: full decompression recovers the text
    with open(gz, "rb") as fh:
        r = BgzfReader(fh)
        text = b""
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            text += chunk
    got_lines = [l + "\n" for l in text.decode().splitlines()
                 if not l.startswith("#")]
    assert got_lines == plain

    with TabixFile(gz) as tb:
        assert tb.contigs == ["chr1", "chr2"]
        assert tb.header()[0].startswith("##fileformat")
        for _ in range(40):
            c = rng.choice(["chr1", "chr2"])
            s = rng.randrange(0, 5_500_000)
            e = s + rng.randrange(1, 400_000)
            got = sorted(l.split("\t")[2] for l in tb.fetch(c, s, e))
            want = []
            for line in plain:
                f = line.rstrip("\n").split("\t")
                if f[0] != c:
                    continue
                beg, end = _vcf_span(f)
                if beg < e and end > s:
                    want.append(f[2])
            assert got == sorted(want), (c, s, e)
        # whole-contig fetch
        assert len(list(tb.fetch("chr2"))) == len(
            [l for l in plain if l.startswith("chr2\t")])
        # unknown contig is empty, not an error
        assert list(tb.fetch("chrUn", 0, 100)) == []


def test_tbi_layout(tmp_path):
    """Structural sanity of the .tbi: magic, VCF preset, names block."""
    rng = random.Random(32)
    vcf = str(tmp_path / "y.vcf")
    _make_vcf(vcf, rng, n=50, contigs=("chrA",))
    gz, tbi = bgzip_vcf(vcf)
    with open(tbi, "rb") as fh:
        data = BgzfReader(fh).read(1 << 20)
    assert data[:4] == b"TBI\x01"
    n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm = \
        struct.unpack_from("<8i", data, 4)
    assert (n_ref, fmt, col_seq, col_beg, col_end) == (1, 2, 1, 2, 0)
    assert meta == ord("#") and skip == 0
    assert data[36:36 + l_nm] == b"chrA\x00"


def test_cli_bgzip_flag(tmp_path):
    """--bgzip through the CLI produces .vcf.gz + .tbi whose indexed
    records equal the bgzf-decompressed text (one pipeline run — this is
    smoke's CLI e2e; plain-vs-gz record equality is the unit-level
    roundtrip above, and the plain VCF path is covered across the full
    tier's e2e suites)."""
    import numpy as np
    import jax
    from svision_tpu.cli import parse_arguments, run_pipeline
    from svision_tpu.models import alexnet
    from svision_tpu.models.checkpoint import save_params
    from tests import synth

    genome = str(tmp_path / "ref.fa")
    seqs = synth.make_genome(genome, {"chr1": 100000}, seed=41)
    bam = str(tmp_path / "s.bam")
    synth.make_sv_bam(bam, seqs, seed=41, support=8,
                      events=[("DEL", "chr1", 30000, 300)])
    weights = str(tmp_path / "w.npz")
    save_params({k: np.asarray(v) for k, v in
                 alexnet.init_params(jax.random.PRNGKey(0)).items()}, weights)

    gz = run_pipeline(parse_arguments(
        ["-o", str(tmp_path / "z"), "-b", bam, "-g", genome, "-m", weights,
         "-n", "s", "-s", "3", "--batch_size", "32", "--bgzip"]))
    assert gz.endswith(".vcf.gz")
    assert os.path.exists(gz + ".tbi")
    assert not os.path.exists(gz[:-3])      # bgzip replaces the plain file
    with open(gz, "rb") as fh:
        r = BgzfReader(fh)
        text = b""
        while True:
            chunk = r.read(1 << 20)
            if not chunk:
                break
            text += chunk
    body = [l + "\n" for l in text.decode().splitlines()
            if not l.startswith("#")]
    assert body, "CLI produced an empty callset"
    with TabixFile(gz) as tb:
        got = [l + "\n" for l in tb.fetch("chr1")]
    assert got == body
