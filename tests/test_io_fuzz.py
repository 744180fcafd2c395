"""Seeded random-corruption fuzz over the first-party IO readers
(VERDICT r3 #7): BAM bodies, BAI/CSI indexes, FASTA(+fai), and bgzipped
tabix-indexed VCFs. Every corruption must surface as a TYPED error
(ValueError/OSError/EOFError) or — when the flipped bytes land in payload
content like a qname — decode to records without crashing; never a hang,
a segfault (the native decoder's CRC/bounds gates), or an untyped internal
exception (struct.error, IndexError, ...). Bounded: the whole corpus runs
in a few seconds on small fixtures (smoke tier)."""

import os
import random

import pytest

# errors the readers are ALLOWED to raise on corrupt input; anything else
# is an untyped internal crash and fails the fuzz
TYPED = (ValueError, OSError, EOFError)


def _mutations(data: bytes, rng: random.Random):
    """One mutated copy of `data` per corruption class."""
    out = []
    if len(data) > 40:
        cut = rng.randrange(1, len(data) - 1)
        out.append(("truncate", data[:cut]))
    b = bytearray(data)
    for _ in range(rng.randint(1, 8)):
        i = rng.randrange(len(b))
        b[i] ^= 1 << rng.randrange(8)
    out.append(("bitflip", bytes(b)))
    b2 = bytearray(data)
    i = rng.randrange(max(1, len(b2) - 4))
    b2[i:i + 4] = rng.randbytes(4)                 # bogus length fields
    out.append(("len4", bytes(b2)))
    b3 = bytearray(data)
    i = rng.randrange(max(1, len(b3) - 16))
    b3[i:i + 16] = b"\0" * 16
    out.append(("zero16", bytes(b3)))
    return out


def _write(path, data):
    with open(path, "wb") as fh:
        fh.write(data)


@pytest.fixture(scope="module")
def fuzz_ws(tmp_path_factory):
    from svision_tpu.sim import make_genome, make_sv_bam
    from svision_tpu.io.bamwrite import write_bam
    from svision_tpu.io.tabix import bgzip_vcf

    root = tmp_path_factory.mktemp("fuzz")
    genome = str(root / "ref.fa")
    seqs = make_genome(genome, {"chr1": 60000}, seed=13)
    bam = str(root / "s.bam")
    make_sv_bam(bam, seqs, seed=13, support=6,
                events=[("DEL", "chr1", 30000, 280)])
    vcf = str(root / "x.vcf")
    with open(vcf, "w") as fh:
        fh.write("##fileformat=VCFv4.2\n")
        fh.write("##contig=<ID=chr1,length=60000>\n")
        fh.write("#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\n")
        for p in range(1000, 50000, 1000):
            fh.write(f"chr1\t{p}\t.\tA\t<DEL>\t50\tPASS\tEND={p+100}\n")
    vgz, _tbi = bgzip_vcf(vcf, remove_original=False)
    return dict(root=root, genome=genome, bam=bam, vgz=vgz, seqs=seqs)


def _drive_bam(path, bai=None):
    from svision_tpu.io.bam import BamReader
    with BamReader(path) as bam:
        n = 0
        for a in bam.fetch("chr1", 0, 60000):
            n += 1
            _ = a.cigarstring, a.query_name
        return n


def _drive_fasta(path):
    from svision_tpu.io.fasta import FastaFile
    fa = FastaFile(path)
    return fa.fetch("chr1", 100, 2100)


def _drive_tabix(path):
    from svision_tpu.io.tabix import TabixFile
    tb = TabixFile(path)
    return sum(1 for _ in tb.fetch("chr1", 0, 60000))


def test_fuzz_bam_body(fuzz_ws, tmp_path):
    rng = random.Random(101)
    data = open(fuzz_ws["bam"], "rb").read()
    bai = open(fuzz_ws["bam"] + ".bai", "rb").read()
    for trial in range(60):
        for kind, mut in _mutations(data, rng):
            p = str(tmp_path / "m.bam")
            _write(p, mut)
            _write(p + ".bai", bai)
            try:
                _drive_bam(p)
            except TYPED:
                pass
            except Exception as exc:   # noqa: BLE001 — the fuzz verdict
                raise AssertionError(
                    f"untyped {type(exc).__name__} on {kind} trial "
                    f"{trial}: {exc}") from exc


def test_fuzz_bam_index(fuzz_ws, tmp_path):
    rng = random.Random(202)
    data = open(fuzz_ws["bam"], "rb").read()
    bai = open(fuzz_ws["bam"] + ".bai", "rb").read()
    for trial in range(60):
        for kind, mut in _mutations(bai, rng):
            p = str(tmp_path / "m.bam")
            _write(p, data)
            _write(p + ".bai", mut)
            try:
                _drive_bam(p)
            except TYPED:
                pass
            except Exception as exc:   # noqa: BLE001
                raise AssertionError(
                    f"untyped {type(exc).__name__} on bai {kind} trial "
                    f"{trial}: {exc}") from exc


def test_fuzz_fasta(fuzz_ws, tmp_path):
    rng = random.Random(303)
    fa = open(fuzz_ws["genome"], "rb").read()
    fai = open(fuzz_ws["genome"] + ".fai", "rb").read()
    for trial in range(50):
        for kind, mut in _mutations(fa, rng):
            p = str(tmp_path / "m.fa")
            _write(p, mut)
            _write(p + ".fai", fai)
            try:
                _drive_fasta(p)
            except TYPED:
                pass
            except Exception as exc:   # noqa: BLE001
                raise AssertionError(
                    f"untyped {type(exc).__name__} on fa {kind} trial "
                    f"{trial}: {exc}") from exc
        for kind, mut in _mutations(fai, rng):
            p = str(tmp_path / "m.fa")
            _write(p, fa)
            _write(p + ".fai", mut)
            try:
                _drive_fasta(p)
            except TYPED:
                pass
            except Exception as exc:   # noqa: BLE001
                raise AssertionError(
                    f"untyped {type(exc).__name__} on fai {kind} trial "
                    f"{trial}: {exc}") from exc


def test_fuzz_tabix(fuzz_ws, tmp_path):
    rng = random.Random(404)
    vgz = open(fuzz_ws["vgz"], "rb").read()
    tbi = open(fuzz_ws["vgz"] + ".tbi", "rb").read()
    for trial in range(50):
        for kind, mut in _mutations(vgz, rng):
            p = str(tmp_path / "m.vcf.gz")
            _write(p, mut)
            _write(p + ".tbi", tbi)
            try:
                _drive_tabix(p)
            except TYPED:
                pass
            except Exception as exc:   # noqa: BLE001
                raise AssertionError(
                    f"untyped {type(exc).__name__} on vgz {kind} trial "
                    f"{trial}: {exc}") from exc
        for kind, mut in _mutations(tbi, rng):
            p = str(tmp_path / "m.vcf.gz")
            _write(p, vgz)
            _write(p + ".tbi", mut)
            try:
                _drive_tabix(p)
            except TYPED:
                pass
            except Exception as exc:   # noqa: BLE001
                raise AssertionError(
                    f"untyped {type(exc).__name__} on tbi {kind} trial "
                    f"{trial}: {exc}") from exc
