"""Full-pipeline VCF parity: the EXECUTING reference vs svision-tpu.

The strongest parity statement available without the (stripped) demo BAM:
run the actual reference implementation end-to-end — collection
(run_collection.run_detect), CNN prediction (predict.Predict.run on the
reference TF graph), scoring and merge (output.cal_scores_max_min /
merge_split_vcfs), optional graph step (graph.collect_csv_same_format) —
against a synthetic BAM, with pysam replaced by a shim backed by
svision_tpu's own BAM/FASTA/VCF readers (tests/ref_harness.py), and require
the outputs to equal svision-tpu's byte for byte.

The CNN weights are random but SHARED: a TF1 checkpoint is saved from the
reference's own AlexNet graph and fed to both sides (ours through the
models/checkpoint.py converter). svision-tpu runs with --exact (f32) so the
numerics match the reference's f32 session.

Configs (BASELINE.json-style): base (simple SVs), graph (+CSV events,
--graph --qname), hash (--hash realignment).
"""

import os
import shutil
import sys

import numpy as np
import pytest

from tests import ref_harness, synth

MIN_SUPPORT = 3
BATCH_SIZE = 32
SAMPLE = "parity"


def _fuzz_events(seed, chrom_sizes, kinds, spacing=24000):
    """Seeded random event soup: random kinds/sizes on a jittered grid
    (grid spacing >> 2x read flank so events never interact)."""
    import random as _random
    rng = _random.Random(seed)
    events = []
    for chrom, size in chrom_sizes.items():
        pos = 15000
        while pos < size - 15000:
            events.append((rng.choice(kinds), chrom,
                           pos + rng.randint(0, 4000),
                           rng.randint(60, 900)))
            pos += spacing
    return events


CONFIGS = {
    # seeded random event soup over two chromosomes + filter noise — the
    # differential-fuzz capstone: any divergence from the executing
    # reference on arbitrary mixed inputs fails byte identity
    "fuzz": dict(
        chroms={"chr1": 260000, "chr2": 200000},
        events=_fuzz_events(101, {"chr1": 260000, "chr2": 200000},
                            ["DEL", "INS", "INV", "tDUP", "DUP"]),
        noise=True, flags={}, seed=61),
    # fuzz incl. compound events under --graph --qname (GFA + isomorphism
    # artifacts byte-checked for every record the soup produces)
    "fuzz_graph": dict(
        events=_fuzz_events(103, {"chr1": 150000},
                            ["DEL", "INS", "DEL+INS", "INV+DEL"]),
        flags=dict(graph=True, qname=True), seed=67, ckpt_seed=1248),
    # fuzz under --hash: the k-mer realigner reshapes segments before
    # candidate emission, so any divergence shows in the beds/VCF
    "fuzz_hash": dict(
        chroms={"chr1": 180000},
        events=_fuzz_events(107, {"chr1": 180000},
                            ["DEL", "INS", "INV", "DUP"]),
        flags=dict(hash=True), seed=71),
    "base": dict(
        events=[("DEL", "chr1", 20000, 300), ("INS", "chr1", 60000, 220),
                ("INV", "chr1", 100000, 400), ("DEL", "chr1", 130000, 150)],
        flags={}, seed=11),
    "graph": dict(
        events=[("DEL+INS", "chr1", 20000, 300),
                ("INV+DEL", "chr1", 60000, 260),
                ("DEL+INS", "chr1", 100000, 280),
                ("DEL", "chr1", 130000, 200)],
        flags=dict(graph=True, qname=True), seed=23, ckpt_seed=1248),
    "hash": dict(
        events=[("DEL", "chr1", 20000, 300), ("INS", "chr1", 60000, 400),
                ("INV", "chr1", 100000, 400)],
        flags=dict(hash=True), seed=31),
    # two chromosomes: exercises per-chrom predict fragments + the merge's
    # cross-chromosome ID renumbering (output.py:311-331)
    "multichrom": dict(
        chroms={"chr1": 150000, "chr2": 120000},
        events=[("DEL", "chr1", 20000, 300), ("INS", "chr1", 60000, 220),
                ("DEL", "chr2", 30000, 260), ("INV", "chr2", 80000, 400)],
        flags={}, seed=37),
    # small window: 150 kb chrom split into 3 windows + boundary-straddling
    # event (window fetch-overlap semantics, SVision:182-201)
    "windows": dict(
        events=[("DEL", "chr1", 20000, 300), ("INS", "chr1", 49900, 220),
                ("INV", "chr1", 100000, 400)],
        flags=dict(window_size=50000), seed=41),
    # contig mode: min_support forced to 1, min_mapq to 0, window = contig
    # (SVision:161-162,179-180; collect_signatures.py:125)
    "contig": dict(
        events=[("DEL", "chr1", 20000, 300), ("INS", "chr1", 60000, 220)],
        support=2, flags=dict(contig=True), seed=43),
    # duplication signatures: tandem (ref-overlap => sigDup,
    # analyze_reads.py:355-424) and dispersed (main-x-other pairs)
    "duptypes": dict(
        events=[("tDUP", "chr1", 20000, 500), ("DUP", "chr1", 60000, 400),
                ("INS", "chr1", 100000, 220)],
        flags={}, seed=47),
    # filter paths + partition edges: low-mapq/secondary/unmapped noise
    # reads (collect_signatures.py:131-155) and two DELs 3.5 kb apart
    # (same 5 kb partition, cluster_signatures.py:51-66)
    "filters": dict(
        events=[("DEL", "chr1", 20000, 300), ("DEL", "chr1", 23500, 250),
                ("INS", "chr1", 60000, 220)],
        noise=True, flags={}, seed=53),
    # region mode (-c chr:x-y) with region > window: replicates the
    # reference's window-offset quirk — windows are laid out relative to 0,
    # not the region start (SVision:225-232), so the effective scan is
    # [0, region_length)
    "region": dict(
        events=[("DEL", "chr1", 20000, 300), ("INS", "chr1", 60000, 220),
                ("INV", "chr1", 100000, 400)],
        flags=dict(chrom="chr1:10000-140000", window_size=50000), seed=59),
}

_ckpt_cache = {}
_run_cache = {}


def _save_reference_ckpt(prefix: str, seed: int) -> None:
    """Random-init weights saved from the REFERENCE AlexNet graph itself, so
    variable names/shapes are exactly what Saver.restore expects
    (predict.py:165-184)."""
    tf = pytest.importorskip("tensorflow")
    v1 = tf.compat.v1
    v1.disable_eager_execution()
    ref_alexnet = ref_harness.load_reference_module("src.network.alexnet")
    v1.reset_default_graph()
    v1.set_random_seed(seed)
    x = v1.placeholder(tf.float32, [BATCH_SIZE, 227, 227, 3])
    keep_prob = v1.placeholder(tf.float32)
    ref_alexnet.AlexNet(x, keep_prob, 5, ["fc8", "fc7"])
    with v1.Session() as sess:
        sess.run(v1.global_variables_initializer())
        v1.train.Saver().save(sess, prefix)
    v1.reset_default_graph()


def _build_workspace(root, cfg):
    genome_path = os.path.join(root, "ref.fa")
    seqs = synth.make_genome(genome_path,
                             cfg.get("chroms", {"chr1": 150000}),
                             seed=cfg["seed"])
    bam_path = os.path.join(root, "sample.bam")
    synth.make_sv_bam(bam_path, seqs, seed=cfg["seed"],
                      support=cfg.get("support", 8), events=cfg["events"],
                      noise=cfg.get("noise", False))
    ckpt = os.path.join(root, "model.ckpt")
    # ckpt_seed picked so random weights still yield the config's interesting
    # outputs (the graph config needs >=1 <CSV> record to merge a GFA)
    _save_reference_ckpt(ckpt, cfg.get("ckpt_seed", 1234))
    return dict(genome=genome_path, bam=bam_path, ckpt=ckpt)


def _run_reference(ws, outdir, flags):
    """Drive the reference pipeline in-process (SVision:244-359 staging)."""
    ref_harness.install_fake_pysam()
    if ref_harness.REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, ref_harness.REFERENCE_ROOT)
    import src.collection.run_collection as ref_run_collection
    from src.network.predict import Predict
    from src.network.output import cal_scores_max_min, merge_split_vcfs

    opts = ref_harness.ref_options(
        ws["genome"], bam_path=ws["bam"], out_path=outdir, sample=SAMPLE,
        model_path=ws["ckpt"], min_support=MIN_SUPPORT,
        batch_size=BATCH_SIZE, **flags)
    if opts.contig:
        opts.min_support = 1     # driver override, SVision:161-162
    min_support = opts.min_support

    segments_dir = os.path.join(outdir, "segments")
    predict_dir = os.path.join(outdir, "predict_results")
    os.makedirs(segments_dir, exist_ok=True)
    os.makedirs(predict_dir, exist_ok=True)
    if opts.graph:
        os.makedirs(os.path.join(outdir, "graphs"), exist_ok=True)

    # window task list per SVision:164-242 (contig mode: window = contig;
    # region mode: windows relative to 0, the reference's offset quirk)
    from svision_tpu.io.bam import BamReader
    bam = BamReader(ws["bam"])
    if opts.chrom:
        name = opts.chrom
        if ":" in name:
            name, cords = name.split(":")
            rstart, rend = (int(c) for c in cords.split("-"))
        else:
            rstart, rend = 0, bam.get_reference_length(name)
        region_length = rend - rstart + 1
        window = opts.window_size
        if region_length < window:
            region_windows = [(rstart, rend)]
        else:
            region_windows = [(p, p + window)
                              for p in range(0, region_length - window + 1,
                                             window)]
            if region_windows[-1][1] < region_length:
                region_windows.append((region_windows[-1][1], region_length))
        chroms = [name]
    else:
        chroms = list(bam.references)
    for chrom in chroms:
        if opts.chrom:
            windows = region_windows
        else:
            length = bam.get_reference_length(chrom)
            window = length if opts.contig else opts.window_size
            windows = ([(0, length)] if length < window else
                       [(p, min(p + window, length))
                        for p in range(0, length, window)])
        part_beds = []
        for part, (ts, te) in enumerate(windows):
            err = ref_run_collection.run_detect(opts, ws["bam"], chrom,
                                                part, ts, te)
            assert err is None, err
            part_beds.append(os.path.join(
                segments_dir, f"{chrom}.segments.{part}.bed"))

        all_bed = os.path.join(segments_dir, f"{chrom}.segments.all.bed")
        with open(all_bed, "w") as out:       # the driver's `cat`
            for pb in part_beds:
                out.write(open(pb).read())

        prefix = os.path.join(predict_dir, f"{chrom}.predict.s{min_support}")
        Predict(chrom, all_bed).run(prefix, opts)

    scores = cal_scores_max_min(predict_dir)
    assert scores, "reference produced no calls"
    merged = os.path.join(outdir, f"{SAMPLE}.svision.s{min_support}.vcf")
    merge_split_vcfs(predict_dir, merged, np.max(scores), np.min(scores),
                     chroms, opts)

    if opts.graph:
        from src.collection.graph import collect_csv_same_format
        collect_csv_same_format(os.path.join(outdir, "graphs"), merged, opts)
        return os.path.join(outdir,
                            f"{SAMPLE}.svision.s{min_support}.graph.vcf")
    return merged


def _run_ours(ws, outdir, flags):
    from svision_tpu.cli import parse_arguments, run_pipeline
    argv = ["-o", outdir, "-b", ws["bam"], "-g", ws["genome"],
            "-m", ws["ckpt"], "-n", SAMPLE, "-s", str(MIN_SUPPORT),
            "--batch_size", str(BATCH_SIZE), "--exact", "--debug"]
    for flag, val in flags.items():
        if flag == "chrom":
            argv += ["-c", str(val)]
        elif val is True:
            argv.append(f"--{flag}")
        elif val is not False:
            argv += [f"--{flag}", str(val)]
    return run_pipeline(parse_arguments(argv))


def _runs(config, tmp_path_factory):
    """Build workspace + run both pipelines once per config (cached)."""
    if config not in _run_cache:
        cfg = CONFIGS[config]
        root = str(tmp_path_factory.mktemp(f"parity_{config}"))
        ws = _build_workspace(root, cfg)
        ref_dir = os.path.join(root, "ref")
        our_dir = os.path.join(root, "ours")
        ref_vcf = _run_reference(ws, ref_dir, cfg["flags"])
        our_vcf = _run_ours(ws, our_dir, cfg["flags"])
        _run_cache[config] = (ref_dir, ref_vcf, our_dir, our_vcf)
    return _run_cache[config]


def _read_vcf(path):
    header, records = [], []
    for line in open(path):
        (header if line.startswith("#") else records).append(line)
    return header, records


def _assert_vcf_identical(ref_vcf, our_vcf):
    ref_header, ref_records = _read_vcf(ref_vcf)
    our_header, our_records = _read_vcf(our_vcf)
    assert ref_records, "reference emitted no records"
    assert our_records == ref_records, (
        "VCF records differ\n--- reference ---\n" + "".join(ref_records)
        + "--- svision-tpu ---\n" + "".join(our_records))
    assert our_header == ref_header


@pytest.mark.slow
@pytest.mark.parametrize("config", list(CONFIGS))
def test_full_pipeline_vcf_identity(config, tmp_path_factory):
    _, ref_vcf, _, our_vcf = _runs(config, tmp_path_factory)
    _assert_vcf_identical(ref_vcf, our_vcf)


@pytest.mark.slow
def test_full_pipeline_candidate_beds_match(tmp_path_factory):
    """The intermediate candidate beds (collection output, 23 columns) must
    be byte-identical (--debug keeps ours)."""
    ref_dir, _, our_dir, _ = _runs("base", tmp_path_factory)
    ref_bed = open(os.path.join(ref_dir, "segments",
                                "chr1.segments.all.bed")).read()
    our_bed = open(os.path.join(our_dir, "segments",
                                "chr1.segments.0.bed")).read()
    assert ref_bed, "reference emitted no candidates"
    assert our_bed == ref_bed


@pytest.mark.slow
def test_full_pipeline_score_files_match(tmp_path_factory):
    """The per-chromosome .score.txt side channel feeds the global QUAL
    rescale; it must match line for line (same softmax after round(.,2))."""
    ref_dir, _, our_dir, _ = _runs("base", tmp_path_factory)
    name = f"chr1.predict.s{MIN_SUPPORT}.score.txt"
    ref_scores = open(os.path.join(ref_dir, "predict_results", name)).read()
    our_scores = open(os.path.join(our_dir, "predict_results", name)).read()
    assert our_scores == ref_scores


@pytest.mark.slow
def test_full_pipeline_graph_artifacts_match(tmp_path_factory):
    """Graph mode: merged per-record GFA files and the isomorphism summary
    files must be byte-identical (graph.py:584-673)."""
    ref_dir, _, our_dir, _ = _runs("graph", tmp_path_factory)
    for name in (f"{SAMPLE}.graph_exactly_match.txt",
                 f"{SAMPLE}.graph_symmetry_match.txt"):
        ref_txt = open(os.path.join(ref_dir, name)).read()
        our_txt = open(os.path.join(our_dir, name)).read()
        assert our_txt == ref_txt, name

    ref_gfas = sorted(f for f in os.listdir(os.path.join(ref_dir, "graphs"))
                      if f.endswith(".gfa"))
    our_gfas = sorted(f for f in os.listdir(os.path.join(our_dir, "graphs"))
                      if f.endswith(".gfa"))
    assert ref_gfas, "reference merged no CSV graphs"
    assert our_gfas == ref_gfas
    for name in ref_gfas:
        ref_g = open(os.path.join(ref_dir, "graphs", name)).read()
        our_g = open(os.path.join(our_dir, "graphs", name)).read()
        assert our_g == ref_g, name
