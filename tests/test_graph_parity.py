"""CSV graph subsystem parity vs the reference (generate_graph, GFA bytes,
isomorphism)."""
import os
import random
import sys

import pytest

from tests import ref_harness
from svision_tpu.collect import graph as G
from svision_tpu.io.fasta import write_fasta, FastaFile

ref_harness.install_fake_pysam()
if ref_harness.REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, ref_harness.REFERENCE_ROOT)
import src.collection.graph as REF_G  # noqa: E402


@pytest.fixture(scope="module")
def genome(tmp_path_factory):
    rng = random.Random(5)
    seq = "".join(rng.choice("ACGT") for _ in range(50000))
    path = str(tmp_path_factory.mktemp("g") / "ref.fa")
    write_fasta(path, {"chr1": seq})
    return path


def _seg(rng, q0, q1, r0, r1, rev=False):
    return {
        "ref_chr": "chr1", "q_start": q0, "q_end": q1, "qual": 60,
        "ref_id": 0, "ref_start": r0, "ref_end": r1, "is_reverse": rev,
        "read_name": "readX",
        "read_seq": "".join(rng.choice("ACGT") for _ in range(max(q1 - q0, 1))),
    }


def _scenarios(rng):
    # (cur, next, helps, next_is_last)
    out = []
    # plain del gap
    out.append((_seg(rng, 0, 1000, 1000, 2000), _seg(rng, 1010, 2000, 2400, 3400),
                [], True))
    # ref overlap (dup split)
    out.append((_seg(rng, 0, 1000, 1000, 2000), _seg(rng, 1001, 2100, 1700, 2800),
                [], True))
    # helper: reverse inside span (insertion/dup candidates)
    out.append((_seg(rng, 0, 800, 500, 1300),
                _seg(rng, 1900, 2600, 1400, 2100),
                [_seg(rng, 850, 1500, 600, 1250, rev=True)], False))
    # helper far away -> skeleton node + read gap insertion node
    out.append((_seg(rng, 0, 800, 500, 1300),
                _seg(rng, 2500, 3200, 3000, 3700),
                [_seg(rng, 900, 1500, 10000, 10600, rev=True)], True))
    return out


def _graph_tuple(g):
    nodes = [(n.id, str(n.ref_start), str(n.ref_end), n.read_start, n.read_end,
              n.is_reverse, n.seq, n.node_is_dup, str(n.dup_from)) for n in g.nodes]
    edges = [(e.node1, e.node1_is_reverse, e.node2, e.node2_is_reverse)
             for e in g.edges]
    return nodes, edges


def test_generate_graph_parity(genome):
    rng = random.Random(6)
    ref = FastaFile(genome)
    whole_read = "".join(rng.choice("ACGT") for _ in range(5000))
    for i, (cur, nxt, helps, last) in enumerate(_scenarios(rng)):
        import copy
        got = G.generate_graph(copy.deepcopy(cur), copy.deepcopy(nxt),
                               copy.deepcopy(helps), 50, whole_read, ref,
                               "readX", last)
        # reference fetches the FASTA itself via (fake) pysam
        want = REF_G.generate_graph(copy.deepcopy(cur), copy.deepcopy(nxt),
                                    copy.deepcopy(helps), 50, whole_read,
                                    genome, "readX", last)
        assert _graph_tuple(got) == _graph_tuple(want), i


def test_gfa_bytes_and_roundtrip(genome, tmp_path):
    rng = random.Random(7)
    ref = FastaFile(genome)
    whole_read = "".join(rng.choice("ACGT") for _ in range(5000))
    for i, (cur, nxt, helps, last) in enumerate(_scenarios(rng)):
        import copy
        g_ours = G.generate_graph(copy.deepcopy(cur), copy.deepcopy(nxt),
                                  copy.deepcopy(helps), 50, whole_read, ref,
                                  "readX", last)
        g_ref = REF_G.generate_graph(copy.deepcopy(cur), copy.deepcopy(nxt),
                                     copy.deepcopy(helps), 50, whole_read,
                                     genome, "readX", last)
        p1 = str(tmp_path / f"ours{i}.gfa")
        p2 = str(tmp_path / f"ref{i}.gfa")
        ours_meta = G.write_graph_to_file(g_ours, p1)
        ref_meta = REF_G.write_graph_to_file(g_ref, p2)
        assert open(p1).read() == open(p2).read(), i
        assert ours_meta[1] == ref_meta[1] and ours_meta[2] == ref_meta[2]
        # round-trip parse equivalence
        back_ours = G.parse_gfa_file(p1)
        back_ref = REF_G.parse_gfa_file(p2)
        assert _graph_tuple(back_ours)[1] == _graph_tuple(back_ref)[1]


def test_isomorphism_parity(genome, tmp_path):
    rng = random.Random(8)
    ref = FastaFile(genome)
    whole_read = "".join(rng.choice("ACGT") for _ in range(5000))
    graphs_ours, graphs_ref = [], []
    for i, (cur, nxt, helps, last) in enumerate(_scenarios(rng) * 2):
        import copy
        graphs_ours.append(G.generate_graph(
            copy.deepcopy(cur), copy.deepcopy(nxt), copy.deepcopy(helps), 50,
            whole_read, ref, "readX", last))
        graphs_ref.append(REF_G.generate_graph(
            copy.deepcopy(cur), copy.deepcopy(nxt), copy.deepcopy(helps), 50,
            whole_read, genome, "readX", last))
    n = len(graphs_ours)
    for i in range(n):
        for j in range(n):
            for kwargs in ({"strict": True}, {"strict": False},
                           {"strict": False, "symmetry": True}):
                got = G.graph_is_same_as(graphs_ours[i], graphs_ours[j], **kwargs)
                want = REF_G.graph_is_same_as(graphs_ref[i], graphs_ref[j],
                                              **kwargs)
                assert got == want, (i, j, kwargs)
    # classify_graphs grouping identical
    ours = G.classify_graphs(list(graphs_ours))
    want = REF_G.classify_graphs(list(graphs_ref))
    assert [g.appear_time for g in ours] == [g.appear_time for g in want]
