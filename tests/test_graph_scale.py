"""Isomorphism sweep at scale: the path-indexed ExactMatcher /
find_symmetric_pairs must (a) reproduce the reference's linear/pairwise scan
verdicts exactly, including the asymmetric dup-count quirk
(graph_is_same_as checks n1 subset-of n2, ref graph.py:182-247), and
(b) classify 10k graphs in seconds, not the O(G^2) the reference's sweep
takes (ref graph.py:629-643)."""
import random
import time

from svision_tpu.collect.graph import (Edge, ExactMatcher, Graph, Node,
                                       _edges_path, find_symmetric_pairs,
                                       graph_is_same_as)


def _mk_graph(rng, n_nodes=None, sym_of=None, dup_i0=False, n_i=None):
    """Random small graph: S0..Sk ref-chain + I nodes, edges in read order.
    sym_of: build the reverse-relabeled twin of another graph instead."""
    if sym_of is not None:
        counts = {}
        for n in sym_of.nodes:
            counts[n.id[0]] = counts.get(n.id[0], 0) + 1
        relabel = {n.id: f"{n.id[0]}{counts[n.id[0]] - int(n.id[1:]) - 1}"
                   for n in sym_of.nodes}
        nodes = [Node("chr1", n.ref_start, n.ref_end, n.read_start,
                      n.read_end, n.seq, n.is_reverse, relabel[n.id], "chr1")
                 for n in sym_of.nodes]
        for old, new in zip(sym_of.nodes, nodes):
            if old.node_is_dup:
                new.set_dup_node(relabel.get(old.dup_from, old.dup_from),
                                 old.dup_from_cord)
        edges = [Edge(relabel[e.node2], e.node2_is_reverse,
                      relabel[e.node1], e.node1_is_reverse, f"E{i}")
                 for i, e in enumerate(reversed(sym_of.edges))]
        return Graph(nodes, edges)
    n_s = n_nodes or rng.randint(2, 4)
    if n_i is None:
        n_i = rng.randint(0, 2)
    nodes = []
    for i in range(n_s):
        nodes.append(Node("chr1", i * 100, i * 100 + 90, i * 100,
                          i * 100 + 90, "A", False, f"S{i}", "chr1"))
    for i in range(n_i):
        node = Node("chr1", 50 + i, 50 + i, 45 + i, 95 + i, "C",
                    rng.random() < 0.3, f"I{i}", "chr1")
        if dup_i0 and i == 0:
            node.set_dup_node("S0", 50)
        nodes.append(node)
    order = nodes[:]
    rng.shuffle(order)
    edges = [Edge(order[k].id, order[k].is_reverse, order[k + 1].id,
                  order[k + 1].is_reverse, f"E{k}")
             for k in range(len(order) - 1)]
    return Graph(nodes, edges)


def _brute_exact(names, graphs):
    """The reference's linear scan (graph.py:624-643 exact loop)."""
    classes = {}
    reps = {}
    ids = []
    for name, g in zip(names, graphs):
        cnt = -1
        hit = None
        for base in classes:
            cnt += 1
            if graph_is_same_as(g, reps[base], strict=True):
                hit = (base, cnt)
                break
        if hit is None:
            classes[name] = [name]
            reps[name] = g
            ids.append(len(classes) - 1)
        else:
            classes[hit[0]].append(name)
            ids.append(hit[1])
    return classes, reps, ids


def _brute_sym(graphs):
    """The reference's all-pairs symmetry sweep (graph.py:629-643)."""
    pairs = []
    for i in range(len(graphs)):
        for j in range(i + 1, len(graphs)):
            if graph_is_same_as(graphs[j], graphs[i], strict=True):
                continue
            if graph_is_same_as(graphs[j], graphs[i], strict=False,
                                symmetry=True):
                pairs.append((i, j))
    return pairs


def test_exact_matcher_equals_linear_scan():
    rng = random.Random(7)
    graphs = [_mk_graph(rng, dup_i0=rng.random() < 0.3) for _ in range(400)]
    names = [f"g{i}" for i in range(len(graphs))]
    ref_classes, _, ref_ids = _brute_exact(names, graphs)

    matcher = ExactMatcher()
    got_ids = [matcher.add(n, g) for n, g in zip(names, graphs)]
    assert got_ids == ref_ids
    assert matcher.classes == ref_classes
    # some duplication must actually have happened for this to test anything
    assert len(ref_classes) < len(graphs)


def test_symmetric_pairs_equal_pairwise_sweep():
    rng = random.Random(11)
    graphs = []
    while len(graphs) < 120:
        g = _mk_graph(rng)
        graphs.append(g)
        if rng.random() < 0.4:
            graphs.append(_mk_graph(rng, sym_of=g))
    names = [f"g{i}" for i in range(len(graphs))]
    # symmetry runs on exact-class representatives, like the product path
    _, reps, _ = _brute_exact(names, graphs)
    rep_names = list(reps)
    rep_graphs = [reps[n] for n in rep_names]
    ref_pairs = _brute_sym(rep_graphs)
    got_pairs = find_symmetric_pairs(rep_names, rep_graphs)
    assert got_pairs == ref_pairs
    assert len(ref_pairs) > 0   # the corpus must contain symmetric twins


def test_dup_count_asymmetry_preserved():
    """graph_is_same_as's subset count check is asymmetric: a no-dup target
    matches a dup base with the same path, not vice versa. The index must
    not collapse the two directions."""
    rng = random.Random(3)
    g_dup = _mk_graph(rng, n_nodes=2, dup_i0=True, n_i=1)
    g_plain = Graph([Node("chr1", n.ref_start, n.ref_end, n.read_start,
                          n.read_end, n.seq, n.is_reverse, n.id, "chr1")
                     for n in g_dup.nodes],
                    g_dup.edges)
    assert _edges_path(g_dup.edges) == _edges_path(g_plain.edges)
    assert graph_is_same_as(g_plain, g_dup, strict=True)
    assert not graph_is_same_as(g_dup, g_plain, strict=True)

    # dup base first: plain joins its class (ref scan order does the same)
    m = ExactMatcher()
    assert m.add("dup", g_dup) == 0
    assert m.add("plain", g_plain) == 0
    # plain base first: dup cannot join and founds its own class
    m2 = ExactMatcher()
    assert m2.add("plain", g_plain) == 0
    assert m2.add("dup", g_dup) == 1


def test_10k_graph_sweep_is_fast():
    rng = random.Random(23)
    base_pool = [_mk_graph(rng) for _ in range(60)]
    graphs = []
    for i in range(10000):
        g = base_pool[rng.randrange(len(base_pool))]
        graphs.append(Graph(g.nodes, g.edges))
    names = [f"g{i}" for i in range(len(graphs))]

    t0 = time.perf_counter()
    matcher = ExactMatcher()
    for n, g in zip(names, graphs):
        matcher.add(n, g)
    reps = list(matcher.classes)
    find_symmetric_pairs(reps, [matcher.graph(r) for r in reps])
    dt = time.perf_counter() - t0

    assert sum(len(v) for v in matcher.classes.values()) == 10000
    # reference-style O(G^2) on 10k graphs is ~50M path comparisons (minutes
    # with disk re-parses); the indexed sweep must land in seconds
    assert dt < 10.0, f"10k-graph sweep took {dt:.1f}s"
