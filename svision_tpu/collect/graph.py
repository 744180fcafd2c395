"""CSV breakpoint graphs: per-read GFA construction, isomorphism, VCF annotation.

Port of src/collection/graph.py. Structural changes vs the reference:
  * graphs are classified in memory — the reference re-parses every GFA file
    from disk inside an O(G^2) loop (graph.py:629-643); here each graph is
    parsed once and cached
  * ref-sequence fetches go through the engine's shared FastaFile handle
    instead of pysam.FastaFile reopened per gap (graph.py:450)
GFA bytes and match summaries are unchanged.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple


class Node:
    def __init__(self, chrom, ref_start, ref_end, read_start, read_end, seq,
                 is_reverse, node_id, host):
        self.chr = chrom
        self.ref_start = ref_start
        self.ref_end = ref_end
        self.read_start = read_start
        self.read_end = read_end
        self.is_reverse = is_reverse
        self.id = node_id
        self.seq = seq
        self.host = host
        self.depth = 0
        self.node_is_dup = False
        self.dup_from = -1
        self.dup_from_cord = -1

    def set_dup_node(self, dup_from, dup_from_cord):
        if dup_from != -1:
            self.node_is_dup = True
            self.dup_from = dup_from
            self.dup_from_cord = dup_from_cord


class Edge:
    def __init__(self, node1, node1_is_reverse, node2, node2_is_reverse, edge_id):
        self.node1 = node1
        self.node1_is_reverse = node1_is_reverse
        self.node2 = node2
        self.node2_is_reverse = node2_is_reverse
        self.id = edge_id
        self.edge_is_dup = False


class Graph:
    def __init__(self, nodes, edges, qname=""):
        self.nodes = nodes
        self.edges = edges
        self.appear_time = 1
        self.qname = qname


def _overlap_ratio_nodes(base: Node, target: Optional[Node],
                         left_most, right_most) -> float:
    """Node-level copy of the overlap rule (graph.py:275-298)."""
    if target is None:
        return 0
    if base is target:
        return 0
    if base.ref_start < left_most:
        return 1.0
    if base.ref_end > right_most:
        return 1.0
    base_len = base.ref_end - base.ref_start
    if base.ref_start >= target.ref_start and base.ref_end <= target.ref_end:
        return 1.0
    if base.ref_end >= target.ref_end > base.ref_start \
            and target.ref_start < base.ref_start:
        return (target.ref_end - base.ref_start) / base_len
    if base.ref_end < target.ref_start < base.ref_start \
            and target.ref_end > base.ref_end:
        return (base.ref_end - target.ref_start) / base_len
    return 0


def _align_node(align, node_id: str, host: Optional[str] = None) -> Node:
    """Node from an alignment-segment dict (host defaults to its chrom)."""
    return Node(align["ref_chr"], align["ref_start"], align["ref_end"],
                align["q_start"], align["q_end"], align["read_seq"],
                align["is_reverse"], node_id,
                align["ref_chr"] if host is None else host)


def _dup_split(cur_align, next_align, dup_len: int):
    """Ref-overlap between the two mains: the first `dup_len` read bases of
    `next` re-traverse reference already covered by `cur`. Split them off as
    a helper duplication segment and return (dup_seg, remainder). Both halves
    inherit qual/ref_id/strand/read_name from CUR, not next — a reference
    quirk kept for GFA identity (graph.py:322-357); the remainder shifts by
    dup_len+1 on both axes."""
    base = dict(ref_chr=next_align["ref_chr"], qual=cur_align["qual"],
                ref_id=cur_align["ref_id"],
                is_reverse=cur_align["is_reverse"],
                read_name=cur_align["read_name"])
    dup = dict(base,
               q_start=next_align["q_start"],
               q_end=next_align["q_start"] + dup_len,
               ref_start=next_align["ref_start"],
               ref_end=next_align["ref_start"] + dup_len,
               read_seq=next_align["read_seq"][:dup_len])
    rest = dict(base,
                q_start=next_align["q_start"] + dup_len + 1,
                q_end=next_align["q_end"],
                ref_start=next_align["ref_start"] + dup_len + 1,
                ref_end=next_align["ref_end"],
                read_seq=next_align["read_seq"][dup_len:])
    return dup, rest


def generate_graph(cur_align, next_align, help_aligns, min_sv_size,
                   whole_read_seq, ref, qname, next_is_last=True) -> Graph:
    """Build the per-read breakpoint graph for a main pair + helpers
    (graph.py:303-478). `ref` is an open FastaFile."""
    skeleton_num = 0
    insert_num = 0
    skeleton: List[Node] = []
    inserts: List[Node] = []

    cur_node = _align_node(cur_align, f"S{skeleton_num}")
    skeleton.append(cur_node)
    skeleton_num += 1

    distance_on_ref = next_align["ref_start"] - cur_align["ref_end"]
    dup_len = abs(distance_on_ref)

    if distance_on_ref <= -min_sv_size:
        # ref overlap: split next into dup part + remainder (graph.py:318-359)
        dup_seg, new_next = _dup_split(cur_align, next_align, dup_len)
        help_aligns.append(dup_seg)
        if new_next["ref_start"] < new_next["ref_end"]:
            next_node = _align_node(new_next, f"S{skeleton_num}")
            skeleton.append(next_node)
            skeleton_num += 1
        elif next_is_last:
            next_node = None
        else:
            # fully-consumed remainder mid-read: keep a fixed 500 bp stub so
            # downstream edges have an anchor (graph.py:344-356)
            stub = dict(new_next,
                        ref_end=new_next["ref_start"] + 500,
                        q_end=new_next["q_start"] + 500)
            next_node = _align_node(stub, f"S{skeleton_num}")
            skeleton.append(next_node)
            skeleton_num += 1
    else:
        next_node = _align_node(next_align, f"S{skeleton_num}")
        skeleton.append(next_node)
        skeleton_num += 1

    # classify helper aligns into insertion vs skeleton nodes (graph.py:369-417)
    left_most = cur_align["ref_start"]
    right_most = next_align["ref_end"]
    for align in help_aligns:
        tmp = _align_node(align, "None", host=align["read_name"])
        ov_cur = _overlap_ratio_nodes(tmp, cur_node, left_most, right_most)
        ov_next = _overlap_ratio_nodes(tmp, next_node, left_most, right_most)

        if align["is_reverse"]:
            if ov_cur > 0.8:
                tmp.id = f"I{insert_num}"
                tmp.set_dup_node(cur_node.id, tmp.ref_start)
                inserts.append(tmp)
                insert_num += 1
            elif ov_next > 0.8:
                tmp.id = f"I{insert_num}"
                tmp.set_dup_node(next_node.id, tmp.ref_start)
                inserts.append(tmp)
                insert_num += 1
            else:
                tmp.id = f"S{skeleton_num}"
                tmp.host = align["ref_chr"]
                skeleton.append(tmp)
                skeleton_num += 1
        else:
            if ov_cur > 0.8:
                tmp.set_dup_node(cur_node.id, tmp.ref_start)
            elif ov_next > 0.8:
                tmp.set_dup_node(next_node.id, tmp.ref_start)
            tmp.id = f"I{insert_num}"
            inserts.append(tmp)
            insert_num += 1

    # edges follow read order; read gaps add insertion nodes (graph.py:419-438)
    by_read = sorted(skeleton + inserts, key=lambda n: n.read_start)
    edges: List[Edge] = []
    edge_num = 0
    for i in range(1, len(by_read)):
        if by_read[i].read_start - by_read[i - 1].read_end > min_sv_size:
            tmp = Node(by_read[i].chr, by_read[i].ref_start,
                       by_read[i].ref_start, by_read[i - 1].read_end + 1,
                       by_read[i].read_start - 1,
                       whole_read_seq[by_read[i - 1].read_end + 1:
                                      by_read[i].read_start - 1],
                       False, f"I{insert_num}", cur_align["read_name"])
            inserts.append(tmp)
            insert_num += 1
            edges.append(Edge(by_read[i - 1].id, by_read[i - 1].is_reverse,
                              tmp.id, tmp.is_reverse, f"E{edge_num}"))
            edge_num += 1
            edges.append(Edge(tmp.id, tmp.is_reverse, by_read[i].id,
                              by_read[i].is_reverse, f"E{edge_num}"))
            edge_num += 1
        else:
            edges.append(Edge(by_read[i - 1].id, by_read[i - 1].is_reverse,
                              by_read[i].id, by_read[i].is_reverse,
                              f"E{edge_num}"))
            edge_num += 1

    # ref gaps between skeleton nodes add reference-sequence nodes
    # (graph.py:441-453)
    skel_by_ref = sorted(skeleton, key=lambda n: n.ref_start)
    for i in range(1, len(skel_by_ref)):
        gap_on_ref = skel_by_ref[i].ref_start - skel_by_ref[i - 1].ref_end
        if gap_on_ref > min_sv_size:
            node_chr = skel_by_ref[i].chr
            start = skel_by_ref[i - 1].ref_end + 1
            end = skel_by_ref[i].ref_start - 1
            ref_seq = ref.fetch(node_chr, start, end)
            skeleton.append(Node(node_chr, start, end, -1, -1, ref_seq, False,
                                 f"S{skeleton_num}", skel_by_ref[i].host))
            skeleton_num += 1

    # renumber ids ref-sorted (S*) / read-sorted (I*) (graph.py:455-477)
    update_id: Dict[str, str] = {}
    skel_by_ref = sorted(skeleton, key=lambda n: n.ref_start)
    for i, node in enumerate(skel_by_ref):
        update_id[node.id] = f"S{i}"
        node.id = f"S{i}"
    ins_by_read = sorted(inserts, key=lambda n: n.read_start)
    for i, node in enumerate(ins_by_read):
        update_id[node.id] = f"I{i}"
        node.id = f"I{i}"
    for edge in edges:
        edge.node1 = update_id[edge.node1]
        edge.node2 = update_id[edge.node2]

    return Graph(skel_by_ref + ins_by_read, edges, qname)


# ---------------------------------------------------------------------------
# GFA serialization / parsing (graph.py:103-179)
# ---------------------------------------------------------------------------

def write_graph_to_file(graph: Graph, path: str):
    node_pos = set()
    node_list = []
    link_list = []
    with open(path, "w") as fout:
        for node in graph.nodes:
            node_seq = node.seq if node.seq != "" else "N"
            if "I" in node.id:
                if node.node_is_dup:
                    fout.write(
                        f"S\t{node.id}\t{node_seq}\tSN:Z:{node.host}\t"
                        f"SO:i:{node.read_start}\tSR:i:0\tLN:i:{len(node_seq)}\t"
                        f"DP:S:{node.dup_from}:{node.dup_from_cord}\n")
                    node_pos.add(node.dup_from_cord)
                else:
                    fout.write(
                        f"S\t{node.id}\t{node_seq}\tSN:Z:{node.host}\t"
                        f"SO:i:{node.read_start}\tSR:i:0\tLN:i:{len(node_seq)}\n")
            else:
                fout.write(
                    f"S\t{node.id}\t{node_seq}\tSN:Z:{node.host}\t"
                    f"SO:i:{node.ref_start}\tSR:i:0\tLN:i:{len(node_seq)}\n")
                node_pos.add(node.ref_start)
            node_list.append(node.id)
        for edge in graph.edges:
            d1 = "-" if edge.node1_is_reverse else "+"
            d2 = "-" if edge.node2_is_reverse else "+"
            fout.write(f"L\t{edge.node1}\t{d1}\t{edge.node2}\t{d2}\t0M\tSR:i:0\n")
            link_list.append(f"{edge.node1}{d1}{edge.node2}")
    return list(node_pos), node_list, link_list


def parse_gfa_file(path: str) -> Graph:
    nodes = []
    edges = []
    with open(path) as fin:
        for line in fin.readlines():
            parts = line.strip().split("\t")
            if parts[0] == "S":
                node_id = parts[1]
                node_seq = parts[2]
                node_host = parts[3].split(":")[-1]
                node_start = parts[4].split(":")[-1]
                if len(parts) == 8:
                    dup_from = parts[7].split(":")[2]
                    dup_from_cord = int(parts[7].split(":")[3])
                else:
                    dup_from = -1
                    dup_from_cord = -1
                node = Node(-1, node_start, -1, node_start, -1, node_seq,
                            False, node_id, node_host)
                node.set_dup_node(dup_from, dup_from_cord)
                nodes.append(node)
            elif parts[0] == "L":
                edges.append(Edge(parts[1], parts[2] == "-", parts[3],
                                  parts[4] == "-", 0))
    return Graph(nodes, edges)


# ---------------------------------------------------------------------------
# isomorphism (graph.py:182-272)
# ---------------------------------------------------------------------------

def _node_type_counts(nodes: List[Node]) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for node in nodes:
        t = node.id[0]
        counts[t] = counts.get(t, 0) + 1
        if node.node_is_dup:
            counts["D"] = counts.get("D", 0) + 1
    return counts


def _edges_path(edges: List[Edge]) -> str:
    out = []
    for e in edges:
        out.append(e.node1)
        out.append("-" if e.node1_is_reverse else "+")
        out.append(e.node2)
        out.append("-" if e.node2_is_reverse else "+")
    return "".join(out)


def graph_is_same_as(g1: Graph, g2: Graph, strict=False, symmetry=False) -> bool:
    n1 = _node_type_counts(g1.nodes)
    n2 = _node_type_counts(g2.nodes)
    if len(g1.nodes) != len(g2.nodes) or len(g1.edges) != len(g2.edges):
        return False
    for t, c in n1.items():
        if t not in n2 or n2[t] != c:
            return False
    if symmetry:
        # reverse-relabeled path equality (graph.py:249-267)
        update = {}
        for node in g2.nodes:
            t = node.id[0]
            num = int(node.id[1:])
            update[node.id] = f"{t}{n2[t] - num - 1}"
        rev_path = []
        for e in reversed(g2.edges):
            rev_path.append(update[e.node2])
            rev_path.append("-" if e.node2_is_reverse else "+")
            rev_path.append(update[e.node1])
            rev_path.append("-" if e.node1_is_reverse else "+")
        if _edges_path(g1.edges) != "".join(rev_path):
            return False
    if strict and _edges_path(g1.edges) != _edges_path(g2.edges):
        return False
    return True


class ExactMatcher:
    """Insertion-ordered exact-match classes with an O(1) path index.

    The reference scans every existing base per new graph
    (graph.py:624-643); since strict matching *requires* edge-path string
    equality (graph_is_same_as), candidates are exactly the bases sharing
    the path string — the index keys on it and only the (cheap, asymmetric)
    count check runs per candidate. GraphID numbering and class membership
    are identical to the linear scan: within a path bucket, insertion order
    is preserved and the first passing base wins, which is the same base the
    reference's full scan would reach first.
    """

    def __init__(self):
        self.classes: Dict[str, List[str]] = {}     # base name -> members
        self._graphs: Dict[str, Graph] = {}          # base name -> graph
        self._ids: Dict[str, int] = {}               # base name -> GraphID
        self._by_path: Dict[str, List[str]] = {}     # path -> base names

    def add(self, name: str, graph: Graph) -> int:
        """Classify `graph`; returns its GraphID (the matched base's index
        in insertion order, or a fresh one)."""
        path = _edges_path(graph.edges)
        for base in self._by_path.get(path, ()):
            if graph_is_same_as(graph, self._graphs[base], strict=True):
                self.classes[base].append(name)
                return self._ids[base]
        gid = len(self.classes)
        self.classes[name] = [name]
        self._graphs[name] = graph
        self._ids[name] = gid
        self._by_path.setdefault(path, []).append(name)
        return gid

    def graph(self, name: str) -> Graph:
        return self._graphs[name]


def _reverse_path(graph: Graph) -> str:
    """The reverse-relabeled edge path of graph_is_same_as(symmetry=True)
    (graph.py:249-267), precomputed once per representative."""
    counts = _node_type_counts(graph.nodes)
    update = {}
    for node in graph.nodes:
        t = node.id[0]
        num = int(node.id[1:])
        update[node.id] = f"{t}{counts[t] - num - 1}"
    out = []
    for e in reversed(graph.edges):
        out.append(update[e.node2])
        out.append("-" if e.node2_is_reverse else "+")
        out.append(update[e.node1])
        out.append("-" if e.node1_is_reverse else "+")
    return "".join(out)


def find_symmetric_pairs(names: List[str], graphs: List[Graph]):
    """All (i, j) i<j pairs whose graphs are symmetric but not exact matches
    (the reference's O(G^2) sweep, graph.py:629-643), via a path index.

    g_j sym-matches base g_i iff path(g_j) == reverse_path(g_i) plus the
    count checks — so candidates for each i come from a path -> indices map
    instead of the full pair scan. The surviving candidates (few) run the
    original graph_is_same_as calls, keeping the recorded verdicts and the
    later-j-overwrites-earlier-j semantics bit-identical.

    Returns (sym_matching, sym_pair) keyed by base name, matching
    collect_csv_same_format's summary structures minus the class-member
    concatenation (done by the caller, which owns the exact classes)."""
    paths = [_edges_path(g.edges) for g in graphs]
    revpaths = [_reverse_path(g) for g in graphs]
    by_path: Dict[str, List[int]] = {}
    for idx, p in enumerate(paths):
        by_path.setdefault(p, []).append(idx)

    pairs: List[Tuple[int, int]] = []
    for i in range(len(graphs)):
        for j in by_path.get(revpaths[i], ()):
            if j <= i:
                continue
            if graph_is_same_as(graphs[j], graphs[i], strict=True):
                continue
            if graph_is_same_as(graphs[j], graphs[i], strict=False,
                                symmetry=True):
                pairs.append((i, j))
    return pairs


def classify_graphs(graphs: List[Graph]) -> List[Graph]:
    """Group identical graphs; majority first (graph.py:72-100, including the
    reference's loop-variable shadowing which increments the count of the
    first matching entry)."""
    final = [graphs[0]]
    for gi in range(1, len(graphs)):
        graph = graphs[gi]
        flags = [1 if graph_is_same_as(graph, t, strict=True) else 0
                 for t in final]
        if 1 not in flags:
            final.append(graph)
        else:
            for i in range(len(flags)):
                if flags[i] == 1:
                    final[i].appear_time += 1
    return sorted(final, key=lambda g: g.appear_time, reverse=True)


def parse_graph_features(graph: Graph):
    counts = _node_type_counts(graph.nodes)
    nodes_feature = ",".join(f"{k}:{v}" for k, v in counts.items())
    return nodes_feature, len(graph.edges), _edges_path(graph.edges)


# ---------------------------------------------------------------------------
# VCF annotation driver (graph.py:518-674)
# ---------------------------------------------------------------------------

def collect_csv_same_format(gfa_path: str, vcf_path: str, options) -> Tuple[Dict, Dict]:
    from svision_tpu.call.vcfout import read_vcf

    out_path = options.out_path
    sample = options.sample
    min_support = options.min_support

    graph_vcf_path = os.path.join(out_path,
                                  f"{sample}.svision.s{min_support}.graph.vcf")
    logging.info("Adding GraphID, GFA INFO fields to VCF, output "
                 f"{sample}.svision.s{min_support}.graph.vcf")

    matcher = ExactMatcher()  # in-memory + path-indexed (fixes the
    # reference's O(G^2) disk re-parse sweep, graph.py:629-643)
    symmetry_matching: Dict[str, List[str]] = {}
    symmetry_matching_pair: Dict[str, List[str]] = {}

    header, records = read_vcf(vcf_path)
    with open(graph_vcf_path, "w") as graph_vcf:
        graph_vcf.write("\n".join(header) + "\n")

        for record in records:
            chrom = record.contig
            start = record.pos
            end = record.stop
            rec_id = record.id
            sv_type = record.info["SVTYPE"]

            parts = record.parts
            main_info = parts[:len(parts) - 2]
            gt_info = "\t".join(parts[-2:])

            record_gfa_dir = os.path.join(gfa_path, f"{chrom}-{start}-{end}")

            if "CSV" not in record.line:
                main_info[-1] += ";GraphID=-1;GFA_ID=.;GFA_S=.;GFA_L=."
                graph_vcf.write("\t".join(main_info) + "\t" + gt_info + "\n")
                continue
            if not os.path.exists(record_gfa_dir):
                continue  # CSV without graphs silently dropped (graph.py:571-572)

            record_graphs = [
                parse_gfa_file(os.path.join(
                    record_gfa_dir, "{}.gfa".format(read.replace("/", "_"))))
                for read in record.reads]
            final_graph = classify_graphs(record_graphs)[0]
            target_gfa = f"{chrom}-{start}-{end}-{rec_id}-{sv_type}"
            final_path = os.path.join(gfa_path, f"{target_gfa}.gfa")
            _, node_list, link_list = write_graph_to_file(final_graph, final_path)
            # classify the round-tripped graph (the reference compares parsed
            # GFAs, whose parse drops ref_end/read ordering detail — parity
            # requires matching on the same representation)
            graph_id = matcher.add(target_gfa, parse_gfa_file(final_path))

            main_info[-1] += (f";GraphID={graph_id};GFA_ID={target_gfa};"
                              f"GFA_S={','.join(node_list)};"
                              f"GFA_L={','.join(link_list)}")
            graph_vcf.write("\t".join(main_info) + "\t" + gt_info + "\n")

    logging.info("Find symmetric graphs")
    exactly_matching = matcher.classes
    gfas = list(exactly_matching.keys())
    for i, j in find_symmetric_pairs(gfas, [matcher.graph(g) for g in gfas]):
        base_gfa, target_gfa = gfas[i], gfas[j]
        symmetry_matching[base_gfa] = (exactly_matching[base_gfa]
                                       + exactly_matching[target_gfa])
        symmetry_matching_pair[base_gfa] = [
            f"{i},{j}",
            f"{len(exactly_matching[base_gfa])},"
            f"{len(exactly_matching[target_gfa])}"]

    with open(os.path.join(out_path, f"{sample}.graph_exactly_match.txt"),
              "w") as fout:
        for cnt, base_gfa in enumerate(exactly_matching.keys()):
            nf, ef, pf = parse_graph_features(matcher.graph(base_gfa))
            fout.write(f"> GraphId={cnt}\tNumber={len(exactly_matching[base_gfa])}"
                       f"\tNodes={nf}\tEdges={ef}\tPath={pf}\n")
            fout.write("\t".join(exactly_matching[base_gfa]))
            fout.write("\n")

    with open(os.path.join(out_path, f"{sample}.graph_symmetry_match.txt"),
              "w") as fout:
        for base_gfa in symmetry_matching.keys():
            if len(symmetry_matching[base_gfa]) == 0:
                continue
            nf, ef, pf = parse_graph_features(matcher.graph(base_gfa))
            fout.write(f"> GraphId={symmetry_matching_pair[base_gfa][0]}"
                       f"\tNumber={symmetry_matching_pair[base_gfa][1]}"
                       f"\tNodes={nf}\tEdges={ef}\tPath={pf}")
            target = symmetry_matching[base_gfa][-1]
            # the reference re-parses the last member's GFA here; class
            # members are exact matches of their base, so the base's parsed
            # graph yields the identical path string
            target_base = next(b for b, members in exactly_matching.items()
                               if target in members)
            _, _, pf2 = parse_graph_features(matcher.graph(target_base))
            fout.write(f",{pf2}\n")
            fout.write("\t".join(symmetry_matching[base_gfa]))
            fout.write("\n")
    return exactly_matching, symmetry_matching
