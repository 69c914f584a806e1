"""Subpath constraints: converting reads into walks in the breakpoint graph.

Behavioral port of the reference's path-constraint construction
(``src/path_constraints.py``).  A path is the reference's alternating list
[edge, node, edge, node, ..., edge] where an edge is ``(type, index)`` with
type in {'s','c','d'} and a node is ``(chrom, pos, orientation)``.
"""
from __future__ import annotations

from typing import Dict

from ..graph.breakpoint_graph import SEQ, CONC, DISC, BreakpointGraph
from ..ops.breakpoints import interval_overlap

EDGE_SLOT = {"s": SEQ, "c": CONC, "d": DISC}


def valid_path(g: BreakpointGraph, path: list) -> bool:
    """A valid path alternates seq/breakpoint edges through consistent
    nodes, has >= 3 sequence edges, and terminates with sequence edges
    (reference ``path_constraints.py:10-45``)."""
    if len(path) <= 3 or len(path) % 2 == 0:
        return False
    if path[0][0] != "s" or path[-1][0] != "s":
        return False
    for i in range(len(path)):
        if i % 2 == 0:
            if len(path[i]) != 2:
                return False
        else:
            if len(path[i]) != 3:
                return False
            e1, e2 = path[i - 1], path[i + 1]
            try:
                if (e1[0] == "s") == (e2[0] == "s"):
                    return False
                if e1[1] not in g.nodes[path[i]][EDGE_SLOT[e1[0]]]:
                    return False
                if e2[1] not in g.nodes[path[i]][EDGE_SLOT[e2[0]]]:
                    return False
            except KeyError:
                return False
    return True


def _overlapping_seq_edges(g, al, oriented: bool):
    """Sequence edges overlapping alignment interval ``al``; when oriented,
    returns [idx, strand] honoring the '-'-interval storage convention."""
    out = []
    for segi, e in enumerate(g.sequence_edges):
        seg_int = [e.chrom, e.start, e.end]
        if not oriented:
            if interval_overlap(al, seg_int):
                out.append(segi)
        else:
            if al[-1] == "+":
                if interval_overlap(al, seg_int):
                    out.append([segi, "+"])
            else:
                if interval_overlap([al[0], al[2], al[1]], seg_int):
                    out.append([segi, "-"])
    return out


def traverse_through_sequence_edge(g: BreakpointGraph, start_node, end_node) -> list:
    """Walk seq+concordant edges from start_node to end_node (reference
    ``:304-342``); result starts and ends with the given nodes."""
    assert start_node[2] != end_node[2]
    path = [start_node]
    seqi = g.nodes[start_node][SEQ][0]
    e = g.sequence_edges[seqi]
    next_end = (e.chrom, e.start, "-") if start_node[2] == "+" else (e.chrom, e.end, "+")
    path.append(("s", seqi))
    path.append(next_end)
    while next_end != end_node:
        cl = g.nodes[next_end][CONC]
        if not cl:
            return path  # alignment spans two amplicon intervals
        ci = cl[0]
        path.append(("c", ci))
        ce = g.concordant_edges[ci]
        next_start = ce.node1() if ce.node1() != next_end else ce.node2()
        path.append(next_start)
        seqi = g.nodes[next_start][SEQ][0]
        e = g.sequence_edges[seqi]
        next_end = (e.chrom, e.start, "-") if next_start[2] == "+" \
            else (e.chrom, e.end, "+")
        path.append(("s", seqi))
        path.append(next_end)
    return path


def alignment_to_path(g: BreakpointGraph, rint, min_overlap: int = 500) -> list:
    """Concordant read -> path (reference ``:48-88``)."""
    seq_edge_list = _overlapping_seq_edges(g, rint, oriented=False)
    if not seq_edge_list:
        return []
    seq_edge_list.sort(key=lambda i: g.sequence_edges[i].start)
    segi0 = seq_edge_list[0]
    e0 = g.sequence_edges[segi0]
    if len(seq_edge_list) > 1 and \
            min(e0.end, rint[2]) - max(e0.start, rint[1]) < min_overlap:
        del seq_edge_list[0]
    segi0 = seq_edge_list[0]
    while len(seq_edge_list) > 1 and g.sequence_edges[segi0].size < min_overlap:
        del seq_edge_list[0]
        segi0 = seq_edge_list[0]
    segi1 = seq_edge_list[-1]
    e1 = g.sequence_edges[segi1]
    if len(seq_edge_list) > 1 and \
            min(e1.end, rint[2]) - max(e1.start, rint[1]) < min_overlap:
        del seq_edge_list[-1]
    segi1 = seq_edge_list[-1]
    while len(seq_edge_list) > 1 and g.sequence_edges[segi1].size < min_overlap:
        del seq_edge_list[-1]
        segi1 = seq_edge_list[-1]
    if len(seq_edge_list) <= 2:
        return []
    e0 = g.sequence_edges[seq_edge_list[0]]
    e1 = g.sequence_edges[seq_edge_list[-1]]
    node1 = (e0.chrom, e0.start, "-")
    node2 = (e1.chrom, e1.end, "+")
    return traverse_through_sequence_edge(g, node1, node2)[1:-1]


def chimeric_alignment_to_path_l(g, rints, ai: int, bp_node, min_overlap=500) -> list:
    """Prefix walk ending at ``bp_node`` for alignment ``ai``
    (reference ``:91-181``); result additionally starts with a node."""
    al = rints[ai]
    seq_edge_list = _overlapping_seq_edges(g, al, oriented=True)
    if not seq_edge_list:
        return []
    if seq_edge_list[0][1] == "+":
        seq_edge_list.sort(key=lambda it: g.sequence_edges[it[0]].start)
        segi0 = seq_edge_list[0][0]
        e0 = g.sequence_edges[segi0]
        if len(seq_edge_list) > 1 and \
                min(e0.end, al[2]) - max(e0.start, al[1]) < min_overlap:
            del seq_edge_list[0]
        if seq_edge_list:
            segi0 = seq_edge_list[0][0]
        while seq_edge_list and g.sequence_edges[segi0].size < min_overlap:
            del seq_edge_list[0]
            if seq_edge_list:
                segi0 = seq_edge_list[0][0]
        while seq_edge_list:
            last = seq_edge_list[-1][0]
            e = g.sequence_edges[last]
            if (e.chrom, e.end, "+") != bp_node:
                del seq_edge_list[-1]
            else:
                break
    else:
        seq_edge_list.sort(key=lambda it: g.sequence_edges[it[0]].start, reverse=True)
        segi0 = seq_edge_list[0][0]
        e0 = g.sequence_edges[segi0]
        if len(seq_edge_list) > 1 and \
                min(e0.end, al[1]) - max(e0.start, al[2]) < min_overlap:
            del seq_edge_list[0]
        if seq_edge_list:
            segi0 = seq_edge_list[0][0]
        while seq_edge_list and g.sequence_edges[segi0].size < min_overlap:
            del seq_edge_list[0]
            if seq_edge_list:
                segi0 = seq_edge_list[0][0]
        while seq_edge_list:
            last = seq_edge_list[-1][0]
            e = g.sequence_edges[last]
            if (e.chrom, e.start, "-") != bp_node:
                del seq_edge_list[-1]
            else:
                break
    if not seq_edge_list:
        return []
    path = []
    for si in range(len(seq_edge_list)):
        segi, strand = seq_edge_list[si]
        e = g.sequence_edges[segi]
        path.append(("s", segi))
        path.append((e.chrom, e.end, "+") if strand == "+" else (e.chrom, e.start, "-"))
        if si < len(seq_edge_list) - 1:
            nxt = g.sequence_edges[seq_edge_list[si + 1][0]]
            if strand == "+" and e.end + 1 == nxt.start:
                for ci, ce in enumerate(g.concordant_edges):
                    if ce.chrom1 == e.chrom and ce.pos1 == e.end and ce.pos2 == nxt.start:
                        path.append(("c", ci))
                        path.append((e.chrom, nxt.start, "-"))
                        break
            elif strand == "-" and e.start - 1 == nxt.end:
                for ci, ce in enumerate(g.concordant_edges):
                    if ce.chrom1 == e.chrom and ce.pos1 == nxt.end and ce.pos2 == e.start:
                        path.append(("c", ci))
                        path.append((e.chrom, nxt.end, "+"))
                        break
    return path


def chimeric_alignment_to_path_r(g, rints, ai: int, bp_node, min_overlap=500) -> list:
    """Suffix walk starting at ``bp_node`` for alignment ``ai``
    (reference ``:184-277``); result additionally ends with a node."""
    ar = rints[ai]
    seq_edge_list = _overlapping_seq_edges(g, ar, oriented=True)
    if not seq_edge_list:
        return []
    if seq_edge_list[0][1] == "+":
        seq_edge_list.sort(key=lambda it: g.sequence_edges[it[0]].start)
        segi1 = seq_edge_list[-1][0]
        e1 = g.sequence_edges[segi1]
        if min(e1.end, ar[2]) - max(e1.start, ar[1]) < min_overlap:
            del seq_edge_list[-1]
        if not seq_edge_list:
            return []
        segi1 = seq_edge_list[-1][0]
        while seq_edge_list and g.sequence_edges[segi1].size < min_overlap:
            del seq_edge_list[-1]
            if seq_edge_list:
                segi1 = seq_edge_list[-1][0]
        while seq_edge_list:
            first = seq_edge_list[0][0]
            e = g.sequence_edges[first]
            if (e.chrom, e.start, "-") != bp_node:
                del seq_edge_list[0]
            else:
                break
    else:
        seq_edge_list.sort(key=lambda it: g.sequence_edges[it[0]].start, reverse=True)
        segi1 = seq_edge_list[-1][0]
        e1 = g.sequence_edges[segi1]
        if min(e1.end, ar[1]) - max(e1.start, ar[2]) < min_overlap:
            del seq_edge_list[-1]
        if not seq_edge_list:
            return []
        segi1 = seq_edge_list[-1][0]
        while seq_edge_list and g.sequence_edges[segi1].size < min_overlap:
            del seq_edge_list[-1]
            if seq_edge_list:
                segi1 = seq_edge_list[-1][0]
        while seq_edge_list:
            first = seq_edge_list[0][0]
            e = g.sequence_edges[first]
            if (e.chrom, e.end, "+") != bp_node:
                del seq_edge_list[0]
            else:
                break
    if not seq_edge_list:
        return []
    path = []
    for si in range(len(seq_edge_list)):
        segi, strand = seq_edge_list[si]
        e = g.sequence_edges[segi]
        path.append((e.chrom, e.start, "-") if strand == "+" else (e.chrom, e.end, "+"))
        path.append(("s", segi))
        if si < len(seq_edge_list) - 1:
            nxt = g.sequence_edges[seq_edge_list[si + 1][0]]
            if strand == "+" and e.end + 1 == nxt.start:
                for ci, ce in enumerate(g.concordant_edges):
                    if ce.chrom1 == e.chrom and ce.pos1 == e.end and ce.pos2 == nxt.start:
                        path.append((e.chrom, e.end, "+"))
                        path.append(("c", ci))
                        break
            elif strand == "-" and e.start - 1 == nxt.end:
                for ci, ce in enumerate(g.concordant_edges):
                    if ce.chrom1 == e.chrom and ce.pos1 == nxt.end and ce.pos2 == e.start:
                        path.append((e.chrom, e.start, "-"))
                        path.append(("c", ci))
                        break
    return path


def chimeric_alignment_to_path_i(g, rints, ai1, ai2, di) -> list:
    """Single-breakpoint read -> path through discordant edge ``di``
    (reference ``:280-301``)."""
    d = g.discordant_edges[di]
    path = [("d", di)]
    if ai1 > ai2:
        return (chimeric_alignment_to_path_l(g, rints, ai2, d.node2())
                + path + chimeric_alignment_to_path_r(g, rints, ai1, d.node1()))
    return (chimeric_alignment_to_path_l(g, rints, ai1, d.node1())
            + path + chimeric_alignment_to_path_r(g, rints, ai2, d.node2()))


def chimeric_alignment_to_path(g, rints, ai_list, bp_list) -> list:
    """Multi-breakpoint read -> path (reference ``:345-375``)."""
    path: list = []
    lastnode: tuple = ()
    for i, di in enumerate(bp_list):
        d = g.discordant_edges[di]
        node1, node2 = d.node1(), d.node2()
        if ai_list[i][0] > ai_list[i][1]:
            if i == 0:
                path = chimeric_alignment_to_path_l(
                    g, rints, ai_list[i][1], node2) + [("d", di)]
                lastnode = node1
            else:
                path += traverse_through_sequence_edge(g, lastnode, node2)
                path.append(("d", di))
                lastnode = node1
                if i == len(bp_list) - 1:
                    path += chimeric_alignment_to_path_r(g, rints, ai_list[i][0], node1)
        else:
            if i == 0:
                path = chimeric_alignment_to_path_l(
                    g, rints, ai_list[i][0], node1) + [("d", di)]
                lastnode = node2
            else:
                path += traverse_through_sequence_edge(g, lastnode, node1)
                path.append(("d", di))
                lastnode = node2
                if i == len(bp_list) - 1:
                    path += chimeric_alignment_to_path_r(g, rints, ai_list[i][1], node2)
    return path


def longest_path_dict(path_constraints: list) -> list:
    """Keep only maximal paths by edge-multiset subsumption, as
    [edge-count dicts, source path indices, supports]
    (reference ``:378-417``)."""
    res: list = [[], [], []]
    for pathi, path in enumerate(path_constraints[0]):
        counts: Dict[tuple, int] = {}
        for ei in range(0, len(path), 2):
            counts[path[ei]] = counts.get(path[ei], 0) + 1
        res[0].append(counts)
        res[1].append(pathi)
        res[2].append(path_constraints[1][pathi])
    for pathi in range(len(res[0]) - 1, -1, -1):
        counts = res[0][pathi]
        subpath_of = -1
        for pathi_ in range(len(res[0])):
            other = res[0][pathi_]
            contained = all(
                edge in other and other[edge] >= cnt
                for edge, cnt in counts.items()
            )
            if contained and pathi_ != pathi:
                subpath_of = pathi_
                break
        if subpath_of >= 0:
            del res[0][pathi]
            del res[1][pathi]
            res[2][subpath_of] = max(res[2][subpath_of], res[2][pathi])
            del res[2][pathi]
    return res
