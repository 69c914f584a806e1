"""Per-amplicon breakpoint graph container and AA-format writers.

Structural reimplementation of the reference's ``BreakpointGraph``
(``src/breakpoint_graph.py:83-363``) with typed edge records instead of
positional lists.  Node identity and adjacency layout are preserved: a node
is ``(chrom, pos, orientation)``; each node keeps four edge-index lists
(sequence, concordant, discordant, source); ``endnodes`` marks amplicon
interval ends (source/sink candidates for path decompositions).
"""
from __future__ import annotations

import logging
import math
from dataclasses import dataclass, field
from typing import Dict, List, Set, Tuple

import numpy as np

from ..constants import CHR_IDX

logger = logging.getLogger(__name__)

Node = Tuple[str, int, str]


@dataclass
class SequenceEdge:
    chrom: str
    start: int
    end: int
    lr_count: int = -1      # number of long reads on the segment
    lr_nc: int = 0          # total aligned nucleotides on the segment
    cn: float = 0.0
    sr_count: int = -1      # short-read support (hybrid SR+LR mode)
    sr_flag: str = "d"      # 'd' = downsampled short-read counts

    @property
    def size(self) -> int:
        return self.end - self.start + 1

    @property
    def avg_coverage(self) -> float:
        return self.lr_nc * 1.0 / self.size


@dataclass
class ConcordantEdge:
    chrom1: str
    pos1: int
    o1: str
    chrom2: str
    pos2: int
    o2: str
    lr_count: int = -1
    reads: Set[str] = field(default_factory=set)
    cn: float = 0.0
    sr_count: int = -1
    sr_flag: str = "d"
    sr_cn: float = 0.0

    def node1(self) -> Node:
        return (self.chrom1, self.pos1, self.o1)

    def node2(self) -> Node:
        return (self.chrom2, self.pos2, self.o2)


@dataclass
class DiscordantEdge:
    chrom1: str
    pos1: int
    o1: str
    chrom2: str
    pos2: int
    o2: str
    lr_count: int = -1
    reads: Set[tuple] = field(default_factory=set)  # (read, i, j) triples
    cn: float = 0.0
    sr_count: int = -1
    sr_flag: str = "d"
    sr_cn: float = 0.0

    def node1(self) -> Node:
        return (self.chrom1, self.pos1, self.o1)

    def node2(self) -> Node:
        return (self.chrom2, self.pos2, self.o2)

    def is_self_loop(self) -> bool:
        return (self.chrom1 == self.chrom2 and self.pos1 == self.pos2
                and self.o1 == self.o2)


@dataclass
class SourceEdge:
    """Edge from the virtual source to a CN boundary node
    (``breakpoint_graph.py:231-238``); side 1 is always ('source', -1, '-')."""
    chrom: str
    pos: int
    o: str
    lr_cn: float = 0.0
    cn: float = 0.0

    def node(self) -> Node:
        return (self.chrom, self.pos, self.o)


# adjacency slots
SEQ, CONC, DISC, SRC = 0, 1, 2, 3


class BreakpointGraph:
    """Container for one amplicon's breakpoint graph."""

    def __init__(self):
        self.amplicon_intervals: List[list] = []
        self.sequence_edges: List[SequenceEdge] = []
        self.concordant_edges: List[ConcordantEdge] = []
        self.discordant_edges: List[DiscordantEdge] = []
        self.source_edges: List[SourceEdge] = []
        self.nodes: Dict[Node, List[List[int]]] = {}
        self.endnodes: Dict[Node, List[int]] = {}
        self.max_cn: float = 0.0

    # -- construction -----------------------------------------------------

    def add_node(self, node: Node) -> None:
        self.nodes[node] = [[], [], [], []]

    def add_endnode(self, node: Node) -> None:
        if node not in self.endnodes:
            self.endnodes[node] = []

    def add_sequence_edge(self, chrom: str, start: int, end: int, **kw) -> None:
        n1, n2 = (chrom, start, "-"), (chrom, end, "+")
        if n1 not in self.nodes or n2 not in self.nodes:
            raise KeyError("sequence edge endpoints must be added first")
        idx = len(self.sequence_edges)
        self.nodes[n1][SEQ].append(idx)
        self.nodes[n2][SEQ].append(idx)
        self.sequence_edges.append(SequenceEdge(chrom, start, end, **kw))

    def add_concordant_edge(self, chrom1, pos1, o1, chrom2, pos2, o2, **kw) -> None:
        if chrom1 != chrom2 or pos2 != pos1 + 1 or o1 != "+" or o2 != "-":
            raise ValueError("invalid concordant edge")
        n1, n2 = (chrom1, pos1, o1), (chrom2, pos2, o2)
        if n1 not in self.nodes or n2 not in self.nodes:
            raise KeyError("concordant edge endpoints must be added first")
        idx = len(self.concordant_edges)
        self.nodes[n1][CONC].append(idx)
        self.nodes[n2][CONC].append(idx)
        self.concordant_edges.append(ConcordantEdge(chrom1, pos1, o1, chrom2, pos2, o2, **kw))

    def add_discordant_edge(self, chrom1, pos1, o1, chrom2, pos2, o2, **kw) -> None:
        n1, n2 = (chrom1, pos1, o1), (chrom2, pos2, o2)
        if n1 not in self.nodes or n2 not in self.nodes:
            raise KeyError("discordant edge endpoints must be added first")
        idx = len(self.discordant_edges)
        self.nodes[n1][DISC].append(idx)
        self.nodes[n2][DISC].append(idx)
        if n1 in self.endnodes:
            self.endnodes[n1].append(idx)
        if n2 in self.endnodes:
            self.endnodes[n2].append(idx)
        self.discordant_edges.append(DiscordantEdge(chrom1, pos1, o1, chrom2, pos2, o2, **kw))

    def add_source_edge(self, chrom, pos, o, **kw) -> None:
        node = (chrom, pos, o)
        if node not in self.nodes:
            raise KeyError("source edge endpoint must be added first")
        self.nodes[node][SRC].append(len(self.source_edges))
        self.source_edges.append(SourceEdge(chrom, pos, o, **kw))

    # -- maintenance (reference :142-345; the reference's
    # del_redundant_sequence_edges carries `self.self.` typos at :277,282 —
    # implemented here to the evident intent) --------------------------

    def del_endnode(self, node: Node) -> None:
        if node in self.endnodes:
            del self.endnodes[node]

    def del_discordant_endnodes(self) -> None:
        """Drop endnodes that have discordant edges attached (ref :155-164)."""
        for node in [n for n, ds in self.endnodes.items() if ds]:
            del self.endnodes[node]

    def del_discordant_edges(self, del_list, bpi_map) -> None:
        """Delete discordant edges and re-index adjacency (ref :210-228)."""
        for bpi in sorted(del_list, reverse=True):
            del self.discordant_edges[bpi]
        for node in self.endnodes:
            self.endnodes[node] = [
                bpi_map[i] for i in self.endnodes[node] if i not in del_list]
        for node in self.nodes:
            self.nodes[node][DISC] = [
                bpi_map[i] for i in self.nodes[node][DISC] if i not in del_list]

    def del_source_edges(self, del_list, srci_map) -> None:
        """Delete source edges and re-index adjacency (ref :241-253)."""
        for srci in sorted(del_list, reverse=True):
            del self.source_edges[srci]
        for node in self.nodes:
            self.nodes[node][SRC] = [
                srci_map[i] for i in self.nodes[node][SRC] if i not in del_list]

    def del_redundant_sequence_edges(self) -> None:
        """Drop sequence edges with no breakpoint connections on either end
        after merging (ref :256-287)."""
        if not self.discordant_edges:
            return
        del_list = []
        for seqi, e in enumerate(self.sequence_edges):
            n1, n2 = (e.chrom, e.start, "-"), (e.chrom, e.end, "+")
            degree = sum(len(self.nodes[n][slot])
                         for n in (n1, n2) for slot in (CONC, DISC, SRC))
            if degree == 0:
                del_list.append(seqi)
        for seqi in del_list[::-1]:
            e = self.sequence_edges[seqi]
            interval = [e.chrom, e.start, e.end]
            if interval in self.amplicon_intervals:
                self.amplicon_intervals.remove(interval)
            n1, n2 = (e.chrom, e.start, "-"), (e.chrom, e.end, "+")
            del self.sequence_edges[seqi]
            del self.nodes[n1]
            del self.nodes[n2]
            self.del_endnode(n1)
            self.del_endnode(n2)
        for seqi, e in enumerate(self.sequence_edges):
            self.nodes[(e.chrom, e.start, "-")][SEQ][0] = seqi
            self.nodes[(e.chrom, e.end, "+")][SEQ][0] = seqi

    def merge_edges(self) -> None:
        """Merge sequence edges joined only by concordant edges; drop the
        junction nodes and concordant edges (ref :290-345)."""
        c_del, seq_del = [], []
        for ci, ce in enumerate(self.concordant_edges):
            n1, n2 = ce.node1(), ce.node2()
            if not (self.nodes[n1][DISC] or self.nodes[n2][DISC]
                    or self.nodes[n1][SRC] or self.nodes[n2][SRC]):
                seq_del.append(self.nodes[n1][SEQ][0])
                del self.nodes[n1]
                del self.nodes[n2]
                c_del.append(ci)
        if not seq_del:
            return
        seq_del.sort()
        # extend the surviving right neighbor of each consecutive run
        si = li = 0
        for i in range(1, len(seq_del)):
            if seq_del[i] == seq_del[li] + 1:
                li += 1
            else:
                keeper = self.sequence_edges[seq_del[li] + 1]
                keeper.start = self.sequence_edges[seq_del[si]].start
                # ref resets the SHORT-read fields ([3]=-1, [4]='f'),
                # keeps lr_count (breakpoint_graph.py:318-321); size is a
                # property here so the [-2] recompute is implicit
                keeper.sr_count = -1
                keeper.sr_flag = "f"
                si = li = i
        keeper = self.sequence_edges[seq_del[li] + 1]
        keeper.start = self.sequence_edges[seq_del[si]].start
        keeper.sr_count = -1
        keeper.sr_flag = "f"
        for seqi in seq_del[::-1]:
            del self.sequence_edges[seqi]
        for ci in sorted(c_del, reverse=True):
            del self.concordant_edges[ci]
        for seqi, e in enumerate(self.sequence_edges):
            self.nodes[(e.chrom, e.start, "-")][SEQ][0] = seqi
            self.nodes[(e.chrom, e.end, "+")][SEQ][0] = seqi
        for ci, ce in enumerate(self.concordant_edges):
            self.nodes[ce.node1()][CONC][0] = ci
            self.nodes[ce.node2()][CONC][0] = ci

    # -- positional traversal helpers (ref :696-765) ----------------------

    def _walk(self, chrom, pos, orientation, direction, cutoff=100):
        """Distance to the next node (towards ``direction``) with incoming
        discordant edges, capped at ``cutoff`` (ref next/last plus/minus)."""
        dist = -1
        pos_ = pos
        while True:
            if orientation == "-":
                key = (chrom, pos_, "-") if direction > 0 else (chrom, pos_ - 1, "+")
            else:
                key = (chrom, pos_ + 1, "-") if direction > 0 else (chrom, pos_, "+")
            if key not in self.nodes:
                break
            probe = (chrom, pos_, orientation)
            if pos_ != pos and probe in self.nodes and self.nodes[probe][DISC]:
                break
            if dist >= cutoff:
                break
            seglen = self.sequence_edges[self.nodes[key][SEQ][0]].size
            dist = max(dist, 0) + seglen
            pos_ += seglen * direction
        return dist

    def nextminus(self, chrom, pos, cutoff=100):
        return self._walk(chrom, pos, "-", +1, cutoff)

    def lastminus(self, chrom, pos, cutoff=100):
        return self._walk(chrom, pos, "-", -1, cutoff)

    def nextplus(self, chrom, pos, cutoff=100):
        return self._walk(chrom, pos, "+", +1, cutoff)

    def lastplus(self, chrom, pos, cutoff=100):
        return self._walk(chrom, pos, "+", -1, cutoff)

    def sort_edges(self) -> None:
        """Sort sequence/concordant edges by (chrom, pos) and rebuild the
        adjacency indices (``breakpoint_graph.py:348-363``)."""
        self.sequence_edges.sort(key=lambda e: (CHR_IDX[e.chrom], e.start))
        self.concordant_edges.sort(key=lambda e: (CHR_IDX[e.chrom1], e.pos1))
        for i, e in enumerate(self.sequence_edges):
            self.nodes[(e.chrom, e.start, "-")][SEQ] = [i]
            self.nodes[(e.chrom, e.end, "+")][SEQ] = [i]
        for i, e in enumerate(self.concordant_edges):
            self.nodes[e.node1()][CONC] = [i]
            self.nodes[e.node2()][CONC] = [i]

    # -- multiplicity inference (reference :17-80, :609-693) --------------

    def infer_max_seq_multiplicity(
        self, gain: float = 5.0, size_cutoff: int = 10_000,
        multiplicity: int = 2,
    ) -> int:
        """Estimate the maximum allowed sequence-edge multiplicity in
        cycles/paths (``breakpoint_graph.py:609-627``; unused in the
        reference's live path but part of its public surface).

        Over sequence edges with size >= ``size_cutoff`` and CN >=
        ``gain``, returns round(max_cn / length-weighted-mean_cn) + 1;
        falls back to ``multiplicity`` (both orientations) when no edge
        qualifies.
        """
        cns = np.asarray([e.cn for e in self.sequence_edges
                          if e.size >= size_cutoff and e.cn >= gain])
        lens = np.asarray([e.size for e in self.sequence_edges
                           if e.size >= size_cutoff and e.cn >= gain])
        if cns.size == 0:
            return multiplicity
        avg_cn = float(np.average(cns, weights=lens))
        return int(round(float(cns.max()) / avg_cn)) + 1

    def infer_discordant_edge_multiplicities(self, max_multiplicity: int = 5) -> List[int]:
        """Estimate per-discordant-edge multiplicity from read-count log2
        clustering (``breakpoint_graph.py:630-693``)."""
        counts = [e.lr_count for e in self.discordant_edges]
        if not counts:
            return []
        order = np.argsort(counts)
        sc = sorted(counts)
        if math.log2(sc[-1]) - math.log2(sc[0]) < 1.0:
            return [1] * len(counts)
        num_clusters = 1
        best_score = -10.0
        best_partitions: list = []
        best_bases: list = []
        while True:
            found = False
            for partitions in _enumerate_partitions(num_clusters - 1, 0, len(sc) - 1):
                score_all = 0.0
                bases = []
                ok = True
                for pi, part in enumerate(partitions):
                    valid, base_ri, score = _test_clustering(sc, part, max_multiplicity)
                    if not valid:
                        ok = False
                        break
                    score_all += score
                    bases.append([part[0], base_ri])
                    if pi > 0:
                        score_all += (math.log2(sc[partitions[pi][0]])
                                      - math.log2(sc[partitions[pi - 1][1]]))
                if ok:
                    found = True
                    if score_all > best_score:
                        best_score = score_all
                        best_partitions = partitions
                        best_bases = bases
            if found:
                break
            num_clusters += 1
        mult_sorted: List[int] = []
        for pi, part in enumerate(best_partitions):
            base = best_bases[pi]
            for _ in range(base[0], base[1] + 1):
                mult_sorted.append(1)
            base_ri = base[1] + 1
            if base_ri > part[1]:
                continue
            base_avg = float(np.average(sc[base[0]: base[1] + 1]))
            mult = 2
            while sc[base_ri] / base_avg >= mult + 0.5:
                mult += 1
            for i in range(base_ri, part[1] + 1):
                while sc[i] / base_avg >= mult + 0.5:
                    mult += 1
                mult_sorted.append(mult)
        order_list = list(order)
        return [mult_sorted[order_list.index(i)] for i in range(len(sc))]


def _enumerate_partitions(k: int, start: int, end: int):
    """All ways to split [start, end] into k+1 consecutive runs
    (``breakpoint_graph.py:74-80``)."""
    if k == 0:
        yield [[start, end]]
        return
    for i in range(1, end - start - k + 2):
        for rest in _enumerate_partitions(k - 1, start + i, end):
            yield [[start, start + i - 1]] + rest


def _test_clustering(rc_list, partition, max_multiplicity=5):
    """Score one partition's viability as a multiplicity ladder
    (``breakpoint_graph.py:17-71``).  Returns (valid, base_end_idx, score).
    """
    if partition[0] == partition[1]:
        return True, partition[0], 0.0
    vals = rc_list[partition[0]: partition[1] + 1]
    if vals[-1] < vals[0] * 2.0:
        return True, partition[1], 0.0
    base_ri = 0
    while base_ri < len(vals) and vals[base_ri] < vals[0] * 2.0:
        base_ri += 1
    base_avg = float(np.average(vals[:base_ri]))
    if vals[-1] / base_avg >= max_multiplicity + 0.5:
        return False, None, None
    score = -10.0
    best_ri = base_ri
    sum_dev = 1.0
    for b in range(base_ri, 0, -1):
        base_avg = float(np.average(vals[:b]))
        base_size = b
        sizes = {}
        li = b
        mult = 2
        if vals[b] / base_avg < mult - 0.5:
            continue
        while vals[b] / base_avg >= mult + 0.5:
            mult += 1
        sum_gap = math.log2(vals[b]) - math.log2(vals[b - 1])
        for i in range(b, len(vals)):
            if vals[i] / base_avg >= mult + 0.5:
                sum_gap += math.log2(vals[i]) - math.log2(vals[i - 1])
                sizes[mult] = [li, i - 1]
                li = i
                while vals[i] / base_avg >= mult + 0.5:
                    mult += 1
        sizes[mult] = [li, len(vals) - 1]
        if mult > max_multiplicity:
            continue
        if any(m in sizes and sizes[m][1] - sizes[m][0] >= base_size
               for m in range(2, mult + 1)):
            continue
        sum_dev_ = sum(
            abs(m - float(np.average(np.asarray(vals[sizes[m][0]: sizes[m][1] + 1])
                                     / base_avg)))
            for m in range(2, mult + 1) if m in sizes
        )
        if sum_gap - sum_dev_ > score:
            score = sum_gap - sum_dev_
            sum_dev = sum_dev_
            best_ri = b
    if sum_dev < 1.0:
        return True, best_ri + partition[0] - 1, score
    return False, None, None


# -- AA-format writers (reference :805-854) --------------------------------

def write_graph_file(g: BreakpointGraph, path: str) -> None:
    """AA-compatible ``*_graph.txt`` (``output_breakpoint_graph_lr``,
    ``breakpoint_graph.py:805-822``)."""
    with open(path, "w") as fp:
        fp.write("SequenceEdge: StartPosition, EndPosition, PredictedCN, "
                 "AverageCoverage, Size, NumberOfLongReads\n")
        for e in g.sequence_edges:
            fp.write("sequence\t%s:%s-\t%s:%s+\t%f\t%f\t%d\t%d\n"
                     % (e.chrom, e.start, e.chrom, e.end, e.cn,
                        e.avg_coverage, e.size, e.lr_count))
        fp.write("BreakpointEdge: StartPosition->EndPosition, PredictedCN, "
                 "NumberOfLongReads\n")
        for s in g.source_edges:
            fp.write("source\t%s:%s%s->%s:%s%s\t%f\t-1\n"
                     % ("source", -1, "-", s.chrom, s.pos, s.o, s.cn))
        for c in g.concordant_edges:
            fp.write("concordant\t%s:%s%s->%s:%s%s\t%f\t%d\n"
                     % (c.chrom1, c.pos1, c.o1, c.chrom2, c.pos2, c.o2,
                        c.cn, c.lr_count))
        for d in g.discordant_edges:
            fp.write("discordant\t%s:%s%s->%s:%s%s\t%f\t%d\n"
                     % (d.chrom1, d.pos1, d.o1, d.chrom2, d.pos2, d.o2,
                        d.cn, d.lr_count))


def write_graph_file_hybrid(g: BreakpointGraph, path: str,
                            downsample_factor: float = 1.0) -> None:
    """AA graph file with short-read + long-read columns.

    Intent implementation of the reference's dead
    ``output_breakpoint_graph_sr_lr`` (``breakpoint_graph.py:768-802``,
    which calls nonexistent ``math.round`` and references ``self`` in a
    free function)."""
    def sr(count, flag):
        return int(round(count * downsample_factor)) if flag == "d" else count

    with open(path, "w") as fp:
        fp.write("SequenceEdge: StartPosition, EndPosition, PredictedCN, "
                 "NumberOfReadPairs, NumberOfLongReads, Size\n")
        for e in g.sequence_edges:
            fp.write("sequence\t%s:%s-\t%s:%s+\t%f\t%d\t%d\t%d\n"
                     % (e.chrom, e.start, e.chrom, e.end, e.cn,
                        sr(e.sr_count, e.sr_flag), e.lr_count, e.size))
        fp.write("BreakpointEdge: StartPosition->EndPosition, PredictedCN, "
                 "NumberOfReadPairs, NumberOfLongReads\n")
        for s in g.source_edges:
            fp.write("source\t%s:%s%s->%s:%s%s\t%f\t-1\t-1\n"
                     % ("source", -1, "-", s.chrom, s.pos, s.o, s.cn))
        for c in g.concordant_edges:
            fp.write("concordant\t%s:%s%s->%s:%s%s\t%f\t%d\t%d\n"
                     % (c.chrom1, c.pos1, c.o1, c.chrom2, c.pos2, c.o2,
                        c.cn, sr(c.sr_count, c.sr_flag), c.lr_count))
        for d in g.discordant_edges:
            fp.write("discordant\t%s:%s%s->%s:%s%s\t%f\t%d\t%d\n"
                     % (d.chrom1, d.pos1, d.o1, d.chrom2, d.pos2, d.o2,
                        d.cn, sr(d.sr_count, d.sr_flag), d.lr_count))


def write_breakpoints_file_hybrid(g: BreakpointGraph, path: str,
                                  bp_stats: Dict[int, list],
                                  downsample_factor: float = 1.0) -> None:
    """Hybrid breakpoints list (intent of the dead
    ``output_breakpoint_info_sr_lr``, ``breakpoint_graph.py:825-842``)."""
    def sr(count, flag):
        return int(round(count * downsample_factor)) if flag == "d" else count

    with open(path, "w") as fp:
        fp.write("chr1\tpos1\tchr2\tpos2\torientation\tsr_support\t"
                 "lr_support\tlr_info=[avg1, avg2, std1, std2, mapq1, mapq2]\n")
        for di, d in enumerate(g.discordant_edges):
            if di in bp_stats:
                fp.write("%s\t%s\t%s\t%s\t%s%s\t-1\t%d\t%s\n"
                         % (d.chrom2, d.pos2, d.chrom1, d.pos1, d.o2, d.o1,
                            d.lr_count, bp_stats[di]))
            else:
                fp.write("%s\t%s\t%s\t%s\t%s%s\t%d\t%d\tN/A\n"
                         % (d.chrom2, d.pos2, d.chrom1, d.pos1, d.o2, d.o1,
                            sr(d.sr_count, d.sr_flag), d.lr_count))


def write_breakpoints_file(g: BreakpointGraph, path: str, bp_stats: List[list]) -> None:
    """``*_breakpoints.txt`` (``output_breakpoint_info_lr``,
    ``breakpoint_graph.py:845-854``)."""
    with open(path, "w") as fp:
        fp.write("chr1\tpos1\tchr2\tpos2\torientation\tlr_support\t"
                 "lr_info=[avg1, avg2, std1, std2, mapq1, mapq2]\n")
        for i, d in enumerate(g.discordant_edges):
            fp.write("%s\t%s\t%s\t%s\t%s%s\t%d\t%s\n"
                     % (d.chrom2, d.pos2, d.chrom1, d.pos1, d.o2, d.o1,
                        d.lr_count, bp_stats[i]))


def parse_graph_file(path: str) -> BreakpointGraph:
    """Read an AA-format graph file back into a BreakpointGraph (used by
    plot mode and round-trip tests)."""
    g = BreakpointGraph()
    seqs, concs, discs, srcs = [], [], [], []
    with open(path) as fp:
        for line in fp:
            t = line.strip().split("\t")
            if t[0] == "sequence":
                c1, p1 = t[1].rsplit(":", 1)
                c2, p2 = t[2].rsplit(":", 1)
                seqs.append((c1, int(p1[:-1]), int(p2[:-1]), float(t[3]),
                             float(t[4]), int(t[5]), int(t[6])))
            elif t[0] in ("concordant", "discordant", "source"):
                left, right = t[1].split("->")
                c1, p1 = left.rsplit(":", 1)
                c2, p2 = right.rsplit(":", 1)
                row = (c1, int(p1[:-1]), p1[-1], c2, int(p2[:-1]), p2[-1],
                       float(t[2]), int(t[3]))
                {"concordant": concs, "discordant": discs, "source": srcs}[t[0]].append(row)
    for c, s, e, cn, _cov, _size, nreads in seqs:
        for node in [(c, s, "-"), (c, e, "+")]:
            if node not in g.nodes:
                g.add_node(node)
        g.add_sequence_edge(c, s, e, cn=cn, lr_count=nreads,
                            lr_nc=int(round(_cov * (e - s + 1))))
    for c1, p1, o1, c2, p2, o2, cn, n in concs:
        g.add_concordant_edge(c1, p1, o1, c2, p2, o2, cn=cn, lr_count=n)
    for c1, p1, o1, c2, p2, o2, cn, n in discs:
        for node in [(c1, p1, o1), (c2, p2, o2)]:
            if node not in g.nodes:
                g.add_node(node)
        g.add_discordant_edge(c1, p1, o1, c2, p2, o2, cn=cn, lr_count=n)
    for _c1, _p1, _o1, c2, p2, o2, cn, _n in srcs:
        if (c2, p2, o2) not in g.nodes:
            g.add_node((c2, p2, o2))
        g.add_source_edge(c2, p2, o2, cn=cn)
    return g
