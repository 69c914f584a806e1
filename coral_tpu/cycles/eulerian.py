"""Eulerian traversal of extracted cycles/paths into AA segment strings.

Behavioral port of ``eulerian_cycle_t``/``eulerian_path_t``
(``src/cycle_decomposition.py:1602-1934``): randomized retries walking
seq -> (conc|disc) -> seq, preferring traversals satisfying the most
subpath constraints (lexicographic metric: #unsatisfied, total length,
total support; the reference's ``and``/``or`` precedence quirk in the
metric comparison is preserved below).

RNG deviation (deliberate): the reference draws from the GLOBAL
``random`` module (``random.randint``, ref ``:1683,1878``), so its
emitted ``Segments=`` strings vary run-to-run and cannot be reproduced
bit-for-bit.  We draw from a locally seeded ``random.Random`` so outputs
are deterministic for a given seed.  The contract this preserves: any
*constraint-maximal complete traversal* of the same edge multiset is
AA-equivalent — the multiset (hence the genome structure, CN, and
coverage accounting) is identical; only the rotation/representative
differs, and where subpath constraints distinguish orders both
implementations prefer the maximal class.  ``tests/test_eulerian_golden.py``
makes this executable: it enumerates ALL complete traversals of fixed
multisets and asserts the seeded output lies in the constraint-maximal
class for every seed; golden comparisons elsewhere use the
rotation/reflection-canonical form (``cycles.refmodel.canonical_tokens``).
"""
from __future__ import annotations

import logging
import random
from typing import Dict, List

from ..constants import FLIP_STRAND
from ..graph.breakpoint_graph import CONC, DISC, SEQ, BreakpointGraph

logger = logging.getLogger(__name__)


def _bp_edge_nodes(g, edge):
    e = (g.concordant_edges if edge[0] == "c" else g.discordant_edges)[edge[1]]
    return e.node1(), e.node2()


def eulerian_cycle(g: BreakpointGraph, edges_next_cycle: Dict[tuple, int],
                   path_constraints_next: List[list],
                   path_constraints_support: List[int],
                   max_trials: int = 1000, seed: int = 0) -> List[str]:
    """Traverse a cycle's edge multiset into an AA segment token list."""
    rng = random.Random(seed)
    lseg = len(g.sequence_edges)
    best_cycle: List[str] = []
    valid = 0
    num_trials = 0
    l = len(path_constraints_next)
    unsat_metric = [list(range(l)), 100 * l,
                    100 * max(path_constraints_support + [0])]
    while valid <= 0 and num_trials < max_trials:
        valid = 1
        num_trials += 1
        walk: list = []      # alternating edge/node trace
        tokens: List[str] = []
        edges_cur = dict(edges_next_cycle)
        last_seq = lseg
        for edge in edges_cur:
            if edge[0] == "e":
                last_seq = min(last_seq, edge[1])
        last_dir = "+"
        walk.append(("s", last_seq))
        tokens.append(str(last_seq + 1) + "+")
        while edges_cur:
            e = g.sequence_edges[last_seq]
            node = (e.chrom, e.end, "+") if last_dir == "+" else (e.chrom, e.start, "-")
            walk.append(node)
            next_bp = [("c", ci) for ci in g.nodes[node][CONC]] + \
                      [("d", di) for di in g.nodes[node][DISC]]
            next_bp = [b for b in next_bp if b in edges_cur]
            if not next_bp:
                valid = 0
                break
            r = 0 if len(next_bp) == 1 else rng.randint(0, len(next_bp) - 1)
            bp = next_bp[r]
            walk.append(bp)
            edges_cur[bp] -= 1
            if edges_cur[bp] == 0:
                del edges_cur[bp]
            n1, n2 = _bp_edge_nodes(g, bp)
            node_ = n2 if node == n1 else n1
            walk.append(node_)
            last_seq = g.nodes[node_][SEQ][0]
            walk.append(("s", last_seq))
            if node_[2] == "-":
                last_dir = "+"
                tokens.append(str(last_seq + 1) + "+")
            else:
                last_dir = "-"
                tokens.append(str(last_seq + 1) + "-")
            key = ("e", last_seq)
            edges_cur[key] = edges_cur[key] - 1
            if edges_cur[key] == 0:
                del edges_cur[key]
        if valid == 1 and not best_cycle:
            best_cycle = tokens
        # subpath-constraint satisfaction over the circular trace
        metric = [[], 0, 0]
        for pathi, path_ in enumerate(path_constraints_next):
            path0 = path_[0]
            s = 0
            trace = walk[:-1]
            n = len(trace)
            for ei in range(len(walk) - 1):
                if walk[ei] == path0:
                    if all(trace[(ei + i) % n] == path_[i] for i in range(len(path_))):
                        s = 1
                        break
                    if all(trace[ei - i] == path_[i] for i in range(len(path_))):
                        s = 1
                        break
            if s == 0 and valid == 1:
                metric[0].append(pathi)
                metric[1] += len(path_)
                metric[2] += path_constraints_support[pathi]
        if valid == 1 and metric[0]:
            valid = -1
        if valid != 0 and (len(metric[0]) < len(unsat_metric[0])) or \
                (len(metric[0]) == len(unsat_metric[0]) and metric[1] < unsat_metric[1]) or \
                (len(metric[0]) == len(unsat_metric[0]) and metric[1] == unsat_metric[1]
                 and metric[2] < unsat_metric[2]):
            unsat_metric = [metric[0], metric[1], metric[2]]
            best_cycle = tokens
    if unsat_metric[0]:
        logger.debug("cycle traversal leaves %d unsatisfied constraints",
                     len(unsat_metric[0]))
    return best_cycle


def eulerian_path(g: BreakpointGraph, edges_next_path: Dict[tuple, int],
                  path_constraints_next: List[list],
                  path_constraints_support: List[int],
                  max_trials: int = 1000, seed: int = 0) -> List[str]:
    """Traverse an s-t walk's edge multiset (must include its terminal
    's'/'t'/'ns'/'nt' entries) into an AA segment token list."""
    rng = random.Random(seed)
    lseg = len(g.sequence_edges)
    endnode_list = list(g.endnodes.keys())
    best_path: List[str] = []
    valid = 0
    num_trials = 0
    l = len(path_constraints_next)
    unsat_metric = [list(range(l)), 100 * l,
                    100 * max(path_constraints_support + [0])]
    while valid <= 0 and num_trials < max_trials:
        valid = 1
        num_trials += 1
        walk: list = []
        tokens: List[str] = []
        edges_cur = dict(edges_next_path)
        src_edge = ()
        last_seq = lseg
        last_dir = "+"
        for edge in edges_cur:
            if edge[0] in ("s", "t"):
                node = g.source_edges[edge[1]].node()
                if not walk:
                    src_edge = edge
                    last_dir = FLIP_STRAND[node[2]]
                    walk.append(("$", -1))
                    walk.append(node)
                    last_seq = g.nodes[node][SEQ][0]
                elif g.nodes[node][SEQ][0] < last_seq:
                    src_edge = edge
                    last_dir = FLIP_STRAND[node[2]]
                    walk[-1] = node
                    last_seq = g.nodes[node][SEQ][0]
            elif edge[0] in ("ns", "nt"):
                node = endnode_list[edge[1]]
                if not walk:
                    src_edge = edge
                    last_dir = FLIP_STRAND[node[2]]
                    walk.append(("$", -1))
                    walk.append(node)
                    last_seq = g.nodes[node][SEQ][0]
                elif g.nodes[node][SEQ][0] < last_seq:
                    src_edge = edge
                    last_dir = FLIP_STRAND[node[2]]
                    walk[-1] = node
                    last_seq = g.nodes[node][SEQ][0]
        del edges_cur[src_edge]
        walk.append(("s", last_seq))
        tokens.append(str(last_seq + 1) + ("+" if last_dir == "+" else "-"))
        key = ("e", last_seq)
        edges_cur[key] = edges_cur[key] - 1
        if edges_cur[key] == 0:
            del edges_cur[key]
        while edges_cur:
            e = g.sequence_edges[last_seq]
            node = (e.chrom, e.end, "+") if last_dir == "+" else (e.chrom, e.start, "-")
            walk.append(node)
            if len(edges_cur) == 1 and list(edges_cur)[0][0] in ("s", "t", "ns", "nt"):
                walk.append(("$", -1))
                break
            next_bp = [("c", ci) for ci in g.nodes[node][CONC]] + \
                      [("d", di) for di in g.nodes[node][DISC]]
            next_bp = [b for b in next_bp if b in edges_cur]
            if not next_bp:
                valid = 0
                break
            r = 0 if len(next_bp) == 1 else rng.randint(0, len(next_bp) - 1)
            bp = next_bp[r]
            walk.append(bp)
            edges_cur[bp] -= 1
            if edges_cur[bp] == 0:
                del edges_cur[bp]
            n1, n2 = _bp_edge_nodes(g, bp)
            node_ = n2 if node == n1 else n1
            walk.append(node_)
            last_seq = g.nodes[node_][SEQ][0]
            walk.append(("s", last_seq))
            if node_[2] == "-":
                last_dir = "+"
                tokens.append(str(last_seq + 1) + "+")
            else:
                last_dir = "-"
                tokens.append(str(last_seq + 1) + "-")
            key = ("e", last_seq)
            edges_cur[key] = edges_cur[key] - 1
            if edges_cur[key] == 0:
                del edges_cur[key]
        if valid == 1 and not best_path:
            best_path = tokens
        metric = [[], 0, 0]
        for pathi, path_ in enumerate(path_constraints_next):
            s = 0
            for ei in range(2, len(walk) - 1 - len(path_)):
                if walk[ei: ei + len(path_)] == path_ or \
                        walk[ei: ei + len(path_)] == path_[::-1]:
                    s = 1
                    break
            if s == 0 and valid == 1:
                metric[0].append(pathi)
                metric[1] += len(path_)
                metric[2] += path_constraints_support[pathi]
        if valid == 1 and metric[0]:
            valid = -1
        if valid != 0 and (len(metric[0]) < len(unsat_metric[0])) or \
                (len(metric[0]) == len(unsat_metric[0]) and metric[1] < unsat_metric[1]) or \
                (len(metric[0]) == len(unsat_metric[0]) and metric[1] == unsat_metric[1]
                 and metric[2] < unsat_metric[2]):
            unsat_metric = [metric[0], metric[1], metric[2]]
            best_path = tokens
    if unsat_metric[0]:
        logger.debug("path traversal leaves %d unsatisfied constraints",
                     len(unsat_metric[0]))
    return best_path
