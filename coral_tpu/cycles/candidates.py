"""Candidate cycle/path enumeration for cycle extraction.

The reference solves a mixed-integer quadratic program with Gurobi
(``src/cycle_decomposition.py:14-460``) whose integer variables pick an
edge multiset forming one or more connected Eulerian closed walks (cycles)
or s-t walks (paths).  This engine replaces the ILP search over edge
multisets with explicit enumeration of the walks themselves, exploiting a
structural property of CoRAL breakpoint graphs: every node touches exactly
one sequence edge, so a walk is fully determined by its breakpoint-edge
(concordant/discordant) choices — sequence edges are forced.

Feasibility rules mirror the reference model:
  * cycles never traverse endnodes (the endnode Eulerian row
    ``x_s + x_t == x_seq`` forbids it, ref ``:92-97``);
  * paths terminate exactly at endnodes or source-edge nodes, with one
    's'-side and one 't'-side terminal (``:111-119,159-167``);
  * per-edge multiplicity caps: discordant edges by inferred multiplicity
    (``:146-149``), everything by the reference's ub of 10 (``:74``);
  * cycles must have a spanning-tree ROOT: a used node whose
    set-deduped concordant/discordant usage is exactly 1 (the c-variable
    constraints, ref ``:164-177`` — ``sum c*x_bp <= 1`` at the root, and
    connectivity requires a used root).  A uniformly doubled cycle
    (every node's bp usage >= 2) has no root and is INFEASIBLE in the
    reference MIQP, so it must not enter the pool: its coverage is
    always realizable as the underlying rooted walk(s) at scaled
    weight, and keeping it could make our MILP pick a decomposition the
    reference can never emit.

Candidates are deduplicated by edge multiset; the multiset keys use the
reference's cycle-dict vocabulary: ('e',i) sequence, ('c',i) concordant,
('d',i) discordant, ('s'/'t',srci) source edges, ('ns'/'nt',eni) endnode
terminals.
"""
from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

from ..graph.breakpoint_graph import SEQ, CONC, DISC, BreakpointGraph

logger = logging.getLogger(__name__)


@dataclass(frozen=True)
class Candidate:
    edges: Tuple[Tuple[tuple, int], ...]   # sorted ((key, count), ...)
    is_cycle: bool
    seq_weight: float                      # sum of x_seq * segment length

    def edge_dict(self) -> Dict[tuple, int]:
        return dict(self.edges)


class CandidatePool(list):
    """The enumerated candidate list plus its completeness metadata.

    ``truncated`` is True when the state budget ran out before the walk
    space was exhausted — downstream selection is then potentially
    suboptimal and the decomposition driver escalates (wider caps, bigger
    budget, joint MILP re-solve) and/or records visible degradation in the
    output files (reference contrast: the Gurobi model searches edge
    multisets implicitly and has no truncation mode,
    ``cycle_decomposition.py:179-332``).
    """

    def __init__(self, items=(), truncated: bool = False,
                 max_states: int = 0, conc_cap: Optional[int] = None):
        super().__init__(items)
        self.truncated = truncated
        self.max_states = max_states
        self.conc_cap = conc_cap


def _bp_edges_at(g: BreakpointGraph, node) -> List[tuple]:
    """Unique breakpoint edges (('c'|'d', idx)) incident to node."""
    out = []
    for ci in dict.fromkeys(g.nodes[node][CONC]):
        out.append(("c", ci))
    for di in dict.fromkeys(g.nodes[node][DISC]):
        out.append(("d", di))
    return out


def _other_bp_end(g: BreakpointGraph, edge: tuple, node):
    e = (g.concordant_edges if edge[0] == "c" else g.discordant_edges)[edge[1]]
    n1, n2 = e.node1(), e.node2()
    return n2 if node == n1 else n1


def _seq_at(g: BreakpointGraph, node) -> int:
    return g.nodes[node][SEQ][0]


def cycle_has_reference_root(g: BreakpointGraph, used) -> bool:
    """Does this closed walk have a valid spanning-tree root in the
    reference MIQP (``cycle_decomposition.py:164-177``)?

    The root node carries ``c=1`` and its total concordant+discordant
    usage — with the reference's per-node ``set()`` dedup, so a self-loop
    counts once — must be <= 1; connectivity forces the root to be a USED
    node, and any used interior node has bp usage >= 1, so feasibility
    reduces to: some node's set-deduped bp usage is exactly 1.

    ``used`` is an edge multiset (dict or key/count pair iterable)."""
    items = used.items() if hasattr(used, "items") else used
    bp_at: Dict[tuple, int] = {}
    for (t, i), c in items:
        if c <= 0:
            continue
        if t == "c":
            e = g.concordant_edges[i]
        elif t == "d":
            e = g.discordant_edges[i]
        else:
            continue
        for node in {e.node1(), e.node2()}:  # set: self-loop ends collapse
            bp_at[node] = bp_at.get(node, 0) + c
    return any(v == 1 for v in bp_at.values())


def _seq_other_end(g: BreakpointGraph, seqi: int, node):
    e = g.sequence_edges[seqi]
    left, right = (e.chrom, e.start, "-"), (e.chrom, e.end, "+")
    return right if node == left else left


def enumerate_candidates(
    g: BreakpointGraph,
    disc_multiplicities: Optional[List[int]] = None,
    max_multiplicity: int = 10,
    conc_cap: Optional[int] = None,
    max_bp_steps: Optional[int] = None,
    max_states: int = 200_000,
    engine: str = "auto",
) -> "CandidatePool":
    """Enumerate candidate cycles and paths as edge multisets.

    ``engine``: 'native' (C++ walkenum, ~100x state throughput), 'python',
    or 'auto' (native when built).  Both produce identical pools.
    """
    if disc_multiplicities is None:
        disc_multiplicities = g.infer_discordant_edge_multiplicities()
    caps: Dict[tuple, int] = {}
    max_mult = max(disc_multiplicities, default=1)
    if conc_cap is None:
        conc_cap = min(max_multiplicity, max_mult + 1)
    for ci in range(len(g.concordant_edges)):
        caps[("c", ci)] = conc_cap
    for di in range(len(g.discordant_edges)):
        caps[("d", di)] = min(disc_multiplicities[di], max_multiplicity)
    if max_bp_steps is None:
        max_bp_steps = min(
            sum(caps.values()), 4 * (len(g.concordant_edges)
                                     + len(g.discordant_edges)) + 2, 40)

    if engine == "auto":
        from ..native import walkenum
        engine = "native" if walkenum.available() else "python"
    if engine == "native":
        from ..native import walkenum
        rows, truncated = walkenum.enumerate_native(
            g, caps, max_multiplicity, max_bp_steps, max_states)
        if truncated:
            logger.warning(
                "native candidate enumeration truncated at %d states; "
                "%d candidates found (results may be suboptimal)",
                max_states, len(rows))
        logger.info("enumerated %d candidate cycles/paths (native)", len(rows))
        return CandidatePool(
            (Candidate(tuple(sorted(edges.items(), key=repr)), is_cycle, w)
             for (edges, is_cycle, w) in rows
             if not is_cycle or cycle_has_reference_root(g, edges)),
            truncated=bool(truncated), max_states=max_states,
            conc_cap=conc_cap)

    endnode_list = list(g.endnodes.keys())
    endnode_idx = {n: i for i, n in enumerate(endnode_list)}
    seq_len = [e.size for e in g.sequence_edges]

    seen: Set[FrozenSet[Tuple[tuple, int]]] = set()
    out: List[Candidate] = []
    budget = [max_states]
    truncated = [False]

    def emit(used: Dict[tuple, int], is_cycle: bool):
        if is_cycle and not cycle_has_reference_root(g, used):
            return  # root-less (e.g. uniformly doubled) — ref-infeasible
        key = frozenset(used.items())
        if key in seen:
            return
        seen.add(key)
        w = float(sum(seq_len[k[1]] * v for k, v in used.items() if k[0] == "e"))
        out.append(Candidate(tuple(sorted(used.items(), key=repr)), is_cycle, w))

    # ---- cycles: closed alternating walks avoiding endnodes -------------
    def dfs_cycle(start_entry, node, used: Dict[tuple, int], steps: int):
        """``node`` is the current position, reached via a sequence edge;
        ``start_entry`` is the node at which the walk began (the entry end
        of the first sequence edge)."""
        if budget[0] <= 0:
            truncated[0] = True
            return
        budget[0] -= 1
        for bp in _bp_edges_at(g, node):
            if used.get(bp, 0) >= caps[bp]:
                continue
            v = _other_bp_end(g, bp, node)
            if v in g.endnodes:
                continue
            used[bp] = used.get(bp, 0) + 1
            if v == start_entry:
                # walk closes here; may also continue through the start
                # (doubled cycles / figure-eights)
                emit(used, True)
            seqi = _seq_at(g, v)
            if used.get(("e", seqi), 0) < max_multiplicity and steps < depth_cap[0]:
                w = _seq_other_end(g, seqi, v)
                if w not in g.endnodes:
                    used[("e", seqi)] = used.get(("e", seqi), 0) + 1
                    dfs_cycle(start_entry, w, used, steps + 1)
                    used[("e", seqi)] -= 1
                    if used[("e", seqi)] == 0:
                        del used[("e", seqi)]
            used[bp] -= 1
            if used[bp] == 0:
                del used[bp]

    def run_cycle_phase():
        for seqi, e in enumerate(g.sequence_edges):
            left = (e.chrom, e.start, "-")
            right = (e.chrom, e.end, "+")
            if left in g.endnodes or right in g.endnodes:
                continue
            dfs_cycle(left, right, {("e", seqi): 1}, 0)

    # ---- paths: terminal-to-terminal walks -------------------------------
    # terminals: (kind, idx, node); kind 'n' = endnode, 'src' = source edge
    terminals: List[tuple] = [("n", i, n) for i, n in enumerate(endnode_list)]
    terminals += [("src", i, s.node()) for i, s in enumerate(g.source_edges)]

    # static node -> [(kind, idx)] map: the DFS queries this at every
    # visited node, so a linear scan of the terminal list would cost
    # O(len(terminals) * max_states)
    exits_at: Dict[tuple, List[tuple]] = {}
    for (kind, idx, tn) in terminals:
        exits_at.setdefault(tn, []).append((kind, idx))

    def terminal_exits(node):
        return exits_at.get(node, ())

    def dfs_path(start_key, node, used: Dict[tuple, int], steps: int):
        """``node`` reached via a sequence edge; may terminate here if a
        terminal exists, or continue via breakpoint edges."""
        if budget[0] <= 0:
            truncated[0] = True
            return
        budget[0] -= 1
        for (kind, idx) in terminal_exits(node):
            tkey = ("nt", idx) if kind == "n" else ("t", idx)
            if tkey in used:
                continue
            used[tkey] = 1
            emit(used, False)
            del used[tkey]
        if node in g.endnodes:
            return  # paths cannot pass through endnodes
        for bp in _bp_edges_at(g, node):
            if used.get(bp, 0) >= caps[bp]:
                continue
            v = _other_bp_end(g, bp, node)
            if v in g.endnodes:
                continue
            seqi = _seq_at(g, v)
            if used.get(("e", seqi), 0) >= max_multiplicity or steps >= depth_cap[0]:
                continue
            w = _seq_other_end(g, seqi, v)
            used[bp] = used.get(bp, 0) + 1
            used[("e", seqi)] = used.get(("e", seqi), 0) + 1
            dfs_path(start_key, w, used, steps + 1)
            used[bp] -= 1
            if used[bp] == 0:
                del used[bp]
            used[("e", seqi)] -= 1
            if used[("e", seqi)] == 0:
                del used[("e", seqi)]

    def run_path_phase():
        for (kind, idx, node) in terminals:
            skey = ("ns", idx) if kind == "n" else ("s", idx)
            seqi = _seq_at(g, node)
            other = _seq_other_end(g, seqi, node)
            dfs_path(skey, other, {skey: 1, ("e", seqi): 1}, 0)

    # Iterative deepening on breakpoint-edge count: exhaust all short walks
    # (simple cycles and direct paths) before spending the state budget on
    # deep ones, so a truncated pool still provably contains every walk up
    # to the last completed depth.  The seen-set dedups across phases; each
    # phase re-explores shallow prefixes, a bounded constant-factor cost.
    depth_cap = [0]
    depth = min(4, max_bp_steps)
    while True:
        depth_cap[0] = depth
        run_cycle_phase()
        run_path_phase()
        if depth >= max_bp_steps or truncated[0]:
            break
        if budget[0] <= 0:
            # the budget ran out exactly at a pass boundary: deeper walks
            # were never explored, so the pool IS truncated even though
            # no dfs call tripped the in-search guard
            truncated[0] = True
            break
        depth = min(depth * 2, max_bp_steps)

    if truncated[0]:
        logger.warning(
            "candidate enumeration truncated at %d states; "
            "%d candidates found (results may be suboptimal)",
            max_states, len(out))
    logger.info("enumerated %d candidate cycles/paths", len(out))
    return CandidatePool(out, truncated=truncated[0], max_states=max_states,
                         conc_cap=conc_cap)
