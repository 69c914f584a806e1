"""Reference-model solution verifier and cycle canonicalization.

The reference's cycle decomposition is a Gurobi MIQP
(``src/cycle_decomposition.py:14-460``).  This module re-states every
constraint of that model as an explicit *checker* over a finished
solution, so any decomposition — ours, the reference's, or a published
artifact — can be verified against the reference's own feasibility rules:

* w/z coupling and bounds                       (ref ``:60-68``)
* edge-multiplicity integrality and ub 10       (ref ``:69-74``)
* >= p_total_weight coverage                    (ref ``:85-89``)
* per-node Eulerian balance                     (ref ``:92-110``)
* endnode s/t tie  x_s + x_t == x_seq           (ref ``:92-97``)
* per-decomposition s/t path balance            (ref ``:111-119``)
* CN caps per seq/conc/disc/source edge and the
  p_bp_cn lower bound on discordant edges       (ref ``:122-143``)
* discordant multiplicity caps                  (ref ``:146-149``)
* single connected Eulerian component           (ref ``:152-332``,
  the c/d/y spanning-tree machinery, checked directly as
  connectivity + terminal structure)
* cycle spanning-tree root: a used node with
  set-deduped conc/disc usage exactly 1          (ref ``:164-177``,
  the c-variable constraints — kills uniformly doubled cycles)
* subpath-constraint satisfaction               (ref ``:334-353``)

It also converts AA ``Segments=`` token strings into reference edge
multisets (so published ``cycles.txt`` artifacts can be fed through the
checker) and canonicalizes cycles under rotation/reflection so golden
comparisons are representation-invariant.

This is the parity harness for the GBM39 published example — see
``tests/test_gbm39_parity.py`` and ``docs/GBM39_PARITY.md`` for the
feasibility analysis of the README's expected output.
"""
from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from ..graph.breakpoint_graph import SEQ, CONC, DISC, SRC, BreakpointGraph

Violation = str
EdgeDict = Dict[tuple, int]


# --------------------------------------------------------------------------
# Segments= token strings <-> edge multisets
# --------------------------------------------------------------------------

def _seg_nodes(g: BreakpointGraph, token: str) -> Tuple[int, tuple, tuple]:
    """(seq_index, entry_node, exit_node) for a segment token like '2+'."""
    idx = int(token[:-1]) - 1
    if not 0 <= idx < len(g.sequence_edges):
        # '0±' outside the wrap positions, or an out-of-range id: without
        # this guard python's negative indexing would silently validate
        # the wrong segment
        raise ValueError(f"segment token {token!r} does not name a "
                         f"sequence edge (graph has "
                         f"{len(g.sequence_edges)})")
    e = g.sequence_edges[idx]
    left = (e.chrom, e.start, "-")
    right = (e.chrom, e.end, "+")
    if token[-1] == "+":
        return idx, left, right
    return idx, right, left


def _bp_between(g: BreakpointGraph, u: tuple, v: tuple) -> Optional[tuple]:
    """The breakpoint edge joining nodes u and v (conc preferred), or None."""
    for ci, e in enumerate(g.concordant_edges):
        if {e.node1(), e.node2()} == {u, v}:
            return ("c", ci)
    for di, e in enumerate(g.discordant_edges):
        if e.is_self_loop():
            if u == v == e.node1():
                return ("d", di)
        elif {e.node1(), e.node2()} == {u, v}:
            return ("d", di)
    return None


def segments_to_solution(
    g: BreakpointGraph, tokens: List[str],
    allow_free_terminals: bool = False,
) -> Tuple[Optional[EdgeDict], bool, List[Violation]]:
    """Convert an AA ``Segments=`` token list into a reference edge multiset.

    Returns (edge_dict, is_cycle, violations).  A leading '0+' / trailing
    '0-' marks a path (AA wrap convention, ref ``output_cycles``
    ``cycle_decomposition.py:2011-2062``); its terminals must map onto the
    graph's endnodes or source edges — the only s/t attachments that exist
    in the reference model (ref ``:92-119``).  Any missing edge or invalid
    terminal is reported as a violation and conversion returns None.
    """
    viol: List[Violation] = []
    is_cycle = not (tokens[0] == "0+" and tokens[-1] == "0-")
    segs = tokens if is_cycle else tokens[1:-1]
    if not segs:
        return None, is_cycle, ["empty segment list"]
    used: EdgeDict = {}
    try:
        info = [_seg_nodes(g, t) for t in segs]
    except ValueError as exc:
        return None, is_cycle, [str(exc)]
    for (idx, _, _) in info:
        used[("e", idx)] = used.get(("e", idx), 0) + 1
    # interior junctions
    for k in range(len(info) - 1):
        u = info[k][2]
        v = info[k + 1][1]
        bp = _bp_between(g, u, v)
        if bp is None:
            viol.append(
                f"no concordant/discordant edge joins {u} -> {v} "
                f"(between tokens {segs[k]} and {segs[k + 1]})")
        else:
            used[bp] = used.get(bp, 0) + 1
    if is_cycle:
        u = info[-1][2]
        v = info[0][1]
        bp = _bp_between(g, u, v)
        if bp is None:
            viol.append(
                f"cycle does not close: no edge joins {u} -> {v} "
                f"(between tokens {segs[-1]} and {segs[0]})")
        else:
            used[bp] = used.get(bp, 0) + 1
    else:
        endnode_list = list(g.endnodes.keys())
        for side, node in (("s", info[0][1]), ("t", info[-1][2])):
            key = None
            if node in g.endnodes:
                key = ("n" + side, endnode_list.index(node))
            else:
                for si, se in enumerate(g.source_edges):
                    if se.node() == node:
                        key = (side, si)
                        break
            if key is None:
                if allow_free_terminals:
                    continue  # caller wants the interior multiset anyway
                viol.append(
                    f"path terminal {node} is neither an endnode nor a "
                    f"source-edge node: the reference model has no "
                    f"s/t attachment there (ref :92-119) — the walk "
                    f"cannot be a path in this graph")
            else:
                used[key] = used.get(key, 0) + 1
    if viol:
        return None, is_cycle, viol
    return used, is_cycle, []


def canonical_tokens(tokens: List[str], is_cycle: Optional[bool] = None,
                     ) -> Tuple[str, ...]:
    """Rotation/reflection-invariant canonical form of a Segments string.

    Cycles compare equal under rotation and direction reversal (a reversed
    traversal flips every segment sign); paths only under reversal.  The
    randomized Eulerian traversal (ref ``:1602-1934``) makes the emitted
    representative arbitrary — canonicalization is what makes golden
    comparisons meaningful.
    """
    if is_cycle is None:
        is_cycle = not (tokens and tokens[0] == "0+" and tokens[-1] == "0-")
    segs = tokens if is_cycle else tokens[1:-1]
    flip = {"+": "-", "-": "+"}
    rev = [t[:-1] + flip[t[-1]] for t in reversed(segs)]
    if not is_cycle:
        return tuple(min(segs, rev))
    forms = []
    for seq in (segs, rev):
        for r in range(len(seq)):
            forms.append(tuple(seq[r:] + seq[:r]))
    return min(forms)


# --------------------------------------------------------------------------
# cycles.txt parsing (solution side; graph parsing lives in breakpoint_graph)
# --------------------------------------------------------------------------

def parse_cycles_text(text: str) -> dict:
    """Parse a cycles.txt into {segments, constraints, entries}."""
    segments: Dict[int, tuple] = {}
    constraints: List[dict] = []
    entries: List[dict] = []
    for line in text.splitlines():
        f = line.rstrip("\n").split("\t")
        if line.startswith("Segment\t"):
            segments[int(f[1])] = (f[2], int(f[3]), int(f[4]))
        elif line.startswith("Path constraint\t"):
            constraints.append({
                "id": int(f[1]),
                "tokens": f[2].split(","),
                "support": int(re.sub(r"Support<?=", "", f[3])),
                "satisfied": (len(f) > 4 and f[4] == "Satisfied"),
            })
        elif line.startswith("Cycle="):
            attrs = dict(kv.split("=", 1) for kv in line.split(";"))
            entries.append({
                "id": int(attrs["Cycle"]),
                "copy_count": float(attrs["Copy_count"]),
                "tokens": attrs["Segments"].split(","),
                "pcs": [int(x) for x in
                        attrs.get("Path_constraints_satisfied", "").split(",")
                        if x],
            })
    return {"segments": segments, "constraints": constraints,
            "entries": entries}


# --------------------------------------------------------------------------
# The reference-model checker
# --------------------------------------------------------------------------

def _connected(g: BreakpointGraph, used: EdgeDict) -> bool:
    """Is the used-edge multigraph one connected component?"""
    adj: Dict[tuple, set] = {}

    def link(a, b):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    for (t, i), c in used.items():
        if c <= 0:
            continue
        if t == "e":
            e = g.sequence_edges[i]
            link((e.chrom, e.start, "-"), (e.chrom, e.end, "+"))
        elif t == "c":
            e = g.concordant_edges[i]
            link(e.node1(), e.node2())
        elif t == "d":
            e = g.discordant_edges[i]
            link(e.node1(), e.node2())
        # s/t/ns/nt do not join graph nodes to each other
    if not adj:
        return False
    seen = set()
    stack = [next(iter(adj))]
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        stack.extend(adj[n] - seen)
    return seen == set(adj)


def verify_reference_model(
    g: BreakpointGraph,
    cycles: list,
    weights: list,
    pc_list: Optional[List[EdgeDict]] = None,
    p_total_weight: float = 0.9,
    p_bp_cn: float = 0.9,
    require_all_pc: bool = False,
    max_multiplicity: int = 10,
    tol: float = 1e-4,
) -> List[Violation]:
    """Check a finished decomposition against every constraint of the
    reference ``minimize_cycles`` model.  Returns [] iff feasible.

    ``cycles``/``weights`` use the reference's [cycle-list, path-list]
    pair structure with edge multisets keyed ('e'/'c'/'d'/'s'/'t'/'ns'/
    'nt', idx).  ``tol`` absorbs the 6-decimal rounding of published
    graph files.
    """
    viol: List[Violation] = []
    endnode_list = list(g.endnodes.keys())
    all_decomps: List[Tuple[EdgeDict, float, bool]] = []
    for slot, is_cycle in ((0, True), (1, False)):
        for edges, w in zip(cycles[slot], weights[slot]):
            all_decomps.append((edges, float(w), is_cycle))

    # w bounds (ref :60-68)
    for di, (_, w, _) in enumerate(all_decomps):
        if w < 0 or w > g.max_cn + tol:
            viol.append(f"decomp {di}: weight {w} outside [0, max_cn={g.max_cn}]")

    # multiplicity integrality and ub (ref :69-74)
    for di, (edges, _, _) in enumerate(all_decomps):
        for key, c in edges.items():
            if c != int(c) or c < 0:
                viol.append(f"decomp {di}: non-integer multiplicity {key}={c}")
            if c > max_multiplicity:
                viol.append(
                    f"decomp {di}: multiplicity {key}={c} exceeds ub "
                    f"{max_multiplicity} (ref :74)")

    # Eulerian node balance + endnode s/t tie (ref :92-110)
    for di, (edges, _, is_cycle) in enumerate(all_decomps):
        for node, slots in g.nodes.items():
            if node in g.endnodes:
                eni = endnode_list.index(node)
                st = edges.get(("ns", eni), 0) + edges.get(("nt", eni), 0)
                seq = edges.get(("e", slots[SEQ][0]), 0)
                if st != seq:
                    viol.append(
                        f"decomp {di}: endnode {node} s/t usage {st} != "
                        f"sequence usage {seq} (ref :92-97)")
            else:
                bal = sum(edges.get(("e", si), 0) for si in slots[SEQ])
                bal -= sum(edges.get(("c", ci), 0) for ci in slots[CONC])
                bal -= sum(edges.get(("d", dd), 0) for dd in slots[DISC])
                bal -= sum(edges.get(("s", si), 0) + edges.get(("t", si), 0)
                           for si in slots[SRC])
                if bal != 0:
                    viol.append(
                        f"decomp {di}: Eulerian imbalance {bal} at node "
                        f"{node} (ref :98-110)")

    # s/t path balance and terminal structure (ref :111-119, :152-177)
    for di, (edges, _, is_cycle) in enumerate(all_decomps):
        s_tot = sum(c for (t, _), c in edges.items() if t in ("s", "ns"))
        t_tot = sum(c for (t, _), c in edges.items() if t in ("t", "nt"))
        if s_tot != t_tot:
            viol.append(
                f"decomp {di}: source-side terminals {s_tot} != sink-side "
                f"{t_tot} (ref :111-119)")
        if is_cycle and (s_tot or t_tot):
            viol.append(f"decomp {di}: cycle carries s/t terminal edges")
        if not is_cycle and s_tot != 1:
            viol.append(
                f"decomp {di}: path must attach to s exactly once "
                f"(has {s_tot}; ref :152-177)")
        if not _connected(g, edges):
            viol.append(
                f"decomp {di}: used edges do not form one connected "
                f"component (ref spanning-tree constraints :179-332)")
        if is_cycle and edges:
            from .candidates import cycle_has_reference_root

            if not cycle_has_reference_root(g, edges):
                viol.append(
                    f"decomp {di}: cycle has no spanning-tree root — no "
                    f"used node with set-deduped conc/disc usage exactly "
                    f"1 (c-variable constraints, ref :164-177); e.g. a "
                    f"uniformly doubled cycle is infeasible in the "
                    f"reference MIQP")

    # CN caps (ref :122-143)
    def usage(key) -> float:
        return sum(w * e.get(key, 0) for (e, w, _) in all_decomps)

    for i, e in enumerate(g.sequence_edges):
        u = usage(("e", i))
        if u > e.cn + tol:
            viol.append(
                f"sequence edge {i} ({e.chrom}:{e.start}-{e.end}): total "
                f"weighted usage {u:.6f} exceeds CN {e.cn:.6f} (ref :122-126)")
    for i, e in enumerate(g.concordant_edges):
        u = usage(("c", i))
        if u > e.cn + tol:
            viol.append(
                f"concordant edge {i} ({e.chrom1}:{e.pos1}{e.o1}->"
                f"{e.chrom2}:{e.pos2}{e.o2}): total weighted usage {u:.6f} "
                f"exceeds CN {e.cn:.6f} (ref :127-131)")
    for i, e in enumerate(g.discordant_edges):
        u = usage(("d", i))
        if u > e.cn + tol:
            viol.append(
                f"discordant edge {i}: total weighted usage {u:.6f} exceeds "
                f"CN {e.cn:.6f} (ref :132-136)")
        if u < p_bp_cn * e.cn - tol:
            viol.append(
                f"discordant edge {i}: total weighted usage {u:.6f} below "
                f"p_bp_cn*CN = {p_bp_cn * e.cn:.6f} (ref :137-138)")
    for i, e in enumerate(g.source_edges):
        u = usage(("s", i)) + usage(("t", i))
        if u > e.cn + tol:
            viol.append(
                f"source edge {i}: total weighted usage {u:.6f} exceeds "
                f"CN {e.cn:.6f} (ref :139-143)")

    # discordant multiplicity caps (ref :146-149)
    mults = g.infer_discordant_edge_multiplicities()
    for di, (edges, _, _) in enumerate(all_decomps):
        for i, m in enumerate(mults):
            if edges.get(("d", i), 0) > m:
                viol.append(
                    f"decomp {di}: discordant edge {i} multiplicity "
                    f"{edges[('d', i)]} exceeds inferred cap {m} (ref :146-149)")

    # coverage (ref :85-89)
    total_weights = float(sum(e.size * e.cn for e in g.sequence_edges))
    covered = decomposition_coverage(g, cycles, weights)
    if covered < p_total_weight * total_weights - tol * max(total_weights, 1.0):
        viol.append(
            f"coverage {covered:.1f} below p_total_weight * total = "
            f"{p_total_weight * total_weights:.1f} (ref :85-89)")

    # subpath constraints (ref :334-353; minimize_cycles requires ALL)
    if pc_list and require_all_pc:
        from .decomposition import candidate_satisfies

        for pi, pc in enumerate(pc_list):
            if not any(candidate_satisfies(edges, pc)
                       for (edges, _, _) in all_decomps):
                viol.append(
                    f"subpath constraint {pi} satisfied by no decomposition "
                    f"(ref :334-353)")
    return viol


def decomposition_coverage(g: BreakpointGraph, cycles: list,
                           weights: list) -> float:
    """Length-weighted CN covered by a decomposition."""
    covered = 0.0
    for slot in (0, 1):
        for edges, w in zip(cycles[slot], weights[slot]):
            covered += w * sum(g.sequence_edges[i].size * c
                               for (t, i), c in edges.items() if t == "e")
    return covered
